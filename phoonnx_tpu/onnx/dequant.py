"""Reconstruct float weights from int8-quantized ONNX initializers.

onnxruntime's quantization tooling (``quantize_dynamic`` / QOperator
static quantization — what produces the int8 piper/phoonnx voices the
reference runs through its InferenceSession, reference voice.py:167)
rewrites each quantized initializer ``X`` into a triple::

    X_quantized    int8/uint8 tensor
    X_scale        f32 scalar (per-tensor) or [C] vector (per-channel)
    X_zero_point   same shape family as X_scale

and swaps the consuming ops to MatMulInteger/ConvInteger/QLinear*. The
state-dict name ``X`` itself survives as the triple's prefix, so a
quantized voice can still be imported into the compiled JAX graph by
dequantizing ``X = (X_quantized - X_zero_point) * X_scale`` and routing
the reconstructed names as usual — instead of interpreting the whole
quantized graph op-by-op on the host.

Weights dequantize to f32 at import time; the engine then runs them at
its configured dtype (f32 or bf16) on the MXU. This matches onnxruntime
numerics to within the int8 rounding the model already carries.
"""

import logging
from typing import Dict, Mapping, Tuple

import numpy as np

LOG = logging.getLogger(__name__)

_Q_SUFFIX = "_quantized"
_INT_TYPES = (np.int8, np.uint8, np.int32)


def _broadcast_shape(q: np.ndarray, vec: np.ndarray) -> Tuple[int, ...]:
    """Shape that lands a per-channel [C] vector on q's channel axis.

    The true axis lives on the consuming node's attribute, which this
    name-triple pass cannot see — so the axis is only taken when the
    size matches EXACTLY ONE axis. Ambiguous tensors (square weights,
    e.g. hidden-to-hidden projections) are refused: guessing axis 0 on
    a per-column-quantized MatMul weight would dequantize to garbage
    that then imports silently. Refused triples stay quantized and the
    caller routes the voice to the graph interpreter, which applies the
    node-attribute axis exactly.
    """
    candidates = [ax for ax in range(q.ndim) if q.shape[ax] == vec.size]
    if not candidates:
        raise ValueError(
            f"per-channel scale of size {vec.size} matches no axis of "
            f"shape {q.shape}"
        )
    if len(candidates) > 1:
        raise ValueError(
            f"per-channel scale of size {vec.size} is ambiguous for "
            f"shape {q.shape} (axes {candidates}) — axis unknown "
            "without the consuming node"
        )
    axis = candidates[0]
    return tuple(vec.size if ax == axis else 1 for ax in range(q.ndim))


def dequantize_flat(
    named: Mapping[str, np.ndarray],
) -> Tuple[Dict[str, np.ndarray], int]:
    """Fold ``X_quantized/X_scale/X_zero_point`` triples back to ``X``.

    Returns ``(new_named, n_dequantized)``. Non-triple entries pass
    through untouched; malformed triples are left as-is (the caller's
    routed-fraction check then sends the voice to the graph interpreter
    instead of mis-importing it).
    """
    out = dict(named)
    count = 0
    for name in list(named):
        if not name.endswith(_Q_SUFFIX):
            continue
        base = name[: -len(_Q_SUFFIX)]
        q = named[name]
        scale = named.get(base + "_scale")
        zero_point = named.get(base + "_zero_point")
        if scale is None or base in named:
            continue
        if q.dtype.type not in _INT_TYPES:
            continue
        scale = np.asarray(scale, np.float32)
        zp = (np.zeros_like(scale, np.int32) if zero_point is None
              else np.asarray(zero_point).astype(np.int32))
        try:
            if scale.size > 1:
                shape = _broadcast_shape(q, scale.reshape(-1))
                scale = scale.reshape(shape)
                zp = zp.reshape(shape) if zp.size > 1 else zp
            else:
                scale = scale.reshape(())
                if zp.size != 1:
                    # per-tensor scale with a VECTOR zero point is a
                    # shape family the ONNX spec never produces; naive
                    # numpy broadcasting along q's trailing axis would
                    # dequantize silently-wrong values — refuse, the
                    # triple stays for the interpreter fallback
                    raise ValueError(
                        f"scalar scale with {zp.size}-element zero "
                        "point")
                zp = zp.reshape(())
            value = (q.astype(np.int32) - zp).astype(np.float32) * scale
        except ValueError as exc:
            LOG.warning("cannot dequantize %r: %s", name, exc)
            continue
        out[base] = value
        del out[name]
        out.pop(base + "_scale", None)
        out.pop(base + "_zero_point", None)
        count += 1
    return out, count


def quantize_flat(
    named: Mapping[str, np.ndarray],
    min_size: int = 1024,
    per_channel: bool = False,
) -> Tuple[Dict[str, np.ndarray], int]:
    """Inverse of :func:`dequantize_flat`: write weight triples.

    Symmetric int8 (zero_point 0), per-tensor by default or per-channel
    on axis 0. Small tensors (< ``min_size`` elements — biases, norms)
    stay f32, mirroring onnxruntime's weight-only dynamic quantization.
    Used by the exporter's ``--quantize`` mode; the executor runs the
    resulting graphs via its integer op set, and the importer restores
    them through :func:`dequantize_flat`.
    """
    out: Dict[str, np.ndarray] = {}
    count = 0
    for name, value in named.items():
        arr = np.asarray(value)
        if arr.dtype != np.float32 or arr.size < min_size or arr.ndim < 2:
            out[name] = arr
            continue
        if per_channel:
            reduce_axes = tuple(range(1, arr.ndim))
            amax = np.abs(arr).max(axis=reduce_axes, keepdims=True)
            scale = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
            stored_scale = scale.reshape(-1)
        else:
            scale = np.maximum(np.abs(arr).max() / 127.0, 1e-12)
            scale = np.float32(scale)
            stored_scale = np.asarray(scale, np.float32)
        q = np.clip(np.rint(arr / scale), -127, 127).astype(np.int8)
        out[name + _Q_SUFFIX] = q
        out[name + "_scale"] = stored_scale
        out[name + "_zero_point"] = np.zeros_like(stored_scale, np.int8)
        count += 1
    return out, count
