"""ONNX -> JAX lowering: compile foreign voice graphs onto XLA.

The reference hands *every* voice graph to onnxruntime's compiled C++
engine (reference phoonnx/voice.py:167, tolerating signature differences
at voice.py:347-377). The rebuild imports piper/phoonnx-layout weights
into the native VITS engine, but foreign layouts (coqui-VITS, mimic3,
scripted exports) previously ran on the eager numpy interpreter
(:mod:`phoonnx_tpu.onnx.executor`) — functional, but the one place the
rebuild was architecturally slower than the reference. This module
closes that gap: it lowers the interpreter's op subset to jitted
``jax.numpy`` programs so foreign graphs execute as fused XLA
computations on the TPU.

Design — plan-based hybrid execution:

* **Plan pass** (once per input signature): run the graph eagerly with
  the numpy interpreter while classifying every value:

  - ``value_static``: a pure function of (input shapes, initializers,
    attributes) — constants, initializers, ``Shape``/``Size`` of
    shape-static tensors, and any node all of whose inputs are static.
    These are constant-folded at plan time and baked into the plan
    (sound because the plan is keyed on the exact input signature).
  - ``shape_static``: the value's *shape* is a pure function of the
    signature. Lost at data-dependent ops — ``Range`` over computed
    lengths (the VITS duration -> frame-count step), ``NonZero``,
    control flow — and propagated to everything downstream.

* **Segmentation**: consecutive nodes that (a) have a JAX lowering and
  (b) need no dynamic value in a static-required slot (reshape targets,
  slice bounds, pad widths ...) are grouped into maximal segments, each
  compiled with ``jax.jit``. ``If`` nodes whose branches trial-trace to
  matching shapes stage as ``lax.cond``, and ``Loop`` nodes with a
  plan-time-static trip count and a provably-True condition stage as
  ``lax.scan`` — inside the surrounding segment (the decision is made
  per node by ``jax.eval_shape`` over the signature's abstract values;
  see ``_control_flow_stageable``). Everything else (dynamic-termination
  loops, unsupported ops, data-dependent shape math) replays on the
  numpy interpreter between segments. ``jax.jit`` retraces automatically
  when a segment downstream of a data-dependent boundary sees new
  shapes.
  ``RandomNormalLike`` draws stay on the host RNG (bit-identical,
  seedable draws — the reference's onnxruntime path cannot reproduce
  graph noise at all) but do NOT split segments: a draw depends only on
  its input's signature-static shape, so it runs as a prologue-style
  host step feeding the one surrounding segment (see ``_HostDraw``) —
  a noise-injecting VITS graph compiles to a single XLA program.

* **Replay**: later calls with the same signature skip planning and run
  the recorded steps; jitted segments hit the XLA executable cache.

Numerical contract: jitted segments mirror the interpreter's op
semantics (same dtype rules, same rounding); floating-point results may
differ from the interpreter only by reassociation-level error (XLA vs
numpy kernels) — plus the backend's matmul precision: on TPU the
default f32 dot/conv runs on the MXU at bf16 input precision (~1e-3
relative), the same engine-wide policy as the native VITS path
(voice.py `matmul_precision`); construct the runner with
``matmul_precision="highest"`` for full-f32 dots. Integer/bool ops are
bit-exact, with documented exceptions:

* ``DynamicQuantizeLinear`` uses the spec's f32 scale math in both
  implementations (bit-equal where XLA's f32 divide is correctly
  rounded — always on CPU; a 1-ulp divide difference on an accelerator
  can flip a value sitting exactly on a rounding boundary).
* ``MatMulInteger`` accumulates in int32 on device (the interpreter
  uses int64) — identical unless a dot product exceeds int32, which
  needs a contraction length beyond ~33k at extreme int8 values.
* Plain-assignment scatters stay eager unless the plan-time indices are
  signature-static and duplicate-free (XLA's duplicate-write order is
  unspecified; see the ``ScatterND``/``ScatterElements`` guards).

Recurrent ops (LSTM/GRU) lower to ``lax.scan`` with the ONNX masked
``sequence_lens`` semantics (state frozen and outputs zeroed past each
row's length; the reverse direction processes each row's valid prefix
reversed), matching the interpreter's implementation.
"""

import functools
import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from phoonnx_tpu.onnx.executor import (OnnxExecutor, _attr,
                                       _conv_pad_list as _conv_pads)
from phoonnx_tpu.onnx.reader import _DTYPES as _DTYPE_BY_ONNX
from phoonnx_tpu.onnx.reader import OnnxModel, OnnxNode

LOG = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# JAX op lowerings (mirror phoonnx_tpu.onnx.executor._OPS semantics)
# ---------------------------------------------------------------------------
#
# Handlers receive (node, *args) where args are jnp tracers for dynamic
# inputs and concrete numpy arrays for plan-baked static inputs. Static-
# required positions (see _STATIC_REQ) are guaranteed concrete.


def _jnp():
    import jax.numpy as jnp

    return jnp


def _as_ints(arr) -> List[int]:
    return [int(v) for v in np.asarray(arr).reshape(-1)]


def _j_binary(fn):
    def handler(node, a, b):
        return fn(a, b)

    return handler


def _j_unary(fn):
    def handler(node, x):
        return fn(x)

    return handler


def _j_div(node, a, b):
    jnp = _jnp()
    if (np.issubdtype(np.dtype(a.dtype), np.floating)
            or np.issubdtype(np.dtype(b.dtype), np.floating)):
        return jnp.divide(a, b)
    # ONNX integer Div truncates toward zero (executor._int_div)
    q = jnp.floor_divide(a, b)
    r = a - q * b
    return q + ((r != 0) & ((a < 0) != (b < 0)))


def _j_gemm(node, a, b, c=None):
    jnp = _jnp()
    alpha = _attr(node, "alpha", 1.0)
    beta = _attr(node, "beta", 1.0)
    if _attr(node, "transA", 0):
        a = a.T
    if _attr(node, "transB", 0):
        b = b.T
    out = alpha * (a @ b)
    if c is not None:
        out = out + beta * c
    return out.astype(jnp.float32)


# pad resolution (incl. auto_pad) is shared with the interpreter —
# executor._conv_pad_list, imported above as _conv_pads — so the two
# engines' bit-exact parity contract has one copy of the SAME math


def _j_conv(node, x, w, b=None):
    import jax

    jnp = _jnp()
    group = _attr(node, "group", 1)
    spatial = x.ndim - 2
    strides = tuple(_attr(node, "strides", [1] * spatial))
    dilations = tuple(_attr(node, "dilations", [1] * spatial))
    kernel = w.shape[2:]
    pads = _conv_pads(node, x.shape, kernel, strides, dilations, spatial)
    dims = ("NCH", "OIH", "NCH") if spatial == 1 else ("NCHW", "OIHW", "NCHW")
    pad_pairs = [(pads[i], pads[i + spatial]) for i in range(spatial)]
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32),
        window_strides=strides, padding=pad_pairs, rhs_dilation=dilations,
        dimension_numbers=dims, feature_group_count=group,
    )
    if b is not None:
        out = out + jnp.reshape(b, (1, -1) + (1,) * spatial)
    return out.astype(jnp.float32)


def _j_conv_transpose(node, x, w, b=None):
    import jax

    jnp = _jnp()
    spatial = x.ndim - 2
    strides = tuple(_attr(node, "strides", [1] * spatial))
    pads = list(_attr(node, "pads", [0] * (2 * spatial)))
    group = _attr(node, "group", 1)
    kernel = w.shape[2:]
    w = jnp.asarray(w, jnp.float32)
    if group != 1:
        # torch layout [C_in, C_out/g, K...] -> lax rhs [C_in/g, C_out,
        # K...] with a group-major O axis (see _op_conv_transpose)
        ci, og = w.shape[0], w.shape[1]
        w = jnp.transpose(
            jnp.reshape(w, (group, ci // group, og) + kernel),
            (1, 0, 2) + tuple(range(3, 3 + spatial)),
        ).reshape((ci // group, group * og) + kernel)
    pad_pairs = [
        (kernel[i] - 1 - pads[i], kernel[i] - 1 - pads[i + spatial])
        for i in range(spatial)
    ]
    dims = ("NCH", "IOH", "NCH") if spatial == 1 else ("NCHW", "IOHW", "NCHW")
    flipped = jnp.flip(w, axis=tuple(range(2, w.ndim)))
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), flipped,
        window_strides=(1,) * spatial, padding=pad_pairs,
        lhs_dilation=strides, dimension_numbers=dims,
        feature_group_count=group,
    )
    if b is not None:
        out = out + jnp.reshape(b, (1, -1) + (1,) * spatial)
    return out.astype(jnp.float32)


def _j_reshape(node, data, shape):
    jnp = _jnp()
    target = _as_ints(shape)
    out_shape = [data.shape[i] if s == 0 else s
                 for i, s in enumerate(target)]
    return jnp.reshape(data, out_shape)


def _j_slice(node, data, starts=None, ends=None, axes=None, steps=None):
    if starts is None:  # opset < 10: attributes
        starts = _attr(node, "starts")
        ends = _attr(node, "ends")
        axes = _attr(node, "axes")
        steps = None
    starts = _as_ints(starts)
    ends = _as_ints(ends)
    axes = list(range(len(starts))) if axes is None else _as_ints(axes)
    steps = [1] * len(starts) if steps is None else _as_ints(steps)
    slices = [slice(None)] * data.ndim
    for start, end, axis, step in zip(starts, ends, axes, steps):
        slices[axis] = slice(start, end, step)
    return data[tuple(slices)]


def _j_variadic(fn, xs):
    jnp = _jnp()
    out = jnp.asarray(xs[0])
    for x in xs[1:]:
        out = fn(out, x)
    return out


def _j_softmax(node, x):
    jnp = _jnp()
    axis = _attr(node, "axis", -1)
    e = jnp.exp(x - jnp.max(x, axis=axis, keepdims=True))
    return (e / e.sum(axis=axis, keepdims=True)).astype(jnp.float32)


def _static_axes(node, axes_input, attr_name="axes"):
    if axes_input is not None:
        return tuple(_as_ints(axes_input))
    axes = _attr(node, attr_name)
    if axes is None:
        return None
    if isinstance(axes, int):
        return (axes,)
    return tuple(int(a) for a in axes)


def _j_reduce(fn_name, default_keepdims=1):
    def handler(node, data, axes_in=None):
        jnp = _jnp()
        axes = _static_axes(node, axes_in)
        if axes == () and not _attr(node, "noop_with_empty_axes", 0):
            axes = None  # empty axes tensor reduces over EVERY axis
        keepdims = bool(_attr(node, "keepdims", default_keepdims))
        return getattr(jnp, fn_name)(data, axis=axes, keepdims=keepdims)

    return handler


def _j_layer_norm(node, x, scale, bias=None):
    jnp = _jnp()
    axis = _attr(node, "axis", -1)
    eps = _attr(node, "epsilon", 1e-5)
    axes = tuple(range(axis if axis >= 0 else x.ndim + axis, x.ndim))
    mean = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    out = (x - mean) / jnp.sqrt(var + eps) * scale
    if bias is not None:
        out = out + bias
    return out.astype(jnp.float32)


def _j_pad(node, data, pads=None, value=None, axes=None):
    jnp = _jnp()
    if pads is None:
        pads = _attr(node, "pads")
    pads = _as_ints(pads)
    mode = _attr(node, "mode", "constant")
    ndim = data.ndim
    if axes is not None:
        axis_list = [a % ndim for a in _as_ints(axes)]
        n = len(axis_list)
        pad_width = [(0, 0)] * ndim
        for j, axis in enumerate(axis_list):
            pad_width[axis] = (pads[j], pads[j + n])
    else:
        pad_width = [(pads[i], pads[i + ndim]) for i in range(ndim)]
    if any(lo < 0 or hi < 0 for lo, hi in pad_width):
        # negative pads CROP from that edge (mirror interpreter)
        crops = tuple(
            slice(max(-lo, 0), dim - max(-hi, 0))
            for (lo, hi), dim in zip(pad_width, data.shape))
        data = data[crops]
        pad_width = [(max(lo, 0), max(hi, 0)) for lo, hi in pad_width]
    if mode == "constant":
        constant = (jnp.reshape(value, (-1,))[0]
                    if value is not None else 0.0)
        return jnp.pad(data, pad_width, constant_values=constant)
    return jnp.pad(data, pad_width, mode={"reflect": "reflect",
                                          "edge": "edge"}[mode])


def _j_cast(node, x):
    return x.astype(_DTYPE_BY_ONNX[int(_attr(node, "to"))])


def _j_split(node, data, split=None):
    jnp = _jnp()
    axis = _attr(node, "axis", 0)
    if split is None:
        split = _attr(node, "split")
    if split is None:
        num_outputs = _attr(node, "num_outputs", len(node.outputs))
        # opset-18: ceil-sized chunks, LAST one holds the remainder
        dim = data.shape[axis]
        chunk = -(-dim // num_outputs)
        sizes = [chunk] * (num_outputs - 1) + [dim - chunk
                                               * (num_outputs - 1)]
    else:
        sizes = _as_ints(split)
    indices = list(np.cumsum(sizes)[:-1])
    return tuple(jnp.split(data, indices, axis=axis))


def _j_expand(node, data, shape):
    jnp = _jnp()
    target = tuple(_as_ints(shape))
    return jnp.broadcast_to(data, np.broadcast_shapes(data.shape, target))


def _j_gather(node, data, indices):
    # np.take allows negative indices; jnp.take's default out-of-bounds
    # mode would fill them — normalize first to keep interpreter parity
    jnp = _jnp()
    axis = _attr(node, "axis", 0)
    idx = jnp.asarray(indices)
    idx = jnp.where(idx < 0, idx + data.shape[axis], idx)
    return jnp.take(data, idx, axis=axis, mode="clip")


def _j_gather_elements(node, data, indices):
    jnp = _jnp()
    axis = _attr(node, "axis", 0)
    idx = jnp.asarray(indices)
    idx = jnp.where(idx < 0, idx + data.shape[axis], idx)
    return jnp.take_along_axis(data, idx, axis=axis,
                               mode="clip")


def _j_unsqueeze(node, data, axes_in=None):
    jnp = _jnp()
    out = data
    for axis in sorted(_static_axes(node, axes_in)):
        out = jnp.expand_dims(out, axis)
    return out


def _j_squeeze(node, data, axes_in=None):
    jnp = _jnp()
    axes = _static_axes(node, axes_in)
    if axes is None:
        return jnp.squeeze(data)
    return jnp.squeeze(data, axis=tuple(axes))


def _j_arg_reduce(fn_name):
    def handler(node, data):
        jnp = _jnp()
        axis = _attr(node, "axis", 0)
        keepdims = bool(_attr(node, "keepdims", 1))
        if _attr(node, "select_last_index", 0):
            # ties resolve to the LAST occurrence (mirror interpreter)
            n = data.shape[axis]
            out = n - 1 - getattr(jnp, fn_name)(
                jnp.flip(data, axis=axis), axis=axis)
        else:
            out = getattr(jnp, fn_name)(data, axis=axis)
        if keepdims:
            out = jnp.expand_dims(out, axis)
        # ONNX Arg{Max,Min} emit int64; without x64 jax canonicalizes
        # to int32 anyway — request it directly instead of warning
        import jax as _jax

        idx_dtype = (jnp.int64 if _jax.config.jax_enable_x64
                     else jnp.int32)
        return out.astype(idx_dtype)

    return handler


def _j_clip(node, x, lo=None, hi=None):
    jnp = _jnp()
    lo = _attr(node, "min") if lo is None else lo
    hi = _attr(node, "max") if hi is None else hi
    if lo is None and hi is None:
        return jnp.asarray(x)  # legal identity Clip
    return jnp.clip(x, lo, hi)


def _j_cumsum(node, x, axis):
    jnp = _jnp()
    axis = int(np.asarray(axis).reshape(()))
    exclusive = int(_attr(node, "exclusive", 0))
    reverse = int(_attr(node, "reverse", 0))
    if reverse:
        x = jnp.flip(x, axis=axis)
    out = jnp.cumsum(x, axis=axis)
    if exclusive:
        out = jnp.roll(out, 1, axis=axis)
        idx = [slice(None)] * out.ndim
        idx[axis] = slice(0, 1)
        out = out.at[tuple(idx)].set(0)
    if reverse:
        out = jnp.flip(out, axis=axis)
    return out


def _j_transpose(node, data):
    jnp = _jnp()
    return jnp.transpose(data, _attr(node, "perm"))


def _j_tile(node, data, repeats):
    jnp = _jnp()
    return jnp.tile(data, _as_ints(repeats))


def _j_topk(node, x, k):
    jnp = _jnp()
    axis = _attr(node, "axis", -1)
    largest = _attr(node, "largest", 1)
    k = int(np.asarray(k).reshape(()))
    order = jnp.argsort(-x if largest else x, axis=axis, stable=True)
    idx = jnp.take(order, jnp.arange(k), axis=axis)
    values = jnp.take_along_axis(x, idx, axis=axis)
    return values, idx.astype(jnp.int64)


def _j_one_hot(node, indices, depth, values):
    jnp = _jnp()
    axis = _attr(node, "axis", -1)
    depth = int(np.asarray(depth).reshape(()))
    off_on = jnp.reshape(values, (-1,))
    idx = jnp.asarray(indices)
    idx = jnp.where(idx < 0, idx + depth, idx)
    hot = idx[..., None] == jnp.arange(depth)
    out = jnp.where(hot, off_on[1], off_on[0]).astype(off_on.dtype)
    dest = axis if axis >= 0 else out.ndim + axis
    return jnp.moveaxis(out, -1, dest)


def _j_trilu(node, x, k=None):
    jnp = _jnp()
    upper = _attr(node, "upper", 1)
    kk = int(np.asarray(k).reshape(())) if k is not None else 0
    return jnp.triu(x, kk) if upper else jnp.tril(x, kk)


def _j_flatten(node, x):
    jnp = _jnp()
    axis = _attr(node, "axis", 1)
    lead = int(np.prod(x.shape[:axis]) or 1)
    return jnp.reshape(x, (lead, -1))


def _j_erf(node, x):
    from jax.scipy.special import erf

    return erf(x).astype(x.dtype)


def _j_mod(node, a, b):
    jnp = _jnp()
    return jnp.fmod(a, b) if _attr(node, "fmod", 0) else jnp.mod(a, b)


def _j_einsum(node, *args):
    jnp = _jnp()
    eq = _attr(node, "equation")
    if isinstance(eq, bytes):
        eq = eq.decode("utf-8")
    return jnp.einsum(eq, *args)


def _j_dequantize_linear(node, x, scale, zp=None):
    jnp = _jnp()
    axis = _attr(node, "axis", 1)

    def per_axis(a):
        a = jnp.asarray(a)
        if a.ndim == 0 or a.size == 1:
            return jnp.reshape(a, ())
        shape = [1] * x.ndim
        shape[axis] = a.size
        return jnp.reshape(a, shape)

    s = per_axis(scale).astype(jnp.float32)
    z = per_axis(zp).astype(jnp.int32) if zp is not None else 0
    return ((x.astype(jnp.int32) - z) * s).astype(jnp.float32)


def _j_saturate(values, dtype):
    jnp = _jnp()
    info = np.iinfo(dtype)
    return jnp.clip(values, info.min, info.max).astype(dtype)


def _j_per_axis(a, ndim, axis):
    """Reshape a scalar / per-axis quant parameter for broadcasting
    (mirrors executor._per_axis)."""
    jnp = _jnp()
    a = jnp.asarray(a)
    if a.ndim == 0 or a.size == 1:
        return jnp.reshape(a, ())
    shape = [1] * ndim
    shape[axis] = a.size
    return jnp.reshape(a, shape)


def _j_quantize_linear(node, x, scale, zp=None):
    jnp = _jnp()
    axis = _attr(node, "axis", 1)
    s = _j_per_axis(scale, x.ndim, axis)
    dtype = np.dtype(zp.dtype) if zp is not None else np.dtype(np.uint8)
    z = (_j_per_axis(zp, x.ndim, axis).astype(jnp.int32)
         if zp is not None else 0)
    return _j_saturate(jnp.rint(x / s).astype(jnp.int32) + z, dtype)


def _j_dynamic_quantize_linear(node, x):
    jnp = _jnp()
    x = jnp.asarray(x, jnp.float32)
    if x.size:
        rmin = jnp.minimum(x.min(), jnp.float32(0))
        rmax = jnp.maximum(x.max(), jnp.float32(0))
    else:
        rmin = rmax = jnp.float32(0)
    scale = (rmax - rmin) / jnp.float32(255)
    scale = jnp.where(scale == 0, jnp.float32(1), scale)
    zp = jnp.clip(jnp.rint(jnp.float32(0) - rmin / scale),
                  0, 255).astype(jnp.uint8)
    y = _j_saturate(jnp.rint(x / scale).astype(jnp.int32)
                    + zp.astype(jnp.int32), np.uint8)
    return y, scale.astype(jnp.float32), zp


def _j_matmul_integer(node, a, b, a_zp=None, b_zp=None):
    jnp = _jnp()
    a32 = jnp.asarray(a).astype(jnp.int32)
    b32 = jnp.asarray(b).astype(jnp.int32)
    if a_zp is not None:
        z = jnp.asarray(a_zp).astype(jnp.int32)
        a32 = a32 - (z.reshape(-1, 1) if z.ndim == 1 and z.size > 1
                     else z.reshape(()))
    if b_zp is not None:
        z = jnp.asarray(b_zp).astype(jnp.int32)
        b32 = b32 - (z.reshape(1, -1) if z.ndim == 1 and z.size > 1
                     else z.reshape(()))
    return jnp.matmul(a32, b32)  # int32 accumulation (see module doc)


def _j_qlinear_matmul(node, a, a_scale, a_zp, b, b_scale, b_zp,
                      y_scale, y_zp):
    """Statically-quantized matmul: int32 dot + f32 single-rounding
    requant — bit-equal to the interpreter (same IEEE f32 ops; the
    reference feeds such graphs to ort's compiled int8 kernels,
    voice.py:167)."""
    jnp = _jnp()
    acc = _j_matmul_integer(node, a, b, a_zp, b_zp).astype(jnp.float32)
    scale = (jnp.asarray(a_scale).astype(jnp.float32)
             * jnp.asarray(b_scale).astype(jnp.float32)
             / jnp.asarray(y_scale).astype(jnp.float32))
    zp = jnp.asarray(y_zp)
    y = jnp.rint(acc * scale).astype(jnp.int32) + zp.astype(jnp.int32)
    return _j_saturate(y, np.dtype(zp.dtype))


def _j_int_conv(node, x, w, x_zp=None, w_zp=None):
    """(x - x_zp) conv (w - w_zp), int32 accumulation, ONNX NCHW layout
    (1D or 2D, groups) — mirrors executor._int_conv_exact."""
    import jax

    jnp = _jnp()
    spatial = x.ndim - 2
    group = _attr(node, "group", 1)
    strides = tuple(_attr(node, "strides", [1] * spatial))
    dilations = tuple(_attr(node, "dilations", [1] * spatial))
    pads = _conv_pads(node, x.shape, w.shape[2:], strides, dilations,
                      spatial)
    x32 = jnp.asarray(x).astype(jnp.int32)
    w32 = jnp.asarray(w).astype(jnp.int32)
    if x_zp is not None:  # per-tensor scalar (ONNX spec)
        x32 = x32 - jnp.asarray(x_zp).astype(jnp.int32).reshape(())
    if w_zp is not None:
        z = jnp.asarray(w_zp).astype(jnp.int32)
        if z.ndim == 1 and z.size > 1:  # per output channel
            z = z.reshape((-1,) + (1,) * (w32.ndim - 1))
        else:
            z = z.reshape(())
        w32 = w32 - z
    dn = (("NCH", "OIH", "NCH") if spatial == 1
          else ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(
        x32, w32, window_strides=strides,
        padding=[(pads[i], pads[i + spatial]) for i in range(spatial)],
        rhs_dilation=dilations, dimension_numbers=dn,
        feature_group_count=group, preferred_element_type=jnp.int32,
    )
    return out


def _j_conv_integer(node, x, w, x_zp=None, w_zp=None):
    return _j_int_conv(node, x, w, x_zp, w_zp)


def _j_qlinear_conv(node, x, x_scale, x_zp, w, w_scale, w_zp,
                    y_scale, y_zp, b=None):
    """Statically-quantized conv: int32 conv + int32 bias + f32
    single-rounding requant (per-tensor or per-channel scales)."""
    jnp = _jnp()
    acc = _j_int_conv(node, x, w, x_zp, w_zp)
    if b is not None:  # int32 bias at scale x_scale*w_scale
        acc = acc + jnp.asarray(b).astype(jnp.int32).reshape(
            (1, -1) + (1,) * (acc.ndim - 2))
    scale = (jnp.asarray(x_scale).astype(jnp.float32)
             * jnp.asarray(w_scale).astype(jnp.float32)
             / jnp.asarray(y_scale).astype(jnp.float32))
    s = _j_per_axis(scale, acc.ndim, 1)
    zp = jnp.asarray(y_zp)
    y = (jnp.rint(acc.astype(jnp.float32) * s).astype(jnp.int32)
         + zp.astype(jnp.int32))
    return _j_saturate(y, np.dtype(zp.dtype))


def _j_gather_nd(node, data, indices):
    jnp = _jnp()
    batch_dims = _attr(node, "batch_dims", 0)
    idx = jnp.asarray(indices).astype(jnp.int32)
    last = idx.shape[-1]
    dims = np.asarray(data.shape[batch_dims:batch_dims + last], np.int32)
    idx = jnp.where(idx < 0, idx + dims, idx)
    if not batch_dims:
        return data[tuple(jnp.moveaxis(idx, -1, 0))]
    # fold the (matching) leading batch dims into an extra index column
    bshape = data.shape[:batch_dims]
    d2 = jnp.reshape(data, (-1,) + data.shape[batch_dims:])
    i2 = jnp.reshape(idx, (-1,) + idx.shape[batch_dims:])
    rows = jnp.arange(d2.shape[0], dtype=jnp.int32).reshape(
        (-1,) + (1,) * (i2.ndim - 1))
    rows = jnp.broadcast_to(rows, i2.shape[:-1] + (1,))
    i3 = jnp.concatenate([rows, i2], axis=-1)
    out = d2[tuple(jnp.moveaxis(i3, -1, 0))]
    return jnp.reshape(out, bshape + out.shape[1:])


def _scatter_ref(node, data, ix, updates):
    jnp = _jnp()
    at = data.at[ix]
    red = _attr(node, "reduction", "none")
    fn = {"none": at.set, "add": at.add, "mul": at.multiply,
          "max": at.max, "min": at.min}[red]
    return fn(jnp.asarray(updates).astype(data.dtype))


def _j_scatter_nd(node, data, indices, updates):
    jnp = _jnp()
    idx = jnp.asarray(indices).astype(jnp.int32)
    last = idx.shape[-1]
    dims = np.asarray(data.shape[:last], np.int32)
    idx = jnp.where(idx < 0, idx + dims, idx)
    return _scatter_ref(node, data, tuple(jnp.moveaxis(idx, -1, 0)),
                        updates)


def _j_scatter_elements(node, data, indices, updates):
    jnp = _jnp()
    axis = _attr(node, "axis", 0)
    idx = jnp.asarray(indices).astype(jnp.int32)
    idx = jnp.where(idx < 0, idx + data.shape[axis], idx)
    grid = [jnp.asarray(g) for g in np.indices(idx.shape)]
    grid[axis] = idx
    return _scatter_ref(node, data, tuple(grid), updates)


_SCATTER_REDUCTIONS = ("none", "add", "mul", "max", "min")


def _guard_scatter_nd(node, vals, in_vs):
    """Stage ScatterND only when XLA's result is well-defined: reducing
    scatters always (duplicates combine associatively), plain-assignment
    only with signature-static, duplicate-free indices (numpy applies
    the *last* write; XLA's order is unspecified)."""
    red = _attr(node, "reduction", "none")
    if red not in _SCATTER_REDUCTIONS:
        return False
    if red != "none":
        return True
    if len(in_vs) < 2 or not in_vs[1]:
        return False
    idx = np.asarray(vals[1]).reshape(-1, np.asarray(vals[1]).shape[-1])
    # normalize negatives before the duplicate check, mirroring
    # _j_scatter_nd — raw [-1] and [n-1] address the same element and
    # must be judged colliding
    dims = np.asarray(np.asarray(vals[0]).shape[:idx.shape[-1]])
    idx = np.where(idx < 0, idx + dims, idx)
    return len(np.unique(idx, axis=0)) == len(idx)


def _guard_scatter_elements(node, vals, in_vs):
    red = _attr(node, "reduction", "none")
    if red not in _SCATTER_REDUCTIONS:
        return False
    if red != "none":
        return True
    if len(in_vs) < 2 or not in_vs[1]:
        return False
    # writes collide iff two entries share every coordinate but the
    # scatter axis AND carry the same index value there
    axis = _attr(node, "axis", 0)
    idx = np.asarray(vals[1])
    if idx.size == 0:
        return True
    idx = np.where(idx < 0, idx + np.asarray(vals[0]).shape[axis], idx)
    s = np.sort(idx, axis=axis)
    return not (np.diff(s, axis=axis) == 0).any()


def _j_reverse_rows(arr, lens):
    """Reverse each row's valid time prefix, layout [T, B, ...]
    (involution; jnp mirror of executor._reverse_rows)."""
    jnp = _jnp()
    if lens is None:
        return jnp.flip(arr, axis=0)
    t_len = arr.shape[0]
    t = jnp.arange(t_len, dtype=jnp.int32)[:, None]
    lens = jnp.asarray(lens).astype(jnp.int32)[None, :]
    idx = jnp.where(t < lens, lens - 1 - t, t)  # [T, B]
    idx = idx.reshape(idx.shape + (1,) * (arr.ndim - 2))
    return jnp.take_along_axis(arr, jnp.broadcast_to(idx, arr.shape),
                               axis=0)


def _j_reverse_sequence(node, x, sequence_lens):
    jnp = _jnp()
    batch_axis = _attr(node, "batch_axis", 1)
    time_axis = _attr(node, "time_axis", 0)
    lens = jnp.asarray(sequence_lens).astype(jnp.int32).reshape(-1)
    xm = jnp.moveaxis(x, (time_axis, batch_axis), (0, 1))
    out = _j_reverse_rows(xm, lens)
    return jnp.moveaxis(out, (0, 1), (time_axis, batch_axis))


def _j_norm_lens(seq_lens, t_len):
    """None for the unmasked fast path, else a [B] int32 lens vector.
    Plan-baked (concrete) lens equal to the full time dimension compile
    to the fast path; traced lens always take the masked path."""
    if seq_lens is None:
        return None
    if isinstance(seq_lens, np.ndarray):
        lens = seq_lens.astype(np.int64).reshape(-1)
        if lens.size == 0 or np.all(lens == t_len):
            return None
        return _jnp().asarray(lens, dtype=_jnp().int32)
    return _jnp().asarray(seq_lens).astype(_jnp().int32).reshape(-1)


def _j_sigmoid(x):
    jnp = _jnp()
    return 1.0 / (1.0 + jnp.exp(-x))  # same formula as the interpreter


def _j_lstm(node, x, w, r, b=None, seq_lens=None, h0=None, c0=None, p=None):
    """LSTM via lax.scan, gates iofc, layout [T, B, I]. The input
    projection for all steps runs as one batched matmul (MXU-friendly);
    only the [B, H] recurrence stays sequential."""
    import jax

    jnp = _jnp()
    if p is not None and np.asarray(p).size:
        raise NotImplementedError("LSTM peephole weights not supported")
    hidden = int(_attr(node, "hidden_size"))
    direction = _attr(node, "direction", "forward")
    t_len, batch = x.shape[0], x.shape[1]
    lens = _j_norm_lens(seq_lens, t_len)
    x = jnp.asarray(x, jnp.float32)

    def run_dir(d, reverse):
        wd = jnp.asarray(w[d], jnp.float32)
        rd = jnp.asarray(r[d], jnp.float32)
        bd = (jnp.asarray(b[d], jnp.float32) if b is not None
              else jnp.zeros(8 * hidden, jnp.float32))
        wb, rb = bd[:4 * hidden], bd[4 * hidden:]
        h = (jnp.asarray(h0[d], jnp.float32) if h0 is not None
             else jnp.zeros((batch, hidden), jnp.float32))
        c = (jnp.asarray(c0[d], jnp.float32) if c0 is not None
             else jnp.zeros((batch, hidden), jnp.float32))
        xs = _j_reverse_rows(x, lens) if reverse else x
        gx = xs @ wd.T + wb  # [T, B, 4H]

        def step(carry, inp):
            h, c = carry
            gxt, t = inp
            gates = gxt + h @ rd.T + rb
            i = _j_sigmoid(gates[:, :hidden])
            o = _j_sigmoid(gates[:, hidden:2 * hidden])
            f = _j_sigmoid(gates[:, 2 * hidden:3 * hidden])
            g = jnp.tanh(gates[:, 3 * hidden:])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            if lens is None:
                return (h_new, c_new), h_new
            mask = (t < lens)[:, None]
            return (
                jnp.where(mask, h_new, h),
                jnp.where(mask, c_new, c),
            ), jnp.where(mask, h_new, jnp.float32(0))

        (h, c), ys = jax.lax.scan(
            step, (h, c), (gx, jnp.arange(t_len, dtype=jnp.int32)),
            unroll=4)
        if reverse:
            ys = _j_reverse_rows(ys, lens)
        return ys, h, c

    def run_bidir():
        # Both directions in ONE scan (the reverse lane walks the
        # row-reversed sequence): halves the sequential loop trips,
        # which dominate this op's device time — tiny [B, H] recurrence
        # matmuls cost less than the per-iteration loop overhead.
        wd = jnp.asarray(w, jnp.float32)  # [2, 4H, I]
        rd = jnp.asarray(r, jnp.float32)
        bd = (jnp.asarray(b, jnp.float32) if b is not None
              else jnp.zeros((2, 8 * hidden), jnp.float32))
        wb = bd[:, None, :4 * hidden]  # [2, 1, 4H]
        rb = bd[:, None, 4 * hidden:]
        h = (jnp.asarray(h0, jnp.float32) if h0 is not None
             else jnp.zeros((2, batch, hidden), jnp.float32))
        c = (jnp.asarray(c0, jnp.float32) if c0 is not None
             else jnp.zeros((2, batch, hidden), jnp.float32))
        xs = jnp.stack([x, _j_reverse_rows(x, lens)], axis=1)  # [T,2,B,I]
        gx = jnp.einsum("tdbi,dgi->tdbg", xs, wd) + wb  # [T, 2, B, 4H]

        def step(carry, inp):
            h, c = carry  # [2, B, H]
            gxt, t = inp
            gates = gxt + jnp.einsum("dbh,dgh->dbg", h, rd) + rb
            i = _j_sigmoid(gates[..., :hidden])
            o = _j_sigmoid(gates[..., hidden:2 * hidden])
            f = _j_sigmoid(gates[..., 2 * hidden:3 * hidden])
            g = jnp.tanh(gates[..., 3 * hidden:])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            if lens is None:
                return (h_new, c_new), h_new
            mask = (t < lens)[None, :, None]
            return (
                jnp.where(mask, h_new, h),
                jnp.where(mask, c_new, c),
            ), jnp.where(mask, h_new, jnp.float32(0))

        (h, c), ys = jax.lax.scan(
            step, (h, c), (gx, jnp.arange(t_len, dtype=jnp.int32)),
            unroll=4)
        # ys [T, 2, B, H]: un-reverse the backward lane's rows
        ys = ys.at[:, 1].set(_j_reverse_rows(ys[:, 1], lens))
        return ys, h, c

    if direction == "bidirectional":
        y, y_h, y_c = run_bidir()
        return y, y_h, y_c

    results = []
    if direction == "forward":
        results.append(run_dir(0, False))
    if direction == "reverse":
        results.append(run_dir(0, True))
    y = jnp.stack([res[0] for res in results], axis=1)  # [T, D, B, H]
    y_h = jnp.stack([res[1] for res in results])
    y_c = jnp.stack([res[2] for res in results])
    return y, y_h, y_c


def _j_gru(node, x, w, r, b=None, seq_lens=None, h0=None):
    """GRU via lax.scan, gates zrh (masked semantics as in _j_lstm)."""
    import jax

    jnp = _jnp()
    hidden = int(_attr(node, "hidden_size"))
    direction = _attr(node, "direction", "forward")
    linear_before_reset = _attr(node, "linear_before_reset", 0)
    t_len, batch = x.shape[0], x.shape[1]
    lens = _j_norm_lens(seq_lens, t_len)
    x = jnp.asarray(x, jnp.float32)

    def run_dir(d, reverse):
        wd = jnp.asarray(w[d], jnp.float32)
        rd = jnp.asarray(r[d], jnp.float32)
        bd = (jnp.asarray(b[d], jnp.float32) if b is not None
              else jnp.zeros(6 * hidden, jnp.float32))
        wb, rb = bd[:3 * hidden], bd[3 * hidden:]
        h = (jnp.asarray(h0[d], jnp.float32) if h0 is not None
             else jnp.zeros((batch, hidden), jnp.float32))
        xs = _j_reverse_rows(x, lens) if reverse else x
        gx_all = xs @ wd.T + wb  # [T, B, 3H]

        def step(h, inp):
            gx, t = inp
            gh = h @ rd.T + rb
            z = _j_sigmoid(gx[:, :hidden] + gh[:, :hidden])
            rr = _j_sigmoid(gx[:, hidden:2 * hidden]
                            + gh[:, hidden:2 * hidden])
            if linear_before_reset:
                n = jnp.tanh(gx[:, 2 * hidden:] + rr * gh[:, 2 * hidden:])
            else:
                n = jnp.tanh(
                    gx[:, 2 * hidden:]
                    + (rr * h) @ rd[2 * hidden:].T
                    + rb[2 * hidden:]
                )
            h_new = (1 - z) * n + z * h
            if lens is None:
                return h_new, h_new
            mask = (t < lens)[:, None]
            return (jnp.where(mask, h_new, h),
                    jnp.where(mask, h_new, jnp.float32(0)))

        h, ys = jax.lax.scan(
            step, h, (gx_all, jnp.arange(t_len, dtype=jnp.int32)))
        if reverse:
            ys = _j_reverse_rows(ys, lens)
        return ys, h

    results = []
    if direction in ("forward", "bidirectional"):
        results.append(run_dir(0, False))
    if direction in ("reverse", "bidirectional"):
        results.append(run_dir(0 if direction == "reverse" else 1, True))
    y = jnp.stack([res[0] for res in results], axis=1)
    y_h = jnp.stack([res[1] for res in results])
    return y, y_h


def _build_jax_ops() -> Dict[str, Any]:
    import jax.numpy as jnp

    ops: Dict[str, Any] = {
        "Add": _j_binary(jnp.add),
        "Sub": _j_binary(jnp.subtract),
        "Mul": _j_binary(jnp.multiply),
        "Div": _j_div,
        "Pow": _j_binary(jnp.power),
        "MatMul": _j_binary(jnp.matmul),
        "And": _j_binary(jnp.logical_and),
        "Or": _j_binary(jnp.logical_or),
        "Xor": _j_binary(jnp.logical_xor),
        "Equal": _j_binary(jnp.equal),
        "Greater": _j_binary(jnp.greater),
        "GreaterOrEqual": _j_binary(jnp.greater_equal),
        "Less": _j_binary(jnp.less),
        "LessOrEqual": _j_binary(jnp.less_equal),
        # variadic (1..N inputs) per spec
        "Min": lambda node, *xs: _j_variadic(jnp.minimum, xs),
        "Max": lambda node, *xs: _j_variadic(jnp.maximum, xs),
        "Relu": _j_unary(lambda x: jnp.maximum(x, 0)),
        "Sigmoid": _j_unary(lambda x: 1.0 / (1.0 + jnp.exp(-x))),
        "Tanh": _j_unary(jnp.tanh),
        "Erf": _j_erf,
        "Exp": _j_unary(jnp.exp),
        "Log": _j_unary(jnp.log),
        "Sqrt": _j_unary(jnp.sqrt),
        "Neg": _j_unary(jnp.negative),
        "Abs": _j_unary(jnp.abs),
        "Sin": _j_unary(jnp.sin),
        "Cos": _j_unary(jnp.cos),
        "Floor": _j_unary(jnp.floor),
        "Ceil": _j_unary(jnp.ceil),
        "Round": _j_unary(jnp.rint),
        "Sign": _j_unary(jnp.sign),
        "Not": _j_unary(jnp.logical_not),
        "Identity": _j_unary(lambda x: x),
        "IsNaN": _j_unary(jnp.isnan),
        "IsInf": _j_unary(jnp.isinf),
        "Mod": _j_mod,
        "Einsum": _j_einsum,
        "Reciprocal": lambda node, x: (
            jnp.reciprocal(x) if np.issubdtype(np.dtype(x.dtype),
                                               np.floating) else 1.0 / x),
        "Sum": lambda node, *xs: functools.reduce(jnp.add, xs),
        "Mean": lambda node, *xs: functools.reduce(jnp.add, xs) / len(xs),
        "HardSigmoid": lambda node, x: jnp.clip(
            _attr(node, "alpha", 0.2) * x + _attr(node, "beta", 0.5), 0, 1),
        "Elu": lambda node, x: jnp.where(
            x > 0, x, _attr(node, "alpha", 1.0) * (jnp.exp(x) - 1)),
        "Selu": lambda node, x: _attr(node, "gamma", 1.0507009873554805)
        * jnp.where(x > 0, x, _attr(node, "alpha", 1.6732632423543772)
                    * (jnp.exp(x) - 1)),
        "LeakyRelu": lambda node, x: jnp.where(
            x >= 0, x, x * _attr(node, "alpha", 0.01)).astype(jnp.float32),
        "Softplus": _j_unary(
            lambda x: jnp.logaddexp(0.0, x).astype(jnp.float32)),
        "Dropout": lambda node, x, *rest: x,
        "Softmax": _j_softmax,
        "LogSoftmax": lambda node, x: jnp.log(_j_softmax(node, x)),
        "Gemm": _j_gemm,
        "Conv": _j_conv,
        "ConvTranspose": _j_conv_transpose,
        "Reshape": _j_reshape,
        "Slice": _j_slice,
        "Concat": lambda node, *parts: jnp.concatenate(
            [p for p in parts if p is not None],
            axis=_attr(node, "axis", 0)),
        "Gather": _j_gather,
        "GatherElements": _j_gather_elements,
        "Unsqueeze": _j_unsqueeze,
        "Squeeze": _j_squeeze,
        "Transpose": _j_transpose,
        "Cast": _j_cast,
        "Expand": _j_expand,
        "Where": lambda node, cond, a, b: jnp.where(cond, a, b),
        "Tile": _j_tile,
        "CumSum": _j_cumsum,
        "ArgMax": _j_arg_reduce("argmax"),
        "ArgMin": _j_arg_reduce("argmin"),
        "Clip": _j_clip,
        "Split": _j_split,
        "Pad": _j_pad,
        "ReduceMean": _j_reduce("mean"),
        "ReduceSum": _j_reduce("sum"),
        "ReduceMax": _j_reduce("max"),
        "ReduceMin": _j_reduce("min"),
        "ReduceProd": _j_reduce("prod"),
        "LayerNormalization": _j_layer_norm,
        "Flatten": _j_flatten,
        "TopK": _j_topk,
        "OneHot": _j_one_hot,
        "Trilu": _j_trilu,
        "DequantizeLinear": _j_dequantize_linear,
        "QuantizeLinear": _j_quantize_linear,
        "DynamicQuantizeLinear": _j_dynamic_quantize_linear,
        "MatMulInteger": _j_matmul_integer,
        "QLinearMatMul": _j_qlinear_matmul,
        "ConvInteger": _j_conv_integer,
        "QLinearConv": _j_qlinear_conv,
        "GatherND": _j_gather_nd,
        "ScatterND": _j_scatter_nd,
        "ScatterElements": _j_scatter_elements,
        "ReverseSequence": _j_reverse_sequence,
        "LSTM": _j_lstm,
        "GRU": _j_gru,
    }
    return ops


_JAX_OPS: Optional[Dict[str, Any]] = None


def _jax_ops() -> Dict[str, Any]:
    global _JAX_OPS
    if _JAX_OPS is None:
        _JAX_OPS = _build_jax_ops()
    return _JAX_OPS


# Input positions that must hold plan-time concrete (signature-pure)
# values for the lowering to stage the node: shape/axis/bound arguments.
_STATIC_REQ: Dict[str, Tuple[int, ...]] = {
    "Reshape": (1,),
    "Expand": (1,),
    "Tile": (1,),
    "Slice": (1, 2, 3, 4),
    "Pad": (1, 3),
    "Unsqueeze": (1,),
    "Squeeze": (1,),
    "Split": (1,),
    "TopK": (1,),
    "OneHot": (1,),
    "CumSum": (1,),
    "Trilu": (1,),
    "ReduceMean": (1,),
    "ReduceSum": (1,),
    "ReduceMax": (1,),
    "ReduceMin": (1,),
    "ReduceProd": (1,),
}

# Ops whose output SHAPE depends on input values even when every input
# shape is static (beyond the _STATIC_REQ slots).
_SHAPE_FROM_VALUE = {"NonZero", "Range", "ConstantOfShape", "If", "Loop"}

# Never constant-folded at plan time (stochastic: each run must re-draw,
# matching interpreter behavior). Their output *shapes* are still
# signature-pure (from input shapes / attributes), so downstream shape
# arithmetic keeps folding.
_NEVER_FOLD = {"RandomNormalLike", "RandomNormal", "RandomUniform",
               "RandomUniformLike", "Multinomial"}

# Value-dependent staging decisions, checked at plan time with the
# interpreter's concrete inputs: guard(node, input_values, input
# value-static flags) -> bool. False routes the node to an eager step.
_LOWER_GUARDS: Dict[str, Any] = {
    "ScatterND": _guard_scatter_nd,
    "ScatterElements": _guard_scatter_elements,
    # peephole LSTMs raise in the interpreter; keep the refusal eager.
    # layout=1 / custom activations / clip are unsupported in both the
    # scan lowering AND the interpreter (which now raises) — keep eager
    # so the error surfaces from one place
    "LSTM": lambda node, vals, vs: not (
        (len(vals) > 7 and vals[7] is not None
         and np.asarray(vals[7]).size)
        or _rnn_attrs_unsupported(node)),
    "GRU": lambda node, vals, vs: not _rnn_attrs_unsupported(node),
}


def _rnn_attrs_unsupported(node) -> bool:
    if _attr(node, "layout", 0) or _attr(node, "clip") is not None:
        return True
    acts = _attr(node, "activations")
    if acts is None:
        return False
    got = [a.decode() if isinstance(a, bytes) else str(a)
           for a in (acts if isinstance(acts, (list, tuple)) else [acts])]
    defaults = (["Sigmoid", "Tanh", "Tanh"] if node.op_type == "LSTM"
                else ["Sigmoid", "Tanh"])
    return got not in (defaults, defaults * 2)


# static arrays at or below this size are baked into the XLA program as
# constants; larger ones (model weights) are passed as device-resident
# arguments so the executable stays small and buffers are shared
_BAKE_MAX_ELEMENTS = 4096

# cap on the concrete trip bound a dynamic-termination Loop WITH scan
# outputs may stage with. _PaddedLoopStep runs the FULL bound and
# transfers bound-sized outputs on EVERY call regardless of the
# executed count, so the waste scales with the bound: tools/
# bench_padded_loop.py measured the interpreter already winning at
# 48/512 utilization on a cheap body, and a 65536-trip scan also
# compiles for minutes. 4096 keeps every realistic TTS-decoder bound
# (≤512-step greedy decodes, frame loops) staged while refusing the
# pathological ones; the ONNX "effectively unbounded" INT64_MAX idiom
# stays eager either way (ADVICE r4).
_PADDED_LOOP_MAX_TRIP = 4096


# -- staged control flow (If -> lax.cond, Loop -> lax.scan) -------------------
#
# The reference feeds scripted exports (If/Loop subgraphs) to onnxruntime,
# which runs them compiled (reference voice.py:167). Here an If whose
# branches trace to matching shapes becomes lax.cond, and a Loop with a
# plan-time-static trip count and a pass-through condition becomes
# lax.scan — both inside the surrounding jitted segment, so control flow
# no longer splits segments or replays on the interpreter. Dynamic
# termination stages too: carried-only Loops become a bounded
# lax.while_loop in-segment, and Loops WITH scan outputs (concrete trip
# bound) stage alone as a masked full-trip scan whose padded outputs the
# host slices to the executed count (_PaddedLoopStep). What remains
# eager: shape-mismatched If branches, bodies drawing host RNG noise or
# using unsupported ops, runtime (non-concrete) trip bounds on
# scan-output loops, and bounds past _PADDED_LOOP_MAX_TRIP. The
# decision is made per node at plan time by TRIAL-TRACING the staged form
# with jax.eval_shape over the signature's abstract values.


def _outer_captures(graph: OnnxModel) -> set:
    """Names a subgraph reads from the OUTER scope: consumed before being
    produced locally, not a formal input, not a local initializer."""
    produced = set(graph.inputs) | set(graph.initializers)
    caps = set()
    for node in graph.nodes:
        for name in node.inputs:
            if name and name not in produced:
                caps.add(name)
        for sub in node.attributes.values():
            if isinstance(sub, OnnxModel):
                caps |= {c for c in _outer_captures(sub)
                         if c not in produced}
        produced.update(o for o in node.outputs if o)
    return caps


def _node_captures(node: OnnxNode) -> set:
    caps = set()
    for sub in node.attributes.values():
        if isinstance(sub, OnnxModel):
            caps |= _outer_captures(sub)
    return caps


def _exec_nodes_traced(nodes, env: Dict[str, Any], ops) -> None:
    """Run a node list under JAX tracing (the body of _Segment.fn);
    If/Loop recurse into their subgraphs as lax.cond / lax.scan."""
    for node in nodes:
        if node.op_type == "If":
            result = _trace_if(node, env, ops)
        elif node.op_type == "Loop":
            result = _trace_loop(node, env, ops)
        else:
            args = [env.get(name) for name in node.inputs]
            result = ops[node.op_type](node, *args)
        if not isinstance(result, tuple):
            result = (result,)
        for out_name, value in zip(node.outputs, result):
            if out_name:
                env[out_name] = value


def _subgraph_env_traced(graph: OnnxModel, env: Dict[str, Any]):
    """Child env for tracing a subgraph: outer captures by reference
    (ONNX name capture), local initializers as constants."""
    child = dict(env)
    child.update(graph.initializers)
    child[""] = None
    return child


def _trace_if(node: OnnxNode, env: Dict[str, Any], ops):
    import jax

    jnp = _jnp()
    pred = jnp.asarray(env[node.inputs[0]]).reshape(()).astype(bool)

    def make_branch(which: str):
        graph = node.attributes[which]

        def branch(_):
            child = _subgraph_env_traced(graph, env)
            _exec_nodes_traced(graph.nodes, child, ops)
            return tuple(jnp.asarray(child[o]) for o in graph.outputs)

        return branch

    return jax.lax.cond(pred, make_branch("then_branch"),
                        make_branch("else_branch"), None)


def _is_concrete_value(v) -> bool:
    import jax

    return not isinstance(v, jax.core.Tracer)


def _loop_is_full_trip(node: OnnxNode, env: Dict[str, Any]) -> bool:
    """True when the Loop provably runs all M iterations at trace time:
    body cond passes through True AND the initial cond (if any) is a
    concrete True. Mirrored by the staging guard — a dynamic-termination
    loop takes the lax.while_loop path instead."""
    import jax

    if not _body_cond_passthrough(node.attributes["body"]):
        return False
    if len(node.inputs) > 1 and node.inputs[1]:
        cond0 = env.get(node.inputs[1])
        if isinstance(cond0, jax.core.Tracer):
            return False
        if cond0 is not None and not bool(np.asarray(cond0).reshape(())):
            return False
    return True


def _trace_loop(node: OnnxNode, env: Dict[str, Any], ops):
    """Loop staging: full-trip loops run as lax.scan (scan outputs
    supported); dynamic-termination / traced-bound loops with NO scan
    outputs run as a bounded lax.while_loop (VERDICT r3 #8) — their
    carried outputs have static shapes, while scan outputs would have a
    data-dependent length and stay on the guarded eager path."""
    import jax

    jnp = _jnp()
    body = node.attributes["body"]
    carried0 = tuple(jnp.asarray(env[name]) for name in node.inputs[2:])
    n_carried = len(carried0)
    n_scan = len(body.outputs) - 1 - n_carried
    it_dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32

    if not _loop_is_full_trip(node, env) or not _is_concrete_value(
            env[node.inputs[0]]):
        # bounded while_loop: cond from iteration i gates iteration i+1,
        # capped at the (possibly traced) trip bound M
        assert n_scan == 0, "guard must refuse dynamic Loop w/ scans"
        m_bound = jnp.asarray(env[node.inputs[0]]).reshape(()).astype(
            it_dtype)
        if len(node.inputs) > 1 and node.inputs[1]:
            cond0 = jnp.asarray(env[node.inputs[1]]).reshape(()).astype(
                bool)
        else:
            cond0 = jnp.asarray(True)

        def cond_fn(state):
            i, cond, _carry = state
            return (i < m_bound) & cond

        def body_fn(state):
            i, cond, carry = state
            child = _subgraph_env_traced(body, env)
            child[body.inputs[0]] = i
            child[body.inputs[1]] = cond
            for name, val in zip(body.inputs[2:], carry):
                child[name] = val
            _exec_nodes_traced(body.nodes, child, ops)
            new_cond = jnp.asarray(child[body.outputs[0]]).reshape(
                ()).astype(bool)
            new_carry = tuple(
                jnp.asarray(child[name]).astype(init.dtype)
                for name, init in zip(body.outputs[1:1 + n_carried],
                                      carried0)
            )
            return i + 1, new_cond, new_carry

        state0 = (jnp.asarray(0, it_dtype), cond0, carried0)
        _i, _c, carry_f = jax.lax.while_loop(cond_fn, body_fn, state0)
        return tuple(carry_f)

    max_trip = int(np.asarray(env[node.inputs[0]]).reshape(()))

    def body_fn(carry, it):
        child = _subgraph_env_traced(body, env)
        child[body.inputs[0]] = it
        child[body.inputs[1]] = jnp.asarray(True)
        for name, val in zip(body.inputs[2:], carry):
            child[name] = val
        _exec_nodes_traced(body.nodes, child, ops)
        new_carry = tuple(
            # scan requires a dtype/shape-stable carry: the interpreter
            # promotes per numpy rules, so pin each slot to its initial
            # dtype (trial-trace rejects genuinely unstable bodies)
            jnp.asarray(child[name]).astype(init.dtype)
            for name, init in zip(body.outputs[1:1 + n_carried], carried0)
        )
        scans = tuple(jnp.asarray(child[name])
                      for name in body.outputs[1 + n_carried:])
        return new_carry, scans

    iters = jnp.arange(max_trip, dtype=jnp.int64 if jax.config.jax_enable_x64
                       else jnp.int32)
    carry_f, scans = jax.lax.scan(body_fn, carried0, iters,
                                  length=max_trip)
    return tuple(carry_f) + tuple(scans)


def _trace_loop_padded(node: OnnxNode, env: Dict[str, Any], ops,
                       pad_bound: Optional[int] = None):
    """Masked full-trip staging for a dynamic-termination Loop WITH scan
    outputs (the remaining eager case after VERDICT r3 #8; the pattern
    of the reference's own autoregressive decode loop, mul.py:201-233,
    if shipped as ONNX — onnxruntime runs it compiled, voice.py:167).

    Two bound modes:

    * ``pad_bound is None``: the trip bound M is CONCRETE at trace time;
      the scan runs M iterations.
    * ``pad_bound`` given (VERDICT r4 #7): M is a RUNTIME value; the
      scan runs ``pad_bound`` iterations (a power-of-two bucket chosen
      per call by _PaddedLoopStep) and the active mask additionally
      gates on ``it < M``, so executed semantics match a sequential
      run of min(M, cond-termination) iterations.

    The body runs as a lax.scan carrying an ``active`` flag: once the
    body's cond goes False (or ``it`` reaches M) the carry freezes and
    further iterations emit zero rows. Returns ``carried finals +
    PADDED [bound, ...] scan outputs + n`` where n is the
    executed-iteration count — ONNX's true-length scan outputs are
    restored by the host slicing ``out[:n]`` (_PaddedLoopStep.run),
    which is why this form stages ALONE, never inside a larger segment.
    """
    import jax

    jnp = _jnp()
    body = node.attributes["body"]
    carried0 = tuple(jnp.asarray(env[name]) for name in node.inputs[2:])
    n_carried = len(carried0)
    it_dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    if pad_bound is None:
        max_trip = int(np.asarray(env[node.inputs[0]]).reshape(()))
        m_rt = None
    else:
        max_trip = int(pad_bound)
        m_rt = jnp.asarray(env[node.inputs[0]]).reshape(()).astype(
            it_dtype)
    if len(node.inputs) > 1 and node.inputs[1]:
        cond0 = jnp.asarray(env[node.inputs[1]]).reshape(()).astype(bool)
    else:
        cond0 = jnp.asarray(True)

    def body_fn(state, it):
        active, carry = state
        if m_rt is not None:
            # runtime trip bound: iterations at/past M are masked out
            # exactly like cond-terminated ones (monotonic, so the
            # chained ``active`` never resurrects)
            active = active & (it < m_rt)
        child = _subgraph_env_traced(body, env)
        child[body.inputs[0]] = it
        child[body.inputs[1]] = active
        for name, val in zip(body.inputs[2:], carry):
            child[name] = val
        _exec_nodes_traced(body.nodes, child, ops)
        new_cond = jnp.asarray(child[body.outputs[0]]).reshape(
            ()).astype(bool)
        # inactive iterations: freeze the carry, emit zero scan rows
        # (dropped by the host slice); active prefix iterations see the
        # same iteration number / carry chain as a sequential run
        def frozen(name, old, init):
            new = jnp.asarray(child[name]).astype(init.dtype)
            if new.shape != old.shape:
                # jnp.where would silently BROADCAST a shape-unstable
                # carry (e.g. a body reducing (1,) to scalar), making it
                # look scan-stable and diverging from the interpreter's
                # output shape — raise so the eval_shape trial routes
                # the loop to the eager path, like the scan/while forms
                raise ValueError(
                    f"Loop carry '{name}' shape-unstable: "
                    f"{new.shape} vs {old.shape}")
            return jnp.where(active, new, old)

        new_carry = tuple(
            frozen(name, old, init)
            for name, old, init in zip(body.outputs[1:1 + n_carried],
                                       carry, carried0)
        )
        scans = tuple(
            jnp.where(active, s, jnp.zeros_like(s))
            for s in (jnp.asarray(child[name])
                      for name in body.outputs[1 + n_carried:])
        )
        return (active & new_cond, new_carry), (active, scans)

    iters = jnp.arange(max_trip, dtype=it_dtype)
    (_, carry_f), (actives, scans) = jax.lax.scan(
        body_fn, (cond0, carried0), iters, length=max_trip)
    n = jnp.sum(actives.astype(it_dtype))
    return tuple(carry_f) + tuple(scans) + (n,)


def _body_cond_passthrough(body: OnnxModel) -> bool:
    """True when the Loop body's cond_out provably stays True: the
    cond_in passed through (directly or via Identity) or a constant/
    initializer True."""
    cond_out = body.outputs[0]
    cond_in = body.inputs[1] if len(body.inputs) > 1 else ""
    if cond_out == cond_in:
        return True
    if cond_out in body.initializers:
        return bool(np.asarray(body.initializers[cond_out]).reshape(()))
    for node in body.nodes:
        if cond_out in node.outputs:
            if node.op_type == "Identity" and node.inputs[0] == cond_in:
                return True
            if node.op_type == "Constant":
                for val in node.attributes.values():
                    if isinstance(val, np.ndarray):
                        return bool(np.asarray(val).reshape(()))
            return False
    return False


def _name_provably_true(graph: OnnxModel, name: str) -> bool:
    """True when ``name`` is a graph-local initializer or Constant whose
    scalar value is True (the only provable case without plan-time
    concrete values — nested-subgraph scope)."""
    if name in graph.initializers:
        return bool(np.asarray(graph.initializers[name]).reshape(()))
    for node in graph.nodes:
        if name in node.outputs and node.op_type == "Constant":
            for val in node.attributes.values():
                if isinstance(val, np.ndarray):
                    return bool(np.asarray(val).reshape(()))
    return False


def _subgraph_ops_ok(graph: OnnxModel, supported: set) -> bool:
    """Every node in a to-be-staged subgraph must be jit-lowerable AND
    pass the structural form of the _LOWER_GUARDS / Loop-staging checks.

    Top-level nodes get the value-dependent guards (plan-time concrete
    inputs exist there); inside a staged If/Loop subgraph values differ
    per branch/iteration, so anything whose guard NEEDS values refuses
    conservatively — otherwise a not-taken-at-plan-time branch could
    replay a duplicate-index ScatterND (XLA write order unspecified) or
    an inner dynamic-termination Loop as a full-trip scan, silently
    diverging from the interpreter.
    """
    for node in graph.nodes:
        if node.op_type == "If":
            if not all(_subgraph_ops_ok(node.attributes[k], supported)
                       for k in ("then_branch", "else_branch")):
                return False
        elif node.op_type == "Loop":
            # a NESTED Loop is staged without the top-level env/
            # value-static checks. Two stageable forms: provably
            # full-trip (cond absent or locally-provably True, body
            # cond passes through — lax.scan, scan outputs fine), or
            # carried-only (no scan outputs — bounded lax.while_loop
            # handles dynamic termination). Anything else refuses.
            if not node.inputs or not node.inputs[0]:
                return False
            body = node.attributes["body"]
            n_scan = (len(body.outputs) - 1) - (len(node.inputs) - 2)
            full_trip = _body_cond_passthrough(body) and not (
                len(node.inputs) > 1 and node.inputs[1]
                and not _name_provably_true(graph, node.inputs[1]))
            if not full_trip and n_scan > 0:
                return False
            if not _subgraph_ops_ok(body, supported):
                return False
        elif node.op_type not in supported:
            return False
        elif node.op_type in ("ScatterND", "ScatterElements"):
            # reducing scatters combine duplicates associatively (safe);
            # plain assignment needs the concrete duplicate-free check
            if _attr(node, "reduction", "none") == "none":
                return False
        elif node.op_type == "LSTM":
            # peephole weights (8th input) are silently ignored by the
            # jax lowering; the interpreter refuses them
            if len(node.inputs) > 7 and node.inputs[7]:
                return False
    return True


class _Segment:
    """A maximal run of lowerable nodes compiled as one XLA program."""

    def __init__(self, nodes: List[OnnxNode], dyn_inputs: List[str],
                 static_vals: Dict[str, np.ndarray], out_names: List[str],
                 static_dyn: frozenset):
        import jax

        self.nodes = nodes
        self.dyn_inputs = dyn_inputs
        self.out_names = out_names
        self.static_dyn = static_dyn  # dyn args that are signature-constant
        ops = _jax_ops()
        static_vals = dict(static_vals)

        def fn(*arrays):
            env: Dict[str, Any] = dict(static_vals)
            env[""] = None
            env.update(zip(dyn_inputs, arrays))
            _exec_nodes_traced(nodes, env, ops)
            return tuple(env[n] for n in out_names)

        self._jit = jax.jit(fn)

    def _args(self, env: Dict[str, Any], dev_static: Dict[str, Any]):
        """Marshal dyn args, device-caching the signature-constant ones."""
        import jax

        args = []
        for name in self.dyn_inputs:
            if name in self.static_dyn:
                buf = dev_static.get(name)
                if buf is None:
                    buf = dev_static[name] = jax.device_put(
                        np.asarray(env[name]))
                args.append(buf)
            else:
                args.append(env[name])
        return args

    def run(self, env: Dict[str, Any], dev_static: Dict[str, Any]) -> None:
        outs = self._jit(*self._args(env, dev_static))
        for name, value in zip(self.out_names, outs):
            env[name] = value


class _PaddedLoopStep(_Segment):
    """A dynamic-termination Loop WITH scan outputs, staged alone.

    Wraps _trace_loop_padded in its own jitted program: the device
    returns the final carried values, the scan outputs PADDED to the
    trip bound, and the executed-iteration count n; ``run`` slices each
    padded output to ``[:n]`` on the host so downstream steps see the
    exact ONNX true-length arrays. A downstream jitted segment that
    consumes a scan output simply retraces when n changes (the module's
    standing data-dependent-boundary contract). Subclasses _Segment only
    for the replay machinery's isinstance dispatch + device-buffer
    sharing; the compiled body and output handling are its own.
    """

    def __init__(self, node: OnnxNode, dyn_inputs: List[str],
                 static_vals: Dict[str, np.ndarray], static_dyn: frozenset,
                 runtime_m: bool = False, executor=None):
        import jax

        self.node = node
        self.dyn_inputs = dyn_inputs
        self.static_dyn = static_dyn
        self.n_carried = len(node.inputs) - 2
        # runtime trip bound (VERDICT r4 #7): one compiled program per
        # power-of-two pad bucket, chosen per call from the actual M;
        # the interpreter handles the rare call whose M exceeds the
        # staging cap (same waste bound the concrete-M path enforces)
        self.runtime_m = runtime_m
        self._executor = executor
        self._jits: Dict[int, Any] = {}
        ops = _jax_ops()
        static_vals = dict(static_vals)

        def make_jit(pad_bound: Optional[int]):
            def fn(*arrays):
                env: Dict[str, Any] = dict(static_vals)
                env[""] = None
                env.update(zip(dyn_inputs, arrays))
                return _trace_loop_padded(node, env, ops,
                                          pad_bound=pad_bound)

            return jax.jit(fn)

        self._make_jit = make_jit
        self._jit = None if runtime_m else make_jit(None)

    def run(self, env: Dict[str, Any], dev_static: Dict[str, Any]) -> None:
        if self.runtime_m:
            m = int(np.asarray(env[self.node.inputs[0]]).reshape(()))
            bound = 16
            while bound < m:
                bound *= 2
            if bound > _PADDED_LOOP_MAX_TRIP:
                # past the staging cap the padded waste (bound vs the
                # cond-terminated count) can dominate: replay this call
                # on the interpreter instead
                _EagerStep(self.node).run(env, self._executor)
                return
            jit = self._jits.get(bound)
            if jit is None:
                jit = self._jits[bound] = self._make_jit(bound)
            outs = jit(*self._args(env, dev_static))
        else:
            outs = self._jit(*self._args(env, dev_static))
        # start the device->host copies the host will actually read —
        # the padded scan outputs and the count — before blocking on
        # the count: on a remote-tunnel backend each blocking fetch
        # pays a full RTT, so fetching n first and the outputs after
        # would cost one RTT per scan output instead of ~one total.
        # Carried outputs stay device-resident (the next segment may be
        # their only consumer; a large carried state, e.g. a KV cache,
        # must not pay a D2H transfer the host never reads).
        for o in outs[self.n_carried:]:
            if hasattr(o, "copy_to_host_async"):
                o.copy_to_host_async()
        n = int(outs[-1])
        for i, name in enumerate(self.node.outputs):
            if not name:
                continue
            if i < self.n_carried:
                env[name] = outs[i]
            else:
                env[name] = np.asarray(outs[i])[:n]


def _graph_has_random(graph: OnnxModel) -> bool:
    for node in graph.nodes:
        if (node.op_type.startswith("Random")
                or node.op_type == "Multinomial"):
            return True
        for sub in node.attributes.values():
            if isinstance(sub, OnnxModel) and _graph_has_random(sub):
                return True
    return False


def _prec_scope(name: Optional[str]):
    """Trace-time matmul-precision scope (no-op when name is None)."""
    import contextlib

    import jax

    return (jax.default_matmul_precision(name) if name
            else contextlib.nullcontext())


class _EagerStep:
    """A single node replayed on the numpy interpreter."""

    def __init__(self, node: OnnxNode):
        self.node = node

    def run(self, env: Dict[str, Any], executor: OnnxExecutor) -> None:
        node = self.node
        names = list(node.inputs)
        if node.op_type in ("If", "Loop"):
            # subgraphs capture the outer scope by name: materialize the
            # whole env so numpy handlers never see jax arrays
            names = [k for k in env if k]
        for name in names:
            val = env.get(name)
            if val is not None and not isinstance(val, np.ndarray):
                env[name] = np.asarray(val)
        executor._exec_nodes([node], env)


class _ShapeOnly:
    """Stand-in for a tensor whose shape alone is needed."""

    def __init__(self, shape):
        self.shape = shape


class _HostDraw:
    """A RandomNormalLike draw on the host RNG that does NOT split the
    surrounding jitted segment.

    The draw depends only on its input's *shape* (signature-static) and
    the executor's RNG stream, never on device values — so it needs no
    transfer from the device, the consuming segment simply takes the
    noise as an argument, and the drawn values are bit-identical to a
    pure interpreter run (same numpy RNG, same node-order stream
    consumption). Segments merge across draws: a noise-injecting VITS
    voice graph compiles to ONE XLA program instead of one per
    noise-separated region, saving a device round trip per boundary.
    """

    def __init__(self, node: OnnxNode, shape: Tuple[int, ...]):
        self.node = node
        self.shape = shape

    def run(self, env: Dict[str, Any], executor: OnnxExecutor) -> None:
        env[self.node.outputs[0]] = executor._random_normal_like(
            self.node, _ShapeOnly(self.shape))


class _Plan:
    def __init__(self, steps: List[Any], static_vals: Dict[str, np.ndarray],
                 n_jitted: int, n_eager: int, n_folded: int,
                 n_draws: int = 0):
        self.steps = steps
        self.static_vals = static_vals
        self.n_jitted = n_jitted
        self.n_eager = n_eager
        self.n_folded = n_folded
        self.n_draws = n_draws
        # device buffers for this plan's signature-constant segment args
        # (computed statics are per-signature; initializer buffers are
        # seeded from the runner-level cache and shared across plans)
        self.dev_static: Dict[str, Any] = {}


class JaxGraphRunner:
    """Execute an ONNX graph as jitted XLA segments + eager residue.

    Drop-in for :class:`OnnxExecutor.run`; plans are cached per input
    signature (name, shape, dtype). The first call per signature pays
    one interpreter pass (planning) plus XLA compilation; subsequent
    calls replay compiled segments.
    """

    def __init__(self, model: OnnxModel,
                 matmul_precision: Optional[str] = None):
        self.model = model
        self.executor = OnnxExecutor(model)
        self.matmul_precision = matmul_precision
        self._plans: Dict[Tuple, _Plan] = {}
        # device buffers for signature-invariant big statics (weights)
        self._dev_init: Dict[str, Any] = {}
        ops = _jax_ops()
        self._supported = set(ops)
        if 0 < model.opset < 13:
            # pre-13 Softmax/LogSoftmax flatten the trailing block; the
            # jit handlers implement only the per-axis form — keep these
            # eager so the interpreter's opset-aware dispatch governs
            self._supported -= {"Softmax", "LogSoftmax"}
        # Host draws keep segments whole only when nothing else can
        # consume the executor's RNG stream between them (an If/Loop
        # body drawing noise would interleave differently at replay).
        self._draws_hoistable = not any(
            isinstance(sub, OnnxModel) and _graph_has_random(sub)
            for node in model.nodes if node.op_type in ("If", "Loop")
            for sub in node.attributes.values()
        )

    # -- public -----------------------------------------------------------

    @staticmethod
    def _key(feeds: Dict[str, np.ndarray]) -> Tuple:
        return tuple(sorted(
            (k, np.asarray(v).shape, np.asarray(v).dtype.str)
            for k, v in feeds.items()
        ))

    def has_plan(self, feeds: Dict[str, np.ndarray]) -> bool:
        """True when this feed signature would replay a cached plan."""
        return self._key(feeds) in self._plans

    def run(self, feeds: Dict[str, np.ndarray],
            outputs: Optional[Sequence[str]] = None) -> List[np.ndarray]:
        feeds = {k: np.asarray(v) for k, v in feeds.items()}
        key = self._key(feeds)
        plan = self._plans.get(key)
        if plan is None:
            plan, results = self._plan(feeds, outputs)
            self._plans[key] = plan
            return results
        return self._replay(plan, feeds, outputs)

    def plan_stats(self) -> Dict[str, int]:
        """Aggregate (jitted, eager, folded, host-draw) node counts over
        all plans."""
        stats = {"plans": len(self._plans), "jitted": 0, "eager": 0,
                 "folded": 0, "segments": 0, "host_draws": 0}
        for plan in self._plans.values():
            stats["jitted"] += plan.n_jitted
            stats["eager"] += plan.n_eager
            stats["folded"] += plan.n_folded
            stats["host_draws"] += plan.n_draws
            stats["segments"] += sum(
                1 for s in plan.steps if isinstance(s, _Segment))
        return stats

    # -- planning -----------------------------------------------------------

    def _plan(self, feeds: Dict[str, np.ndarray],
              outputs: Optional[Sequence[str]]):
        executor = self.executor
        env: Dict[str, Any] = dict(executor.initializers)
        env.update(feeds)
        env[""] = None

        value_static = {name: True for name in executor.initializers}
        shape_static = {name: True for name in executor.initializers}
        for name in feeds:
            value_static[name] = False
            shape_static[name] = True
        value_static[""] = True
        shape_static[""] = True

        wanted = list(outputs or self.model.outputs)
        last_use = self._last_consumer_index(wanted)

        steps: List[Any] = []
        pending: List[Tuple[int, OnnxNode]] = []  # current jittable run
        big_statics: set = set()  # static values passed as device args
        n_jitted = n_eager = n_folded = n_draws = 0

        def split_inputs(names):
            """Classify step inputs: bake small value-static arrays,
            pass big ones as device-resident args, rest dynamic."""
            dyn_inputs: List[str] = []
            static_vals: Dict[str, np.ndarray] = {}
            static_dyn = set()
            for name in names:
                if value_static[name]:
                    arr = np.asarray(env[name])
                    if arr.size <= _BAKE_MAX_ELEMENTS:
                        static_vals[name] = arr
                    else:
                        # weights etc: device-resident argument
                        dyn_inputs.append(name)
                        static_dyn.add(name)
                        big_statics.add(name)
                else:
                    dyn_inputs.append(name)
            return dyn_inputs, static_vals, static_dyn

        def node_input_names(node):
            names = list(node.inputs)
            if node.op_type in ("If", "Loop"):
                # staged control flow reads outer captures beyond the
                # node's declared inputs
                names += sorted(_node_captures(node))
            return names

        def flush():
            nonlocal n_jitted
            if not pending:
                return
            produced = set()
            for _, node in pending:
                produced.update(o for o in node.outputs if o)
            seen = set()
            ordered: List[str] = []
            for _, node in pending:
                for name in node_input_names(node):
                    if not name or name in produced or name in seen:
                        continue
                    seen.add(name)
                    ordered.append(name)
            dyn_inputs, static_vals, static_dyn = split_inputs(ordered)
            # export only outputs consumed AFTER the segment (or wanted)
            seg_end = pending[-1][0]
            out_names = [o for _, node in pending for o in node.outputs
                         if o and last_use.get(o, -1) > seg_end]
            n_jitted += len(pending)
            steps.append(_Segment([n for _, n in pending], dyn_inputs,
                                  static_vals, out_names,
                                  frozenset(static_dyn)))
            pending.clear()

        for node_index, node in enumerate(self.model.nodes):
            # execute eagerly (numpy) to keep concrete values flowing
            executor._exec_nodes([node], env)

            in_vs = [value_static.get(n, True) for n in node.inputs]
            in_ss = [shape_static.get(n, True) for n in node.inputs]

            cf_ok = False
            if node.op_type in ("If", "Loop"):
                cf_ok = self._control_flow_stageable(
                    node, env, value_static, shape_static)

            if cf_ok in ("padded", "padded_runtime"):
                # dynamic-termination Loop WITH scan outputs: stages
                # ALONE (_PaddedLoopStep slices the device's padded
                # outputs to the executed count host-side, so it can
                # never fuse into a segment). Carried outputs keep
                # their input shapes (the stageable check required all
                # inputs shape-static); scan outputs get a
                # data-dependent leading dim, same flags the eager
                # path would have set.
                n_carried_node = len(node.inputs) - 2
                for oi, out in enumerate(node.outputs):
                    if out:
                        value_static[out] = False
                        shape_static[out] = oi < n_carried_node
                flush()
                names: List[str] = []
                for name in node_input_names(node):
                    if name and name not in names:
                        names.append(name)
                loop_dyn, loop_static, loop_static_dyn = split_inputs(names)
                n_jitted += 1
                steps.append(_PaddedLoopStep(
                    node, loop_dyn, loop_static,
                    frozenset(loop_static_dyn),
                    runtime_m=(cf_ok == "padded_runtime"),
                    executor=executor))
                continue

            if node.op_type in ("Shape", "Size"):
                out_vs = bool(in_ss[0])
                out_ss = True
            elif (all(in_vs) and node.op_type not in _NEVER_FOLD
                  and node.op_type not in ("If", "Loop")):
                out_vs = True
                out_ss = True
            else:
                out_vs = False
                req = _STATIC_REQ.get(node.op_type, ())
                req_ok = all(in_vs[i] for i in req if i < len(in_vs))
                out_ss = (all(in_ss) and req_ok
                          and (node.op_type not in _SHAPE_FROM_VALUE
                               # a trial-traced If/Loop proved its output
                               # shapes are signature-pure
                               or cf_ok))
            for out in node.outputs:
                if out:
                    value_static[out] = out_vs
                    shape_static[out] = out_ss

            if out_vs:
                n_folded += 1  # constant under this signature: baked
                continue
            if (node.op_type == "RandomNormalLike" and in_ss[0]
                    and self._draws_hoistable):
                # host draw without a segment split (see _HostDraw):
                # appended before the surrounding segment flushes, which
                # is sound — the draw consumes no dynamic value
                n_draws += 1
                steps.append(_HostDraw(node, tuple(
                    np.asarray(env[node.inputs[0]]).shape)))
                continue
            req = _STATIC_REQ.get(node.op_type, ())
            if node.op_type in ("If", "Loop"):
                jittable = cf_ok
            else:
                jittable = (
                    node.op_type in self._supported
                    and all(in_vs[i] for i in req if i < len(in_vs))
                )
            if jittable:
                guard = _LOWER_GUARDS.get(node.op_type)
                if guard is not None:
                    jittable = bool(guard(
                        node, [env.get(n) for n in node.inputs], in_vs))
            if jittable:
                pending.append((node_index, node))
            else:
                flush()
                n_eager += 1
                steps.append(_EagerStep(node))
        flush()

        # static values any step or output needs at replay (If/Loop
        # subgraphs capture outer names beyond the node's input list)
        static_vals: Dict[str, np.ndarray] = {}

        def record_static(name: str) -> None:
            if name and value_static.get(name, False) and name in env:
                val = env[name]
                if val is not None:
                    static_vals[name] = np.asarray(val)

        for name in wanted:
            record_static(name)
        for name in big_statics:
            record_static(name)
        for step in steps:
            if isinstance(step, _EagerStep):
                for name in step.node.inputs:
                    record_static(name)
                if step.node.op_type in ("If", "Loop"):
                    for name in _node_captures(step.node):
                        record_static(name)

        plan = _Plan(steps, static_vals, n_jitted, n_eager, n_folded,
                     n_draws)
        LOG.debug(
            "lowered graph: %d nodes jitted in %d segments, %d eager, "
            "%d folded, %d host draws",
            n_jitted, sum(1 for s in steps if isinstance(s, _Segment)),
            n_eager, n_folded, n_draws,
        )
        results = [np.asarray(env[name]) for name in wanted]
        return plan, results

    def _last_consumer_index(self, wanted: Sequence[str]) -> Dict[str, int]:
        """name -> highest node index that consumes it; graph outputs
        count as consumed at +inf. Subgraph outer captures (the
        precise _outer_captures set — locally-produced and
        local-initializer names excluded) count as consumed at their
        If/Loop node."""
        inf = 1 << 60
        last: Dict[str, int] = {name: inf for name in wanted}
        for i, node in enumerate(self.model.nodes):
            names = set(n for n in node.inputs if n)
            if node.op_type in ("If", "Loop"):
                names |= _node_captures(node)
            for name in names:
                if last.get(name, -1) < i or name not in last:
                    last[name] = i
        return last

    def _control_flow_stageable(self, node: OnnxNode, env: Dict[str, Any],
                                value_static: Dict[str, bool],
                                shape_static: Dict[str, bool]) -> bool:
        """Can this If/Loop run inside a jitted segment as lax.cond /
        lax.scan? Checked by TRIAL-TRACING the staged form with
        jax.eval_shape over the plan signature's abstract values —
        shape-mismatched If branches, carry-unstable Loop bodies, and
        anything unsupported fail the trace and stay eager."""
        subs = [v for v in node.attributes.values()
                if isinstance(v, OnnxModel)]
        if not subs:
            return False
        for sub in subs:
            # bodies drawing host RNG noise would consume the executor's
            # stream differently at replay; keep them eager
            if _graph_has_random(sub):
                return False
            if not _subgraph_ops_ok(sub, self._supported):
                return False
        names = [n for n in node.inputs if n]
        caps = sorted(_node_captures(node))
        all_names = names + [c for c in caps if c not in names]
        if not all(shape_static.get(n, True) for n in all_names):
            return False
        if any(env.get(n) is None for n in all_names):
            return False
        padded = False
        if node.op_type == "Loop":
            # a Loop needs a trip bound either way (lax has no unbounded
            # scan output and an unbounded while would hide hangs)
            if not node.inputs or not node.inputs[0]:
                return False
            body = node.attributes["body"]
            n_scan = (len(body.outputs) - 1) - (len(node.inputs) - 2)
            full_trip = _body_cond_passthrough(body)
            if len(node.inputs) > 1 and node.inputs[1]:
                cname = node.inputs[1]
                if not value_static.get(cname, True):
                    full_trip = False  # runtime initial cond
                else:
                    cond0 = env.get(cname)
                    if cond0 is not None and not bool(
                            np.asarray(cond0).reshape(())):
                        full_trip = False  # statically zero-trip
            if full_trip and value_static.get(node.inputs[0], False):
                pass  # lax.scan path: scan outputs fine
            elif n_scan == 0:
                pass  # bounded lax.while_loop path (carried-only)
            else:
                # dynamic termination WITH scan outputs: the output
                # length is data-dependent, so this form can never fuse
                # into a segment — but with a sane trip bound it stages
                # ALONE as a masked full-trip scan whose padded outputs
                # the host slices to the executed count
                # (_PaddedLoopStep). A RUNTIME (non-value-static) bound
                # stages too (VERDICT r4 #7): the step picks a
                # power-of-two pad bucket per call from the actual M
                # and falls back to the interpreter past the cap. Only
                # plans whose example M already exceeds the cap stay
                # eager outright (the INT64_MAX "unbounded" idiom).
                m_val = env.get(node.inputs[0])
                if m_val is None:
                    return False
                m_val = int(np.asarray(m_val).reshape(()))
                if not 0 <= m_val <= _PADDED_LOOP_MAX_TRIP:
                    return False
                padded = ("runtime" if not value_static.get(
                    node.inputs[0], False) else True)

        import jax

        ops = _jax_ops()
        if node.op_type == "If":
            trace_fn = _trace_if
        elif padded == "runtime":
            # trial at a small bucket: the body's shape behavior is
            # bound-independent, and eval_shape sees M as abstract
            trace_fn = functools.partial(_trace_loop_padded, pad_bound=16)
        elif padded:
            trace_fn = _trace_loop_padded
        else:
            trace_fn = _trace_loop
        # mirror the SEGMENT's argument split exactly: value-static
        # arrays above _BAKE_MAX_ELEMENTS become device arguments
        # (tracers) at the real jit trace, so the trial must treat them
        # as abstract too — otherwise a body needing their concrete
        # values (Reshape target, Slice bounds) trial-passes here and
        # then throws from inside the segment's first real trace
        abstract = [n for n in all_names
                    if not value_static.get(n, True)
                    or np.asarray(env[n]).size > _BAKE_MAX_ELEMENTS]
        concrete = {n: np.asarray(env[n]) for n in all_names
                    if n not in abstract}

        def probe(*vals):
            local = dict(concrete)
            local.update(zip(abstract, vals))
            local[""] = None
            return trace_fn(node, local, ops)

        try:
            jax.eval_shape(probe, *[
                jax.ShapeDtypeStruct(np.asarray(env[n]).shape,
                                     np.asarray(env[n]).dtype)
                for n in abstract])
        except Exception as exc:
            LOG.debug("control-flow node %s stays eager: %s",
                      node.name, exc)
            return False
        if padded == "runtime":
            return "padded_runtime"
        return "padded" if padded else True

    # -- replay -----------------------------------------------------------

    def _replay(self, plan: _Plan, feeds: Dict[str, np.ndarray],
                outputs: Optional[Sequence[str]]) -> List[np.ndarray]:
        import jax

        env: Dict[str, Any] = dict(self.executor.initializers)
        env.update(plan.static_vals)
        env.update(feeds)
        env[""] = None
        # share initializer (weight) device buffers across plans
        if not plan.dev_static:
            for step in plan.steps:
                if not isinstance(step, _Segment):
                    continue
                for name in step.static_dyn:
                    if name in self.executor.initializers:
                        buf = self._dev_init.get(name)
                        if buf is None:
                            buf = self._dev_init[name] = jax.device_put(
                                self.executor.initializers[name])
                        plan.dev_static[name] = buf
        with _prec_scope(self.matmul_precision):
            for step in plan.steps:
                if isinstance(step, _Segment):
                    step.run(env, plan.dev_static)
                else:
                    step.run(env, self.executor)
        wanted = list(outputs or self.model.outputs)
        outs = [env[name] for name in wanted]
        # start all device->host copies before blocking on any: on a
        # remote-tunnel backend each blocking fetch pays a full RTT, so
        # sequential np.asarray over k outputs costs k round-trips
        for o in outs:
            if hasattr(o, "copy_to_host_async"):
                o.copy_to_host_async()
        return [np.asarray(o) for o in outs]
