"""Neural-net primitives for the TPU VITS build.

Conventions (chosen for TPU/XLA, not a torch translation):

* Activations are ``[B, T, C]`` (channels-last — the natural layout for the
  MXU; the reference uses ``[B, C, T]``).
* Conv weights keep the torch parameter layout ``[O, I/g, K]`` so checkpoint
  import is a pure re-keying; the conv dimension-numbers tell XLA how to
  consume them directly (no runtime transpose).
* Every function is pure: ``fn(params_subtree, x, ...) -> y``.
"""

import math
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

# Grouped-conv autodiff selection. "custom" (default) is correct on
# every mesh; "native" restores the upstream autodiff whose weight
# gradient is scaled by the size of any IDLE mesh axis (see conv1d
# docstring) but trains ~45% faster per step (v5e b8 medium: 30.6 vs
# 44.4 ms) — the trainer selects it when its mesh provably has no
# second axis (single device or pure DP), where the native rule is
# exact (probed: (8,) and (8,1) meshes match the single-device dW
# bit-for-bit; only multi-axis meshes miscount).
_GROUPED_CONV_ENV = os.environ.get("PHOONNX_GROUPED_CONV")
_GROUPED_CONV_IMPL = _GROUPED_CONV_ENV or "custom"


def set_grouped_conv_impl(impl: str) -> None:
    """Select the grouped-conv autodiff ("custom" | "native"); read at
    trace time, so set it before jitting training steps. An explicit
    PHOONNX_GROUPED_CONV env setting wins over runtime selection."""
    global _GROUPED_CONV_IMPL
    if impl not in ("custom", "native"):
        raise ValueError(f"unknown grouped conv impl {impl!r}")
    if _GROUPED_CONV_ENV and _GROUPED_CONV_ENV != impl:
        return
    _GROUPED_CONV_IMPL = impl

Array = jax.Array


def _is_concrete(x) -> bool:
    """True for numpy arrays and committed jax.Arrays; False under
    tracing (packed-kernel builders pick host numpy vs traced jnp)."""
    return not isinstance(x, jax.core.Tracer)


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

# lhs [B, T, C] ; rhs [O, I/g, K] ; out [B, T, O]
_CONV_DN = ("NTC", "OIT", "NTC")
# Transposed conv consumes the torch ConvTranspose1d layout [I, O/g, K].
_CONVT_DN = ("NTC", "IOT", "NTC")


def conv1d(
    x: Array,
    weight: Array,
    bias: Optional[Array] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> Array:
    """1D cross-correlation matching torch.nn.Conv1d semantics.

    groups > 1 routes through :func:`_grouped_conv` — a custom-VJP
    wrapper whose forward and input-gradient are the native grouped
    conv (both partition correctly under SPMD) but whose WEIGHT
    gradient is computed as per-tap batched einsums: XLA's SPMD
    partitioner (Shardy AND GSPMD, probed on jax 0.9) scales the native
    grouped-conv dW by the size of any idle mesh axis — a
    (data=4, model=2) mesh returns exactly 2x the true dW for a
    replicated-weight, batch-sharded grouped conv (caught by
    tests/test_multidevice_equivalence.py; dx probed exact).
    """
    if groups == 1:
        out = jax.lax.conv_general_dilated(
            x,
            weight,
            window_strides=(stride,),
            padding=[(padding, padding)],
            rhs_dilation=(dilation,),
            dimension_numbers=_CONV_DN,
            preferred_element_type=x.dtype,
        )
    elif _GROUPED_CONV_IMPL == "native":  # A/B knob (bench tooling)
        out = _grouped_conv_native(x, weight, stride, padding, dilation,
                                   groups)
    else:
        out = _grouped_conv(x, weight, stride, padding, dilation, groups)
    if bias is not None:
        out = out + bias
    return out


def _grouped_conv_native(x, weight, stride, padding, dilation, groups):
    return jax.lax.conv_general_dilated(
        x, weight,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_CONV_DN,
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _grouped_conv(x, weight, stride, padding, dilation, groups):
    return _grouped_conv_native(x, weight, stride, padding, dilation,
                                groups)


def _grouped_conv_fwd(x, weight, stride, padding, dilation, groups):
    return (_grouped_conv_native(x, weight, stride, padding, dilation,
                                 groups), (x, weight))


def _grouped_conv_bwd(stride, padding, dilation, groups, res, dy):
    x, weight = res
    # dx: jax's own transpose rule for the native conv (probed exact
    # under SPMD meshes — only dW is miscounted upstream)
    _, vjp_x = jax.vjp(
        lambda xx: _grouped_conv_native(xx, weight, stride, padding,
                                        dilation, groups), x)
    dx, = vjp_x(dy)
    # dW: NATIVE XLA weight-grad conv + an in-graph integer-scale
    # correction. Round-5 measurement (TRAINING.md, v5e, the HiFi-GAN
    # scale discriminator's four grouped convs at train b16): the
    # native dW conv is FREE (<0.1 ms, MXU-lowered) while every
    # dot_general formulation is lane-starved on the tiny per-group
    # channel slices — the old per-group stacked einsum cost ~11 ms
    # (21 ms of a 23 ms discriminator backward), a dense-then-diagonal
    # variant up to 25 ms at groups=256. The reason this custom vjp
    # exists is that the native dW's SPMD partitioning scales the
    # result by the product of idle mesh axis sizes (probed on jax
    # 0.9, Shardy AND GSPMD; tests/test_multidevice_equivalence.py
    # catches it). That miscount is an EXACT positive-integer scale,
    # so it is recovered in-graph: run the SAME native dW on all-ones
    # clones of the operands (x*0+1 / dy*0+1, so sharding propagates
    # identically) — its exact value is computable analytically at
    # trace time (each dW element equals B x the tap's count of
    # non-padding positions) — and divide by the rounded ratio. A
    # data probe (e.g. recomputing one tap with a dot_general) is NOT
    # robust: a tap whose receptive field falls entirely in padding
    # has dW == 0 on both sides and blinds the ratio (exactly the
    # discriminator's k=41/pad=20 convs at small t_out). The ones
    # probe is nonzero whenever the conv touches any real input,
    # costs one extra native dW (still ~free next to any einsum
    # formulation), degrades to factor=1 on a fixed upstream, and
    # self-adapts to whatever mesh the step is traced under.
    out_ch, cg, kernel = weight.shape
    _, vjp_w = jax.vjp(
        lambda ww: _grouped_conv_native(x, ww, stride, padding,
                                        dilation, groups), weight)
    dw_n, = vjp_w(dy)
    t_in = x.shape[1]
    t_out = dy.shape[1]
    total = 0
    for kk in range(kernel):
        off = kk * dilation - padding
        t_lo = 0 if off >= 0 else (-off + stride - 1) // stride
        t_hi = (t_in - 1 - off) // stride
        total += max(0, min(t_out - 1, t_hi) - max(0, t_lo) + 1)
    if total == 0:  # conv reads only padding: dW is exactly zero
        return dx, dw_n
    analytic = float(out_ch * cg * x.shape[0] * total)
    _, vjp_wp = jax.vjp(
        lambda ww: _grouped_conv_native(x * 0 + 1, ww, stride, padding,
                                        dilation, groups), weight)
    dw_p, = vjp_wp(dy * 0 + 1)
    factor = jnp.clip(
        jnp.round(jnp.sum(jnp.abs(dw_p.astype(jnp.float32))) / analytic),
        1.0, None)
    return dx, (dw_n.astype(jnp.float32) / factor).astype(weight.dtype)


_grouped_conv.defvjp(_grouped_conv_fwd, _grouped_conv_bwd)


def conv_transpose1d(
    x: Array,
    weight: Array,
    bias: Optional[Array] = None,
    stride: int = 1,
    padding: int = 0,
) -> Array:
    """1D transposed conv matching torch.nn.ConvTranspose1d.

    Realised as an input-dilated cross-correlation with a flipped kernel —
    the form XLA lowers efficiently on TPU (fractionally-strided conv on the
    MXU) instead of a scatter.
    """
    kernel = weight.shape[-1]
    out = jax.lax.conv_general_dilated(
        x,
        jnp.flip(weight, axis=-1),
        window_strides=(1,),
        padding=[(kernel - 1 - padding, kernel - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=_CONVT_DN,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias
    return out


def apply_conv(params, x, **kw) -> Array:
    """Conv1d from a ``{"weight", "bias"?}`` parameter subtree."""
    return conv1d(x, params["weight"], params.get("bias"), **kw)


# ---------------------------------------------------------------------------
# Channel-packed convolutions (TPU lane-occupancy optimisation)
# ---------------------------------------------------------------------------
#
# The TPU vector registers and MXU tiles are 128 lanes wide in the minor
# (channel) dimension; a conv at C=32 leaves 3/4 of every lane unused (and
# XLA pads the operands, so the waste is both FLOPs and HBM bytes). The
# HiFi-GAN vocoder's last stages run at C = 64/32 over very long time
# axes — ~95% of synthesis device time (ARCHITECTURE.md "Measured
# reality").
#
# Fix: view [B, T, C] as [B, T/r, r*C] — for row-major channels-last data
# this reshape is a free bitcast (x[t, c] == xp[t//r, (t%r)*C + c]) — and
# run the conv over the packed view with an equivalent block-structured
# kernel. Derivation: with t = r*t' + phi and tap offset m = phi + j*d - p,
#
#   y[t, o]             = sum_j  W[o, i, j] . x[t + j*d - p, i]
#   y_p[t', phi*O + o]  = sum_q  Wp[phi*O+o, psi*C+i, q - q_min]
#                                . x_p[t' + q, psi*C+i]
#   where q = floor(m / r), psi = m mod r
#
# Each (phi, j) lands on exactly one (q, psi), so Wp ([r*O, r*C, K'] with
# K' = q_max - q_min + 1) holds the k*r*O*C original weights among zeros.
# The packed conv computes K'/r * (rC)^2 MACs per original position versus
# the lane-padded k * pad(C)^2 of the direct form — a win whenever
# K' < k * r (always true for small dilations; false e.g. for k7 d12 at
# r=2, which is why callers decide per conv via packed_conv_taps).


def packed_conv_taps(kernel: int, r: int, dilation: int,
                     padding: int) -> int:
    """K' — packed-kernel tap count for the cost heuristic (static)."""
    lo = (0 - padding) // r
    hi = ((r - 1) + (kernel - 1) * dilation - padding) // r
    return hi - lo + 1


def build_packed_kernel(weight: Array, r: int, dilation: int, padding: int):
    """[O, I, K] torch-layout weight -> (Wp [r*O, r*I, K'], pad_l, pad_r).

    Pure jnp scatter of static slices — traces to a handful of pad/concat
    ops, negligible beside the conv itself.
    """
    out_ch, in_ch, kernel = weight.shape
    q_min = (0 - padding) // r
    n_taps = packed_conv_taps(kernel, r, dilation, padding)
    wp = jnp.zeros((r * out_ch, r * in_ch, n_taps), weight.dtype)
    for phi in range(r):
        for j in range(kernel):
            m = phi + j * dilation - padding
            q = m // r
            psi = m - q * r
            wp = wp.at[phi * out_ch:(phi + 1) * out_ch,
                       psi * in_ch:(psi + 1) * in_ch,
                       q - q_min].set(weight[:, :, j])
    return wp, -q_min, n_taps - 1 + q_min


def build_packed_kernel_np(weight, r: int, dilation: int, padding: int):
    """Numpy twin of :func:`build_packed_kernel` for prebuilt/spec
    construction, where weights are always concrete (engine init). The
    jnp version stays for the in-graph fallback path whose weights are
    traced; on a cold remote-compile relay the eager jnp scatters
    serialized into hundreds of tiny device programs."""
    import numpy as np

    weight = np.asarray(weight)
    out_ch, in_ch, kernel = weight.shape
    q_min = (0 - padding) // r
    n_taps = packed_conv_taps(kernel, r, dilation, padding)
    wp = np.zeros((r * out_ch, r * in_ch, n_taps), weight.dtype)
    for phi in range(r):
        for j in range(kernel):
            m = phi + j * dilation - padding
            q = m // r
            psi = m - q * r
            wp[phi * out_ch:(phi + 1) * out_ch,
               psi * in_ch:(psi + 1) * in_ch,
               q - q_min] = weight[:, :, j]
    return wp, -q_min, n_taps - 1 + q_min


def packed_conv_prebuilt(weight: Array, bias: Optional[Array],
                         r: int, dilation: int, padding: int) -> dict:
    """Precompute ``conv1d_packed_io``'s packed kernel for static weights.

    The packed/block-diagonal kernel is a pure placement of the original
    weights (zero arithmetic), so building it once at engine init and
    feeding the result back through ``prebuilt=`` is bit-identical to the
    in-graph construction — but removes the per-call scatter work XLA
    cannot hoist out of a program whose weights are runtime inputs
    (profiled at ~40% of single-utterance synthesis device time as "data
    formatting"). With CONCRETE weights (engine init — the usual case)
    the placement runs in numpy on host: the eager jnp scatters
    otherwise serialize into hundreds of tiny device programs (~20 min
    of engine init on a cold remote-compile relay). Traced weights (the
    in-graph fallback for schedule-mismatched buckets) keep the jnp
    path.
    """
    import numpy as np

    from phoonnx_tpu.models.vits.statics import StaticInt

    concrete = _is_concrete(weight) and (bias is None or _is_concrete(bias))
    xp = np if concrete else jnp
    w_xp = np.asarray(weight) if concrete else weight
    out_ch, in_ch, kernel = w_xp.shape
    if r > 1 and dilation % r == 0 and padding % r == 0:
        wb = xp.zeros((r * out_ch, r * in_ch, kernel), w_xp.dtype)
        for phi in range(r):
            if concrete:
                wb[phi * out_ch:(phi + 1) * out_ch,
                   phi * in_ch:(phi + 1) * in_ch, :] = w_xp
            else:
                wb = wb.at[phi * out_ch:(phi + 1) * out_ch,
                           phi * in_ch:(phi + 1) * in_ch, :].set(w_xp)
        w, pad_l, pad_r, rhs_dil = wb, padding // r, padding // r, dilation // r
    else:
        build = build_packed_kernel_np if concrete else build_packed_kernel
        w, pad_l, pad_r = build(w_xp, r, dilation, padding)
        rhs_dil = 1
    if bias is not None:
        tiled_bias = (jnp.asarray(np.tile(np.asarray(bias), r)) if concrete
                      else jnp.tile(bias, r))
    return {
        "w": jnp.asarray(w),
        "bias": None if bias is None else tiled_bias,
        "pad_l": StaticInt(pad_l),
        "pad_r": StaticInt(pad_r),
        "rhs_dilation": StaticInt(rhs_dil),
        "r": StaticInt(r),
        "dilation": StaticInt(dilation),
    }


def conv1d_packed_io(
    x_p: Array,
    weight: Optional[Array],
    bias: Optional[Array] = None,
    dilation: int = 1,
    padding: int = 0,
    r: int = 4,
    prebuilt: Optional[dict] = None,
) -> Array:
    """Conv over an already channel-packed view [B, T/r, r*C] -> same form.

    When r divides both the dilation and the padding, every original tap
    lands on its own phase (psi == phi): the packed kernel is
    block-diagonal with only ``kernel`` taps at packed dilation d/r —
    much cheaper than the dense floor-spread form (e.g. k7 d12 r4: 7
    taps vs 19).

    ``prebuilt``: a :func:`packed_conv_prebuilt` dict — skips the
    in-graph kernel construction (``weight``/``bias`` are then unused).
    """
    if prebuilt is None:
        prebuilt = packed_conv_prebuilt(weight, bias, r, dilation, padding)
    y = jax.lax.conv_general_dilated(
        x_p, prebuilt["w"], window_strides=(1,),
        padding=[(int(prebuilt["pad_l"]), int(prebuilt["pad_r"]))],
        rhs_dilation=(int(prebuilt["rhs_dilation"]),),
        dimension_numbers=_CONV_DN,
        preferred_element_type=x_p.dtype,
    )
    if prebuilt["bias"] is not None:
        y = y + prebuilt["bias"]
    return y


def conv1d_packed(
    x: Array,
    weight: Array,
    bias: Optional[Array] = None,
    dilation: int = 1,
    padding: int = 0,
    r: int = 4,
) -> Array:
    """Channel-packed "same"-family conv1d (stride 1, groups 1).

    Bit-identical contract to ``conv1d(x, weight, bias, padding=padding,
    dilation=dilation)`` up to float summation order. T must be divisible
    by ``r`` (vocoder time axes are multiples of the upsample rates).
    """
    batch, t_len, in_ch = x.shape
    out_ch = weight.shape[0]
    xp = x.reshape(batch, t_len // r, r * in_ch)
    yp = conv1d_packed_io(xp, weight, bias, dilation=dilation,
                          padding=padding, r=r)
    return yp.reshape(batch, t_len, out_ch)


def pack_ratio(channels: int, t_len: int, lanes: int = 128) -> int:
    """Largest r with r*channels <= lanes, r | t_len (1 = don't pack)."""
    r = 1
    while (channels * r * 2 <= lanes and t_len % (r * 2) == 0):
        r *= 2
    return r


def conv_transpose1d_packed_io(
    x_p: Array,
    weight: Optional[Array],
    bias: Optional[Array] = None,
    stride: int = 1,
    padding: int = 0,
    r_in: int = 1,
    prebuilt: Optional[dict] = None,
) -> Array:
    """Transposed conv from a packed view to a packed view.

    x_p: [B, T', r_in * I] (r_in = 1 means unpacked input). Returns
    [B, T', r_out * O] with r_out = stride * r_in — the SAME row count:
    the upsampling happens entirely inside the lane dimension, so no
    tensor in the chain ever materializes in a partially-occupied
    layout. Requires K == 2 * padding + stride (true for every VITS
    upsample conv: K = 2s, p = s/2), which makes T_out == T_in * s
    exactly.

    Derivation: out[n] = sum_{t,k : s*t + k - p = n} x[t] . W[i, o, k].
    With n = r_out * t' + phi and t = r_in * u + psi and delta = t' - u:
    k = r_out * delta + phi + p - s * psi. Each (phi, psi, k) triple with
    (phi + p - s*psi - k) divisible by r_out lands on exactly one tap.
    Out-of-range input rows are zero rows of x_p == zero x: plain zero
    padding is exact.
    """
    if prebuilt is None:
        prebuilt = packed_convt_prebuilt(weight, bias, stride, padding, r_in)
    y = jax.lax.conv_general_dilated(
        x_p, prebuilt["w"], window_strides=(1,),
        padding=[(int(prebuilt["pad_l"]), int(prebuilt["pad_r"]))],
        dimension_numbers=_CONV_DN,
        preferred_element_type=x_p.dtype,
    )
    if prebuilt["bias"] is not None:
        y = y + prebuilt["bias"]
    return y


def packed_convt_prebuilt(weight: Array, bias: Optional[Array],
                          stride: int, padding: int, r_in: int) -> dict:
    """Precompute ``conv_transpose1d_packed_io``'s packed kernel
    (placement-only, bit-identical to the in-graph construction; see
    :func:`packed_conv_prebuilt` — numpy on host for concrete weights,
    jnp for the traced in-graph fallback)."""
    import numpy as np

    from phoonnx_tpu.models.vits.statics import StaticInt

    concrete = _is_concrete(weight) and (bias is None or _is_concrete(bias))
    w_xp = np.asarray(weight) if concrete else weight
    in_ch, out_ch, kernel = w_xp.shape  # torch ConvTranspose1d [I, O, K]
    if kernel != 2 * padding + stride:
        raise ValueError(
            f"conv_transpose1d_packed_io requires K == 2p + s "
            f"(got K={kernel}, p={padding}, s={stride})"
        )
    r_out = stride * r_in
    entries = []
    deltas = []
    for phi in range(r_out):
        for psi in range(r_in):
            for k in range(kernel):
                num = k - phi - padding + stride * psi
                if num % r_out == 0:
                    entries.append((phi, psi, k, num // r_out))
                    deltas.append(num // r_out)
    d_min, d_max = min(deltas), max(deltas)
    n_taps = d_max - d_min + 1
    if concrete:
        wt = np.zeros((r_out * out_ch, r_in * in_ch, n_taps), w_xp.dtype)
        for phi, psi, k, delta in entries:
            wt[phi * out_ch:(phi + 1) * out_ch,
               psi * in_ch:(psi + 1) * in_ch,
               delta - d_min] = w_xp[:, :, k].T
        wt = wt[:, :, ::-1]
        tiled_bias = (None if bias is None
                      else jnp.asarray(np.tile(np.asarray(bias), r_out)))
    else:
        wt = jnp.zeros((r_out * out_ch, r_in * in_ch, n_taps), w_xp.dtype)
        for phi, psi, k, delta in entries:
            wt = wt.at[phi * out_ch:(phi + 1) * out_ch,
                       psi * in_ch:(psi + 1) * in_ch,
                       delta - d_min].set(w_xp[:, :, k].T)
        wt = jnp.flip(wt, axis=-1)
        tiled_bias = None if bias is None else jnp.tile(bias, r_out)
    # y[t'] = sum_delta x[t' - delta] . Wt[delta]  ==  cross-correlation
    # with the tap axis flipped and left pad d_max / right pad -d_min
    return {
        "w": jnp.asarray(wt),
        "bias": tiled_bias,
        "pad_l": StaticInt(d_max),
        "pad_r": StaticInt(-d_min),
        "r_in": StaticInt(r_in),
        "stride": StaticInt(stride),
        "out_ch": StaticInt(out_ch),
    }


# ---------------------------------------------------------------------------
# Weight normalization
# ---------------------------------------------------------------------------


def weight_norm(v: Array, g: Array, eps: float = 0.0) -> Array:
    """w = g * v / ||v|| with the norm over all dims but 0 (torch default)."""
    axes = tuple(range(1, v.ndim))
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
    return g * v / (norm + eps)


def resolve_weight(params) -> Array:
    """Weight from a conv subtree that may be weight-normalised.

    Training checkpoints carry ``weight_v``/``weight_g``; exported inference
    models carry a plain folded ``weight`` (the reference removes weight norm
    at export, phoonnx_train/vits/models.py:370-375).
    """
    if "weight" in params:
        return params["weight"]
    return weight_norm(params["weight_v"], params["weight_g"])


def apply_wn_conv(params, x, **kw) -> Array:
    return conv1d(x, resolve_weight(params), params.get("bias"), **kw)


# ---------------------------------------------------------------------------
# Normalization / activations
# ---------------------------------------------------------------------------


def layer_norm(params, x: Array, eps: float = 1e-5) -> Array:
    """LayerNorm over the channel (last) axis; params: gamma/beta [C]."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    return normed * params["gamma"] + params["beta"]


def leaky_relu(x: Array, slope: float = 0.1) -> Array:
    return jnp.where(x >= 0, x, x * slope)


def gated_tanh_sigmoid(x: Array, g: Array, channels: int) -> Array:
    """tanh(a) * sigmoid(b) gate used by WaveNet blocks.

    Channel-last equivalent of the reference's fused op
    (phoonnx_train/vits/commons.py:99-106); XLA fuses the whole expression
    into one VPU kernel.
    """
    s = x + g
    return jnp.tanh(s[..., :channels]) * jax.nn.sigmoid(s[..., channels:])


def embedding(params, ids: Array) -> Array:
    """Token embedding lookup; params: weight [V, C]."""
    return jnp.take(params["weight"], ids, axis=0)


def dropout(
    x: Array, rate: float, rng: Optional[Array], deterministic: bool
) -> Array:
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Masks and paths
# ---------------------------------------------------------------------------


def sequence_mask(lengths: Array, max_length: int) -> Array:
    """[B, T] boolean mask from lengths (True inside the sequence)."""
    positions = jnp.arange(max_length)[None, :]
    return positions < lengths[:, None]


def time_mask_packed(valid: Array, rows: int, r: int, dtype) -> Array:
    """Time-validity mask for a channel-packed view.

    valid [B] counts valid TIME positions at the current resolution; the
    tensor being masked is the packed [B, rows, r*C] view where lane
    block ``phi`` of row ``t`` holds time position ``t*r + phi``.
    Returns [B, rows, 1] when the boundary falls on whole rows (r == 1,
    the common case) — otherwise [B, rows, r, 1], to be applied through
    the free [B, rows, r, C] view (see apply_time_mask).
    """
    if r == 1:
        return sequence_mask(valid, rows)[..., None].astype(dtype)
    pos = (jnp.arange(rows)[:, None] * r + jnp.arange(r)[None, :])
    return (pos[None] < valid[:, None, None]).astype(dtype)[..., None]


def time_mask_lanes(valid: Array, rows: int, r: int, c: int,
                    dtype) -> Array:
    """Directly-multiplicable validity mask for a packed [B, rows, r*C]
    tensor: [B, rows, 1] when r == 1, else the expanded [B, rows, r*C]
    lane mask (a fused broadcast, not a materialised constant).

    Exactness contract: zeroing padded time positions after every conv
    makes a bucket-padded decode bit-equal to the exact-length decode —
    each conv's boundary taps then read zeros, exactly the zero padding
    the conv itself would have applied at the true edge.
    """
    mask = time_mask_packed(valid, rows, r, dtype)
    if r == 1:
        return mask
    b = mask.shape[0]
    return jnp.broadcast_to(mask, (b, rows, r, c)).reshape(b, rows, r * c)


# Batched (B > 1) tail-zeroing strategy: "dus" (unrolled per-element
# update chain), "vmapdus" (one gather + one scatter), or "mult"
# (full-tensor mask multiply). All bit-equal; tools/bench_tail_zero.py
# picks the fastest on hardware. Batch 1 always takes the single-DUS path.
TAIL_ZERO_IMPL = "dus"


def zero_time_tail(x: Array, valid: Array, r: int,
                   window_rows: int) -> Array:
    """Zero time positions ``[valid, valid + window_rows*r)`` of a packed
    ``[B, rows, r*C]`` tensor (r == 1: plain ``[B, T, C]``).

    Cheap form of the full ``x * time_mask_lanes(...)`` multiply, exact
    for the decoder's padding-invariance contract: a stride-1 conv's
    valid outputs read at most its right receptive-field extent
    ``(K-1)*d/2`` past ``valid`` (a transposed conv reads at most
    ``ceil(p/s)``), so zeroing only that bleed window after each conv
    keeps a bucket-padded decode bit-equal to the exact-length decode —
    every boundary tap still reads the zeros the conv itself would have
    padded at the true edge (reference slices z before ``dec``,
    phoonnx_train/vits/models.py:721). Positions past the window keep
    garbage no valid output ever reads; callers must size
    ``window_rows * r`` >= the consumer's extent. Touches
    O(B * window * lanes) elements instead of O(B * rows * lanes) —
    the full-tensor masks cost +42% single-stream decode device time
    on v5e (BENCH_r02 vs r01).
    """
    b, rows, lanes = x.shape
    if rows <= window_rows:
        # tiny buffer: the window covers everything, full mask is exact
        # (and avoids clamping edge cases)
        return x * time_mask_lanes(valid, rows, r, lanes // r, x.dtype)
    valid = valid.astype(jnp.int32)
    impl = TAIL_ZERO_IMPL if b > 1 else "dus"
    if impl == "mult":
        return x * time_mask_lanes(valid, rows, r, lanes // r, x.dtype)
    starts = jnp.clip(valid // r, 0, rows - window_rows)  # [B]
    row_idx = jnp.arange(window_rows, dtype=jnp.int32)
    win_rows = starts[:, None] + row_idx[None, :]  # [B, W]
    if r == 1:
        keep = (win_rows < valid[:, None])[..., None]  # [B, W, 1]
    else:
        phi = jnp.arange(lanes, dtype=jnp.int32) // (lanes // r)
        pos = win_rows[:, :, None] * r + phi  # [B, W, lanes]
        keep = pos < valid[:, None, None]
    if impl == "vmapdus":
        # one gather + one scatter covering every element's window —
        # two ops regardless of batch, instead of a 2B-long chain
        wins = jax.vmap(
            lambda xi, s: jax.lax.dynamic_slice(
                xi, (s, 0), (window_rows, lanes)))(x, starts)
        wins = jnp.where(keep, wins, jnp.zeros((), x.dtype))
        return jax.vmap(
            lambda xi, wi, s: jax.lax.dynamic_update_slice(
                xi, wi, (s, 0)))(x, wins, starts)
    out = x
    # unrolled per-element dynamic-update-slice: lowers to in-place
    # windowed writes (the buffer dies), unlike a batched scatter
    for i in range(b):
        win = jax.lax.dynamic_slice(
            out, (i, starts[i], 0), (1, window_rows, lanes))
        win = jnp.where(keep[i][None], win, jnp.zeros((), x.dtype))
        out = jax.lax.dynamic_update_slice(out, win, (i, starts[i], 0))
    return out


def bleed_window_rows(max_extent: int, r: int) -> int:
    """Rows a :func:`zero_time_tail` window must span so that
    ``window_rows * r`` covers a consumer reading ``max_extent`` time
    positions past ``valid`` (+1 row because ``valid`` may fall mid-row)."""
    return -(-max_extent // r) + 1


def generate_path(duration: Array, attn_mask: Array) -> Array:
    """Monotonic alignment from integer durations.

    duration: [B, T_x]; attn_mask: [B, T_y, T_x] (query frames x text).
    Returns [B, T_y, T_x] one-hot-per-frame path. Pure cumsum + compare —
    the jittable equivalent of the reference's generate_path
    (phoonnx_train/vits/commons.py:116-129).
    """
    t_y = attn_mask.shape[1]
    # frame counting must be exact: bf16 durations/cumsums quantize above
    # 256 (spacing 2) and misalign frames — always accumulate in f32,
    # casting only the resulting one-hot path to the compute dtype
    duration = duration.astype(jnp.float32)
    cum = jnp.cumsum(duration, axis=-1)  # [B, T_x]
    frames = jnp.arange(t_y, dtype=jnp.float32)[None, :, None]  # [1,T_y,1]
    reached = frames < cum[:, None, :]
    started = frames < (cum - duration)[:, None, :]
    return (reached & ~started).astype(attn_mask.dtype) * attn_mask


# ---------------------------------------------------------------------------
# Initializers (match reference init schemes for from-scratch training)
# ---------------------------------------------------------------------------


def init_conv(
    rng: Array,
    out_ch: int,
    in_ch: int,
    kernel: int,
    groups: int = 1,
    bias: bool = True,
    std: Optional[float] = None,
):
    """Kaiming-uniform conv init (torch Conv1d default) or normal(0, std)."""
    k_rng, b_rng = jax.random.split(rng)
    shape = (out_ch, in_ch // groups, kernel)
    fan_in = (in_ch // groups) * kernel
    if std is not None:
        weight = std * jax.random.normal(k_rng, shape, dtype=jnp.float32)
    else:
        bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
        weight = jax.random.uniform(
            k_rng, shape, minval=-bound, maxval=bound, dtype=jnp.float32
        )
    params = {"weight": weight}
    if bias:
        bound = math.sqrt(1.0 / fan_in)
        params["bias"] = jax.random.uniform(
            b_rng, (out_ch,), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    return params


def init_wn_conv(rng, out_ch, in_ch, kernel, groups=1, bias=True, std=None):
    """Weight-normalised conv: store (v, g) with w = g v/||v||."""
    params = init_conv(rng, out_ch, in_ch, kernel, groups=groups, bias=bias,
                       std=std)
    v = params.pop("weight")
    axes = tuple(range(1, v.ndim))
    g = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
    params["weight_v"] = v
    params["weight_g"] = g
    return params


def init_layer_norm(channels: int):
    return {
        "gamma": jnp.ones((channels,), jnp.float32),
        "beta": jnp.zeros((channels,), jnp.float32),
    }


def init_zero_conv(out_ch: int, in_ch: int, kernel: int = 1):
    """Zero-initialised projection (flows start at identity)."""
    return {
        "weight": jnp.zeros((out_ch, in_ch, kernel), jnp.float32),
        "bias": jnp.zeros((out_ch,), jnp.float32),
    }
