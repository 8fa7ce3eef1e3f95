"""HiFi-GAN generator (vocoder).

Reference: phoonnx_train/vits/models.py:299-375. Transposed convs are
realised as input-dilated MXU convolutions (see nn.conv_transpose1d); the
whole stack compiles to one fused XLA program per frame bucket.
"""

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits import fused_stage, modules, nn

from phoonnx_tpu.models.vits.statics import StaticInt, StaticStr, StaticTuple

Array = jax.Array


def _bleed_extent(params) -> int:
    """Max right receptive-field extent (time positions past ``valid``)
    of any conv consuming a zero_time_tail-masked tensor: the dilated
    resblock convs ((K-1)*d/2), the K=7 pre/post convs (3), and the
    transposed convs (ceil(p/s), derived from the actual kernel/rate
    geometry — the standard presets give <= 1 but an imported voice may
    carry k >> 2*rate, and an undersized window silently breaks the
    padding bit-equality contract). Static — kernel sizes/dilations are
    StaticInt/StaticTuple params."""
    extent = 3
    for block in params["resblocks"]:
        k = int(block["kernel_size"])
        for d in block["dilations"]:
            extent = max(extent, (k * int(d) - int(d)) // 2)
    rates = params.get("upsample_rates")
    kernels = params.get("upsample_kernel_sizes")
    if rates is not None and kernels is not None:
        for rate, kernel in zip(rates, kernels):
            rate, kernel = int(rate), int(kernel)
            padding = (kernel - rate) // 2
            extent = max(extent, -(-padding // rate))
    return extent


def init_generator(rng, initial_channel: int, resblock: str,
                   resblock_kernel_sizes: Sequence[int],
                   resblock_dilation_sizes: Sequence[Sequence[int]],
                   upsample_rates: Sequence[int],
                   upsample_initial_channel: int,
                   upsample_kernel_sizes: Sequence[int],
                   gin_channels: int = 0):
    params = {
        "resblock_type": StaticStr(resblock),
        "num_kernels": StaticInt(len(resblock_kernel_sizes)),
        "upsample_rates": StaticTuple(upsample_rates),
        "upsample_kernel_sizes": StaticTuple(upsample_kernel_sizes),
    }
    rng, k_pre, k_post, k_cond = jax.random.split(rng, 4)
    params["conv_pre"] = nn.init_conv(k_pre, upsample_initial_channel,
                                      initial_channel, 7)

    ups = []
    for i, (rate, kernel) in enumerate(zip(upsample_rates,
                                           upsample_kernel_sizes)):
        rng, key = jax.random.split(rng)
        in_ch = upsample_initial_channel // (2 ** i)
        out_ch = upsample_initial_channel // (2 ** (i + 1))
        # torch ConvTranspose1d layout [I, O, K]; normal(0, 0.01) init
        # (commons.init_weights, applied at models.py:343)
        v = 0.01 * jax.random.normal(key, (in_ch, out_ch, kernel),
                                     dtype=jnp.float32)
        axes = (1, 2)
        g = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
        ups.append({"weight_v": v, "weight_g": g,
                    "bias": jnp.zeros((out_ch,), jnp.float32)})
    params["ups"] = ups

    resblocks = []
    init_fn = (modules.init_resblock1 if resblock == "1"
               else modules.init_resblock2)
    for i in range(len(ups)):
        ch = upsample_initial_channel // (2 ** (i + 1))
        for kernel, dilations in zip(resblock_kernel_sizes,
                                     resblock_dilation_sizes):
            rng, key = jax.random.split(rng)
            resblocks.append(init_fn(key, ch, kernel, dilations))
    params["resblocks"] = resblocks

    final_ch = upsample_initial_channel // (2 ** len(ups))
    post = nn.init_conv(k_post, 1, final_ch, 7, bias=False)
    params["conv_post"] = post

    if gin_channels:
        params["cond"] = nn.init_conv(k_cond, upsample_initial_channel,
                                      gin_channels, 1)
    return params


def generator(params, x: Array, g: Optional[Array] = None,
              pack_channels: Optional[bool] = None,
              frame_lengths: Optional[Array] = None) -> Array:
    """Latent frames [B, T, C] -> waveform [B, T * prod(rates)].

    pack_channels: run the low-channel late stages with channel-packed
    kernels ([T, C] viewed as [T/r, r*C], see nn.conv1d_packed) so the
    128-wide TPU lanes stay occupied — same math, different summation
    grouping. None = auto: on for TPU backends, off elsewhere (on CPU
    the packed form costs strictly more FLOPs).

    frame_lengths: optional [B] true frame counts. When given, the bleed
    window past each element's valid length is re-zeroed after every
    conv (nn.zero_time_tail), which makes a bucket-padded decode
    BIT-EQUAL on the valid span to decoding the exact-length latents
    (the reference slices z to the true length before ``dec``,
    models.py:721 — without masking, conv biases turn the padded region
    nonzero and later taps bleed it back into the valid span, measured
    at ~0.05 waveform deviation). The fused Pallas stages mask their own
    input taps and output rows from the per-batch length, so the fused
    path needs no XLA-level masking at all beyond conv_pre's window.
    """
    if pack_channels is None:
        pack_channels = jax.default_backend() == "tpu"
    num_kernels = params["num_kernels"]
    resblock_fn = (modules.resblock1 if params["resblock_type"] == "1"
                   else modules.resblock2)
    # max right receptive-field extent (time positions) any conv reads
    # past `valid` — sizes every zero_time_tail window below
    extent = _bleed_extent(params)

    x = nn.apply_conv(params["conv_pre"], x, padding=3)
    if g is not None:
        x = x + nn.apply_conv(params["cond"], g)
    valid = None
    if frame_lengths is not None:
        valid = frame_lengths.astype(jnp.int32)
        x = nn.zero_time_tail(x, valid, 1,
                              nn.bleed_window_rows(extent, 1))

    # Running packing factor of x's current view ([B, T/r, r*C]); the
    # whole tail — upsample convs included — chains packed views so no
    # tensor ever materializes in a partially-occupied lane layout.
    pack_r = 1
    cum_up = 1  # cumulative upsample factor (frame -> current resolution)
    for i, up in enumerate(params["ups"]):
        rate = params["upsample_rates"][i]
        cum_up *= rate
        kernel = params["upsample_kernel_sizes"][i]
        padding = (kernel - rate) // 2
        x = nn.leaky_relu(x, modules.LRELU_SLOPE)
        pb = up.get("packed")
        if (pb is None or int(pb["r_in"]) != pack_r
                or int(pb["stride"]) != rate):
            pb = None
        weight = None if pb is not None else nn.resolve_weight(up)
        out_ch = int(pb["out_ch"]) if pb is not None else weight.shape[1]
        batch, rows, packed_ch = x.shape
        t_out = rows * pack_r * rate
        stage_r = nn.pack_ratio(out_ch, t_out) if pack_channels else 1
        r_up = rate * pack_r
        if (pack_channels and kernel == 2 * padding + rate
                and stage_r > 1 and r_up % stage_r == 0):
            x = nn.conv_transpose1d_packed_io(
                x, weight, up.get("bias"), stride=rate, padding=padding,
                r_in=pack_r, prebuilt=pb,
            )  # [B, rows, r_up * out_ch]
            if r_up != stage_r:  # free reshape: both views are row-major
                x = x.reshape(batch, rows * (r_up // stage_r),
                              stage_r * out_ch)
            pack_r = stage_r
        else:
            if pack_r > 1:
                x = x.reshape(batch, rows * pack_r, packed_ch // pack_r)
            x = nn.conv_transpose1d(
                x, weight if weight is not None else nn.resolve_weight(up),
                up.get("bias"), stride=rate, padding=padding,
            )
            pack_r = stage_r
            if pack_r > 1:
                x = x.reshape(batch, t_out // pack_r, pack_r * out_ch)
        stage_valid = None if valid is None else valid * cum_up
        fused = params.get("fused_stages")
        fused = fused[i] if fused is not None else None
        if fused is not None and fused_stage.usable(fused, pack_r, x):
            # the kernel masks its own input taps AND its output rows
            # from the scalar-prefetch lengths — no XLA-level zeroing
            # needed around it (its output is fully masked, so the next
            # transposed conv's boundary taps read exact zeros)
            x = fused_stage.apply_group(fused, x, valid=stage_valid)
            if "postW" in fused:  # epilogue produced packed audio
                batch, rows, r_out = x.shape
                return x.reshape(batch, rows * r_out)
        else:
            mask_fn = None
            if stage_valid is not None:
                w_rows = nn.bleed_window_rows(extent, pack_r)
                mask_fn = partial(nn.zero_time_tail, valid=stage_valid,
                                  r=pack_r, window_rows=w_rows)
                x = mask_fn(x)
            acc = None
            for j in range(num_kernels):
                block = params["resblocks"][i * num_kernels + j]
                out = resblock_fn(block, x, mask_fn=mask_fn,
                                  pack_r=pack_r, packed_io=pack_r > 1)
                acc = out if acc is None else acc + out
            x = acc / num_kernels

    # Final activation uses torch's default leaky slope 0.01 (models.py:364).
    # The last stage's packed view feeds conv_post directly (same r).
    x = nn.leaky_relu(x, 0.01)
    w_post = params["conv_post"]["weight"]
    b_post = params["conv_post"].get("bias")
    if pack_r > 1:
        pb = params["conv_post"].get("packed")
        if pb is not None and int(pb["r"]) == pack_r:
            x = nn.conv1d_packed_io(x, None, prebuilt=pb)
        else:
            x = nn.conv1d_packed_io(x, w_post, b_post, dilation=1,
                                    padding=3, r=pack_r)
        x = x.reshape(x.shape[0], x.shape[1] * pack_r, w_post.shape[0])
    else:
        x = nn.conv1d(x, w_post, b_post, padding=3)
    x = jnp.tanh(x)
    return x[..., 0]


def pack_schedule(params, t_frames: int) -> tuple:
    """Hashable pack plan for a ``t_frames`` decode — one entry
    ``(r_in_used, stage_r)`` per upsample stage (``r_in_used`` 0 when the
    stage falls back to unpacked transposed conv) plus the final
    ``conv_post`` ratio. Two t_frames with equal schedules get
    content-identical :func:`pack_generator_params` results, so callers
    can dedupe the packed copies (the engine keys its cache on this)."""
    sched = []
    pack_r = 1
    t = t_frames
    for i, up in enumerate(params["ups"]):
        rate = params["upsample_rates"][i]
        kernel = params["upsample_kernel_sizes"][i]
        padding = (kernel - rate) // 2
        out_ch = up.get("weight", up.get("weight_v")).shape[1]
        t_out = t * rate
        stage_r = nn.pack_ratio(out_ch, t_out)
        r_up = rate * pack_r
        uses_packed_t = (kernel == 2 * padding + rate and stage_r > 1
                         and r_up % stage_r == 0)
        sched.append((pack_r if uses_packed_t else 0, stage_r))
        pack_r = stage_r
        t = t_out
    sched.append((pack_r,))
    return tuple(sched)


def pack_generator_params(params, t_frames: int) -> dict:
    """Copy of the generator params with packed kernels precomputed for a
    ``t_frames``-frame decode (what the inference engine dispatches).

    Mirrors :func:`generator`'s per-stage pack-ratio schedule; at call
    time the generator uses a prebuilt kernel only when its (r, stride /
    dilation) matches, so a bucket with a different schedule silently
    falls back to in-graph construction — precomputation is a pure
    speedup, never a correctness dependency. The packed entries are
    placement-only transforms of the stored weights (bit-identical
    output; tests/test_packed_conv.py pins it).
    """
    packed = dict(params)
    num_kernels = params["num_kernels"]
    ups = [dict(u) for u in params["ups"]]
    resblocks = list(params["resblocks"])
    fused_specs = []

    pack_r = 1
    t = t_frames
    for i, up in enumerate(ups):
        rate = params["upsample_rates"][i]
        kernel = params["upsample_kernel_sizes"][i]
        padding = (kernel - rate) // 2
        weight = nn.resolve_weight(up)
        out_ch = weight.shape[1]
        t_out = t * rate
        stage_r = nn.pack_ratio(out_ch, t_out)
        r_up = rate * pack_r
        if (kernel == 2 * padding + rate and stage_r > 1
                and r_up % stage_r == 0):
            up["packed"] = nn.packed_convt_prebuilt(
                weight, up.get("bias"), stride=rate, padding=padding,
                r_in=pack_r,
            )
        pack_r = stage_r
        if pack_r > 1:
            for j in range(num_kernels):
                idx = i * num_kernels + j
                resblocks[idx] = modules.pack_resblock(resblocks[idx],
                                                       pack_r)
        if fused_stage.enabled():
            # last stage: fuse the generator tail (leaky 0.01 ->
            # conv_post -> tanh) as a kernel epilogue — the full-width
            # stage output then never touches HBM (models.py:362-366)
            post = None
            if i == len(ups) - 1:
                post = (params["conv_post"]["weight"],
                        params["conv_post"].get("bias"), 3, 0.01)
            fused_specs.append(fused_stage.build_group_spec(
                params["resblocks"][i * num_kernels:(i + 1) * num_kernels],
                pack_r, modules.LRELU_SLOPE, dtype=weight.dtype,
                post=post))
        else:
            fused_specs.append(None)
        t = t_out
    packed["ups"] = ups
    packed["resblocks"] = resblocks
    packed["fused_stages"] = tuple(fused_specs)
    if pack_r > 1:
        post = dict(params["conv_post"])
        post["packed"] = nn.packed_conv_prebuilt(
            post["weight"], post.get("bias"), pack_r, 1, 3)
        packed["conv_post"] = post
    return packed
