"""iSTFT decoder: a lighter alternative to the HiFi-GAN vocoder.

Follows the iSTFT-VITS direction (Kaneko et al., "Lightweight and
High-Fidelity End-to-End Text-to-Speech with Multi-Band Generation and
Inverse Short-Time Fourier Transform", arXiv:2210.15975): the last
transposed-conv upsampling stages are replaced by predicting a complex
spectrogram and inverting it with an iSTFT. For hop 256 this cuts the
vocoder's upsampled-domain convolutions by the iSTFT hop factor (4x here)
— the dominant FLOPs of synthesis — at equal sample rate.

The decoder is a drop-in alternative selected by
``VitsHParams.decoder_type == "istft"``; training (mel/GAN losses operate
on the waveform) and the synthesis engine are unchanged.

Measured on TPU v5e (batch 16, 512 frames, interleaved best-of-6 on the
shared chip): hifigan 0.41 ms, istft 0.41 ms, mb-istft 0.42 ms — at
these sizes all three decoder families are overhead-bound and equal on
TPU, so the iSTFT variants' lower parameter/FLOP count is free capacity
headroom here and a real win for CPU-bound deployments. (An earlier
note claimed istft was 1.7x slower; that was shared-chip contention.)
"""

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits import fused_stage, modules, nn
from phoonnx_tpu.ops.istft import istft

Array = jax.Array


def init_istft_generator(rng, initial_channel: int, resblock: str,
                         resblock_kernel_sizes: Sequence[int],
                         resblock_dilation_sizes,
                         upsample_rates: Sequence[int],
                         upsample_initial_channel: int,
                         upsample_kernel_sizes: Sequence[int],
                         istft_n_fft: int = 16,
                         istft_hop: int = 4,
                         istft_bands: int = 1,
                         gin_channels: int = 0):
    """Same stage structure as the HiFi-GAN init, plus mag/phase heads.

    ``istft_bands > 1`` gives the full MB-iSTFT variant: the heads emit
    bands*(n_fft/2+1) channels, each band is inverted separately, and a
    PQMF synthesis bank recombines them (arXiv:2210.15975 §2.2).
    """
    from phoonnx_tpu.models.vits.hifigan import init_generator
    from phoonnx_tpu.models.vits.statics import StaticInt

    params = init_generator(
        rng, initial_channel, resblock, resblock_kernel_sizes,
        resblock_dilation_sizes, upsample_rates, upsample_initial_channel,
        upsample_kernel_sizes, gin_channels=gin_channels,
    )
    # replace the waveform head with spectral heads
    params.pop("conv_post")
    final_ch = upsample_initial_channel // (2 ** len(upsample_rates))
    n_freqs = (istft_n_fft // 2 + 1) * istft_bands
    k_mag, k_phase = jax.random.split(jax.random.fold_in(rng, 1))
    params["conv_mag"] = nn.init_conv(k_mag, n_freqs, final_ch, 7)
    params["conv_phase"] = nn.init_conv(k_phase, n_freqs, final_ch, 7)
    params["istft_n_fft"] = StaticInt(istft_n_fft)
    params["istft_hop"] = StaticInt(istft_hop)
    params["istft_bands"] = StaticInt(istft_bands)
    return params


def istft_generator(params, x: Array, g: Optional[Array] = None,
                    pack_channels: Optional[bool] = None,
                    frame_lengths: Optional[Array] = None) -> Array:
    """Latent frames [B, T, C] -> waveform [B, T * prod(rates) * hop].

    pack_channels: channel-pack the low-channel stages (see
    hifigan.generator / nn.conv1d_packed_io); None = auto (TPU only).
    frame_lengths: optional [B] true frame counts — padded time positions
    are re-zeroed after every conv so bucket-padded decodes match
    exact-length decodes (see hifigan.generator).
    """
    if pack_channels is None:
        pack_channels = jax.default_backend() == "tpu"
    num_kernels = params["num_kernels"]
    resblock_fn = (modules.resblock1 if params["resblock_type"] == "1"
                   else modules.resblock2)
    n_fft = params["istft_n_fft"]
    hop = params["istft_hop"]
    from phoonnx_tpu.models.vits.hifigan import _bleed_extent
    extent = _bleed_extent(params)

    x = nn.apply_conv(params["conv_pre"], x, padding=3)
    if g is not None and "cond" in params:
        x = x + nn.apply_conv(params["cond"], g)
    valid = None
    if frame_lengths is not None:
        valid = frame_lengths.astype(jnp.int32)
        x = nn.zero_time_tail(x, valid, 1,
                              nn.bleed_window_rows(extent, 1))

    cum_up = 1
    for i, up in enumerate(params["ups"]):
        rate = params["upsample_rates"][i]
        kernel = params["upsample_kernel_sizes"][i]
        cum_up *= rate
        x = nn.leaky_relu(x, modules.LRELU_SLOPE)
        x = nn.conv_transpose1d(
            x, nn.resolve_weight(up), up.get("bias"),
            stride=rate, padding=(kernel - rate) // 2,
        )
        batch, t_len, ch = x.shape
        pack_r = nn.pack_ratio(ch, t_len) if pack_channels else 1
        if pack_r > 1:
            x = x.reshape(batch, t_len // pack_r, pack_r * ch)
        stage_valid = None if valid is None else valid * cum_up
        fused = params.get("fused_stages")
        fused = fused[i] if fused is not None else None
        if fused is not None and fused_stage.usable(fused, pack_r, x):
            # in-kernel masking from the scalar-prefetch lengths; output
            # rows fully masked (see hifigan.generator)
            x = fused_stage.apply_group(fused, x, valid=stage_valid)
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
        if pack_r > 1:
            x = x.reshape(batch, t_len, ch)

    x = nn.leaky_relu(x, 0.01)
    magnitude = jnp.exp(
        jnp.clip(nn.apply_conv(params["conv_mag"], x, padding=3), -12.0, 6.0)
    )
    phase = math.pi * jnp.sin(nn.apply_conv(params["conv_phase"], x,
                                            padding=3))
    istft_lengths = None
    if valid is not None:
        # the iSTFT's overlap-add would bleed padded frames' spectra
        # (exp(bias) != 0) back into the valid tail; zero magnitude kills
        # their contribution. The envelope denominator must then count
        # exactly valid*cum_up + 1 frames (the exact decode's frame count
        # including its one silent pad frame below).
        tail_mask = nn.time_mask_packed(valid * cum_up, x.shape[1], 1,
                                        magnitude.dtype)
        magnitude = magnitude * tail_mask
        phase = phase * tail_mask
        istft_lengths = valid * cum_up + 1
    # pad one silent frame so the output is exactly T*hop samples
    magnitude = jnp.pad(magnitude, [(0, 0), (0, 1), (0, 0)])
    phase = jnp.pad(phase, [(0, 0), (0, 1), (0, 0)])

    n_bands = int(params.get("istft_bands", 1))
    if n_bands == 1:
        audio = istft(magnitude.astype(jnp.float32),
                      phase.astype(jnp.float32), n_fft, hop, n_fft,
                      frame_lengths=istft_lengths)
        return audio.astype(x.dtype)

    # multi-band: fold bands into the batch, invert each subband, then
    # recombine with the PQMF synthesis bank (one stride-N transposed
    # conv — translation-invariant, so chunked streaming decode works)
    from phoonnx_tpu.ops.pqmf import pqmf_filters, pqmf_synthesis

    b, t_up = magnitude.shape[:2]
    n_freqs = n_fft // 2 + 1

    def fold(spec):
        spec = spec.reshape(b, t_up, n_bands, n_freqs)
        return jnp.swapaxes(spec, 1, 2).reshape(b * n_bands, t_up, n_freqs)

    sub = istft(fold(magnitude).astype(jnp.float32),
                fold(phase).astype(jnp.float32), n_fft, hop, n_fft,
                frame_lengths=(None if istft_lengths is None else
                               jnp.repeat(istft_lengths, n_bands)))
    if istft_lengths is not None:
        # the exact-length decode's iSTFT crop ends at (t_frames-1)*hop
        # (center=True semantics with win == n_fft), discarding the last
        # windows' overlap spill; the padded buffer keeps that spill
        # inside its larger crop, and the centered PQMF filter would
        # read it back into the valid tail — zero it
        keep = (jnp.arange(sub.shape[-1])[None, :]
                < ((jnp.repeat(istft_lengths, n_bands) - 1) * hop)[:, None])
        sub = sub * keep.astype(sub.dtype)
    sub = sub.reshape(b, n_bands, sub.shape[-1])
    _, synthesis = pqmf_filters(n_bands)
    audio = pqmf_synthesis(jnp.swapaxes(sub, 1, 2), synthesis, n_bands)
    return audio.astype(x.dtype)


def pack_schedule(params, t_frames: int) -> tuple:
    """Hashable pack plan for a ``t_frames`` decode (one per-stage
    resblock ratio; see hifigan.pack_schedule for the dedupe contract)."""
    sched = []
    t = t_frames
    for i, up in enumerate(params["ups"]):
        t *= params["upsample_rates"][i]
        ch = up.get("weight", up.get("weight_v")).shape[1]
        sched.append(nn.pack_ratio(ch, t))
    return tuple(sched)


def pack_istft_params(params, t_frames: int) -> dict:
    """Copy of the iSTFT decoder params with the resblock packed kernels
    precomputed for a ``t_frames``-frame decode (engine init; mirrors
    :func:`istft_generator`'s pack-ratio schedule — see
    hifigan.pack_generator_params for the contract)."""
    packed = dict(params)
    num_kernels = params["num_kernels"]
    resblocks = list(params["resblocks"])
    fused_specs = []
    t = t_frames
    for i, up in enumerate(params["ups"]):
        rate = params["upsample_rates"][i]
        t *= rate
        weight = nn.resolve_weight(up)
        ch = weight.shape[1]
        pack_r = nn.pack_ratio(ch, t)
        if pack_r > 1:
            for j in range(num_kernels):
                idx = i * num_kernels + j
                resblocks[idx] = modules.pack_resblock(resblocks[idx],
                                                       pack_r)
        if fused_stage.enabled():
            fused_specs.append(fused_stage.build_group_spec(
                params["resblocks"][i * num_kernels:(i + 1) * num_kernels],
                pack_r, modules.LRELU_SLOPE, dtype=weight.dtype))
        else:
            fused_specs.append(None)
    packed["resblocks"] = resblocks
    packed["fused_stages"] = tuple(fused_specs)
    return packed
