"""Full VITS synthesizer: init, training forward, inference.

Functional equivalent of the reference SynthesizerTrn
(phoonnx_train/vits/models.py:522-732) plus the quality presets from
phoonnx_train/vits/lightning.py:26-57 and train.py:106-120.

All stochastic inputs (posterior noise, prior noise, SDP noise, slice
offsets) come from an explicit PRNG key or injected arrays, so synthesis is
reproducible and can be verified bit-for-bit against other runtimes.
"""

from dataclasses import dataclass, replace
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits import duration, encoder, hifigan, nn, posterior
from phoonnx_tpu.ops import mas

Array = jax.Array


@dataclass(frozen=True)
class VitsHParams:
    n_vocab: int = 256
    spec_channels: int = 513  # filter_length // 2 + 1
    segment_size: int = 32  # frames (8192 samples / hop 256)
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    resblock: str = "2"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 5, 7)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 2), (2, 6), (3, 12),
    )
    upsample_rates: Tuple[int, ...] = (8, 8, 4)
    upsample_initial_channel: int = 256
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 8)
    n_speakers: int = 1
    gin_channels: int = 0
    use_sdp: bool = True
    # decoder family: "hifigan" (reference) or "istft" (lightweight
    # spectral head + inverse STFT, arXiv:2210.15975 direction)
    decoder_type: str = "hifigan"
    istft_n_fft: int = 16
    istft_hop: int = 4
    istft_bands: int = 1  # >1: multi-band iSTFT + PQMF synthesis
    # audio
    sample_rate: int = 22050
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    mel_channels: int = 80

    @property
    def total_upsample(self) -> int:
        out = 1
        for rate in self.upsample_rates:
            out *= rate
        if self.decoder_type == "istft":
            out *= self.istft_hop * self.istft_bands
        return out

    @staticmethod
    def preset(quality: str = "medium", **overrides) -> "VitsHParams":
        """'x-low' | 'medium' | 'high' presets (train.py:106-120), plus a
        'micro' preset for smoke tests and CI."""
        hp = VitsHParams()
        if quality == "micro":
            hp = replace(
                hp,
                spec_channels=65,
                segment_size=16,
                inter_channels=32,
                hidden_channels=32,
                filter_channels=64,
                n_layers=1,
                resblock_kernel_sizes=(3,),
                resblock_dilation_sizes=((1, 2),),
                upsample_rates=(4, 4),
                upsample_initial_channel=32,
                upsample_kernel_sizes=(8, 8),
                filter_length=128,
                hop_length=16,
                win_length=128,
                mel_channels=20,
                sample_rate=16000,
            )
        elif quality == "x-low":
            hp = replace(hp, hidden_channels=96, inter_channels=96,
                         filter_channels=384)
        elif quality == "medium-istft":
            # medium body; the final x4 upsampling becomes an iSTFT
            hp = replace(
                hp,
                decoder_type="istft",
                upsample_rates=(8, 8),
                upsample_kernel_sizes=(16, 16),
                istft_n_fft=16,
                istft_hop=4,
            )
        elif quality == "medium-mb-istft":
            # full MB-iSTFT-VITS direction (arXiv:2210.15975): 4 subbands
            # predicted at 1/16 rate, each iSTFT'd (hop 4), PQMF x4
            hp = replace(
                hp,
                decoder_type="istft",
                upsample_rates=(4, 4),
                upsample_kernel_sizes=(8, 8),
                istft_n_fft=16,
                istft_hop=4,
                istft_bands=4,
            )
        elif quality == "high":
            hp = replace(
                hp,
                resblock="1",
                resblock_kernel_sizes=(3, 7, 11),
                resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
                upsample_rates=(8, 8, 2, 2),
                upsample_initial_channel=512,
                upsample_kernel_sizes=(16, 16, 4, 4),
            )
        elif quality != "medium":
            raise ValueError(f"unknown quality preset: {quality}")
        if overrides:
            hp = replace(hp, **overrides)
        return hp


def random_params(rng: Array, hp: VitsHParams) -> Dict[str, Any]:
    """Random initialization matching the reference init schemes."""
    keys = jax.random.split(rng, 6)
    params: Dict[str, Any] = {
        "enc_p": encoder.init_text_encoder(
            keys[0], hp.n_vocab, hp.inter_channels, hp.hidden_channels,
            hp.filter_channels, hp.n_heads, hp.n_layers, hp.kernel_size,
        ),
        "dec": _init_decoder(keys[1], hp),
        "enc_q": posterior.init_posterior_encoder(
            keys[2], hp.spec_channels, hp.inter_channels, hp.hidden_channels,
            5, 1, 16, gin_channels=hp.gin_channels,
        ),
        "flow": posterior.init_residual_coupling_block(
            keys[3], hp.inter_channels, hp.hidden_channels, 5, 1, 4,
            gin_channels=hp.gin_channels,
        ),
    }
    if hp.use_sdp:
        params["dp"] = duration.init_stochastic_duration_predictor(
            keys[4], hp.hidden_channels, 192, 3, 4,
            gin_channels=hp.gin_channels,
        )
    else:
        params["dp"] = duration.init_duration_predictor(
            keys[4], hp.hidden_channels, 256, 3, gin_channels=hp.gin_channels,
        )
    if hp.n_speakers > 1:
        params["emb_g"] = {
            "weight": jax.random.normal(
                keys[5], (hp.n_speakers, hp.gin_channels), jnp.float32
            )
        }
    return params


def _init_decoder(rng: Array, hp: VitsHParams):
    if hp.decoder_type == "istft":
        from phoonnx_tpu.models.vits.istft_decoder import (
            init_istft_generator,
        )

        return init_istft_generator(
            rng, hp.inter_channels, hp.resblock,
            hp.resblock_kernel_sizes, hp.resblock_dilation_sizes,
            hp.upsample_rates, hp.upsample_initial_channel,
            hp.upsample_kernel_sizes, istft_n_fft=hp.istft_n_fft,
            istft_hop=hp.istft_hop, istft_bands=hp.istft_bands,
            gin_channels=hp.gin_channels,
        )
    return hifigan.init_generator(
        rng, hp.inter_channels, hp.resblock,
        hp.resblock_kernel_sizes, hp.resblock_dilation_sizes,
        hp.upsample_rates, hp.upsample_initial_channel,
        hp.upsample_kernel_sizes, gin_channels=hp.gin_channels,
    )


def decode_audio(params, hp: VitsHParams, z: Array,
                 g: Optional[Array] = None,
                 frame_lengths: Optional[Array] = None) -> Array:
    """Latent frames -> waveform via the configured decoder family.

    frame_lengths: [B] true frame counts when z is bucket-padded — the
    decoders re-zero padded time positions after every conv so the valid
    span is bit-equal to decoding the exact-length latents (the
    reference slices z before ``dec``, models.py:721; without this,
    conv biases leak ~5e-2 of garbage back into the tail of the valid
    span through later layers' taps).
    """
    if hp.decoder_type == "istft":
        from phoonnx_tpu.models.vits.istft_decoder import istft_generator

        return istft_generator(params["dec"], z, g=g,
                               frame_lengths=frame_lengths)
    return hifigan.generator(params["dec"], z, g=g,
                             frame_lengths=frame_lengths)


def pack_decoder_params(params, hp: VitsHParams, t_frames: int):
    """Params copy with the decoder's packed kernels precomputed.

    Inference-engine init step: the channel-packed vocoder stages
    (hifigan.generator / istft_generator) otherwise rebuild their packed
    kernels from the stored weights inside EVERY compiled call — XLA
    cannot hoist the construction because weights are runtime inputs
    (profiled at ~0.7 ms of the 1.9 ms single-utterance synthesis on
    v5e). The packed entries are placement-only transforms, bit-identical
    to in-graph construction, and call-time code falls back to the
    in-graph build whenever a bucket's pack schedule differs.
    """
    if hp.decoder_type == "istft":
        from phoonnx_tpu.models.vits.istft_decoder import pack_istft_params

        packed_dec = pack_istft_params(params["dec"], t_frames)
    else:
        packed_dec = hifigan.pack_generator_params(params["dec"], t_frames)
    out = dict(attach_fused_specs(params))
    out["dec"] = packed_dec
    return out


def attach_fused_specs(params):
    """Params view with the frame-count-independent fused-kernel specs
    attached: the fused text encoder (stacked per-layer weights for the
    single-pallas_call encoder stack) and the fused inverse flow.

    Placement-only like the decoder packs: attention.encoder /
    posterior.coupling_flow use a spec only when the corresponding
    ``usable()`` gate holds, else keep the XLA path. Idempotent — params
    that already carry a spec are returned unchanged, so the inference
    engine attaches once at init and pack_decoder_params reuses it.
    Unlike the decoder packs these specs do not depend on the frame
    bucket, so phase-1/latents/streaming programs (which never see
    packed params) get the fused paths too.
    """
    from phoonnx_tpu.models.vits import fused_encoder, fused_flow

    out = params
    if (fused_encoder.enabled()
            and "fused" not in params["enc_p"]["encoder"]):
        spec = fused_encoder.build_spec(params["enc_p"]["encoder"])
        if spec is not None:
            if out is params:
                out = dict(params)
            enc_p = dict(params["enc_p"])
            enc_p["encoder"] = dict(enc_p["encoder"], fused=spec)
            out["enc_p"] = enc_p
    if fused_flow.enabled() and "fused_rev" not in params["flow"]:
        flow_spec = fused_flow.build_spec(params["flow"])
        if flow_spec is not None:
            if out is params:
                out = dict(params)
            out["flow"] = dict(params["flow"], fused_rev=flow_spec)
    return out


def decoder_pack_schedule(params, hp: VitsHParams, t_frames: int) -> tuple:
    """Hashable pack plan :func:`pack_decoder_params` would build for a
    ``t_frames`` decode. Equal schedules -> content-identical packed
    params; the engine dedupes its per-frame-bucket packed copies on it
    (most large buckets share one schedule, so HBM holds one copy)."""
    if hp.decoder_type == "istft":
        from phoonnx_tpu.models.vits import istft_decoder

        return ("istft",) + istft_decoder.pack_schedule(params["dec"],
                                                        t_frames)
    return ("hifigan",) + hifigan.pack_schedule(params["dec"], t_frames)


def _speaker_embedding(params, hp: VitsHParams, sid: Optional[Array],
                       batch: int) -> Optional[Array]:
    if hp.n_speakers <= 1:
        return None
    if sid is None:
        sid = jnp.zeros((batch,), jnp.int32)
    return nn.embedding(params["emb_g"], sid)[:, None, :]  # [B, 1, G]


def train_forward(params, hp: VitsHParams, rng: Array,
                  x_ids: Array, x_lengths: Array,
                  spec: Array, spec_lengths: Array,
                  sid: Optional[Array] = None,
                  deterministic: bool = False,
                  mas_impl: str = "scan"):
    """Training forward pass (models.py:617-679).

    x_ids [B, T_x] int32; spec [B, T_y, C_spec]; lengths [B].
    Returns dict with the sliced waveform, duration loss pieces, the
    alignment, and the latents needed for the KL loss. ``mas_impl``
    selects the alignment kernel (see ops/mas.py).
    """
    b, t_x = x_ids.shape
    t_y = spec.shape[1]
    seg = hp.segment_size

    (rng_enc, rng_post, rng_sdp, rng_slice, rng_drop) = jax.random.split(rng, 5)

    x_mask = nn.sequence_mask(x_lengths, t_x)[..., None].astype(spec.dtype)
    y_mask = nn.sequence_mask(spec_lengths, t_y)[..., None].astype(spec.dtype)

    x, m_p, logs_p = encoder.text_encoder(
        params["enc_p"], x_ids, x_mask, p_dropout=hp.p_dropout,
        rng=rng_enc, deterministic=deterministic,
    )
    g = _speaker_embedding(params, hp, sid, b)

    post_noise = jax.random.normal(rng_post, (b, t_y, hp.inter_channels),
                                   spec.dtype)
    z, m_q, logs_q = posterior.posterior_encoder(
        params["enc_q"], spec, y_mask, post_noise, g=g,
    )
    z_p = posterior.coupling_flow(params["flow"], z, y_mask, g=g)

    # --- MAS alignment (no gradients; models.py:628-650) ---
    s_p_sq_r = jnp.exp(-2.0 * logs_p)  # [B, T_x, C]
    neg_cent1 = jnp.sum(
        -0.5 * jnp.log(2.0 * jnp.pi) - logs_p, axis=-1
    )[:, None, :]  # [B, 1, T_x]
    neg_cent2 = jnp.einsum("byc,bxc->byx", -0.5 * jnp.square(z_p), s_p_sq_r)
    neg_cent3 = jnp.einsum("byc,bxc->byx", z_p, m_p * s_p_sq_r)
    neg_cent4 = jnp.sum(
        -0.5 * jnp.square(m_p) * s_p_sq_r, axis=-1
    )[:, None, :]
    neg_cent = neg_cent1 + neg_cent2 + neg_cent3 + neg_cent4  # [B, T_y, T_x]

    attn_mask = y_mask * jnp.swapaxes(x_mask, 1, 2)  # [B, T_y, T_x]
    attn = jax.lax.stop_gradient(
        mas.maximum_path(jax.lax.stop_gradient(neg_cent), attn_mask,
                         impl=mas_impl)
    )

    w = jnp.sum(attn, axis=1)[..., None]  # [B, T_x, 1] durations
    if hp.use_sdp:
        e_q = jax.random.normal(rng_sdp, (b, t_x, 2), spec.dtype)
        l_length = duration.sdp_nll(
            params["dp"], x, x_mask, w, e_q, g=g,
            p_dropout=0.5, rng=rng_drop, deterministic=deterministic,
        )
        # exact token count: a bf16 mask sum quantizes above 256
        l_length = l_length / jnp.sum(x_mask.astype(jnp.float32))
    else:
        logw_ = jnp.log(w + 1e-6) * x_mask
        logw = duration.duration_predictor(
            params["dp"], x, x_mask, g=g, p_dropout=0.5, rng=rng_drop,
            deterministic=deterministic,
        )
        l_length = (jnp.sum(jnp.square(logw - logw_), axis=(1, 2))
                    / jnp.sum(x_mask.astype(jnp.float32)))

    # Expand prior over the alignment: [B, T_y, T_x] @ [B, T_x, C]
    m_p_exp = jnp.einsum("byx,bxc->byc", attn, m_p)
    logs_p_exp = jnp.einsum("byx,bxc->byc", attn, logs_p)

    # Random segment slice for the vocoder (commons.py:47-63)
    max_start = jnp.maximum(spec_lengths - seg + 1, 1)
    starts = (jax.random.uniform(rng_slice, (b,)) * max_start).astype(jnp.int32)
    z_slice = _slice_segments(z, starts, seg)
    o = decode_audio(params, hp, z_slice, g=g)

    return {
        "audio": o,
        "l_length": l_length,
        "attn": attn,
        "ids_slice": starts,
        "x_mask": x_mask,
        "y_mask": y_mask,
        "z": z,
        "z_p": z_p,
        "m_p": m_p_exp,
        "logs_p": logs_p_exp,
        "m_q": m_q,
        "logs_q": logs_q,
    }


def _slice_segments(x: Array, starts: Array, segment_size: int) -> Array:
    """Gather fixed-size segments at per-batch offsets; x [B, T, C]."""
    idx = starts[:, None] + jnp.arange(segment_size)[None, :]  # [B, S]
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def slice_audio_segments(y: Array, starts: Array, segment_samples: int,
                         hop: int) -> Array:
    """Slice waveform segments aligned with frame slices; y [B, N]."""
    idx = (starts * hop)[:, None] + jnp.arange(segment_samples)[None, :]
    return jnp.take_along_axis(y, idx, axis=1)


def infer(params, hp: VitsHParams,
          x_ids: Array, x_lengths: Array,
          max_frames: int,
          noise_scale: Array,
          length_scale: Array,
          noise_w: Array,
          sid: Optional[Array] = None,
          rng: Optional[Array] = None,
          dp_noise: Optional[Array] = None,
          prior_noise: Optional[Array] = None):
    """Inference (models.py:681-722) with a static frame budget.

    ``max_frames`` bounds the decoded length (bucketed by the engine). The
    true per-example frame count is returned so the host can trim. Noise
    can be injected (``dp_noise`` [B, T_x, 2], ``prior_noise``
    [B, max_frames, C]) for bit-exact verification against other runtimes;
    otherwise it is drawn from ``rng``.
    """
    if rng is None and (dp_noise is None or prior_noise is None):
        raise ValueError(
            "pass rng= or inject dp_noise AND prior_noise"
        )
    b, t_x = x_ids.shape
    dtype = params["enc_p"]["emb"]["weight"].dtype

    x_mask = nn.sequence_mask(x_lengths, t_x)[..., None].astype(dtype)
    x, m_p, logs_p = encoder.text_encoder(params["enc_p"], x_ids, x_mask)
    g = _speaker_embedding(params, hp, sid, b)

    if dp_noise is None:
        rng, sub = jax.random.split(rng)
        dp_noise = jax.random.normal(sub, (b, t_x, 2), dtype)
    if hp.use_sdp:
        logw = duration.sdp_reverse(
            params["dp"], x, x_mask,
            dp_noise.astype(dtype) * jnp.asarray(noise_w, dtype), g=g,
        )
    else:
        logw = duration.duration_predictor(params["dp"], x, x_mask, g=g)

    # duration arithmetic in f32 (bf16 cannot count frames exactly)
    w = jnp.exp(logw.astype(jnp.float32)) * x_mask.astype(jnp.float32) \
        * length_scale
    w_ceil = jnp.ceil(w)[..., 0]  # [B, T_x]
    y_lengths = jnp.maximum(
        jnp.sum(w_ceil, axis=-1), 1.0
    ).astype(jnp.int32)
    y_lengths = jnp.minimum(y_lengths, max_frames)

    y_mask = nn.sequence_mask(y_lengths, max_frames)[..., None].astype(dtype)
    attn_mask = y_mask * jnp.swapaxes(x_mask, 1, 2)  # [B, T_y, T_x]
    attn = nn.generate_path(w_ceil, attn_mask)

    m_p_exp, logs_p_exp = expand_prior(m_p, logs_p, w_ceil, y_mask,
                                       max_frames)

    if prior_noise is None:
        rng, sub = jax.random.split(rng)
        prior_noise = jax.random.normal(sub, m_p_exp.shape, dtype)
    z_p = m_p_exp + prior_noise.astype(dtype) * jnp.exp(logs_p_exp) \
        * jnp.asarray(noise_scale, dtype)
    z = posterior.coupling_flow(params["flow"], z_p, y_mask, g=g,
                                reverse=True)
    audio = decode_audio(params, hp, z * y_mask, g=g,
                         frame_lengths=y_lengths)
    return audio, y_lengths, attn


def voice_conversion(params, hp: VitsHParams, spec: Array,
                     spec_lengths: Array, sid_src: Array, sid_tgt: Array,
                     rng: Optional[Array] = None,
                     noise: Optional[Array] = None):
    """Convert an utterance between speakers (models.py:724-732).

    spec [B, T, C_spec] -> waveform in the target speaker's voice; requires
    a multi-speaker training checkpoint (posterior encoder weights).
    ``noise`` [B, T, inter_channels] can be injected for bit-exact
    verification against other runtimes; otherwise drawn from ``rng``.
    """
    if hp.n_speakers <= 1:
        raise ValueError("voice conversion requires a multi-speaker model")
    if rng is None and noise is None:
        raise ValueError("pass rng= or inject noise")
    b, t_y = spec.shape[:2]
    y_mask = nn.sequence_mask(spec_lengths, t_y)[..., None].astype(spec.dtype)
    g_src = nn.embedding(params["emb_g"], sid_src)[:, None, :]
    g_tgt = nn.embedding(params["emb_g"], sid_tgt)[:, None, :]

    if noise is None:
        noise = jax.random.normal(rng, (b, t_y, hp.inter_channels),
                                  spec.dtype)
    noise = noise.astype(spec.dtype)
    z, _m_q, _logs_q = posterior.posterior_encoder(
        params["enc_q"], spec, y_mask, noise, g=g_src,
    )
    z_p = posterior.coupling_flow(params["flow"], z, y_mask, g=g_src)
    z_hat = posterior.coupling_flow(params["flow"], z_p, y_mask, g=g_tgt,
                                    reverse=True)
    audio = decode_audio(params, hp, z_hat * y_mask, g=g_tgt,
                         frame_lengths=spec_lengths)
    return audio, y_mask


def expand_prior(m_p: Array, logs_p: Array, w_ceil: Array, y_mask: Array,
                 max_frames: int):
    """Expand (m_p, logs_p) [B, T_x, C] to frames [B, T_y, C] by GATHER.

    Frame y belongs to the first text position whose cumulative duration
    exceeds it, so its index is #(cum <= y) — bit-identical rows to the
    reference's einsum(one-hot-path, m_p) (models.py:663-665) at a
    fraction of the device time: the profiled generate_path+expand stage
    was 0.158 ms of the 0.73 ms single-stream step for ~12 MFLOP of real
    work, because the one-hot [B, T_y, T_x] build + two einsums
    dominate. ``nn.generate_path`` remains for callers that want the
    alignment matrix itself; jitted hot paths discard it and XLA
    dead-code-eliminates the one-hot build entirely.
    """
    t_x = m_p.shape[1]
    cum = jnp.cumsum(w_ceil, axis=-1)  # [B, T_x] f32, exact (< 2^24)
    frames = jnp.arange(max_frames, dtype=jnp.float32)
    idx = jnp.sum(cum[:, None, :] <= frames[None, :, None],
                  axis=-1)  # [B, T_y]
    idx = jnp.minimum(idx, t_x - 1).astype(jnp.int32)[..., None]
    m_p_exp = jnp.take_along_axis(m_p, idx, axis=1) * y_mask
    logs_p_exp = jnp.take_along_axis(logs_p, idx, axis=1) * y_mask
    return m_p_exp, logs_p_exp


def infer_durations(params, hp: VitsHParams, x_ids: Array, x_lengths: Array,
                    length_scale: Array, noise_w: Array,
                    sid: Optional[Array] = None,
                    dp_noise: Optional[Array] = None,
                    rng: Optional[Array] = None):
    """Phase-1 of two-phase synthesis: encoder + durations only.

    Returns (m_p, logs_p, w_ceil, x_mask, g). The host picks a frame
    bucket from sum(w_ceil) and dispatches phase 2 (:func:`infer_latents`
    + the decoder).
    """
    if rng is None and dp_noise is None:
        raise ValueError("pass rng= or inject dp_noise")
    b, t_x = x_ids.shape
    dtype = params["enc_p"]["emb"]["weight"].dtype
    x_mask = nn.sequence_mask(x_lengths, t_x)[..., None].astype(dtype)
    x, m_p, logs_p = encoder.text_encoder(params["enc_p"], x_ids, x_mask)
    g = _speaker_embedding(params, hp, sid, b)

    if dp_noise is None:
        rng, sub = jax.random.split(rng)
        dp_noise = jax.random.normal(sub, (b, t_x, 2), dtype)
    if hp.use_sdp:
        logw = duration.sdp_reverse(
            params["dp"], x, x_mask,
            dp_noise.astype(dtype) * jnp.asarray(noise_w, dtype), g=g,
        )
    else:
        logw = duration.duration_predictor(params["dp"], x, x_mask, g=g)
    w = jnp.exp(logw.astype(jnp.float32)) * x_mask.astype(jnp.float32) \
        * length_scale
    w_ceil = jnp.ceil(w)[..., 0]
    return m_p, logs_p, w_ceil, x_mask, g


def infer_latents(params, hp: VitsHParams, m_p: Array, logs_p: Array,
                  w_ceil: Array, x_mask: Array, max_frames: int,
                  noise_scale: Array, g: Optional[Array] = None,
                  prior_noise: Optional[Array] = None,
                  rng: Optional[Array] = None):
    """Expand prior to ``max_frames`` and reverse the flow -> latent frames.

    Returns (z * y_mask, y_lengths). The decoder (``decode_audio`` or the
    engine's chunked streaming decode) turns the latents into waveform —
    splitting here lets the decoder, which holds ~all the FLOPs after the
    256x upsampling, run incrementally.
    """
    if rng is None and prior_noise is None:
        raise ValueError("pass rng= or inject prior_noise")
    dtype = m_p.dtype
    y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=-1), 1.0).astype(jnp.int32)
    y_lengths = jnp.minimum(y_lengths, max_frames)
    y_mask = nn.sequence_mask(y_lengths, max_frames)[..., None].astype(dtype)
    m_p_exp, logs_p_exp = expand_prior(m_p, logs_p, w_ceil, y_mask,
                                       max_frames)

    if prior_noise is None:
        rng, sub = jax.random.split(rng)
        prior_noise = jax.random.normal(sub, m_p_exp.shape, dtype)
    z_p = m_p_exp + prior_noise.astype(dtype) * jnp.exp(logs_p_exp) \
        * jnp.asarray(noise_scale, dtype)
    z = posterior.coupling_flow(params["flow"], z_p, y_mask, g=g,
                                reverse=True)
    return z * y_mask, y_lengths


def infer_decode(params, hp: VitsHParams, m_p: Array, logs_p: Array,
                 w_ceil: Array, x_mask: Array, max_frames: int,
                 noise_scale: Array, g: Optional[Array] = None,
                 prior_noise: Optional[Array] = None,
                 rng: Optional[Array] = None):
    """Phase-2: expand prior to ``max_frames``, reverse flow, vocode."""
    z, y_lengths = infer_latents(
        params, hp, m_p, logs_p, w_ceil, x_mask, max_frames, noise_scale,
        g=g, prior_noise=prior_noise, rng=rng,
    )
    audio = decode_audio(params, hp, z, g=g, frame_lengths=y_lengths)
    return audio, y_lengths
