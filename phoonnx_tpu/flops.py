"""Analytic FLOP counts for the VITS inference graph.

Closed-form MAC counts (x2 for FLOPs) derived from ``VitsHParams`` —
every shape is static per (text-bucket, frame-bucket), so the count is
exact for the dense linear algebra (convs, transposed convs, attention,
einsums). Elementwise work (activations, norms, masks, splines) is
excluded: it is O(T*C) against the O(T*C^2) conv terms.

Exists because XLA's ``cost_analysis()`` attributes ~zero FLOPs to the
Pallas custom-calls that hold most of the decoder compute on TPU (and
overcounts input-dilated transposed convs by the stride factor), so
bench MFU numbers derived from it were wrong by ~100x (VERDICT r2).
These are MODEL FLOPs — the math the graph must do — not implementation
FLOPs: the channel-packed TPU kernels deliberately spend up to
``pack_r`` times more multiplies to fill 128-wide lanes, and XLA pads
narrow channels either way. MFU computed from model FLOPs is therefore
conservative (the chip does strictly more arithmetic than counted).

Structure mirrors the reference graph (phoonnx_train/vits/models.py:
681-722): text encoder (attentions.py:161-360), SDP reverse
(models.py:14-117), prior expansion, residual coupling flow reverse
(models.py:212-254), HiFi-GAN / iSTFT decoder (models.py:299-368).
"""

from typing import Optional

from phoonnx_tpu.models.vits.model import VitsHParams

_REL_WINDOW = 4  # rel-pos attention window (attentions.py:21)


def _mm(m: float, n: float, k: float) -> float:
    """FLOPs of an [m,k]x[k,n] matmul / conv expressed as one."""
    return 2.0 * m * n * k


def text_encoder_flops(hp: VitsHParams, t_text: int) -> float:
    """Embedding-scale + n_layers x (windowed rel-pos MHA + conv FFN)
    + the (m, logs) projection."""
    t, h, f = t_text, hp.hidden_channels, hp.filter_channels
    per_layer = (
        4 * _mm(t, h, h)                    # q, k, v, out 1x1 projections
        + 2 * _mm(t, t, h)                  # QK^T scores + AV context
        + 2 * _mm(t, 2 * _REL_WINDOW + 1, h)  # rel-pos keys + values
        + 2 * _mm(t, f, h * hp.kernel_size)   # FFN convs (h->f->h, k taps)
    )
    proj = _mm(t, 2 * hp.inter_channels, h)
    return hp.n_layers * per_layer + proj


def _dds_conv_flops(t: int, ch: int, kernel: int, n_layers: int) -> float:
    """Depthwise-separable dilated stack (modules.py:81-129)."""
    per_layer = 2.0 * t * ch * kernel + _mm(t, ch, ch)  # depthwise + 1x1
    return n_layers * per_layer


def sdp_reverse_flops(hp: VitsHParams, t_text: int) -> float:
    """Stochastic duration predictor, reverse mode (models.py:88-117):
    conditioning trunk + 4 ConvFlow spline couplings over 2 channels."""
    t = t_text
    fc = hp.hidden_channels  # reference overrides filter_channels
    trunk = (_mm(t, fc, hp.hidden_channels)        # pre 1x1
             + _dds_conv_flops(t, fc, hp.kernel_size, 3)
             + _mm(t, fc, fc))                     # proj 1x1
    n_bins = 10
    per_cf = (_mm(t, fc, 1)                        # pre 1x1 (half=1)
              + _dds_conv_flops(t, fc, hp.kernel_size, 3)
              + _mm(t, 3 * n_bins - 1, fc))        # proj to spline params
    return trunk + 4 * per_cf


def flow_flops(hp: VitsHParams, frames: int,
               speaker: bool = False) -> float:
    """Residual coupling block, one direction (posterior.py /
    models.py:212-254): 4 couplings, each pre + WN(k=5, 4 layers) + post."""
    y, h, half = frames, hp.hidden_channels, hp.inter_channels // 2
    wn_layers = 4
    wn_kernel = 5
    per_wn_layer = _mm(y, 2 * h, h * wn_kernel) + _mm(y, 2 * h, h)
    per_coupling = (_mm(y, h, half)
                    + wn_layers * per_wn_layer
                    + _mm(y, half, h))
    cond = 0.0
    if speaker and hp.gin_channels:
        # 1x1 cond conv per coupling's WN (g is [B, 1, G]: t=1)
        cond = 4 * _mm(1, 2 * h * wn_layers, hp.gin_channels)
    return 4 * per_coupling + cond


def prior_expand_flops(hp: VitsHParams, t_text: int, frames: int) -> float:
    """attn @ m_p and attn @ logs_p einsums (models.py:663-665)."""
    return 2 * _mm(frames, hp.inter_channels, t_text)


def decoder_flops(hp: VitsHParams, frames: int) -> float:
    """HiFi-GAN (or iSTFT-head) decoder: conv_pre, per-stage transposed
    conv + resblock group, output head. Transposed-conv MACs counted in
    math form T_in*I*O*K (each input taps the kernel once), not XLA's
    input-dilated T_out*I*O*K overcount."""
    u0 = hp.upsample_initial_channel
    fl = _mm(frames, u0, hp.inter_channels * 7)  # conv_pre k7
    t = frames
    ch = u0
    convs_per_kernel = 2 if hp.resblock == "1" else 1
    for rate, kernel in zip(hp.upsample_rates, hp.upsample_kernel_sizes):
        ch_out = ch // 2
        fl += _mm(t, ch_out, ch * kernel)  # transposed conv (math MACs)
        t *= rate
        for k, dils in zip(hp.resblock_kernel_sizes,
                           hp.resblock_dilation_sizes):
            n_convs = convs_per_kernel * len(dils)
            fl += n_convs * _mm(t, ch_out, ch_out * k)
        ch = ch_out
    if hp.decoder_type == "istft":
        n_freqs = (hp.istft_n_fft // 2 + 1) * hp.istft_bands
        fl += 2 * _mm(t, n_freqs, ch * 7)  # conv_mag + conv_phase
        # iSTFT via dense DFT matrices at n_fft=16 + PQMF synthesis
        fl += 2 * _mm(t, hp.istft_n_fft, hp.istft_n_fft // 2 + 1)
        if hp.istft_bands > 1:
            taps = 63  # pqmf_filters default prototype length
            fl += _mm(t * hp.istft_hop * hp.istft_bands, 1,
                      hp.istft_bands * taps)
    else:
        fl += _mm(t, 1, ch * 7)  # conv_post k7
    return fl


def posterior_flops(hp: VitsHParams, frames: int) -> float:
    """Posterior encoder (posterior.py:18-49): pre 1x1 + WN(k=5, 16
    layers) + proj to 2*inter (model.py:145-148 fixes k=5, d=1, L=16)."""
    y, h = frames, hp.hidden_channels
    per_wn_layer = _mm(y, 2 * h, h * 5) + _mm(y, 2 * h, h)
    return (_mm(y, h, hp.spec_channels)
            + 16 * per_wn_layer
            + _mm(y, 2 * hp.inter_channels, h))


def sdp_nll_flops(hp: VitsHParams, t_text: int) -> float:
    """SDP training NLL (duration.py:75-143): main trunk + duration
    posterior trunk, then 4 posterior ConvFlows + 4 prior ConvFlows."""
    t = t_text
    fc = hp.hidden_channels
    trunk = (_mm(t, fc, hp.hidden_channels)
             + _dds_conv_flops(t, fc, hp.kernel_size, 3)
             + _mm(t, fc, fc))
    post_trunk = (_mm(t, fc, 1)
                  + _dds_conv_flops(t, fc, hp.kernel_size, 3)
                  + _mm(t, fc, fc))
    n_bins = 10
    per_cf = (_mm(t, fc, 1)
              + _dds_conv_flops(t, fc, hp.kernel_size, 3)
              + _mm(t, 3 * n_bins - 1, fc))
    return trunk + post_trunk + 8 * per_cf


def mas_flops(hp: VitsHParams, t_text: int, frames: int) -> float:
    """Alignment score matrix (model.py train path): the z_p/m_p
    neg-cent einsums over inter_channels; the O(T_y*T_x) dynamic
    program itself is excluded (comparisons, not MACs)."""
    return 2 * _mm(frames, t_text, hp.inter_channels)


def disc_p_flops(period: int, n_samples: int, channel_scale: int = 1,
                 kernel: int = 5, stride: int = 3) -> float:
    """One period discriminator forward (discriminator.py:48-92):
    fold [n] -> [n/p, p, 1], five (k,1) conv2d stages + post."""
    cs = channel_scale
    chans = [(1, 32 // cs), (32 // cs, 128 // cs),
             (128 // cs, 512 // cs), (512 // cs, 1024 // cs),
             (1024 // cs, 1024 // cs)]
    h = -(-n_samples // period)
    fl = 0.0
    for i, (i_ch, o_ch) in enumerate(chans):
        s = stride if i < len(chans) - 1 else 1
        h_out = -(-h // s)
        fl += _mm(h_out * period, o_ch, i_ch * kernel)
        h = h_out
    fl += _mm(h * period, 1, (1024 // cs) * 3)  # conv_post (3,1)
    return fl


def disc_s_flops(n_samples: int, channel_scale: int = 1) -> float:
    """Scale discriminator forward (discriminator.py:94-133): grouped
    strided 1d convs + post."""
    cs = channel_scale
    specs = [(1, 16 // cs, 15, 1, 1),
             (16 // cs, 64 // cs, 41, 4, 4),
             (64 // cs, 256 // cs, 41, 4, 16 // cs if cs <= 4 else 4),
             (256 // cs, 1024 // cs, 41, 4, 64 // cs),
             (1024 // cs, 1024 // cs, 41, 4, 256 // cs),
             (1024 // cs, 1024 // cs, 5, 1, 1)]
    t = n_samples
    fl = 0.0
    for i_ch, o_ch, k, s, groups in specs:
        t_out = -(-t // s)
        fl += _mm(t_out, o_ch, (i_ch // groups) * k)
        t = t_out
    fl += _mm(t, 1, (1024 // cs) * 3)
    return fl


def discriminator_flops(hp: VitsHParams, n_samples: int,
                        periods=(2, 3, 5, 7, 11),
                        channel_scale: int = 1) -> float:
    """One MPD+MSD forward over one waveform [n_samples]."""
    return (sum(disc_p_flops(p, n_samples, channel_scale)
                for p in periods)
            + disc_s_flops(n_samples, channel_scale))


def train_generator_fwd_flops(hp: VitsHParams, t_text: int,
                              frames: int) -> float:
    """train_forward (model.py:300-400): encoder, SDP NLL, posterior,
    flow forward, MAS scores, decoder on the SEGMENT."""
    return (text_encoder_flops(hp, t_text)
            + sdp_nll_flops(hp, t_text)
            + posterior_flops(hp, frames)
            + flow_flops(hp, frames)
            + mas_flops(hp, t_text, frames)
            + decoder_flops(hp, hp.segment_size))


def train_step_flops(hp: VitsHParams, t_text: int, frames: int,
                     periods=(2, 3, 5, 7, 11),
                     channel_scale: int = 1) -> float:
    """Analytic FLOPs of ONE fused G+D train step per batch element.

    Conventions (documented so the MFU denominator is auditable):
    backward-through-params+activations = 2x forward; the generator
    loss differentiates the full train_forward (3x fwd total). The
    discriminator runs 4 forwards per step — D(y), D(y_hat) in the
    generator loss and both again (stop-gradded inputs) in the
    discriminator loss — plus an input-gradient backward through
    D(y_hat) for the G update (~1x fwd) and a params backward for the
    D update (~2x fwd): 7x one discriminator forward in total.
    """
    seg_samples = hp.segment_size * hp.hop_length
    gen = 3.0 * train_generator_fwd_flops(hp, t_text, frames)
    disc = 7.0 * discriminator_flops(hp, seg_samples, periods,
                                     channel_scale)
    return gen + disc


def train_step_gflops(hp: VitsHParams, t_text: int, frames: int,
                      batch_size: int = 1,
                      periods=(2, 3, 5, 7, 11),
                      channel_scale: int = 1) -> float:
    return batch_size * train_step_flops(
        hp, t_text, frames, periods, channel_scale) / 1e9


def infer_flops(hp: VitsHParams, t_text: int, frames: int,
                speaker: bool = False) -> float:
    """Total model FLOPs of one inference forward at static buckets
    (text encoder -> SDP reverse -> prior expand -> flow reverse ->
    decoder)."""
    return (text_encoder_flops(hp, t_text)
            + sdp_reverse_flops(hp, t_text)
            + prior_expand_flops(hp, t_text, frames)
            + flow_flops(hp, frames, speaker=speaker)
            + decoder_flops(hp, frames))


def infer_gflops(hp: VitsHParams, t_text: int, frames: int,
                 speaker: bool = False) -> float:
    return infer_flops(hp, t_text, frames, speaker=speaker) / 1e9
