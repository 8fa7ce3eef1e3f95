"""Pseudo-QMF filter bank (analysis + synthesis) for multi-band vocoding.

Used by the multi-band iSTFT decoder (the full MB-iSTFT-VITS direction,
arXiv:2210.15975 §2.2): the network predicts N subband spectra, each is
inverted with a small iSTFT, and the PQMF synthesis bank upsamples and
recombines them into the full-rate waveform. The synthesis bank is a
stride-N transposed convolution — exactly the op the MXU is built for —
so the final N× upsampling costs one small conv instead of N× more
upsampled-domain convolutions.

Cosine-modulated near-perfect-reconstruction design (Nguyen 1994, as in
ParallelWaveGAN/MB-MelGAN): prototype lowpass = Kaiser-windowed sinc at
cutoff ~pi/2N, bands g_k[n] = 2 h[n] cos((2k+1) pi/2N (n - L/2) +
(-1)^k pi/4).
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def prototype_filter(taps: int = 62, cutoff_ratio: float = 0.142,
                     beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed sinc prototype lowpass, length taps+1."""
    n = np.arange(taps + 1, dtype=np.float64)
    m = n - taps / 2.0
    h_ideal = np.where(
        m == 0.0, cutoff_ratio,
        np.sin(np.pi * cutoff_ratio * m) / (np.pi * m + 1e-38),
    )
    return (h_ideal * np.kaiser(taps + 1, beta)).astype(np.float64)


def pqmf_filters(n_bands: int, taps: int = 62,
                 cutoff_ratio: float = None,
                 beta: float = 9.0) -> Tuple[np.ndarray, np.ndarray]:
    """(analysis [bands, L], synthesis [bands, L]) float32 filters."""
    if cutoff_ratio is None:
        # cutoffs grid-optimized for minimal reconstruction error at
        # taps=62 / beta=9 (N=4 lands on ParallelWaveGAN's 0.142);
        # reconstruction max error ~2-5e-3 on unit-variance noise
        cutoff_ratio = {2: 0.2668, 4: 0.1418, 8: 0.0793}.get(
            n_bands, 0.568 / n_bands)
    h = prototype_filter(taps, cutoff_ratio, beta)
    length = taps + 1
    n = np.arange(length, dtype=np.float64)
    analysis = np.zeros((n_bands, length), np.float64)
    synthesis = np.zeros((n_bands, length), np.float64)
    for k in range(n_bands):
        arg = ((2 * k + 1) * math.pi / (2 * n_bands) * (n - taps / 2.0))
        phase = (-1) ** k * math.pi / 4.0
        analysis[k] = 2.0 * h * np.cos(arg + phase)
        synthesis[k] = 2.0 * h * np.cos(arg - phase)
    return analysis.astype(np.float32), synthesis.astype(np.float32)


def pqmf_analysis(x: Array, analysis: np.ndarray, n_bands: int) -> Array:
    """[B, N] waveform -> [B, T/N, bands] subbands (critically sampled).

    Correlate with each band filter under full-left (causal) padding,
    then decimate by n_bands — the padding/decimation phase that makes
    the synthesis bank's alias terms cancel (validated numerically in
    tests/test_ops.py: max reconstruction error ~7e-4 on unit-variance
    noise). Total analysis+synthesis delay is taps//2 samples.
    """
    length = analysis.shape[1]
    w = jnp.asarray(analysis, x.dtype)[:, None, :]  # [O=bands, I=1, K]
    y = jax.lax.conv_general_dilated(
        x[:, :, None], w, window_strides=[n_bands],
        padding=[(length - 1, 0)],
        dimension_numbers=("NTC", "OIT", "NTC"),
    )
    return y  # [B, T/N, bands]


def pqmf_synthesis(subbands: Array, synthesis: np.ndarray,
                   n_bands: int) -> Array:
    """[B, T, bands] subbands -> [B, T*bands] waveform.

    Expand-by-N + band filter + sum, expressed as ONE stride-N transposed
    convolution (input-dilated conv), translation-invariant so the
    engine's chunked streaming decode works unchanged.
    """
    length = synthesis.shape[1]
    # weight [O=1, I=bands, K] in OIT layout, filters passed UN-reversed:
    # lax.conv_general_dilated computes correlation (no kernel flip), so
    # this realizes OLA with the filters as given. The ONNX mirror
    # (onnx/vits_graph.py) targets ConvTranspose — which DOES flip — and
    # therefore feeds synthesis[:, ::-1]; the two paths are equivalent,
    # not both-flipped. Padding centers the taps so the output is exactly
    # T*bands samples (validated against the explicit expand+filter
    # reference in tests/test_ops.py).
    w = jnp.asarray(synthesis, subbands.dtype)[:, None, :]
    pad_lo = length // 2
    pad_hi = length + n_bands - 2 - pad_lo
    y = jax.lax.conv_general_dilated(
        subbands, jnp.swapaxes(w, 0, 1),  # [O=1, I=bands, K] for OIT
        window_strides=[1],
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=[n_bands],
        dimension_numbers=("NTC", "OIT", "NTC"),
    )
    return y[:, :, 0] * n_bands  # [B, T*bands]
