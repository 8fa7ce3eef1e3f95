"""Inverse STFT with overlap-add, as MXU-friendly ops.

Used by the iSTFT decoder variant (models/vits/istft_decoder.py): the
inverse rFFT turns (magnitude, phase) frames into windowed time frames, and
the overlap-add is expressed as a transposed convolution with a diagonal
(window-scaled) kernel — one fused XLA op instead of a scatter loop.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from phoonnx_tpu.ops.stft import hann_window

Array = jax.Array


@lru_cache(maxsize=8)
def _ola_kernel(win_size: int) -> np.ndarray:
    """[I=win, O=1, K=win] kernel with kernel[i, 0, i] = window[i]."""
    window = hann_window(win_size)
    kernel = np.zeros((win_size, 1, win_size), np.float32)
    kernel[np.arange(win_size), 0, np.arange(win_size)] = window
    return kernel


def istft(magnitude: Array, phase: Array, n_fft: int, hop: int,
          win_size: int, frame_lengths: Array = None) -> Array:
    """(mag, phase) [B, T, F=n_fft//2+1] -> waveform [B, (T-1)*hop].

    Matches torch.istft with a periodic Hann window and center=True
    cropping of n_fft//2 samples on both ends, up to the window-envelope
    normalisation (computed exactly below). NOTE the center=True output
    length is (T-1)*hop (+ win - 2*pad extra, clipped to T*hop) — both
    in-repo decoders pad one extra frame so a T-frame decode yields
    exactly T*hop samples (istft_decoder.py). Only ``win_size == n_fft``
    is supported (every in-repo export satisfies it; the OLA kernel
    carries n_fft channels per frame).

    frame_lengths: optional [B] per-element valid frame counts. The
    window-envelope denominator then sums only the first
    ``frame_lengths[b]`` frames' windows, so a bucket-padded inversion
    (with the padded frames' magnitudes zeroed by the caller) is
    bit-equal to inverting exactly that many frames — without this the
    exact decode's PARTIAL tail envelope (fewer overlapping windows near
    its buffer end) diverges from the padded buffer's full envelope.
    """
    if win_size != n_fft:
        raise NotImplementedError(
            f"istft requires win_size == n_fft (got {win_size} != "
            f"{n_fft}); in-repo exports always satisfy this")
    spec = magnitude * jnp.exp(1j * phase.astype(jnp.complex64))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [B, T, n_fft]

    kernel = jnp.asarray(_ola_kernel(win_size))
    # overlap-add: transposed conv, stride=hop, kernel diag(window)
    audio = jax.lax.conv_general_dilated(
        frames,
        jnp.flip(kernel, axis=-1),
        window_strides=(1,),
        padding=[(win_size - 1, win_size - 1)],
        lhs_dilation=(hop,),
        dimension_numbers=("NTC", "IOT", "NTC"),
    )[..., 0]  # [B, (T-1)*hop + win]

    # window envelope normalisation: OLA of window^2 (the kernel already
    # multiplies by the window once, so feed plain window frames)
    t_frames = frames.shape[1]
    window = jnp.asarray(hann_window(win_size))
    if frame_lengths is None:
        env_frames = jnp.broadcast_to(
            window[None, None, :], (1, t_frames, win_size)
        )
    else:
        keep = (jnp.arange(t_frames)[None, :]
                < frame_lengths[:, None]).astype(window.dtype)
        env_frames = window[None, None, :] * keep[..., None]
    envelope = jax.lax.conv_general_dilated(
        env_frames,
        jnp.flip(kernel, axis=-1),
        window_strides=(1,),
        padding=[(win_size - 1, win_size - 1)],
        lhs_dilation=(hop,),
        dimension_numbers=("NTC", "IOT", "NTC"),
    )[..., 0]
    audio = audio / jnp.maximum(envelope, 1e-9)

    # center crop (torch.istft center=True semantics)
    pad = n_fft // 2
    return audio[:, pad:pad + (t_frames - 1) * hop + win_size - 2 * pad][
        :, : t_frames * hop
    ]
