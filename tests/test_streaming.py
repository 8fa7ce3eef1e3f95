"""Chunked streaming decode == monolithic decode.

The streaming path (engine.synthesize_ids_streaming) decodes the latent
frames through the vocoder in overlapping windows; with the same seed the
concatenated stream must reproduce engine.synthesize_ids bit-for-fp
(the decoders are translation-invariant conv stacks — see
VitsEngine._get_decode_chunk). Capability beyond the reference, whose
synthesize (phoonnx/tts.py) yields only whole-sentence onnxruntime runs.
"""

import numpy as np
import pytest

import jax

from phoonnx_tpu.infer.engine import VitsEngine
from phoonnx_tpu.models.vits import model as vits_model
from phoonnx_tpu.models.vits.model import VitsHParams

IDS = [1, 5, 9, 3, 7, 2, 8, 4, 6, 1, 5, 9, 2, 7]


def _stream_vs_full(hp, chunk, overlap, atol=2e-5):
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    eng = VitsEngine(params, hp, text_buckets=(16, 32),
                     frame_buckets=(32, 64, 128, 256))
    full = eng.synthesize_ids(IDS, seed=42)
    chunks = list(eng.synthesize_ids_streaming(
        IDS, chunk_frames=chunk, overlap_frames=overlap, seed=42))
    assert len(chunks) > 1, "test must actually exercise multiple chunks"
    stream = np.concatenate(chunks)
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=atol)


def test_streaming_matches_monolithic_micro():
    # micro decoder receptive field ~7 latent frames; overlap 8 covers it
    _stream_vs_full(VitsHParams.preset("micro"), chunk=8, overlap=8)


def test_streaming_matches_monolithic_medium_decoder():
    """x-low preset carries the full medium HiFi-GAN decoder topology
    (upsample (8,8,4), resblock2 dilations up to 12 -> receptive field
    ~12 latent frames) — the deepest field the overlap must cover."""
    hp = VitsHParams.preset("x-low")
    _stream_vs_full(hp, chunk=8, overlap=16)


def test_streaming_matches_monolithic_istft():
    hp = VitsHParams.preset(
        "micro", decoder_type="istft", upsample_rates=(4,),
        upsample_kernel_sizes=(8,), istft_n_fft=16, istft_hop=4,
    )
    _stream_vs_full(hp, chunk=8, overlap=10)


def test_streaming_matches_monolithic_mb_istft():
    """Multi-band iSTFT: PQMF synthesis is one stride-N transposed conv,
    so chunked decode must still equal the monolithic decode."""
    hp = VitsHParams.preset(
        "micro", decoder_type="istft", upsample_rates=(4,),
        upsample_kernel_sizes=(8,), istft_n_fft=16, istft_hop=2,
        istft_bands=2,
    )
    _stream_vs_full(hp, chunk=8, overlap=12)


def test_streaming_final_chunk_overruns_frame_bucket():
    """When ceil(n_frames/chunk)*chunk exceeds the frame bucket, the final
    window's kept-span offset must be clamped WITH a matching emission
    skip — the unclamped arithmetic used to re-emit earlier audio."""
    hp = VitsHParams.preset("micro")
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    eng = VitsEngine(params, hp, text_buckets=(16, 32),
                     frame_buckets=(32, 64, 128, 256))
    full = eng.synthesize_ids(IDS, seed=42)
    up = hp.total_upsample
    n = len(full) // up
    bucket = next(b for b in (32, 64, 128, 256) if n <= b)
    overlap = 8  # covers the micro decoder receptive field
    trigger = None
    for chunk in range(overlap + 1, bucket - 2 * overlap):
        import math
        n_chunks = max(1, math.ceil(n / chunk))
        window = chunk + 2 * overlap
        i = n_chunks - 1
        start = min(max(i * chunk - overlap, 0), bucket - window)
        if i * chunk - start > window - chunk:
            trigger = chunk
            break
    assert trigger is not None, (
        f"no chunk size triggers the clamp for n={n} bucket={bucket}")
    chunks = list(eng.synthesize_ids_streaming(
        IDS, chunk_frames=trigger, overlap_frames=overlap, seed=42))
    stream = np.concatenate(chunks)
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=2e-5)


def test_streaming_single_chunk_short_utterance():
    hp = VitsHParams.preset("micro")
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    eng = VitsEngine(params, hp, text_buckets=(16,),
                     frame_buckets=(32, 64, 128, 256))
    ids = [1, 2]
    full = eng.synthesize_ids(ids, seed=7)
    chunks = list(eng.synthesize_ids_streaming(
        ids, chunk_frames=4096, overlap_frames=32, seed=7))
    assert len(chunks) == 1
    np.testing.assert_allclose(np.concatenate(chunks), full, atol=2e-5)


def test_streaming_pcm16_roundtrip():
    hp = VitsHParams.preset("micro")
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    eng = VitsEngine(params, hp, text_buckets=(16, 32),
                     frame_buckets=(32, 64, 128, 256), fetch_pcm16=True)
    full = eng.synthesize_ids(IDS, seed=3)
    stream = np.concatenate(list(eng.synthesize_ids_streaming(
        IDS, chunk_frames=8, overlap_frames=8, seed=3)))
    np.testing.assert_allclose(stream, full, atol=1.0 / 32767.0 + 2e-5)
