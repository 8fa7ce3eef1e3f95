"""Bucket-padding invariance of the decoders.

The engine always decodes at a frame BUCKET; the reference slices z to
the true length before its decoder (models.py:721). Without masking,
conv biases make the padded region nonzero and later layers' taps bleed
it back into the tail of the valid span (measured ~5e-2 on random
weights). decode_audio's ``frame_lengths`` contract makes the padded
decode bit-equal to the exact-length decode; these tests pin it for
both decoder families, the channel-packed path, the fused Pallas stage
kernel (interpret mode), and the public engine path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits import nn
from phoonnx_tpu.models.vits.model import (
    VitsHParams,
    decode_audio,
    infer,
    random_params,
)

HP = VitsHParams(
    n_vocab=40, spec_channels=65, segment_size=16,
    inter_channels=64, hidden_channels=64, filter_channels=128,
    n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.0,
    resblock="2", resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 2), (2, 6)),
    upsample_rates=(4, 4), upsample_initial_channel=64,
    upsample_kernel_sizes=(8, 8),
)


def _decode(hp, params, z_true, pad_to, lengths=None):
    b, t, c = z_true.shape
    z = np.zeros((b, pad_to, c), np.float32)
    z[:, :t] = z_true
    fl = jnp.asarray(lengths if lengths is not None else [t] * b,
                     jnp.int32)
    return np.asarray(decode_audio(
        params, hp, jnp.asarray(z), g=None, frame_lengths=fl))


@pytest.mark.parametrize("pad_to", [16, 40, 64])
def test_hifigan_padded_decode_matches_exact(pad_to):
    params = random_params(jax.random.PRNGKey(0), HP)
    rng = np.random.default_rng(3)
    z = rng.standard_normal((1, 11, HP.inter_channels)).astype(np.float32)
    exact = np.asarray(decode_audio(params, HP, jnp.asarray(z), g=None))
    padded = _decode(HP, params, z, pad_to)
    n = exact.shape[1]
    np.testing.assert_allclose(padded[:, :n], exact, atol=1e-6)
    # without frame_lengths the contamination is real (guards against
    # the test passing vacuously)
    zp = np.zeros((1, pad_to, HP.inter_channels), np.float32)
    zp[:, :11] = z
    unmasked = np.asarray(decode_audio(params, HP, jnp.asarray(zp),
                                       g=None))
    assert np.abs(unmasked[:, :n] - exact).max() > 1e-4


@pytest.mark.parametrize("tail_impl", ["dus", "vmapdus", "mult"])
def test_hifigan_per_element_lengths(tail_impl):
    """Batched decode with DIFFERENT true lengths per element — under
    every batched tail-zeroing strategy (nn.TAIL_ZERO_IMPL): all three
    must satisfy the same bit-equality contract so the hardware A/B
    (tools/bench_tail_zero.py) can pick freely."""
    params = random_params(jax.random.PRNGKey(1), HP)
    rng = np.random.default_rng(4)
    up = HP.total_upsample
    lens = [7, 13]
    z = rng.standard_normal((2, 16, HP.inter_channels)).astype(np.float32)
    for b, n in enumerate(lens):
        z[b, n:] = 0.0
    orig = nn.TAIL_ZERO_IMPL
    nn.TAIL_ZERO_IMPL = tail_impl
    try:
        batched = _decode(HP, params, z, 16, lengths=lens)
    finally:
        nn.TAIL_ZERO_IMPL = orig
    for b, n in enumerate(lens):
        solo = np.asarray(decode_audio(
            params, HP, jnp.asarray(z[b: b + 1, :n]), g=None))
        np.testing.assert_allclose(batched[b: b + 1, : n * up], solo,
                                   atol=1e-6)


@pytest.mark.parametrize("preset", ["medium-istft", "medium-mb-istft"])
def test_istft_padded_decode_matches_exact(preset):
    hp = VitsHParams.preset(
        preset, n_vocab=40, spec_channels=65, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_layers=1,
        upsample_initial_channel=32,
    )
    params = random_params(jax.random.PRNGKey(2), hp)
    rng = np.random.default_rng(5)
    z = rng.standard_normal((1, 9, hp.inter_channels)).astype(np.float32)
    exact = np.asarray(decode_audio(params, hp, jnp.asarray(z), g=None))
    padded = _decode(hp, params, z, 32)
    n = exact.shape[1]
    np.testing.assert_allclose(padded[:, :n], exact, atol=2e-5)


def test_fused_stage_kernel_respects_valid_lengths():
    """The Pallas resblock-group kernel (interpret mode) must mask
    per-element valid TIME positions, sub-row when packed (r > 1)."""
    from phoonnx_tpu.models.vits import fused_stage, modules

    old = fused_stage.FORCE_INTERPRET
    fused_stage.FORCE_INTERPRET = True
    try:
        rng = jax.random.PRNGKey(3)
        c, r, rows = 32, 4, 16
        blocks = [modules.init_resblock2(rng, c, 3, (1, 2))]
        spec = fused_stage.build_group_spec(blocks, r,
                                            modules.LRELU_SLOPE)
        assert spec is not None
        nprng = np.random.default_rng(6)
        valid = 42  # NOT a multiple of r: exercises sub-row masking
        x_true = nprng.standard_normal((1, valid, c)).astype(np.float32)
        # exact: run the unpacked XLA resblock on the true length
        exact = np.asarray(modules.resblock2(blocks[0],
                                             jnp.asarray(x_true)))
        # padded packed view with garbage beyond valid
        x_pad = nprng.standard_normal((1, rows * r, c)).astype(np.float32)
        x_pad[0, :valid] = x_true[0]
        x_pad[0, valid:] = 7.0  # loud garbage: masking must kill it
        # pass the garbage UNMASKED: the kernel must mask its own input
        # taps from the scalar-prefetch lengths (the decoders no longer
        # zero anything ahead of a fused stage)
        packed = jnp.asarray(x_pad.reshape(1, rows, r * c))
        out = fused_stage.apply_group(spec, packed,
                                      valid=jnp.asarray([valid]))
        out = np.asarray(out).reshape(1, rows * r, c)
        np.testing.assert_allclose(out[:, :valid], exact[:, :valid],
                                   atol=1e-5)
    finally:
        fused_stage.FORCE_INTERPRET = old


def test_engine_bucketed_synthesis_matches_exact_infer():
    """Public engine path: bucketed synthesize_ids equals an
    exact-length, exact-frames ``infer`` with the same noise draws
    zeroed (noise scales 0 make the graph deterministic)."""
    from phoonnx_tpu.infer.engine import VitsEngine

    params = random_params(jax.random.PRNGKey(0), HP)
    ids = np.array([[1, 5, 9, 3, 7, 2, 11, 13]], np.int32)
    exact, ylen, _ = infer(
        params, HP, jnp.asarray(ids), jnp.asarray([8]), max_frames=8,
        noise_scale=jnp.float32(0.0), length_scale=jnp.float32(1.0),
        noise_w=jnp.float32(0.0),
        dp_noise=jnp.zeros((1, 8, 2), jnp.float32),
        prior_noise=jnp.zeros((1, 8, HP.inter_channels), jnp.float32))
    exact = np.asarray(exact)
    n = int(ylen[0]) * HP.total_upsample

    engine = VitsEngine(params, HP)
    audio = engine.synthesize_ids(list(ids[0]), noise_scale=0.0,
                                  noise_w=0.0, seed=0)
    assert len(audio) == n
    np.testing.assert_allclose(audio, exact[0, :n], atol=1e-6)


def test_bleed_extent_covers_wide_transposed_conv():
    """An imported voice can carry upsample kernels much wider than
    2*rate; the transposed conv then reads ceil(padding/rate) positions
    past `valid` — more than the resblock extent. The zero_time_tail
    window must be sized from the ACTUAL geometry or bit-equality
    silently breaks (found by review: the extent hard-coded the
    transposed-conv term as <= 1)."""
    from phoonnx_tpu.models.vits.hifigan import _bleed_extent

    hp = VitsHParams(
        n_vocab=40, spec_channels=65, segment_size=16,
        inter_channels=32, hidden_channels=32, filter_channels=64,
        n_heads=2, n_layers=1, kernel_size=3, p_dropout=0.0,
        resblock="2", resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        upsample_rates=(3, 2), upsample_initial_channel=32,
        upsample_kernel_sizes=(33, 4),
    )
    params = random_params(jax.random.PRNGKey(2), hp)
    # geometry check: ceil(((33-3)//2)/3) = 5 > the resblock extent
    assert _bleed_extent(params["dec"]) >= 5
    rng = np.random.default_rng(9)
    z = rng.standard_normal((2, 9, hp.inter_channels)).astype(np.float32)
    lens = [5, 9]
    for b, n in enumerate(lens):
        z[b, n:] = 0.0
    zp = np.zeros((2, 24, hp.inter_channels), np.float32)
    zp[:, :9] = z
    padded = np.asarray(decode_audio(
        params, hp, jnp.asarray(zp), g=None,
        frame_lengths=jnp.asarray(lens, jnp.int32)))
    up = hp.total_upsample
    for b, n in enumerate(lens):
        solo = np.asarray(decode_audio(
            params, hp, jnp.asarray(z[b: b + 1, :n]), g=None))
        np.testing.assert_allclose(padded[b: b + 1, : n * up], solo,
                                   atol=1e-6)
