"""Fused resblock-group Pallas kernel vs the XLA stage loop.

On CPU the kernel runs in interpreter mode (FORCE_INTERPRET), which
executes the same tap-matmul semantics the Mosaic compile does. The
comparison is a tight allclose, not bit-equality: XLA's conv lowering
and the kernel's tap matmuls accumulate in different orders (and CPU
XLA's threaded contractions are not even order-stable across
processes) — real defects (e.g. edge semantics) show up at 1e-3+,
float noise at ~1e-7. Hardware drives measured ~1e-5 on the full
decode on v5e.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phoonnx_tpu.models.vits import (fused_stage, hifigan, modules,
                                     model as vits_model)


@pytest.fixture(autouse=True)
def _interpret():
    fused_stage.FORCE_INTERPRET = True
    yield
    fused_stage.FORCE_INTERPRET = False


def _group_ref(blocks, x, pack_r):
    fn = modules.resblock1 if "convs1" in blocks[0] else modules.resblock2
    acc = None
    for b in blocks:
        out = fn(b, x, pack_r=pack_r, packed_io=pack_r > 1)
        acc = out if acc is None else acc + out
    return acc / len(blocks)


@pytest.mark.parametrize("stage,pack_r", [(0, 1), (1, 2), (2, 4)])
def test_fused_group_matches_rb2(stage, pack_r):
    hp = vits_model.VitsHParams.preset("medium", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    nk = params["dec"]["num_kernels"]
    blocks = params["dec"]["resblocks"][stage * nk:(stage + 1) * nk]
    spec = fused_stage.build_group_spec(blocks, pack_r,
                                        modules.LRELU_SLOPE)
    assert spec is not None
    # 1280 spans multiple 512-row tiles plus a ragged tail
    x = jnp.asarray(np.random.default_rng(stage).standard_normal(
        (2, 1280, 128)) * 0.5, jnp.float32)
    ref = _group_ref(blocks, x, pack_r)
    got = fused_stage.apply_group(spec, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_fused_group_matches_rb1():
    hp = vits_model.VitsHParams.preset("high", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(1), hp)
    nk = params["dec"]["num_kernels"]
    # last stage: C=32 packed r=4 — the only high-preset stage whose tap
    # set fits the VMEM budget
    n_stages = len(params["dec"]["ups"])
    blocks = params["dec"]["resblocks"][(n_stages - 1) * nk:
                                        n_stages * nk]
    assert "convs1" in blocks[0]
    spec = fused_stage.build_group_spec(blocks, 4, modules.LRELU_SLOPE)
    assert spec is not None
    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (1, 700, 128)) * 0.5, jnp.float32)
    ref = _group_ref(blocks, x, 4)
    got = fused_stage.apply_group(spec, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_fused_group_short_input():
    """t_len < TILE (single ragged tile, streaming windows)."""
    hp = vits_model.VitsHParams.preset("medium", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    nk = params["dec"]["num_kernels"]
    blocks = params["dec"]["resblocks"][2 * nk:3 * nk]
    spec = fused_stage.build_group_spec(blocks, 4, modules.LRELU_SLOPE)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 48, 128)) * 0.5, jnp.float32)
    ref = _group_ref(blocks, x, 4)
    got = fused_stage.apply_group(spec, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_packed_generator_uses_fused_and_matches():
    """End-to-end: pack_generator_params attaches specs; generator output
    must equal the un-fused packed path."""
    hp = vits_model.VitsHParams.preset("medium", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 17, hp.inter_channels)) * 0.3, jnp.float32)
    ref = hifigan.generator(params["dec"], z, pack_channels=True)
    packed = hifigan.pack_generator_params(params["dec"], t_frames=17)
    assert any(s is not None for s in packed["fused_stages"])
    got = hifigan.generator(packed, z, pack_channels=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_istft_packed_params_match():
    from phoonnx_tpu.models.vits.istft_decoder import (istft_generator,
                                                       pack_istft_params)

    hp = vits_model.VitsHParams.preset("medium-istft", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 16, hp.inter_channels)) * 0.3, jnp.float32)
    ref = istft_generator(params["dec"], z, pack_channels=True)
    packed = pack_istft_params(params["dec"], t_frames=16)
    got = istft_generator(packed, z, pack_channels=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_vmem_gate_returns_none():
    """Oversized tap sets (high preset early stages, C=256) must be
    rejected, keeping the XLA path."""
    hp = vits_model.VitsHParams.preset("high", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(1), hp)
    nk = params["dec"]["num_kernels"]
    blocks = params["dec"]["resblocks"][:nk]  # C=256 stage
    spec = fused_stage.build_group_spec(blocks, 1, modules.LRELU_SLOPE)
    assert spec is None


def test_post_epilogue_fused_into_last_stage():
    """conv_post+tanh ride the last stage kernel; output shape/values
    must match the unfused generator exactly (interpret mode)."""
    hp = vits_model.VitsHParams.preset("medium", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(2), hp)
    packed = hifigan.pack_generator_params(params["dec"], t_frames=16)
    last = packed["fused_stages"][-1]
    assert last is not None and "postW" in last
    assert "postW" not in (packed["fused_stages"][0] or {})
    z = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 16, hp.inter_channels)) * 0.3, jnp.float32)
    ref = hifigan.generator(params["dec"], z, pack_channels=True)
    got = hifigan.generator(packed, z, pack_channels=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
