"""Fused text-encoder Pallas kernel vs the XLA layer stack.

On CPU the kernel runs in interpreter mode (FORCE_INTERPRET), executing
the same banded-relative-attention / tap-FFN semantics the Mosaic
compile does. CPU dots are true f32 on both paths, so the comparison is
tight (~1e-6); on TPU both paths round matmul inputs through bf16 in
different orders, and hardware drives measured ~1.3e-2 XLA-vs-kernel at
default precision while kernel-at-HIGHEST matches an XLA-highest
reference at 1.2e-6 (see fused_encoder module docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phoonnx_tpu.models.vits import (attention, encoder, fused_encoder,
                                     model as vits_model, nn)


@pytest.fixture(autouse=True)
def _interpret():
    fused_encoder.FORCE_INTERPRET = True
    yield
    fused_encoder.FORCE_INTERPRET = False


def _params(hidden=32, n_filter=64, heads=2, layers=3, kernel=3, window=4,
            seed=0):
    return attention.init_encoder(
        jax.random.PRNGKey(seed), hidden_channels=hidden,
        filter_channels=n_filter, n_heads=heads, n_layers=layers,
        kernel_size=kernel, window_size=window,
    )


def _mask(lengths, t):
    return nn.sequence_mask(jnp.asarray(lengths, jnp.int32),
                            t)[..., None].astype(jnp.float32)


@pytest.mark.parametrize("kernel_size", [3, 1])
def test_fused_matches_xla_stack(kernel_size):
    params = _params(kernel=kernel_size)
    b, t, h = 2, 16, 32
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, h), jnp.float32)
    mask = _mask([16, 11], t)

    ref = attention.encoder(params, x * mask, mask)
    spec = fused_encoder.build_spec(params)
    assert spec is not None
    assert fused_encoder.usable(spec, x)
    got = fused_encoder.apply(spec, x * mask, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_masks_padded_rows():
    params = _params()
    b, t, h = 1, 12, 32
    x = jax.random.normal(jax.random.PRNGKey(2), (b, t, h), jnp.float32)
    mask = _mask([7], t)
    got = np.asarray(fused_encoder.apply(
        fused_encoder.build_spec(params), x * mask, mask))
    assert np.all(got[:, 7:] == 0.0)


def test_fused_padding_invariance():
    """Synthesis pads to text buckets: extra padded rows must not change
    the valid rows' output (key-masking + FFN masking correctness)."""
    params = _params()
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 24, 32), jnp.float32)
    spec = fused_encoder.build_spec(params)
    short = fused_encoder.apply(spec, x[:, :10] * _mask([10], 10),
                                _mask([10], 10))
    padded = fused_encoder.apply(spec, x * _mask([10], 24), _mask([10], 24))
    np.testing.assert_allclose(np.asarray(padded)[:, :10],
                               np.asarray(short), atol=1e-5, rtol=1e-5)


def test_build_spec_refuses_unsupported():
    no_window = attention.init_encoder(
        jax.random.PRNGKey(0), hidden_channels=32, filter_channels=64,
        n_heads=2, n_layers=1, kernel_size=3, window_size=None,
    )
    assert fused_encoder.build_spec(no_window) is None
    # per-head (non-shared) relative tables are out of scope
    per_head = _params(layers=1)
    rel = per_head["layers"][0]["attn"]["emb_rel_k"]
    per_head["layers"][0]["attn"]["emb_rel_k"] = jnp.tile(rel, (2, 1, 1))
    assert fused_encoder.build_spec(per_head) is None


def test_usable_gates():
    params = _params(window=4)
    spec = fused_encoder.build_spec(params)
    ok = jnp.zeros((1, 16, 32), jnp.float32)
    assert fused_encoder.usable(spec, ok)
    # T <= window: the banded-diagonal identity needs T > window
    assert not fused_encoder.usable(spec, jnp.zeros((1, 4, 32)))
    # measured crossover: XLA amortizes per-op overhead past batch 8
    assert fused_encoder.usable(spec, jnp.zeros((8, 16, 32)))
    assert not fused_encoder.usable(spec, jnp.zeros((16, 16, 32)))
    # wrong hidden width
    assert not fused_encoder.usable(spec, jnp.zeros((1, 16, 64)))
    assert not fused_encoder.usable(spec, ok, deterministic=False)
    assert not fused_encoder.usable(None, ok)


def test_resolve_precision_maps_high_to_highest():
    assert fused_encoder.resolve_precision(None) is None
    hi = jax.lax.Precision.HIGHEST
    assert fused_encoder.resolve_precision(hi) is hi
    with jax.default_matmul_precision("high"):
        assert fused_encoder.resolve_precision(None) is hi
    with jax.default_matmul_precision("highest"):
        # ambient highest resolves inside the dots themselves
        assert fused_encoder.resolve_precision(None) is None


def test_precision_kwarg_matches_default_on_cpu():
    """CPU dots are true f32 either way; HIGHEST must be a no-op here."""
    params = _params(layers=2)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 32), jnp.float32)
    mask = _mask([16], 16)
    spec = fused_encoder.build_spec(params)
    a = fused_encoder.apply(spec, x, mask)
    b = fused_encoder.apply(spec, x, mask,
                            precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)


def test_pack_decoder_params_attaches_spec_and_infer_matches():
    hp = vits_model.VitsHParams(
        n_vocab=40, spec_channels=65, segment_size=16,
        inter_channels=32, hidden_channels=32, filter_channels=64,
        n_heads=2, n_layers=2,
        resblock="2", resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        upsample_rates=(4, 4), upsample_initial_channel=32,
        upsample_kernel_sizes=(8, 8),
        filter_length=128, hop_length=16, win_length=128, mel_channels=20,
        sample_rate=16000,
    )
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    packed = vits_model.pack_decoder_params(params, hp, 64)
    assert packed["enc_p"]["encoder"].get("fused") is not None

    ids = jnp.asarray([[5, 9, 3, 7, 1, 2, 8, 4]], jnp.int32)
    lengths = jnp.asarray([8], jnp.int32)
    kw = dict(max_frames=64, noise_scale=jnp.float32(0.667),
              length_scale=jnp.float32(1.0), noise_w=jnp.float32(0.8),
              rng=jax.random.PRNGKey(7))
    a_ref, len_ref, _ = vits_model.infer(params, hp, ids, lengths, **kw)
    a_fused, len_fused, _ = vits_model.infer(packed, hp, ids, lengths, **kw)
    assert int(len_ref[0]) == int(len_fused[0])
    np.testing.assert_allclose(np.asarray(a_fused), np.asarray(a_ref),
                               atol=1e-4, rtol=1e-4)


def test_text_encoder_fused_path_matches():
    enc_params = encoder.init_text_encoder(
        jax.random.PRNGKey(0), n_vocab=40, out_channels=16,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=2,
        kernel_size=3,
    )
    spec = fused_encoder.build_spec(enc_params["encoder"])
    fused_params = dict(enc_params)
    fused_params["encoder"] = dict(enc_params["encoder"], fused=spec)

    ids = jnp.asarray([[5, 9, 3, 7, 1, 0, 0, 0]], jnp.int32)
    mask = _mask([5], 8)
    x_r, m_r, s_r = encoder.text_encoder(enc_params, ids, mask)
    x_f, m_f, s_f = encoder.text_encoder(fused_params, ids, mask)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_r), atol=1e-5)
