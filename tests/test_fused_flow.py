"""Fused inverse coupling-flow Pallas kernel vs the XLA reverse path.

Mirrors test_fused_encoder.py: FORCE_INTERPRET runs the exact kernel
semantics on CPU CI (the Mosaic compile on TPU executes the same
program). The XLA reference is posterior.coupling_flow(reverse=True)
over randomly-initialised init_residual_coupling_block params — with
the zero-init ``post`` convs replaced by random weights, since mean-only
coupling with m == 0 is the identity and would vacuously pass.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phoonnx_tpu.models.vits import fused_flow, nn, posterior

CH = 16  # inter_channels (192 in the real model); half = 8
HID = 32


@pytest.fixture(autouse=True)
def _interpret():
    fused_flow.FORCE_INTERPRET = True
    yield
    fused_flow.FORCE_INTERPRET = False


def _flow_params(gin_channels=0, n_flows=4, seed=0, channels=CH):
    params = posterior.init_residual_coupling_block(
        jax.random.PRNGKey(seed), channels=channels, hidden_channels=HID,
        kernel_size=5, dilation_rate=1, n_layers=4, n_flows=n_flows,
        gin_channels=gin_channels,
    )
    # zero-init post => m == 0 => reverse pass is the identity; randomise
    # so the comparison actually exercises the coupling math
    key = jax.random.PRNGKey(seed + 100)
    for flow in params["flows"]:
        key, kw, kb = jax.random.split(key, 3)
        w = flow["post"]["weight"]
        flow["post"]["weight"] = 0.3 * jax.random.normal(kw, w.shape,
                                                         w.dtype)
        b = flow["post"]["bias"]
        flow["post"]["bias"] = 0.3 * jax.random.normal(kb, b.shape, b.dtype)
    return params


def _mask(lengths, t):
    return nn.sequence_mask(jnp.asarray(lengths, jnp.int32),
                            t)[..., None].astype(jnp.float32)


def _reference(params, x, mask, g=None):
    # the pure-XLA reverse path (no fused_rev key present)
    return posterior.coupling_flow(params, x, mask, g=g, reverse=True)


def test_fused_matches_xla_reverse_padded():
    params = _flow_params()
    b, t = 2, 24
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, CH), jnp.float32)
    mask = _mask([24, 17], t)

    ref = _reference(params, x * mask, mask)
    spec = fused_flow.build_spec(params)
    assert spec is not None
    assert fused_flow.usable(spec, x)
    got = fused_flow.apply(spec, x * mask, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_matches_with_speaker_conditioning():
    gin = 8
    params = _flow_params(gin_channels=gin, seed=3)
    b, t = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(4), (b, t, CH), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(5), (b, 1, gin), jnp.float32)
    mask = _mask([16, 9], t)

    ref = _reference(params, x * mask, mask, g=g)
    spec = fused_flow.build_spec(params)
    got = fused_flow.apply(spec, x * mask, mask, g=g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_gin_mismatch_raises():
    spec_g = fused_flow.build_spec(_flow_params(gin_channels=8, seed=3))
    spec_nog = fused_flow.build_spec(_flow_params())
    x = jnp.zeros((1, 8, CH), jnp.float32)
    mask = _mask([8], 8)
    with pytest.raises(ValueError, match="no g was passed"):
        fused_flow.apply(spec_g, x, mask)
    with pytest.raises(ValueError, match="without gin_channels"):
        fused_flow.apply(spec_nog, x, mask,
                         g=jnp.zeros((1, 1, 8), jnp.float32))


def test_fused_padding_invariance():
    """Frame-bucket padding must not change valid rows (mask handling in
    the pre/WN/post stages and the coupled-half update)."""
    params = _flow_params(seed=7)
    spec = fused_flow.build_spec(params)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 32, CH), jnp.float32)
    short = fused_flow.apply(spec, x[:, :12] * _mask([12], 12),
                             _mask([12], 12))
    padded = fused_flow.apply(spec, x * _mask([12], 32), _mask([12], 32))
    np.testing.assert_allclose(np.asarray(padded)[:, :12],
                               np.asarray(short), atol=1e-5, rtol=1e-5)
    assert np.all(np.asarray(padded)[:, 12:] == 0.0)


def test_bf16_tracks_f32_truth():
    """bf16 weights/activations: the kernel accumulates in f32 (only
    storage is bf16), so it must stay near the f32 truth — the XLA bf16
    path, which rounds between all ~26 convs, drifts further."""
    params_f32 = _flow_params(seed=9)
    x_f32 = jax.random.normal(jax.random.PRNGKey(9), (1, 16, CH),
                              jnp.float32)
    mask = _mask([16], 16)
    truth = np.asarray(_reference(params_f32, x_f32, mask))

    params_bf = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        params_f32)
    spec = fused_flow.build_spec(params_bf)
    x_bf = x_f32.astype(jnp.bfloat16)
    assert fused_flow.usable(spec, x_bf)
    got = np.asarray(fused_flow.apply(
        spec, x_bf, mask.astype(jnp.bfloat16))).astype(np.float32)
    scale = max(1.0, float(np.max(np.abs(truth))))
    assert np.max(np.abs(got - truth)) / scale < 2e-2


def test_build_spec_refuses_unsupported():
    # odd n_flows: the folded-flip identity needs an even count
    assert fused_flow.build_spec(_flow_params(n_flows=3)) is None
    # non-mean-only post (emits mean+logs): out of the kernel's scope
    params = _flow_params()
    w = params["flows"][0]["post"]["weight"]
    params["flows"][0]["post"]["weight"] = jnp.concatenate([w, w], axis=0)
    params["flows"][0]["post"]["bias"] = jnp.concatenate(
        [params["flows"][0]["post"]["bias"]] * 2, axis=0)
    assert fused_flow.build_spec(params) is None
    # heterogeneous stack (mismatched hidden width across flows)
    params2 = _flow_params()
    other = posterior.init_residual_coupling_block(
        jax.random.PRNGKey(11), channels=CH, hidden_channels=HID * 2,
        kernel_size=5, dilation_rate=1, n_layers=4, n_flows=1,
    )
    params2["flows"][1] = other["flows"][0]
    assert fused_flow.build_spec(params2) is None
    # empty / missing flows
    assert fused_flow.build_spec({"flows": []}) is None


def test_usable_gates():
    spec = fused_flow.build_spec(_flow_params())
    ok = jnp.zeros((1, 16, CH), jnp.float32)
    assert fused_flow.usable(spec, ok)
    assert not fused_flow.usable(None, ok)
    # measured crossover: XLA amortizes per-op overhead past batch 8
    assert fused_flow.usable(spec, jnp.zeros((8, 16, CH)))
    assert not fused_flow.usable(spec, jnp.zeros((16, 16, CH)))
    # wrong channel width
    assert not fused_flow.usable(spec, jnp.zeros((1, 16, CH * 2)))
    # unsupported dtype
    assert not fused_flow.usable(spec, jnp.zeros((1, 16, CH), jnp.float16))


def test_engine_attaches_specs_to_base_params():
    """VitsEngine must attach the frame-independent fused specs to
    self.params at init (not only inside pack_decoder_params), so the
    phase-1/latents/streaming programs — which run on the base params —
    take the fused paths, and the fused output matches pure XLA."""
    from phoonnx_tpu.infer.engine import VitsEngine
    from phoonnx_tpu.models.vits import fused_encoder
    from phoonnx_tpu.models.vits import model as vits_model

    hp = vits_model.VitsHParams.preset("micro")
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    ids = [1, 5, 9, 3, 7, 2, 8, 4]

    fused_encoder.FORCE_INTERPRET = True
    try:
        eng = VitsEngine(params, hp, text_buckets=(16,),
                         frame_buckets=(32, 64))
        assert eng.params["flow"].get("fused_rev") is not None
        assert eng.params["enc_p"]["encoder"].get("fused") is not None
        fused_audio = eng.synthesize_ids(ids, seed=3)
    finally:
        fused_encoder.FORCE_INTERPRET = False
        fused_flow.FORCE_INTERPRET = False

    plain = VitsEngine(params, hp, text_buckets=(16,),
                       frame_buckets=(32, 64))
    assert plain.params["flow"].get("fused_rev") is None
    plain_audio = plain.synthesize_ids(ids, seed=3)
    assert fused_audio.shape == plain_audio.shape
    np.testing.assert_allclose(fused_audio, plain_audio,
                               atol=1e-4, rtol=1e-4)


def test_coupling_flow_dispatches_through_fused_spec():
    """posterior.coupling_flow must take the kernel path when fused_rev
    is attached and usable, and agree with the plain path."""
    params = _flow_params(seed=13)
    x = jax.random.normal(jax.random.PRNGKey(14), (1, 20, CH), jnp.float32)
    mask = _mask([20], 20)
    ref = posterior.coupling_flow(params, x, mask, reverse=True)
    with_spec = dict(params, fused_rev=fused_flow.build_spec(params))
    got = posterior.coupling_flow(with_spec, x, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
