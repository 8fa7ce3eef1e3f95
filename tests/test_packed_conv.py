"""Channel-packed conv equivalence (nn.conv1d_packed and the packed
resblock/generator stages).

The packed form computes the same sums as the direct conv with a
different grouping — results must match to fp32 reassociation noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phoonnx_tpu.models.vits import hifigan, modules, nn
from phoonnx_tpu.models.vits import model as vits_model


@pytest.mark.parametrize("k,d,r", [
    (3, 1, 4), (3, 2, 4), (5, 2, 4), (5, 6, 4), (7, 3, 4), (7, 12, 4),
    (3, 1, 2), (5, 6, 2), (7, 12, 8), (1, 1, 4),
])
def test_conv1d_packed_matches_direct(k, d, r):
    rng = np.random.default_rng(k * 100 + d * 10 + r)
    c_in, c_out, t = 16, 24, 64
    x = jnp.asarray(rng.standard_normal((2, t, c_in)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c_out, c_in, k)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((c_out,)) * 0.1, jnp.float32)
    p = (k * d - d) // 2
    ref = nn.conv1d(x, w, b, padding=p, dilation=d)
    out = nn.conv1d_packed(x, w, b, dilation=d, padding=p, r=r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_packed_conv_taps_matches_kernel():
    w = jnp.ones((4, 4, 7), jnp.float32)
    wp, pad_l, pad_r = nn.build_packed_kernel(w, 4, 12, 36)
    assert wp.shape == (16, 16, nn.packed_conv_taps(7, 4, 12, 36))
    # every original weight appears exactly once
    assert float(wp.sum()) == pytest.approx(4 * 4 * 7 * 4)  # x r phases


def test_pack_ratio():
    assert nn.pack_ratio(32, 1024) == 4
    assert nn.pack_ratio(64, 1024) == 2
    assert nn.pack_ratio(128, 1024) == 1
    assert nn.pack_ratio(192, 1024) == 1
    assert nn.pack_ratio(32, 6) == 2  # T divisibility caps r
    assert nn.pack_ratio(32, 7) == 1


@pytest.mark.parametrize("T,I,O,K,s,r_in", [
    (8, 4, 6, 8, 4, 1), (8, 4, 6, 8, 4, 2), (16, 4, 6, 16, 8, 1),
    (16, 4, 6, 16, 8, 2), (12, 6, 4, 4, 2, 2), (16, 3, 5, 4, 2, 4),
])
def test_conv_transpose_packed_io_matches(T, I, O, K, s, r_in):
    p = (K - s) // 2
    rng = np.random.default_rng(T * 7 + r_in)
    x = jnp.asarray(rng.standard_normal((2, T, I)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((I, O, K)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((O,)) * 0.1, jnp.float32)
    ref = nn.conv_transpose1d(x, w, b, stride=s, padding=p)
    xp = x.reshape(2, T // r_in, r_in * I)
    yp = nn.conv_transpose1d_packed_io(x_p=xp, weight=w, bias=b,
                                       stride=s, padding=p, r_in=r_in)
    y = yp.reshape(2, (T // r_in) * s * r_in, O)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_conv_transpose_packed_io_rejects_bad_geometry():
    w = jnp.ones((4, 4, 7), jnp.float32)  # K != 2p + s
    x = jnp.ones((1, 8, 4), jnp.float32)
    with pytest.raises(ValueError):
        nn.conv_transpose1d_packed_io(x, w, stride=4, padding=1)


@pytest.mark.parametrize("which", ["resblock1", "resblock2"])
def test_packed_resblock_matches_with_mask(which):
    """Packed vs unpacked resblock under the zero_time_tail mask_fn
    contract: each path re-zeroes the bleed window after every conv, so
    the VALID spans must agree bit-for-bit with an exact-length run."""
    from functools import partial

    rng_np = np.random.default_rng(0)
    lens = [40, 64]
    x_np = (rng_np.standard_normal((2, 64, 32)) * 0.3).astype(np.float32)
    for i, n in enumerate(lens):
        x_np[i, n:] = 0.0
    x = jnp.asarray(x_np)
    valid = jnp.asarray(lens, jnp.int32)
    if which == "resblock1":
        params = modules.init_resblock1(jax.random.PRNGKey(3), 32, 3,
                                        (1, 3, 5))
        fn = modules.resblock1
        extent = (3 * 5 - 5) // 2
    else:
        params = modules.init_resblock2(jax.random.PRNGKey(4), 32, 5,
                                        (2, 6))
        fn = modules.resblock2
        extent = (5 * 6 - 6) // 2
    mask1 = partial(nn.zero_time_tail, valid=valid, r=1,
                    window_rows=nn.bleed_window_rows(extent, 1))
    mask4 = partial(nn.zero_time_tail, valid=valid, r=4,
                    window_rows=nn.bleed_window_rows(extent, 4))
    ref = fn(params, x, mask_fn=mask1, pack_r=1)
    out = fn(params, x, mask_fn=mask4, pack_r=4)
    # exact-length single decode pins the padding-invariance contract
    for i, n in enumerate(lens):
        solo = fn(params, x[i:i + 1, :n], pack_r=1)
        np.testing.assert_allclose(np.asarray(out)[i:i + 1, :n],
                                   np.asarray(solo), atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ref)[i:i + 1, :n],
                                   np.asarray(solo), atol=2e-5, rtol=1e-4)


def test_generator_packed_matches_unpacked():
    hp = vits_model.VitsHParams.preset("medium", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, hp.inter_channels)) * 0.3, jnp.float32)
    ref = hifigan.generator(params["dec"], z, pack_channels=False)
    out = hifigan.generator(params["dec"], z, pack_channels=True)
    assert ref.shape == out.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("preset", ["medium-istft", "medium-mb-istft"])
def test_istft_generator_packed_matches_unpacked(preset):
    from phoonnx_tpu.models.vits.istft_decoder import istft_generator

    hp = vits_model.VitsHParams.preset(preset, n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, hp.inter_channels)) * 0.3, jnp.float32)
    ref = istft_generator(params["dec"], z, pack_channels=False)
    out = istft_generator(params["dec"], z, pack_channels=True)
    assert ref.shape == out.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_generator_packed_grads_match():
    """Training goes through the same code path — check autodiff."""
    hp = vits_model.VitsHParams.preset("x-low", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    z = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 8, hp.inter_channels)) * 0.3, jnp.float32)

    def loss(dec_params, pack):
        y = hifigan.generator(dec_params, z, pack_channels=pack)
        return jnp.sum(y * y)

    g_ref = jax.grad(lambda p: loss(p, False))(params["dec"])
    g_pack = jax.grad(lambda p: loss(p, True))(params["dec"])
    flat_ref = jax.tree.leaves(g_ref)
    flat_pack = jax.tree.leaves(g_pack)
    assert len(flat_ref) == len(flat_pack)
    for a, b in zip(flat_ref, flat_pack):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-3)

# -- prebuilt packed kernels (engine-init precompute) -----------------------

@pytest.mark.parametrize("preset", ["medium", "medium-istft",
                                    "medium-mb-istft"])
def test_prebuilt_packed_decoder_bit_identical(preset):
    """pack_decoder_params moves kernel construction to init time; the
    decode must be BIT-identical (placement-only transform)."""
    hp = vits_model.VitsHParams.preset(preset, n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, hp.inter_channels)) * 0.3, jnp.float32)
    ref = vits_model.decode_audio(params, hp, z)
    packed = vits_model.pack_decoder_params(params, hp, t_frames=8)
    out = vits_model.decode_audio(packed, hp, z)
    assert ref.shape == out.shape
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_prebuilt_schedule_mismatch_falls_back():
    """Packed params built for one t_frames used at another length:
    guards must reject mismatched prebuilts and rebuild in-graph, so the
    output still matches to float noise."""
    hp = vits_model.VitsHParams.preset("medium", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    packed = vits_model.pack_decoder_params(params, hp, t_frames=8)
    for t in (6, 12):
        z = jnp.asarray(np.random.default_rng(t).standard_normal(
            (1, t, hp.inter_channels)) * 0.3, jnp.float32)
        ref = vits_model.decode_audio(params, hp, z)
        out = vits_model.decode_audio(packed, hp, z)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_pack_schedule_matches_built_entries():
    """decoder_pack_schedule is the dedupe key: equal schedules must mean
    content-identical pack_decoder_params results."""
    hp = vits_model.VitsHParams.preset("medium", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    sigs = {}
    for t in (64, 128, 256, 384, 512):
        sigs[t] = vits_model.decoder_pack_schedule(params, hp, t)
    groups = {}
    for t, sig in sigs.items():
        groups.setdefault(sig, []).append(t)
    for sig, ts in groups.items():
        if len(ts) < 2:
            continue
        a = vits_model.pack_decoder_params(params, hp, ts[0])
        b = vits_model.pack_decoder_params(params, hp, ts[1])
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(la) == len(lb)
        assert jax.tree.structure(a) == jax.tree.structure(b)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_engine_packed_cache_dedupes_and_matches():
    """VitsEngine._params_for_frames: schedule-equal buckets share one
    packed copy, and synthesis output is unchanged by the wiring."""
    from phoonnx_tpu.infer.engine import VitsEngine

    hp = vits_model.VitsHParams.preset("x-low", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    eng = VitsEngine(params, hp, text_buckets=(16,),
                     frame_buckets=(64, 128, 256))
    ids = list(np.random.default_rng(0).integers(1, 100, size=12))
    wav = eng.synthesize_ids(ids, seed=123)
    assert wav.ndim == 1 and wav.size > 0
    p64 = eng._params_for_frames(64)
    sig64 = vits_model.decoder_pack_schedule(params, hp, 64)
    sig128 = vits_model.decoder_pack_schedule(params, hp, 128)
    if sig64 == sig128:
        assert eng._params_for_frames(128) is p64
    # unpacked-engine output must be identical (prebuilt is placement-only)
    eng2 = VitsEngine(params, hp, text_buckets=(16,),
                      frame_buckets=(64, 128, 256))
    eng2._params_for_frames = lambda t: eng2.params
    wav2 = eng2.synthesize_ids(ids, seed=123)
    np.testing.assert_array_equal(wav, wav2)
