"""Numerical parity: JAX VITS vs the reference torch implementation.

Loads the reference torch modules (with a stubbed monotonic_align), copies
the torch state_dict into our parameter pytree via the checkpoint importer,
and compares outputs with identical injected noise. This validates both the
math and the checkpoint name mapping (the ONNX initializers keep these
names, export_onnx.py:318-327).
"""

import sys
import types
from unittest import mock

import numpy as np
import pytest

from .conftest import REFERENCE_PATH, requires_reference

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from phoonnx_tpu.models.vits import nn as jnn  # noqa: E402
from phoonnx_tpu.models.vits.load import params_from_flat  # noqa: E402
from phoonnx_tpu.models.vits.model import VitsHParams  # noqa: E402
from phoonnx_tpu.ops.mas import maximum_path_numpy  # noqa: E402

TOL = 2e-4


@pytest.fixture(scope="module")
def ref():
    """Reference torch modules with MAS stubbed to our numpy oracle."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    stub = types.ModuleType("phoonnx_train.vits.monotonic_align")

    def maximum_path(neg_cent, mask):
        path = maximum_path_numpy(
            neg_cent.detach().cpu().numpy(), mask.detach().cpu().numpy()
        )
        return torch.from_numpy(path).to(neg_cent.dtype)

    stub.maximum_path = maximum_path
    import phoonnx_train.vits  # noqa: F401

    sys.modules["phoonnx_train.vits.monotonic_align"] = stub
    import phoonnx_train.vits.models as ref_models
    import phoonnx_train.vits.modules as ref_modules
    import phoonnx_train.vits.attentions as ref_attentions
    import phoonnx_train.vits.transforms as ref_transforms

    return types.SimpleNamespace(
        models=ref_models, modules=ref_modules, attentions=ref_attentions,
        transforms=ref_transforms,
    )


def to_np(t):
    return t.detach().cpu().numpy()


def state_dict_np(module):
    return {k: to_np(v) for k, v in module.state_dict().items()}


TEST_HP = VitsHParams(
    n_vocab=40,
    spec_channels=65,
    segment_size=16,
    inter_channels=64,
    hidden_channels=64,
    filter_channels=128,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.0,
    resblock="2",
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 2), (2, 6)),
    upsample_rates=(4, 4),
    upsample_initial_channel=64,
    upsample_kernel_sizes=(8, 8),
)


def make_ref_synth(ref, hp: VitsHParams, n_speakers=1, gin=0):
    torch.manual_seed(0)
    return _make_ref_synth_full(ref, hp, n_speakers, gin)


def _make_ref_synth_full(ref, hp, n_speakers, gin):
    return ref.models.SynthesizerTrn(
        n_vocab=hp.n_vocab,
        spec_channels=hp.spec_channels,
        segment_size=hp.segment_size,
        inter_channels=hp.inter_channels,
        hidden_channels=hp.hidden_channels,
        filter_channels=hp.filter_channels,
        n_heads=hp.n_heads,
        n_layers=hp.n_layers,
        kernel_size=hp.kernel_size,
        p_dropout=0.0,
        resblock=hp.resblock,
        resblock_kernel_sizes=hp.resblock_kernel_sizes,
        resblock_dilation_sizes=hp.resblock_dilation_sizes,
        upsample_rates=hp.upsample_rates,
        upsample_initial_channel=hp.upsample_initial_channel,
        upsample_kernel_sizes=hp.upsample_kernel_sizes,
        n_speakers=n_speakers,
        gin_channels=gin,
        use_sdp=hp.use_sdp,
    ).eval()


# ---------------------------------------------------------------------------
# Primitive parity
# ---------------------------------------------------------------------------


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 11, 7)).astype(np.float32)  # [B,T,C]
    w = rng.standard_normal((5, 7, 3)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    ours = jnn.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                      padding=2, dilation=2)
    theirs = torch.nn.functional.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
        torch.from_numpy(b), padding=2, dilation=2,
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_grouped_conv_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 9, 6)).astype(np.float32)
    w = rng.standard_normal((6, 1, 3)).astype(np.float32)  # depthwise
    ours = jnn.conv1d(jnp.asarray(x), jnp.asarray(w), padding=1, groups=6)
    theirs = torch.nn.functional.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
        padding=1, groups=6,
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


@pytest.mark.parametrize("stride,kernel", [(4, 8), (2, 4), (8, 16)])
def test_conv_transpose_matches_torch(stride, kernel):
    rng = np.random.default_rng(2)
    in_ch, out_ch = 6, 4
    x = rng.standard_normal((2, 10, in_ch)).astype(np.float32)
    w = rng.standard_normal((in_ch, out_ch, kernel)).astype(np.float32)
    b = rng.standard_normal(out_ch).astype(np.float32)
    padding = (kernel - stride) // 2
    ours = jnn.conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), stride=stride,
                                padding=padding)
    theirs = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
        torch.from_numpy(b), stride=stride, padding=padding,
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


@requires_reference
def test_spline_matches_reference(ref):
    from phoonnx_tpu.models.vits.transforms import (
        piecewise_rational_quadratic_transform,
    )

    rng = np.random.default_rng(3)
    shape = (2, 7, 1)
    inputs = (rng.standard_normal(shape) * 3).astype(np.float32)
    uw = rng.standard_normal(shape + (10,)).astype(np.float32)
    uh = rng.standard_normal(shape + (10,)).astype(np.float32)
    ud = rng.standard_normal(shape + (9,)).astype(np.float32)

    for inverse in (False, True):
        ours, ld = piecewise_rational_quadratic_transform(
            jnp.asarray(inputs), jnp.asarray(uw), jnp.asarray(uh),
            jnp.asarray(ud), inverse=inverse, tails="linear", tail_bound=5.0,
        )
        theirs, ld_t = ref.transforms.piecewise_rational_quadratic_transform(
            torch.from_numpy(inputs), torch.from_numpy(uw),
            torch.from_numpy(uh), torch.from_numpy(ud), inverse=inverse,
            tails="linear", tail_bound=5.0,
        )
        np.testing.assert_allclose(np.asarray(ours), to_np(theirs), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ld), to_np(ld_t), atol=1e-5)


def test_spline_bf16_no_bin_collapse():
    """bf16 knot positions near the tail bound quantize to 0.03125 —
    coarser than the 0.01 minimum bin — so a pure-bf16 spline collapses
    bins to zero width (delta = h/w -> inf -> NaN). Caught by a real
    bf16 training run in round 5: the NaN lived in MASKED lanes (every
    loss stayed finite) while poisoning all duration-predictor
    parameter gradients. The transform must upcast half precision and
    compute in f32 (transforms.rational_quadratic_spline docstring)."""
    from phoonnx_tpu.models.vits.transforms import (
        piecewise_rational_quadratic_transform,
    )

    num_bins = 10
    n = 64
    # one dominant width logit pushes the later knots toward +5 where
    # the 0.01-wide minimum bins sit inside one bf16 quantum
    uw = np.zeros((n, num_bins), np.float32)
    uw[:, 0] = 12.0
    uh = np.zeros((n, num_bins), np.float32)
    ud = np.zeros((n, num_bins - 1), np.float32)
    x = np.linspace(4.90, 4.999, n).astype(np.float32)
    # pin: this case DOES collapse a bin when knots are built in bf16
    from phoonnx_tpu.models.vits import transforms as T

    _, widths16 = T._bin_positions(
        jnp.asarray(uw, jnp.bfloat16), num_bins, 1e-3, -5.0, 5.0)
    assert float(jnp.min(widths16)) == 0.0

    def run(dtype, xs):
        out, ld = piecewise_rational_quadratic_transform(
            jnp.asarray(xs, dtype), jnp.asarray(uw, dtype),
            jnp.asarray(uh, dtype), jnp.asarray(ud, dtype),
            tails="linear", tail_bound=5.0)
        return np.asarray(out, np.float32), np.asarray(ld, np.float32)

    out16, ld16 = run(jnp.bfloat16, x)
    assert np.isfinite(out16).all()
    assert np.isfinite(ld16).all()
    # value check vs f32 evaluated at the bf16-quantized inputs (input
    # rounding is the only legitimate half-precision difference left)
    xq = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    out32, ld32 = run(jnp.float32, xq)
    np.testing.assert_allclose(out16, out32, atol=0.05)
    np.testing.assert_allclose(ld16, ld32, atol=0.1)
    # gradients through the bf16 spline must be finite too (the
    # training failure mode was NaN param-grads with finite losses)
    def loss(u):
        out, ld = piecewise_rational_quadratic_transform(
            jnp.asarray(x, jnp.bfloat16), u,
            jnp.asarray(uh, jnp.bfloat16), jnp.asarray(ud, jnp.bfloat16),
            tails="linear", tail_bound=5.0)
        return (out.astype(jnp.float32).sum()
                + ld.astype(jnp.float32).sum())

    grad = jax.grad(loss)(jnp.asarray(uw, jnp.bfloat16))
    assert bool(jnp.isfinite(grad.astype(jnp.float32)).all())


# ---------------------------------------------------------------------------
# Module parity (random weights transferred from torch)
# ---------------------------------------------------------------------------


@requires_reference
def test_wn_matches_reference(ref):
    torch.manual_seed(4)
    hidden, t = 16, 12
    ref_wn = ref.modules.WN(hidden, kernel_size=5, dilation_rate=1,
                            n_layers=3).eval()
    sd = state_dict_np(ref_wn)

    from phoonnx_tpu.models.vits.modules import init_wn, wn

    params = init_wn(jax.random.PRNGKey(0), hidden, 5, 1, 3)
    for i in range(3):
        for src, dst in (("in_layers", "in_layers"),
                         ("res_skip_layers", "res_skip_layers")):
            params[dst][i]["weight_v"] = jnp.asarray(sd[f"{src}.{i}.weight_v"])
            params[dst][i]["weight_g"] = jnp.asarray(sd[f"{src}.{i}.weight_g"])
            params[dst][i]["bias"] = jnp.asarray(sd[f"{src}.{i}.bias"])

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, t, hidden)).astype(np.float32)
    mask = np.ones((2, t, 1), np.float32)
    mask[1, -3:] = 0

    ours = wn(params, jnp.asarray(x), jnp.asarray(mask))
    with torch.no_grad():
        theirs = ref_wn(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(mask.transpose(0, 2, 1)),
        ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


@requires_reference
def test_text_encoder_matches_reference(ref):
    torch.manual_seed(6)
    ref_enc = ref.models.TextEncoder(
        n_vocab=40, out_channels=64, hidden_channels=64, filter_channels=128,
        n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.0,
    ).eval()
    named = {f"enc_p.{k}": v for k, v in state_dict_np(ref_enc).items()}
    # encoder-only weights: a deliberate partial load (strict now also
    # rejects checkpoints with unfilled leaves)
    params = params_from_flat(named, TEST_HP, strict=False)

    from phoonnx_tpu.models.vits.encoder import text_encoder
    from phoonnx_tpu.models.vits.nn import sequence_mask

    ids = np.array([[1, 5, 9, 3, 7, 2, 0, 0], [4, 8, 2, 6, 0, 0, 0, 0]],
                   np.int32)
    lengths = np.array([6, 4], np.int64)
    x_mask = sequence_mask(jnp.asarray(lengths), 8)[..., None].astype(
        jnp.float32
    )
    x, m, logs = text_encoder(params["enc_p"], jnp.asarray(ids), x_mask)

    with torch.no_grad():
        xt, mt, logst, maskt = ref_enc(
            torch.from_numpy(ids.astype(np.int64)),
            torch.from_numpy(lengths),
        )
    np.testing.assert_allclose(np.asarray(x), to_np(xt).transpose(0, 2, 1),
                               atol=TOL)
    np.testing.assert_allclose(np.asarray(m), to_np(mt).transpose(0, 2, 1),
                               atol=TOL)
    np.testing.assert_allclose(np.asarray(logs),
                               to_np(logst).transpose(0, 2, 1), atol=TOL)


# ---------------------------------------------------------------------------
# Full model parity
# ---------------------------------------------------------------------------


@requires_reference
def test_full_infer_matches_reference(ref):
    _full_infer_parity(ref, TEST_HP)


@requires_reference
def test_full_infer_non_sdp_matches_reference(ref):
    """Deterministic DurationPredictor (use_sdp=False; models.py:120-165
    and the dp branch of infer, models.py:694-699)."""
    from dataclasses import replace

    _full_infer_parity(ref, replace(TEST_HP, use_sdp=False))


@requires_reference
def test_full_infer_resblock1_matches_reference(ref):
    """The 'high' preset's decoder path (ResBlock1: three dilated convs
    per kernel with post-convs, rates (8,8,2,2) topology shrunk)."""
    from dataclasses import replace

    hp = replace(
        TEST_HP,
        resblock="1",
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        upsample_rates=(4, 2, 2),
        upsample_kernel_sizes=(8, 4, 4),
    )
    _full_infer_parity(ref, hp)


def _full_infer_parity(ref, hp):
    synth = make_ref_synth(ref, hp)
    params = params_from_flat(state_dict_np(synth), hp, strict=True)

    ids = np.array([[1, 5, 9, 3, 7, 2, 11, 13]], np.int64)
    lengths = np.array([8], np.int64)

    rng = np.random.default_rng(7)
    dp_noise = rng.standard_normal((1, 2, 8)).astype(np.float32)

    noise_scale, length_scale, noise_w = 0.667, 1.0, 0.8

    randn_calls = []

    def fake_randn(*shape, **kw):
        randn_calls.append(shape)
        return torch.from_numpy(dp_noise)

    prior_noise_holder = {}

    def fake_randn_like(t):
        noise = np.random.default_rng(8).standard_normal(
            tuple(t.shape)
        ).astype(np.float32)
        prior_noise_holder["noise"] = noise
        return torch.from_numpy(noise)

    with torch.no_grad(), \
            mock.patch.object(torch, "randn", side_effect=fake_randn), \
            mock.patch.object(torch, "randn_like",
                              side_effect=fake_randn_like):
        audio_t, attn_t, y_mask_t, _ = synth.infer(
            torch.from_numpy(ids), torch.from_numpy(lengths),
            noise_scale=noise_scale, length_scale=length_scale,
            noise_scale_w=noise_w,
        )
    audio_t = to_np(audio_t)[:, 0]
    max_frames = int(y_mask_t.shape[-1])
    prior_noise = prior_noise_holder["noise"].transpose(0, 2, 1)

    from phoonnx_tpu.models.vits.model import infer

    audio_j, y_lengths, attn_j = infer(
        params, hp,
        jnp.asarray(ids.astype(np.int32)), jnp.asarray(lengths),
        max_frames=max_frames,
        noise_scale=jnp.float32(noise_scale),
        length_scale=jnp.float32(length_scale),
        noise_w=jnp.float32(noise_w),
        dp_noise=jnp.asarray(dp_noise.transpose(0, 2, 1)),
        prior_noise=jnp.asarray(prior_noise),
    )
    audio_j = np.asarray(audio_j)

    assert int(y_lengths[0]) == max_frames
    np.testing.assert_allclose(
        np.asarray(attn_j), to_np(attn_t)[:, 0], atol=1e-6
    )
    assert audio_j.shape == audio_t.shape
    mae = np.abs(audio_j - audio_t).max()
    assert mae < 1e-3, f"waveform max deviation {mae}"


@requires_reference
def test_voice_conversion_matches_reference(ref):
    """voice_conversion (models.py:724-732) with transferred weights and
    injected posterior noise."""
    from dataclasses import replace

    hp = replace(TEST_HP, n_speakers=3, gin_channels=32)
    synth = make_ref_synth(ref, hp, n_speakers=3, gin=32)
    params = params_from_flat(state_dict_np(synth), hp, strict=True)

    rng = np.random.default_rng(11)
    t_y = 24
    spec = (rng.standard_normal((1, hp.spec_channels, t_y)) ** 2
            ).astype(np.float32)
    lengths = np.array([t_y], np.int64)
    sid_src, sid_tgt = np.array([0], np.int64), np.array([2], np.int64)

    holder = {}

    def fake_randn_like(t):
        noise = np.random.default_rng(12).standard_normal(
            tuple(t.shape)).astype(np.float32)
        holder["noise"] = noise
        return torch.from_numpy(noise)

    with torch.no_grad(), \
            mock.patch.object(torch, "randn_like",
                              side_effect=fake_randn_like):
        o_hat, _, _ = synth.voice_conversion(
            torch.from_numpy(spec), torch.from_numpy(lengths),
            torch.from_numpy(sid_src), torch.from_numpy(sid_tgt),
        )
    audio_t = to_np(o_hat)[:, 0]

    from phoonnx_tpu.models.vits.model import voice_conversion

    audio_j, _ = voice_conversion(
        params, hp,
        jnp.asarray(spec.transpose(0, 2, 1)), jnp.asarray(lengths),
        jnp.asarray(sid_src.astype(np.int32)),
        jnp.asarray(sid_tgt.astype(np.int32)),
        noise=jnp.asarray(holder["noise"].transpose(0, 2, 1)),
    )
    mae = np.abs(np.asarray(audio_j) - audio_t).max()
    assert mae < 1e-3, f"VC waveform max deviation {mae}"


@requires_reference
def test_full_infer_multispeaker(ref):
    from dataclasses import replace

    hp = replace(TEST_HP, n_speakers=3, gin_channels=32)
    synth = make_ref_synth(ref, hp, n_speakers=3, gin=32)
    params = params_from_flat(state_dict_np(synth), hp, strict=True)

    ids = np.array([[2, 4, 6, 8, 10, 12]], np.int64)
    lengths = np.array([6], np.int64)
    sid = np.array([1], np.int64)
    dp_noise = np.random.default_rng(9).standard_normal(
        (1, 2, 6)
    ).astype(np.float32)

    holder = {}

    def fake_randn(*shape, **kw):
        return torch.from_numpy(dp_noise)

    def fake_randn_like(t):
        noise = np.random.default_rng(10).standard_normal(
            tuple(t.shape)
        ).astype(np.float32)
        holder["noise"] = noise
        return torch.from_numpy(noise)

    with torch.no_grad(), \
            mock.patch.object(torch, "randn", side_effect=fake_randn), \
            mock.patch.object(torch, "randn_like",
                              side_effect=fake_randn_like):
        audio_t, _, y_mask_t, _ = synth.infer(
            torch.from_numpy(ids), torch.from_numpy(lengths),
            sid=torch.from_numpy(sid),
            noise_scale=0.5, length_scale=1.2, noise_scale_w=0.6,
        )
    audio_t = to_np(audio_t)[:, 0]
    max_frames = int(y_mask_t.shape[-1])

    from phoonnx_tpu.models.vits.model import infer

    audio_j, y_lengths, _ = infer(
        params, hp,
        jnp.asarray(ids.astype(np.int32)), jnp.asarray(lengths),
        max_frames=max_frames,
        noise_scale=jnp.float32(0.5),
        length_scale=jnp.float32(1.2),
        noise_w=jnp.float32(0.6),
        sid=jnp.asarray(sid.astype(np.int32)),
        dp_noise=jnp.asarray(dp_noise.transpose(0, 2, 1)),
        prior_noise=jnp.asarray(holder["noise"].transpose(0, 2, 1)),
    )
    mae = np.abs(np.asarray(audio_j) - audio_t).max()
    assert mae < 1e-3, f"waveform max deviation {mae}"


def test_relative_attention_heads_not_summed():
    """heads_share=False keeps per-head relative tables separate — a
    contraction over the table's head axis would silently SUM them."""
    import jax
    import jax.numpy as jnp

    from phoonnx_tpu.models.vits import attention

    rng = jax.random.PRNGKey(0)
    params = attention.init_multi_head_attention(
        rng, channels=16, out_channels=16, n_heads=2, window_size=4,
        heads_share=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    base = attention.multi_head_attention(
        params, x, x, attn_mask=None, deterministic=True)
    # zero one head's relative tables: output must CHANGE (tables used)
    # but by a head-local amount, not the sum-of-heads amount
    p2 = jax.tree.map(lambda a: a, params)
    p2["emb_rel_k"] = params["emb_rel_k"].at[0].set(0.0)
    p2["emb_rel_v"] = params["emb_rel_v"].at[0].set(0.0)
    out2 = attention.multi_head_attention(
        p2, x, x, attn_mask=None, deterministic=True)
    assert not jnp.allclose(base, out2)
    # and zeroing BOTH heads' tables equals zeroing them one at a time
    # sequentially (per-head independence)
    p3 = jax.tree.map(lambda a: a, params)
    p3["emb_rel_k"] = jnp.zeros_like(params["emb_rel_k"])
    p3["emb_rel_v"] = jnp.zeros_like(params["emb_rel_v"])
    out3 = attention.multi_head_attention(
        p3, x, x, attn_mask=None, deterministic=True)
    # with the summed-einsum bug, zeroing head 0 already removed BOTH
    # heads' contributions, making out2 == out3 even though head 1's
    # tables are nonzero in p2
    assert not jnp.allclose(out2, out3)
