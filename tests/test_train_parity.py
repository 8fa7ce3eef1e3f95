"""Training-path parity: train_forward vs reference SynthesizerTrn.forward.

Same weights (transferred via the checkpoint importer), same injected noise
(posterior sample, SDP e_q, segment slice offsets), stubbed MAS on both
sides -> identical alignments, durations, duration loss, KL inputs, and
sliced generator audio.
"""

from unittest import mock

import numpy as np
import pytest

from .conftest import requires_reference

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from phoonnx_tpu.models.vits.load import params_from_flat  # noqa: E402
from phoonnx_tpu.train import losses as jlosses  # noqa: E402

from .test_vits_parity import (  # noqa: E402
    TEST_HP,
    make_ref_synth,
    state_dict_np,
    to_np,
)


@requires_reference
def test_train_forward_parity(ref):
    hp = TEST_HP
    synth = make_ref_synth(ref, hp).train()
    # p_dropout=0 in TEST_HP so train() vs eval() only matters for dropout
    params = params_from_flat(state_dict_np(synth), hp, strict=True)

    rng = np.random.default_rng(11)
    b, t_x, t_y = 2, 10, 36
    ids = rng.integers(1, hp.n_vocab, (b, t_x))
    x_lengths = np.array([10, 7])
    spec = (rng.standard_normal((b, hp.spec_channels, t_y)) ** 2).astype(
        np.float32
    )
    y_lengths = np.array([36, 30])
    for i, n in enumerate(y_lengths):
        spec[i, :, n:] = 0.0

    post_noise = rng.standard_normal((b, hp.inter_channels, t_y)).astype(
        np.float32
    )
    e_q = rng.standard_normal((b, 2, t_x)).astype(np.float32)
    slice_u = rng.random(b).astype(np.float32)

    randn_like_calls = []

    def fake_randn_like(t):
        randn_like_calls.append(tuple(t.shape))
        return torch.from_numpy(post_noise)

    def fake_randn(*shape, **kw):
        return torch.from_numpy(e_q)

    def fake_rand(shape):
        return torch.from_numpy(slice_u)

    with torch.no_grad(), \
            mock.patch.object(torch, "randn_like", side_effect=fake_randn_like), \
            mock.patch.object(torch, "randn", side_effect=fake_randn), \
            mock.patch.object(torch, "rand", side_effect=fake_rand):
        (o_t, l_length_t, attn_t, ids_slice_t, x_mask_t, y_mask_t,
         latents_t) = synth(
            torch.from_numpy(ids), torch.from_numpy(x_lengths),
            torch.from_numpy(spec), torch.from_numpy(y_lengths),
        )
    z_t, z_p_t, m_p_t, logs_p_t, m_q_t, logs_q_t = latents_t

    # --- our side with the same injected noise ---
    from phoonnx_tpu.models.vits import duration, encoder, hifigan, nn
    from phoonnx_tpu.models.vits import model as vits_model
    from phoonnx_tpu.models.vits import posterior
    from phoonnx_tpu.ops import mas

    dtype = jnp.float32
    x_mask = nn.sequence_mask(jnp.asarray(x_lengths), t_x)[..., None].astype(
        dtype)
    y_mask = nn.sequence_mask(jnp.asarray(y_lengths), t_y)[..., None].astype(
        dtype)
    x, m_p, logs_p = encoder.text_encoder(
        params["enc_p"], jnp.asarray(ids.astype(np.int32)), x_mask
    )
    z, m_q, logs_q = posterior.posterior_encoder(
        params["enc_q"], jnp.asarray(spec.transpose(0, 2, 1)), y_mask,
        jnp.asarray(post_noise.transpose(0, 2, 1)),
    )
    z_p = posterior.coupling_flow(params["flow"], z, y_mask)

    s_p_sq_r = jnp.exp(-2.0 * logs_p)
    neg_cent = (
        jnp.sum(-0.5 * jnp.log(2.0 * jnp.pi) - logs_p, -1)[:, None, :]
        + jnp.einsum("byc,bxc->byx", -0.5 * jnp.square(z_p), s_p_sq_r)
        + jnp.einsum("byc,bxc->byx", z_p, m_p * s_p_sq_r)
        + jnp.sum(-0.5 * jnp.square(m_p) * s_p_sq_r, -1)[:, None, :]
    )
    attn_mask = y_mask * jnp.swapaxes(x_mask, 1, 2)
    attn = mas.maximum_path(neg_cent, attn_mask)

    np.testing.assert_allclose(
        np.asarray(attn), to_np(attn_t)[:, 0], atol=1e-6
    )

    w = jnp.sum(attn, axis=1)[..., None]
    l_length = duration.sdp_nll(
        params["dp"], x, x_mask, w, jnp.asarray(e_q.transpose(0, 2, 1))
    ) / jnp.sum(x_mask)
    np.testing.assert_allclose(
        np.asarray(l_length), to_np(l_length_t), rtol=2e-4
    )

    np.testing.assert_allclose(
        np.asarray(z_p), to_np(z_p_t).transpose(0, 2, 1), atol=2e-4
    )

    # expanded prior + same slice offsets -> same sliced audio
    m_p_exp = jnp.einsum("byx,bxc->byc", attn, m_p)
    logs_p_exp = jnp.einsum("byx,bxc->byc", attn, logs_p)
    np.testing.assert_allclose(
        np.asarray(m_p_exp), to_np(m_p_t).transpose(0, 2, 1), atol=2e-4
    )

    seg = hp.segment_size
    starts = (slice_u * np.maximum(y_lengths - seg + 1, 1)).astype(np.int64)
    np.testing.assert_array_equal(starts, to_np(ids_slice_t))
    z_slice = vits_model._slice_segments(z, jnp.asarray(starts), seg)
    o_j = hifigan.generator(params["dec"], z_slice)
    np.testing.assert_allclose(np.asarray(o_j), to_np(o_t)[:, 0], atol=1e-3)

    # KL loss parity on the latents
    kl_j = jlosses.kl_loss(z_p, logs_q, m_p_exp, logs_p_exp, y_mask)
    import phoonnx_train.vits.losses as ref_losses

    kl_t = ref_losses.kl_loss(
        z_p_t, logs_q_t, m_p_t, logs_p_t,
        torch.from_numpy(np.asarray(y_mask).transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(float(kl_j), float(kl_t), rtol=1e-4)


# reuse the reference fixture from test_vits_parity
from .test_vits_parity import ref  # noqa: E402, F401
