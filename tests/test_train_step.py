"""Training step tests: loss math, one fused update, 8-device DP mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits.model import VitsHParams
from phoonnx_tpu.parallel import make_mesh, shard_batch, shard_train_state
from phoonnx_tpu.train.step import (
    TrainConfig,
    init_train_state,
    train_step,
)

TRAIN_HP = VitsHParams(
    n_vocab=40,
    spec_channels=65,
    segment_size=16,  # frames
    inter_channels=32,
    hidden_channels=32,
    filter_channels=64,
    n_heads=2,
    n_layers=1,
    resblock="2",
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
    upsample_rates=(4, 4),
    upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8),
    filter_length=128,
    hop_length=16,
    win_length=128,
    mel_channels=20,
    sample_rate=16000,
)


def make_batch(batch_size=2, t_x=12, t_y=40):
    rng = np.random.default_rng(0)
    hop = TRAIN_HP.hop_length
    return {
        "phoneme_ids": jnp.asarray(
            rng.integers(1, TRAIN_HP.n_vocab, (batch_size, t_x)), jnp.int32
        ),
        "phoneme_lengths": jnp.asarray(
            [t_x - (i % 4) for i in range(batch_size)], jnp.int32
        ),
        "spec": jnp.asarray(
            rng.standard_normal(
                (batch_size, t_y, TRAIN_HP.spec_channels)
            ).astype(np.float32) ** 2
        ),
        "spec_lengths": jnp.asarray(
            [t_y - 3 * (i % 3) for i in range(batch_size)], jnp.int32
        ),
        "audio": jnp.asarray(
            (rng.standard_normal((batch_size, t_y * hop)) * 0.1
             ).astype(np.float32)
        ),
    }


def test_bf16_mixed_precision_step(cfg):
    """bf16 compute against f32 master weights: finite losses, f32
    params/optimizer state, params actually move."""
    import jax.numpy as jnp

    bf16_cfg = cfg._replace(compute_dtype="bfloat16")
    state = init_train_state(jax.random.PRNGKey(0), TRAIN_HP, bf16_cfg)
    batch = make_batch()
    new_state, metrics = train_step(
        state, batch, jax.random.PRNGKey(1), TRAIN_HP, bf16_cfg
    )
    for key in ("loss_gen_all", "loss_disc_all", "loss_mel", "loss_kl"):
        assert np.isfinite(float(metrics[key])), key
    emb_old = np.asarray(state.params_g["enc_p"]["emb"]["weight"])
    emb_new = np.asarray(new_state.params_g["enc_p"]["emb"]["weight"])
    assert emb_new.dtype == np.float32  # master weights stay f32
    assert not np.allclose(emb_old, emb_new)


def test_multihost_single_process_noop():
    from phoonnx_tpu.parallel import multihost

    assert multihost.initialize() is False
    assert multihost.process_batch_slice(16) == slice(0, 16)


@pytest.fixture(scope="module")
def cfg():
    return TrainConfig(steps_per_epoch=10, disc_periods=(2, 3),
                       disc_channel_scale=4)


def test_single_step_updates_params(cfg):
    state = init_train_state(jax.random.PRNGKey(0), TRAIN_HP, cfg)
    batch = make_batch()
    new_state, metrics = train_step(
        state, batch, jax.random.PRNGKey(1), TRAIN_HP, cfg
    )
    for key in ("loss_gen_all", "loss_disc_all", "loss_mel", "loss_kl",
                "loss_dur", "loss_fm"):
        value = float(metrics[key])
        assert np.isfinite(value), key
    assert int(new_state.step) == 1
    # generator weights moved
    before = state.params_g["enc_p"]["emb"]["weight"]
    after = new_state.params_g["enc_p"]["emb"]["weight"]
    assert np.abs(np.asarray(after - before)).max() > 0
    # discriminator weights moved
    before_d = state.params_d["msd"]["convs"][0]["weight_v"]
    after_d = new_state.params_d["msd"]["convs"][0]["weight_v"]
    assert np.abs(np.asarray(after_d - before_d)).max() > 0


def test_jitted_step_runs_twice(cfg):
    from functools import partial

    step = jax.jit(partial(train_step, hp=TRAIN_HP, cfg=cfg))
    state = init_train_state(jax.random.PRNGKey(0), TRAIN_HP, cfg)
    batch = make_batch()
    state, m1 = step(state, batch, jax.random.PRNGKey(1))
    state, m2 = step(state, batch, jax.random.PRNGKey(2))
    assert int(state.step) == 2
    assert np.isfinite(float(m2["loss_gen_all"]))


def test_dp_mesh_8_devices(cfg):
    """Full train step sharded over an 8-device data-parallel mesh."""
    from functools import partial

    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    state = init_train_state(jax.random.PRNGKey(0), TRAIN_HP, cfg)
    state = shard_train_state(mesh, state)
    batch = shard_batch(mesh, make_batch(batch_size=8))

    step = jax.jit(partial(train_step, hp=TRAIN_HP, cfg=cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss_gen_all"]))
    assert np.isfinite(float(metrics["loss_disc_all"]))
    # params remain replicated (same value everywhere)
    emb = new_state.params_g["enc_p"]["emb"]["weight"]
    assert emb.sharding.is_fully_replicated


def test_tp_mesh_4x2(cfg):
    """Train step with params tensor-parallel over a (4 data, 2 model) mesh."""
    from functools import partial

    from phoonnx_tpu.parallel import shard_params_tp
    from phoonnx_tpu.parallel.mesh import make_mesh as _make_mesh

    mesh = _make_mesh(n_data=4, n_model=2)
    state = init_train_state(jax.random.PRNGKey(0), TRAIN_HP, cfg)
    state = shard_train_state(mesh, state)
    # shard the generator weights' output channels over `model`
    state = state._replace(
        params_g=shard_params_tp(mesh, state.params_g),
        opt_g=shard_params_tp(mesh, state.opt_g),
    )
    batch = shard_batch(mesh, make_batch(batch_size=4))

    step = jax.jit(partial(train_step, hp=TRAIN_HP, cfg=cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss_gen_all"]))
    # at least one parameter actually ended up model-sharded
    # (ffn conv_1 has 64 output channels >= the TP threshold)
    ffn_w = new_state.params_g["enc_p"]["encoder"]["layers"][0]["ffn"][
        "conv_1"]["weight"]
    assert not ffn_w.sharding.is_fully_replicated


def test_eval_mode_no_update_no_dropout(cfg):
    """eval_mode: metrics computed with dropout off, state unchanged, and
    deterministic across identical calls."""
    state = init_train_state(jax.random.PRNGKey(0), TRAIN_HP, cfg)
    batch = make_batch()
    eval_fn = jax.jit(
        lambda s, b, r: train_step(s, b, r, hp=TRAIN_HP, cfg=cfg,
                                   eval_mode=True)
    )
    new_state, metrics = eval_fn(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss_gen_all"]))
    # params unchanged, step not advanced
    np.testing.assert_array_equal(
        np.asarray(new_state.params_g["enc_p"]["emb"]["weight"]),
        np.asarray(state.params_g["enc_p"]["emb"]["weight"]),
    )
    assert int(new_state.step) == int(state.step)
    # dropout is off -> same rng gives bit-identical loss; a different
    # rng only moves the stochastic model inputs (sdp/slice/posterior)
    _, metrics2 = eval_fn(state, batch, jax.random.PRNGKey(5))
    assert float(metrics2["loss_gen_all"]) == float(metrics["loss_gen_all"])


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    """REAL multi-process validation: two processes join the distributed
    runtime, build one global mesh (4 devices), assemble a global batch
    from per-process slices, and agree on replicated state."""
    import os
    import subprocess
    import sys

    import socket

    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_worker.py")
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        port = sock.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", worker, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=150)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "MULTIHOST SMOKE OK" in out, out


def test_grad_accum_matches_manual_average(cfg):
    """grad_accum=2 must equal averaging the two micro-batch gradients
    (same rng folding, same slices) followed by ONE optimizer update."""
    from phoonnx_tpu.train.step import _micro_grads, make_optimizer
    import optax

    accum_cfg = cfg._replace(grad_accum=2)
    state = init_train_state(jax.random.PRNGKey(0), TRAIN_HP, accum_cfg)
    batch = make_batch(batch_size=4)
    rng = jax.random.PRNGKey(5)

    got_state, got_metrics = train_step(
        state, batch, rng, TRAIN_HP, accum_cfg
    )

    halves = [
        {k: v[:2] for k, v in batch.items()},
        {k: v[2:] for k, v in batch.items()},
    ]
    acc_g = acc_d = None
    for i, half in enumerate(halves):
        g_g, g_d, _ = _micro_grads(
            state, half, jax.random.fold_in(rng, i), TRAIN_HP, accum_cfg,
            eval_mode=False,
        )
        if acc_g is None:
            acc_g, acc_d = g_g, g_d
        else:
            acc_g = jax.tree.map(lambda a, b: a + b, acc_g, g_g)
            acc_d = jax.tree.map(lambda a, b: a + b, acc_d, g_d)
    acc_g = jax.tree.map(lambda a: a / 2.0, acc_g)
    acc_d = jax.tree.map(lambda a: a / 2.0, acc_d)
    opt = make_optimizer(accum_cfg)
    up_g, _ = opt.update(acc_g, state.opt_g, state.params_g)
    want_params_g = optax.apply_updates(state.params_g, up_g)

    want_emb = np.asarray(want_params_g["enc_p"]["emb"]["weight"])
    got_emb = np.asarray(got_state.params_g["enc_p"]["emb"]["weight"])
    np.testing.assert_allclose(got_emb, want_emb, atol=1e-6, rtol=1e-6)
    assert int(got_state.step) == 1
    assert np.isfinite(float(got_metrics["loss_gen_all"]))


def test_grad_accum_rejects_indivisible_batch(cfg):
    accum_cfg = cfg._replace(grad_accum=3)
    state = init_train_state(jax.random.PRNGKey(0), TRAIN_HP, accum_cfg)
    with pytest.raises(ValueError, match="divisible"):
        train_step(state, make_batch(batch_size=4), jax.random.PRNGKey(1),
                   TRAIN_HP, accum_cfg)


def test_grad_accum_on_dp_mesh(cfg):
    """grad_accum composes with the data-parallel mesh: micro-batch
    slices stay evenly sharded (8 rows / 2 slices / 8... devices handle
    4-row slices), params remain replicated."""
    from functools import partial

    accum_cfg = cfg._replace(grad_accum=2)
    mesh = make_mesh(n_data=4)
    state = shard_train_state(
        mesh, init_train_state(jax.random.PRNGKey(0), TRAIN_HP, accum_cfg)
    )
    batch = shard_batch(mesh, make_batch(batch_size=8))
    step = jax.jit(partial(train_step, hp=TRAIN_HP, cfg=accum_cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss_gen_all"]))
    emb = new_state.params_g["enc_p"]["emb"]["weight"]
    assert emb.sharding.is_fully_replicated
