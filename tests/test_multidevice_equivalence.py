"""Multi-device EQUIVALENCE: a sharded step must compute the same math
as the single-device step on the identical global batch + rng.

VERDICT r3 #3: finiteness checks (test_train_step.py) prove the sharded
step runs; these prove it is *correct*. The object compared is the
GRADIENTS (plus all losses): gradients are where the DP all-reduce and
TP partial-sum collectives act, and a sharding bug (dropped shard,
missing psum, wrong-axis reduction) perturbs them at O(1) relative
scale. Post-Adam parameters are deliberately NOT the equivalence
object: for near-zero-gradient leaves Adam amplifies ulp-level
reduction-order noise to a full +-lr update flip (observed: identical
global math, param delta 4e-4 = 2*lr on the CPU mesh, gradient delta
~1e-7), so a parameter comparison cannot separate reduction noise from
real bugs at any tolerance that would still catch them.
"""

from functools import partial

import numpy as np
import pytest

import jax

from phoonnx_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_params_tp,
    shard_train_state,
)
from phoonnx_tpu.train.step import (
    TrainConfig,
    _micro_grads,
    init_train_state,
)

from tests.test_train_step import TRAIN_HP, make_batch

# Two-tier gradient assertion. The CPU backend's threaded contractions
# are not bitwise run-reproducible (Eigen partial-sum order varies with
# thread scheduling); an ulp-level difference in the MAS value matrix
# occasionally flips ONE alignment cell, which is a legitimate discrete
# branch both runs are entitled to — observed as a single leaf at
# ~4e-3 relative-L2 while every other leaf is bit-identical. So:
#   * the MEDIAN leaf must be (near) bit-equal — a missing psum or a
#     dropped shard perturbs essentially every leaf at O(1) relative;
#   * EVERY leaf must stay under a loose cap that a real sharding bug
#     (wrong-axis reduction, unreduced partial) cannot satisfy.
GRAD_MEDIAN_RELL2 = 1e-6
GRAD_MAX_RELL2 = 3e-2
LOSS_RTOL = 1e-5


@pytest.fixture(scope="module")
def cfg():
    # run_training selects the fast native grouped-conv autodiff (exact
    # on its pure-DP meshes); these tests exercise multi-axis meshes,
    # so pin the mesh-safe custom path regardless of session order
    from phoonnx_tpu.models.vits import nn

    nn.set_grouped_conv_impl("custom")
    return TrainConfig(steps_per_epoch=10, disc_periods=(2, 3),
                       disc_channel_scale=4)


def _grads_fn(cfg):
    def run(state, batch, rng):
        grads_g, grads_d, metrics = _micro_grads(
            state, batch, rng, TRAIN_HP, cfg, eval_mode=False)
        return grads_g, grads_d, metrics

    return jax.jit(run)


def _assert_trees_close(tree_a, tree_b, label):
    flat_a, _ = jax.tree_util.tree_flatten_with_path(tree_a)
    flat_b = jax.tree.leaves(tree_b)
    assert len(flat_a) == len(flat_b)
    # Denominator floored at 1e-6 of the global gradient norm: leaves
    # whose gradient is mathematically zero (e.g. the attention key
    # bias — softmax is shift-invariant in it) hold pure cancellation
    # noise, and noise-vs-noise has rel-L2 O(1) with no bug present.
    global_norm = float(np.sqrt(sum(
        float(np.linalg.norm(np.asarray(a, np.float64)) ** 2)
        for _, a in flat_a)))
    floor = 1e-6 * (global_norm + 1e-12)
    rel = []
    for (path, a), b in zip(flat_a, flat_b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        num = float(np.linalg.norm(a - b))
        den = max(float(np.linalg.norm(a)), floor)
        rel.append((num / den, jax.tree_util.keystr(path)))
    rel.sort(reverse=True)
    median = sorted(r for r, _ in rel)[len(rel) // 2]
    assert median <= GRAD_MEDIAN_RELL2, (
        f"{label}: median leaf rel-L2 {median:.3e} — systematic "
        f"sharded-vs-single gradient divergence (top: {rel[:3]})")
    assert rel[0][0] <= GRAD_MAX_RELL2, (
        f"{label}: leaf {rel[0][1]} rel-L2 {rel[0][0]:.3e} exceeds "
        f"{GRAD_MAX_RELL2}")


def _assert_metrics_close(m1, m2):
    for key in ("loss_gen_all", "loss_disc_all", "loss_mel", "loss_kl",
                "loss_dur", "loss_fm"):
        a, b = float(m1[key]), float(m2[key])
        assert np.isfinite(a) and np.isfinite(b), key
        assert a == pytest.approx(b, rel=LOSS_RTOL), (key, a, b)


def test_dp8_grads_equal_single_device(cfg):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    run = _grads_fn(cfg)
    batch = make_batch(batch_size=8)
    rng = jax.random.PRNGKey(3)

    state0 = init_train_state(jax.random.PRNGKey(0), TRAIN_HP, cfg)
    gg1, gd1, m1 = run(state0, batch, rng)

    mesh = make_mesh()
    state_s = shard_train_state(
        mesh, init_train_state(jax.random.PRNGKey(0), TRAIN_HP, cfg))
    gg2, gd2, m2 = run(state_s, shard_batch(mesh, batch), rng)

    _assert_metrics_close(m1, m2)
    _assert_trees_close(gg1, gg2, "grads_g dp8-vs-single")
    _assert_trees_close(gd1, gd2, "grads_d dp8-vs-single")


def test_dp4_tp2_grads_equal_single_device(cfg):
    assert len(jax.devices()) == 8
    run = _grads_fn(cfg)
    batch = make_batch(batch_size=4)
    rng = jax.random.PRNGKey(5)

    state0 = init_train_state(jax.random.PRNGKey(0), TRAIN_HP, cfg)
    gg1, gd1, m1 = run(state0, batch, rng)

    mesh = make_mesh(n_data=4, n_model=2)
    state_s = shard_train_state(
        mesh, init_train_state(jax.random.PRNGKey(0), TRAIN_HP, cfg))
    state_s = state_s._replace(
        params_g=shard_params_tp(mesh, state_s.params_g),
        opt_g=shard_params_tp(mesh, state_s.opt_g),
    )
    gg2, gd2, m2 = run(state_s, shard_batch(mesh, batch), rng)

    _assert_metrics_close(m1, m2)
    _assert_trees_close(gg1, gg2, "grads_g dp4tp2-vs-single")
    _assert_trees_close(gd1, gd2, "grads_d dp4tp2-vs-single")


def test_grouped_conv_custom_vjp_matches_native_grads():
    """Single-device oracle: the custom weight-gradient einsum must
    equal the native grouped-conv autodiff exactly (the custom path
    exists only because the NATIVE dW is miscounted under idle mesh
    axes; on one device the native rule is correct)."""
    import jax.numpy as jnp

    from phoonnx_tpu.models.vits import nn

    rng = np.random.default_rng(3)
    for groups, stride, dilation, k, cin, cout in (
            (4, 4, 1, 41, 16, 64), (8, 1, 2, 5, 8, 8), (16, 1, 1, 3, 16, 16)):
        x = jnp.asarray(rng.standard_normal((2, 64, cin)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((cout, cin // groups, k)) * 0.1,
            jnp.float32)
        pad = (k - 1) * dilation // 2

        def loss_custom(x, w):
            return (nn.conv1d(x, w, stride=stride, padding=pad,
                              dilation=dilation, groups=groups) ** 2).sum()

        def loss_native(x, w):
            return (nn._grouped_conv_native(
                x, w, stride, pad, dilation, groups) ** 2).sum()

        gx_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(x, w)
        gx_n, gw_n = jax.grad(loss_native, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_n),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_n),
                                   rtol=1e-5, atol=1e-4)
