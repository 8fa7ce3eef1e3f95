"""Fused VITS GAN training step (generator + discriminator updates).

Equivalent of the reference Lightning module's two-optimizer alternation
(phoonnx_train/vits/lightning.py:196-280), fused into one jitted SPMD
program: the generator forward runs once; the discriminator update uses the
stop-gradiented fake audio (identical semantics to Lightning's "optimizer 1
reuses cached y/y_hat"). Under a sharded mesh, GSPMD inserts the gradient
all-reduce over the data axis automatically.
"""

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from phoonnx_tpu.models.vits import discriminator as disc
from phoonnx_tpu.models.vits import model as vits_model
from phoonnx_tpu.models.vits.model import VitsHParams
from phoonnx_tpu.ops import stft
from phoonnx_tpu.train import losses

Array = jax.Array


class TrainConfig(NamedTuple):
    """Optimization hyperparameters (lightning.py:60-73)."""

    learning_rate: float = 2e-4
    betas: Tuple[float, float] = (0.8, 0.99)
    eps: float = 1e-9
    lr_decay: float = 0.999875  # per epoch
    steps_per_epoch: int = 1000
    c_mel: float = 45.0
    c_kl: float = 1.0
    grad_clip: Optional[float] = None
    disc_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    disc_channel_scale: int = 1  # >1 shrinks the discriminator (tests)
    remat: bool = False  # rematerialize the generator forward (saves HBM)
    # MAS kernel: "auto" = Pallas VMEM kernel on TPU at batch <= 16
    # (2.1-3.2x the scan DP there; sharding-aware via
    # custom_partitioning), scan DP at larger batches and on CPU —
    # the measured crossover table lives in TRAINING.md.
    mas_impl: str = "auto"
    # Informational only (logging/bookkeeping): devices on the mesh's
    # data axis. No step behavior keys off it — the Pallas MAS is
    # sharding-aware, so sharded and unsharded programs compile the same.
    data_axis_size: int = 1
    # "bfloat16": forward/backward compute in bf16 with f32 master
    # weights, optimizer state and losses (mixed precision); MAS scores
    # are cast to f32 inside the kernel. Measured ~7% step speedup at
    # medium/batch-8 on v5e (the step is not matmul-bound at this size)
    # — the main win is halved activation memory for bigger batches.
    compute_dtype: str = "float32"
    # >1: split the batch into this many micro-batches, average their
    # gradients, apply ONE optimizer update — activation memory scales
    # with batch/grad_accum, so effective batches can exceed HBM. The
    # micro-steps unroll statically (slices keep the data-axis sharding;
    # a reshape would invite GSPMD resharding), so keep it small (2-8).
    # Near-equivalent to one big batch: every loss term is a batch mean
    # except the duration SUM the reference uses (lightning.py:253),
    # which averages over micro-batches here.
    grad_accum: int = 1


class TrainState(NamedTuple):
    params_g: Any
    params_d: Any
    opt_g: optax.OptState
    opt_d: optax.OptState
    step: Array


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW with the reference's exponential per-epoch decay."""
    schedule = optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=cfg.steps_per_epoch,
        decay_rate=cfg.lr_decay,
        staircase=True,
    )
    chain = []
    if cfg.grad_clip is not None:
        # global-norm clipping (Lightning gradient_clip_val semantics —
        # element-wise optax.clip would change the update DIRECTION)
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(
        optax.adamw(schedule, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                    # torch.optim.AdamW's default (lightning.py:309-321
                    # passes none) — optax defaults to 1e-4, 100x weaker
                    weight_decay=0.01)
    )
    return optax.chain(*chain)


def init_train_state(rng: Array, hp: VitsHParams,
                     cfg: TrainConfig) -> TrainState:
    rng_g, rng_d = jax.random.split(rng)
    params_g = vits_model.random_params(rng_g, hp)
    params_d = disc.init_multi_period_discriminator(
        rng_d, periods=cfg.disc_periods,
        channel_scale=cfg.disc_channel_scale,
    )
    optimizer = make_optimizer(cfg)
    return TrainState(
        params_g=params_g,
        params_d=params_d,
        opt_g=optimizer.init(params_g),
        opt_d=optimizer.init(params_d),
        step=jnp.zeros((), jnp.int32),
    )


def _mel(y: Array, hp: VitsHParams) -> Array:
    return stft.mel_spectrogram(
        y, hp.filter_length, hp.mel_channels, hp.sample_rate,
        hp.hop_length, hp.win_length,
    )


def _micro_grads(state: TrainState, batch: Dict[str, Array], rng: Array,
                 hp: VitsHParams, cfg: TrainConfig, eval_mode: bool):
    """Gradients + metrics for ONE (micro-)batch; no optimizer update.

    Returns (grads_g, grads_d, metrics); the grads are None in eval mode.
    """
    segment_samples = hp.segment_size * hp.hop_length

    # the pallas MAS is sharding-aware (custom_partitioning over the
    # batch dim), so "auto" resolves the same way meshed or not
    mas_impl = cfg.mas_impl
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                     else jnp.float32)

    def _cast(tree, dtype):
        return jax.tree.map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            tree,
        )

    # mixed precision: compute in bf16 against f32 master weights; the
    # cast sits inside the loss fn so gradients accumulate in f32
    cast_batch = _cast(batch, compute_dtype)

    def forward(params_g, hp, rng):
        return vits_model.train_forward(
            _cast(params_g, compute_dtype), hp, rng,
            cast_batch["phoneme_ids"], cast_batch["phoneme_lengths"],
            cast_batch["spec"], cast_batch["spec_lengths"],
            sid=cast_batch.get("sid"),
            deterministic=eval_mode,
            mas_impl=mas_impl,
        )

    if cfg.remat:
        # Trade FLOPs for HBM: recompute generator activations in the
        # backward pass (useful for the 'high' preset at large batch).
        forward = jax.checkpoint(forward, static_argnums=(1,))

    def generator_loss_fn(params_g, params_d):
        out = forward(params_g, hp, rng)
        y_hat = out["audio"]  # [B, segment_samples]
        y = vits_model.slice_audio_segments(
            batch["audio"], out["ids_slice"], segment_samples, hp.hop_length
        )

        # losses in f32 regardless of the compute dtype
        mel_hat = _mel(y_hat.astype(jnp.float32), hp)
        # the mel TARGET comes from the full-utterance spectrogram, frame
        # -sliced (lightning.py:216-228: slice(spec_to_mel(spec))) — mel
        # of the sliced waveform would reflect-pad ~1.5 frames at each
        # segment edge with mirrored instead of true context
        mel_full = stft.spec_to_mel(
            batch["spec"].astype(jnp.float32), hp.sample_rate,
            hp.filter_length, hp.mel_channels,
        )
        mel_real = vits_model._slice_segments(
            mel_full, out["ids_slice"], hp.segment_size
        )
        loss_mel = jnp.mean(jnp.abs(mel_real - mel_hat)) * cfg.c_mel

        loss_kl = losses.kl_loss(
            *_cast((out["z_p"], out["logs_q"], out["m_p"], out["logs_p"],
                    out["y_mask"]), jnp.float32),
        ) * cfg.c_kl
        loss_dur = jnp.sum(out["l_length"]).astype(jnp.float32)

        _, y_d_gs, fmap_rs, fmap_gs = disc.multi_period_discriminator(
            _cast(params_d, compute_dtype),
            y.astype(compute_dtype), y_hat,
        )
        loss_fm = losses.feature_loss(
            _cast(fmap_rs, jnp.float32), _cast(fmap_gs, jnp.float32))
        loss_gen, _ = losses.generator_loss(_cast(y_d_gs, jnp.float32))

        total = loss_gen + loss_fm + loss_mel + loss_dur + loss_kl
        aux = {
            "loss_gen_all": total,
            "loss_mel": loss_mel,
            "loss_kl": loss_kl,
            "loss_dur": loss_dur,
            "loss_fm": loss_fm,
            "loss_gen": loss_gen,
            "y": y,
            "y_hat": y_hat,
        }
        return total, aux

    if eval_mode:
        _, aux = generator_loss_fn(state.params_g, state.params_d)
        grads_g = None
    else:
        (_, aux), grads_g = jax.value_and_grad(
            generator_loss_fn, has_aux=True
        )(state.params_g, state.params_d)

    def discriminator_loss_fn(params_d):
        y_hat = jax.lax.stop_gradient(aux["y_hat"]).astype(compute_dtype)
        y = jax.lax.stop_gradient(aux["y"]).astype(compute_dtype)
        y_d_rs, y_d_gs, _, _ = disc.multi_period_discriminator(
            _cast(params_d, compute_dtype), y, y_hat
        )
        loss_d, _, _ = losses.discriminator_loss(
            _cast(y_d_rs, jnp.float32), _cast(y_d_gs, jnp.float32))
        return loss_d

    if eval_mode:
        loss_d = discriminator_loss_fn(state.params_d)
        grads_d = None
    else:
        loss_d, grads_d = jax.value_and_grad(discriminator_loss_fn)(
            state.params_d
        )

    metrics = {
        "loss_gen_all": aux["loss_gen_all"],
        "loss_disc_all": loss_d,
        "loss_mel": aux["loss_mel"],
        "loss_kl": aux["loss_kl"],
        "loss_dur": aux["loss_dur"],
        "loss_fm": aux["loss_fm"],
    }
    return grads_g, grads_d, metrics


def train_step(state: TrainState, batch: Dict[str, Array], rng: Array,
               hp: VitsHParams, cfg: TrainConfig,
               eval_mode: bool = False,
               ) -> Tuple[TrainState, Dict[str, Array]]:
    """One fused G+D update.

    batch: phoneme_ids [B,T_x] int32, phoneme_lengths [B], spec [B,T_y,C],
    spec_lengths [B], audio [B, N] (N >= T_y*hop), sid [B] (optional).

    ``eval_mode=True`` (static) runs the losses with dropout disabled and
    returns the state unchanged — validation semantics (the reference
    validates under Lightning eval mode, lightning.py:282-306).

    ``cfg.grad_accum > 1`` splits the batch into that many micro-batches
    and averages their gradients before the single optimizer update
    (activation memory scales with the micro-batch).
    """
    accum = max(1, int(cfg.grad_accum)) if not eval_mode else 1
    if accum > 1:
        b = batch["phoneme_ids"].shape[0]
        if b % accum:
            raise ValueError(
                f"batch size {b} is not divisible by grad_accum {accum}"
            )
        mb = b // accum
        grads_g = grads_d = metrics = None
        for i in range(accum):
            micro = {k: v[i * mb:(i + 1) * mb] for k, v in batch.items()}
            g_g, g_d, m = _micro_grads(
                state, micro, jax.random.fold_in(rng, i), hp, cfg,
                eval_mode=False,
            )
            if grads_g is None:
                grads_g, grads_d, metrics = g_g, g_d, m
            else:
                add = lambda a, c: a + c
                grads_g = jax.tree.map(add, grads_g, g_g)
                grads_d = jax.tree.map(add, grads_d, g_d)
                metrics = jax.tree.map(add, metrics, m)
        scale = 1.0 / accum
        grads_g = jax.tree.map(lambda a: a * scale, grads_g)
        grads_d = jax.tree.map(lambda a: a * scale, grads_d)
        metrics = jax.tree.map(lambda a: a * scale, metrics)
    else:
        grads_g, grads_d, metrics = _micro_grads(
            state, batch, rng, hp, cfg, eval_mode=eval_mode
        )

    if eval_mode:
        return state, metrics

    optimizer = make_optimizer(cfg)
    updates_g, opt_g = optimizer.update(grads_g, state.opt_g, state.params_g)
    params_g = optax.apply_updates(state.params_g, updates_g)
    updates_d, opt_d = optimizer.update(grads_d, state.opt_d, state.params_d)
    params_d = optax.apply_updates(state.params_d, updates_d)

    new_state = TrainState(
        params_g=params_g, params_d=params_d,
        opt_g=opt_g, opt_d=opt_d, step=state.step + 1,
    )
    return new_state, metrics
