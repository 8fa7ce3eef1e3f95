"""Training CLI: VITS + GAN on TPU with periodic checkpointing.

Equivalent of phoonnx_train/train.py + the Lightning module
(phoonnx_train/vits/lightning.py): quality presets, AdamW x2 with
exponential decay, G/D alternation (fused step), periodic checkpoints,
validation loss, resume, and single->multi-speaker warm start.

Usage:
    python -m phoonnx_tpu.train.trainer --dataset-dir out/ --quality medium \
        --batch-size 16 --max-epochs 1000
"""

import json
import logging
import time
from functools import partial
from pathlib import Path
from typing import Optional

import click
import jax
import numpy as np

from phoonnx_tpu.models.vits.model import VitsHParams
from phoonnx_tpu.train import checkpoint as ckpt
from phoonnx_tpu.train.dataset import (
    BucketedLoader,
    load_dataset,
    train_val_split,
)
from phoonnx_tpu.train.step import TrainConfig, init_train_state, train_step

LOG = logging.getLogger("trainer")


def build_hparams(config: dict, quality: str) -> VitsHParams:
    """Model hyperparameters from a dataset config.json + quality preset."""
    num_speakers = config.get("num_speakers", 1)
    hp = VitsHParams.preset(
        quality,
        n_vocab=config["num_symbols"],
        sample_rate=config.get("audio", {}).get("sample_rate", 22050),
        n_speakers=num_speakers,
        # Lightning defaults gin to 512 for multi-speaker (lightning.py:81-83)
        gin_channels=512 if num_speakers > 1 else 0,
    )
    return hp


def evaluate(state, loader: BucketedLoader, rng, hp, cfg,
             max_batches: int = 8, step_fn=None,
             device_batch=None) -> float:
    """Mean COMBINED (generator + discriminator) loss over validation
    batches, no updates — matching the reference's validation_step which
    logs loss_gen_all + loss_disc_all (lightning.py:282-306).

    ``step_fn`` must be a jitted train step WITHOUT donation (the state
    is reused across batches); run_training caches one across epochs.
    Never run the raw step here — un-jitted execution dispatches every
    op individually, which over a remote-TPU link takes effectively
    forever (~28 ms/op on the axon tunnel).
    """
    if step_fn is None:
        step_fn = jax.jit(partial(train_step, hp=hp, cfg=cfg,
                                  eval_mode=True))
    total, count = 0.0, 0
    for i, batch in enumerate(loader.epoch()):
        if i >= max_batches:
            break
        if device_batch is not None:
            batch = device_batch(batch)
        _, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
        total += float(metrics["loss_gen_all"]) + float(
            metrics["loss_disc_all"]
        )
        count += 1
    return total / max(count, 1)


def _batch_key(batch) -> tuple:
    return tuple(sorted(
        (k, tuple(v.shape), str(getattr(v, "dtype", "")))
        for k, v in batch.items()
    ))


def _compile_auto_layout_step(step_partial, state, example_batch, rng):
    """Compile the train step with XLA-chosen (AUTO) state layouts.

    Returns (state re-placed into the chosen layouts, the concrete
    format pytree to pin on other compiles, the compiled executable for
    the example batch's shape, that shape's key).
    """
    from jax.experimental.layout import Format, Layout

    auto = jax.tree.map(lambda _: Format(Layout.AUTO), state)
    jf = jax.jit(step_partial, donate_argnums=(0,),
                 in_shardings=(auto, None, None),
                 out_shardings=(auto, None))
    compiled = jf.lower(state, example_batch, rng).compile()
    state_formats = compiled.input_formats[0][0]
    state = jax.tree.map(jax.device_put, state, state_formats)
    return state, state_formats, compiled, _batch_key(example_batch)


_TEST_INFER_CACHE: dict = {}


def _test_infer_jit(hp, max_frames: int, multispeaker: bool):
    import jax.numpy as jnp

    from phoonnx_tpu.models.vits import model as vits_model

    # key by VALUE: id(hp) can be recycled by the allocator across
    # run_training calls in one process, silently reusing a jit closed
    # over a dead run's hparams
    key = (hp, max_frames, multispeaker)
    if key not in _TEST_INFER_CACHE:
        @jax.jit
        def infer_fn(params_g, ids, lengths, sid, rng):
            return vits_model.infer(
                params_g, hp, ids, lengths, max_frames=max_frames,
                noise_scale=jnp.float32(0.667),
                length_scale=jnp.float32(1.0),
                noise_w=jnp.float32(0.8),
                sid=sid, rng=rng,
            )

        _TEST_INFER_CACHE[key] = infer_fn
    return _TEST_INFER_CACHE[key]


def write_test_audio(params_g, hp, test_utts, out_dir) -> None:
    """Synthesize the held-out test utterances with the current weights
    (reference validation_step, lightning.py:286-304) and write WAVs.

    Uses the same fixed scales as the reference (0.667/1.0/0.8) and a
    fixed seed so successive epochs are comparable. Failures are logged,
    never fatal — progress audio must not kill a training run.
    """
    import wave

    import jax.numpy as jnp
    import numpy as np

    from phoonnx_tpu.models.vits import model as vits_model

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    try:
        for idx, utt in enumerate(test_utts):
            ids = np.asarray([utt.phoneme_ids], np.int32)
            n_frames = max(len(utt.phoneme_ids) * 12, hp.segment_size)
            sid = (jnp.asarray([utt.speaker_id])
                   if utt.speaker_id is not None and hp.n_speakers > 1
                   else None)
            # jitted (never run infer op-by-op over a remote link); the
            # cache is keyed by (text length, frame budget), and the test
            # utterances are fixed across epochs, so compiles happen once
            infer_fn = _test_infer_jit(hp, n_frames, sid is not None)
            audio, y_lengths, _ = infer_fn(
                params_g, jnp.asarray(ids),
                jnp.asarray([ids.shape[1]], jnp.int32),
                sid, jax.random.PRNGKey(idx),
            )
            n = int(np.asarray(y_lengths)[0]) * hp.total_upsample
            wav = np.asarray(audio, np.float32)[0, :n]
            if wav.size == 0:
                # early-training weights can round every predicted
                # duration to zero frames — write a minimal silent file
                # rather than abort the whole epoch's test audio
                wav = np.zeros(hp.total_upsample, np.float32)
            # scale to make louder in [-1, 1] (lightning.py:299-300)
            wav = wav * (1.0 / max(0.01, float(np.abs(wav).max())))
            pcm = np.clip(wav * 32767.0, -32767.0, 32767.0).astype(np.int16)
            with wave.open(str(out_dir / f"test_{idx}.wav"), "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(hp.sample_rate)
                f.writeframes(pcm.tobytes())
        LOG.info("wrote %d test utterances to %s", len(test_utts), out_dir)
    except Exception:
        LOG.exception("test-audio generation failed (continuing)")


def run_training(
    dataset_dir: str,
    quality: str = "medium",
    batch_size: int = 16,
    max_epochs: int = 1000,
    checkpoint_epochs: int = 1,
    validation_split: float = 0.1,
    num_test_examples: int = 5,
    max_phoneme_ids: Optional[int] = None,
    learning_rate: float = 2e-4,
    grad_clip: Optional[float] = None,
    remat: bool = False,
    mas_impl: str = "auto",
    compute_dtype: str = "float32",
    grad_accum: int = 1,
    profile_dir: Optional[str] = None,
    profile_steps: int = 5,
    disc_periods: tuple = (2, 3, 5, 7, 11),
    disc_channel_scale: int = 1,
    seed: int = 1234,
    resume_from_checkpoint: Optional[str] = None,
    resume_from_single_speaker: Optional[str] = None,
    log_every: int = 50,
    auto_layouts: bool = True,
) -> None:
    from phoonnx_tpu.parallel import multihost

    multi_host = multihost.initialize()
    if multi_host:
        LOG.info("multi-host training: this process feeds its batch "
                 "slice; shardings are global")

    dataset_path = Path(dataset_dir)
    with open(dataset_path / "config.json", encoding="utf-8") as f:
        config = json.load(f)
    hp = build_hparams(config, quality)
    is_multispeaker = hp.n_speakers > 1

    utterances = load_dataset(
        [dataset_path / "dataset.jsonl"], max_phoneme_ids=max_phoneme_ids
    )
    train_utts, val_utts, _test_utts = train_val_split(
        utterances, validation_split, num_test_examples, seed=seed
    )
    LOG.info("train=%d val=%d", len(train_utts), len(val_utts))

    make_loader = partial(
        BucketedLoader,
        batch_size=batch_size,
        segment_size_frames=hp.segment_size,
        hop_length=hp.hop_length,
        is_multispeaker=is_multispeaker,
        seed=seed,
        spec_channels=hp.spec_channels,
    )
    train_loader = make_loader(train_utts)
    val_loader = make_loader(val_utts) if val_utts else None

    cfg = TrainConfig(
        learning_rate=learning_rate,
        steps_per_epoch=max(len(train_loader), 1),
        grad_clip=grad_clip,
        remat=remat,
        mas_impl=mas_impl,
        compute_dtype=compute_dtype,
        grad_accum=grad_accum,
        disc_periods=tuple(disc_periods),
        disc_channel_scale=disc_channel_scale,
    )
    state = init_train_state(jax.random.PRNGKey(seed), hp, cfg)

    ckpt_dir = dataset_path / "checkpoints"
    if resume_from_checkpoint:
        state = ckpt.restore(resume_from_checkpoint, state)
        LOG.info("Resumed from %s at step %d", resume_from_checkpoint,
                 int(state.step))
    elif resume_from_single_speaker:
        # Warm start: import generator weights, dropping speaker-conditioning
        # layers that do not exist in the single-speaker checkpoint
        # (phoonnx_train/train.py:131-144).
        state = state._replace(params_g=ckpt.load_generator_warm_start(
            resume_from_single_speaker, hp, state.params_g
        ))
        LOG.info("Warm-started generator from %s", resume_from_single_speaker)

    # data-parallel mesh over every available device (all hosts in a
    # multi-host run): params replicated, batches sharded on the leading
    # dim, gradient all-reduce inserted by GSPMD. Falls back to
    # single-device execution when the batch cannot split.
    import math as _math

    from phoonnx_tpu.parallel import (
        batch_sharding,
        make_mesh,
        shard_train_state,
    )

    n_data = _math.gcd(batch_size, jax.device_count())
    use_mesh = n_data > 1 or jax.process_count() > 1
    # Grouped-conv autodiff: the default "custom" VJP now costs the
    # same as the native rule on every geometry (it IS the native dW
    # plus a free analytic ones-probe that cancels XLA SPMD's
    # idle-mesh-axis dW miscount in-graph — see nn._grouped_conv_bwd
    # and the round-5 table in TRAINING.md; the old einsum dW it
    # replaced was ~45% of the step, which is why a "native" fast path
    # was selected here for single-device/pure-DP runs until round 5).
    # One path for every mesh layout; no policy switch to get wrong.
    mesh = None
    if use_mesh:
        mesh = make_mesh(n_data=n_data, n_model=1)
        state = shard_train_state(mesh, state)
        cfg = cfg._replace(data_axis_size=n_data)
        LOG.info("data-parallel mesh: %d-way batch sharding over %d "
                 "devices (%d processes)", n_data, jax.device_count(),
                 jax.process_count())

    def device_batch(batch):
        """Host batch -> global device batch (sharded when meshed).

        Multi-host: every process collates the same global batch (same
        shuffle seed), keeps only its row slice, and the slices assemble
        into one global array (make_array_from_process_local_data).
        """
        if not use_mesh:
            return batch
        import numpy as _np

        sharding = batch_sharding(mesh)
        rows = (multihost.process_batch_slice(
                    next(iter(batch.values())).shape[0])
                if multi_host else slice(None))
        return {
            key: jax.make_array_from_process_local_data(
                sharding, _np.asarray(value[rows])
            )
            for key, value in batch.items()
        }

    is_main_process = jax.process_index() == 0

    step_partial = partial(train_step, hp=hp, cfg=cfg)
    eval_partial = partial(train_step, hp=hp, cfg=cfg, eval_mode=True)
    # Per-step keys are fold_in(base, step) — a pure function of the
    # global step, never a chained split: a resumed run must draw the
    # exact noise sequence the uninterrupted run would have
    # (checkpoint-resume bit-equivalence; preemptible-TPU safety).
    rng = jax.random.PRNGKey(seed + 1)

    state_formats = None
    step_compiled = None
    compiled_key = None
    if auto_layouts and not use_mesh:
        # Let XLA choose the train state's device layouts: with default
        # (row-major) parameter layouts every step pays relayout copies at
        # the jit boundary before the MXU convolutions can consume the
        # kernels (profiled at ~3 ms/step on medium/batch-8: the
        # discriminator's [1024,1024,5,1] kernels alone are ~2 ms). The
        # first bucket compiles with AUTO in/out layouts; the learned
        # formats are then pinned for every other bucket shape so the
        # donated state never ping-pongs between layouts. (Sharded meshes
        # keep default layouts: Format+NamedSharding AUTO interplay is
        # not worth the complexity while DP is the only strategy.)
        try:
            # peek a batch from a throwaway loader: epoch() advances the
            # loader's shuffle rng, and batch order must not depend on
            # whether auto-layouts is enabled
            example_batch = next(iter(make_loader(train_utts).epoch()))
            state, state_formats, step_compiled, compiled_key = (
                _compile_auto_layout_step(step_partial, state,
                                          example_batch, rng))
            LOG.info("XLA-chosen train-state layouts pinned "
                     "(--no-auto-layouts to disable)")
        except Exception:
            LOG.exception("auto-layout compile failed — continuing with "
                          "default layouts")
            state_formats = None

    if state_formats is not None:
        step_fn_jit = jax.jit(step_partial, donate_argnums=(0,),
                              in_shardings=(state_formats, None, None),
                              out_shardings=(state_formats, None))

        def step_fn(state, batch, sub):
            # reuse the AUTO-compiled executable for its bucket shape;
            # other buckets jit-compile against the same pinned formats
            if _batch_key(batch) == compiled_key:
                return step_compiled(state, batch, sub)
            return step_fn_jit(state, batch, sub)

        eval_fn = jax.jit(eval_partial,
                          in_shardings=(state_formats, None, None))
    else:
        step_fn = jax.jit(step_partial, donate_argnums=(0,))
        # validation step: no donation (state is reused), cached across
        # epochs; dropout off, no optimizer update (Lightning eval-mode
        # semantics)
        eval_fn = jax.jit(eval_partial)

    profiling = False
    # host-side step counter: int(state.step) per iteration would force a
    # device sync every step, stalling JAX's async dispatch (the loader
    # prefetch below would then overlap nothing). Synced once here for
    # checkpoint resume.
    step = int(state.step)
    steps_this_run = 0  # profiler warmup gate: a RESUMED run's global
    # step is large from step one, but the first local steps still pay
    # jit compiles that must stay out of the trace
    # checkpoints are written at epoch boundaries, so a restored step
    # lands exactly on one; epoch-indexed shuffles + step-indexed rng
    # make the continuation identical to the uninterrupted run
    start_epoch = step // max(len(train_loader), 1)
    metrics = None
    for epoch in range(start_epoch, max_epochs):
        epoch_start = time.time()
        for batch in train_loader.epoch(prefetch=2, epoch_index=epoch):
            sub = jax.random.fold_in(rng, step)
            if (profile_dir is not None and not profiling
                    and steps_this_run >= 2):
                # trace after the compile step so the trace is pure
                # device time (view with xprof / tensorboard)
                jax.profiler.start_trace(profile_dir)
                profiling = True
                profile_end = step + profile_steps
            state, metrics = step_fn(state, device_batch(batch), sub)
            step += 1
            steps_this_run += 1
            if profiling and step >= profile_end:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                profiling = False
                profile_dir = None
                LOG.info("device trace written (%d steps)", profile_steps)
            if step % log_every == 0:
                LOG.info(
                    "epoch %d step %d loss_g=%.3f loss_d=%.3f mel=%.3f "
                    "kl=%.3f dur=%.3f",
                    epoch, step,
                    float(metrics["loss_gen_all"]),
                    float(metrics["loss_disc_all"]),
                    float(metrics["loss_mel"]),
                    float(metrics["loss_kl"]),
                    float(metrics["loss_dur"]),
                )
        # fetch one metric's BYTES before reading the clock: async dispatch
        # means the steps above may still be executing, and on remote-tunnel
        # backends even block_until_ready can return early — only a data
        # fetch provably waits for the epoch's in-order work to finish
        if metrics is not None:
            _ = float(metrics["loss_gen_all"])
        LOG.info("epoch %d done in %.1fs", epoch, time.time() - epoch_start)
        if epoch == 0:
            from phoonnx_tpu.observability import device_memory_stats

            hbm = device_memory_stats()
            if hbm:  # post-first-epoch peak ~= steady-state footprint
                LOG.info("device memory after first epoch: %s", hbm)

        if val_loader is not None:
            val_loss = evaluate(state, val_loader, jax.random.PRNGKey(0),
                                hp, cfg, step_fn=eval_fn,
                                device_batch=device_batch)
            LOG.info("epoch %d val_loss=%.3f", epoch, val_loss)

        if _test_utts and is_main_process:
            # progress audio from the held-out test utterances after each
            # validation (the reference's validation_step generates these,
            # lightning.py:286-304 — its tensorboard write is commented
            # out; we write WAVs under <dataset>/test_audio/epoch_N/)
            params_for_audio = state.params_g
            if jax.process_count() > 1:
                # the jitted infer below runs in THIS process only; a jit
                # over arrays sharded across a multi-process mesh would
                # error or hang the other hosts. DP keeps params fully
                # replicated, so process 0 can materialize them host-side
                # and run locally; TP-sharded params cannot — skip.
                try:
                    params_for_audio = jax.tree.map(
                        lambda x: jax.numpy.asarray(np.asarray(x)),
                        state.params_g)
                except Exception:
                    LOG.warning(
                        "test audio skipped: params are not "
                        "host-addressable from process 0 (sharded "
                        "beyond data-parallel replication)")
                    params_for_audio = None
            if params_for_audio is not None:
                write_test_audio(params_for_audio, hp, _test_utts,
                                 dataset_path / "test_audio"
                                 / f"epoch_{epoch}")

        if (epoch + 1) % checkpoint_epochs == 0 and is_main_process:
            # params/opt state are replicated, so process 0's copy is the
            # global state; other hosts must not race the same files
            path = ckpt.save(str(ckpt_dir), state, hp, config)
            LOG.info("saved checkpoint: %s", path)

    if profiling:
        # the run ended before profile_steps completed — close the trace
        # so the files are written rather than silently dropped
        jax.block_until_ready(metrics)
        jax.profiler.stop_trace()
        LOG.info("device trace written (run ended mid-profile)")


@click.command(context_settings={"help_option_names": ["-h", "--help"]})
@click.option("--dataset-dir", required=True)
@click.option("--quality", default="medium",
              type=click.Choice(["micro", "x-low", "medium",
                                 "medium-istft", "medium-mb-istft",
                                 "high"]))
@click.option("--batch-size", default=16, type=int)
@click.option("--max-epochs", default=1000, type=int)
@click.option("--checkpoint-epochs", default=1, type=int)
@click.option("--validation-split", default=0.1, type=float)
@click.option("--num-test-examples", default=5, type=int)
@click.option("--max-phoneme-ids", default=None, type=int)
@click.option("--learning-rate", default=2e-4, type=float)
@click.option("--grad-clip", default=None, type=float)
@click.option("--remat", is_flag=True,
              help="Rematerialize generator activations (saves HBM)")
@click.option("--mas-impl", default="auto",
              type=click.Choice(["auto", "scan", "pallas"]),
              help="Alignment-search kernel (auto: Pallas on TPU)")
@click.option("--compute-dtype", default="float32",
              type=click.Choice(["float32", "bfloat16"]),
              help="bfloat16: mixed-precision compute with f32 master "
                   "weights (halves activation memory)")
@click.option("--grad-accum", default=1, type=int,
              help="Micro-batches per optimizer update: gradients of "
                   "batch-size/N slices are averaged before ONE update, "
                   "so activation memory scales with the slice (train "
                   "effective batches past HBM; keep N small, 2-8)")
@click.option("--profile-dir", default=None,
              help="Write a jax.profiler device trace of a few "
                   "post-compile steps here (xprof/tensorboard)")
@click.option("--profile-steps", default=5, type=int)
@click.option("--auto-layouts/--no-auto-layouts", default=True,
              help="Let XLA choose train-state device layouts (removes "
                   "per-step weight relayout copies; single-device runs)")
@click.option("--seed", default=1234, type=int)
@click.option("--resume-from-checkpoint", default=None)
@click.option("--resume-from-single-speaker-checkpoint",
              "resume_from_single_speaker", default=None)
@click.option("--debug", is_flag=True)
def main(**kwargs) -> None:
    debug = kwargs.pop("debug", False)
    logging.basicConfig(level=logging.DEBUG if debug else logging.INFO)
    run_training(**kwargs)


if __name__ == "__main__":
    main()
