"""Train-at-scale evidence run on the real chip.

Exercises the production training path end to end at the medium preset:
synthetic 22.05 kHz corpus -> preprocess (real 1024/256 spectrogram
params) -> multi-epoch training with bf16 compute + gradient
accumulation + per-epoch checkpointing, then a MID-RUN RESUME from the
phase-A checkpoint. Records per-epoch wall time (step-time stability —
recompiles after warmup would show up as epoch-time spikes), generator
loss trajectory, and HBM footprint; prints a JSON summary for
TRAINING.md.

Usage (on the TPU chip):
    python tools/train_scale_run.py --workdir /tmp/scale_run \
        [--utts 96] [--epochs 12] [--resume-at 6] [--batch-size 16]
"""

import argparse
import json
import logging
import math
import re
import sys
import time
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class _Capture(logging.Handler):
    """Collect trainer log lines for the summary."""

    def __init__(self):
        super().__init__()
        self.epoch_seconds = {}
        self.losses = {}   # step -> loss_g
        self.val = {}
        self.hbm = None
        self.checkpoints = []

    def emit(self, record):
        msg = record.getMessage()
        m = re.match(r"epoch (\d+) done in ([\d.]+)s", msg)
        if m:
            self.epoch_seconds[int(m.group(1))] = float(m.group(2))
        m = re.match(r"epoch (\d+) step (\d+) loss_g=([\d.eE+-]+)", msg)
        if m:
            self.losses[int(m.group(2))] = float(m.group(3))
        m = re.match(r"epoch (\d+) val_loss=([\d.eE+-]+)", msg)
        if m:
            self.val[int(m.group(1))] = float(m.group(2))
        if msg.startswith("device memory after first epoch"):
            self.hbm = msg.split(": ", 1)[-1]
        if msg.startswith("saved checkpoint"):
            self.checkpoints.append(msg.split(": ", 1)[-1])


def build_corpus(root: Path, n_utts: int, sr: int = 22050) -> None:
    """Speech-shaped synthetic utterances: AM-modulated harmonic tones
    with per-utterance f0/duration so batches see realistic length
    variation (1.0-3.0 s at hop 256 -> 86-258 frames)."""
    wav_dir = root / "wavs"
    wav_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    words = ("the quick brown fox jumped over a lazy dog and ran far "
             "away to the green hills beyond town").split()
    lines = []
    for i in range(n_utts):
        dur = 1.0 + 2.0 * rng.random()
        t = np.arange(int(sr * dur)) / sr
        f0 = 120 + 80 * rng.random()
        env = 0.5 + 0.5 * np.sin(2 * math.pi * (2.5 + rng.random()) * t)
        audio = env * sum(
            a * np.sin(2 * math.pi * f0 * k * t + rng.random())
            for k, a in ((1, 0.5), (2, 0.25), (3, 0.12))
        )
        audio = (audio + 0.01 * rng.standard_normal(len(t))).astype(
            np.float32)
        pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
        with wave.open(str(wav_dir / f"utt{i}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(pcm.tobytes())
        n_words = 3 + int(rng.integers(0, 8))
        text = " ".join(rng.choice(words, n_words))
        lines.append(f"utt{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--utts", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--resume-at", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--quality", default="medium")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--grad-accum", type=int, default=2)
    ap.add_argument("--summary-json", default=None,
                    help="also write the summary to this path")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)
    work = Path(args.workdir)
    corpus = work / "corpus"
    dataset = work / "dataset"

    from phoonnx_tpu.train.preprocess import run_preprocess
    from phoonnx_tpu.train.trainer import run_training

    if not (dataset / "dataset.jsonl").exists():
        print(f"building {args.utts}-utterance corpus ...")
        build_corpus(corpus, args.utts)
        run_preprocess(
            input_dir=str(corpus), output_dir=str(dataset),
            language="en", phoneme_type="graphemes", alphabet="unicode",
            sample_rate=22050, max_workers=4, single_speaker=True,
            cache_dir=str(work / "cache"),
        )

    cap = _Capture()
    logging.getLogger("trainer").addHandler(cap)

    common = dict(
        dataset_dir=str(dataset), quality=args.quality,
        batch_size=args.batch_size, checkpoint_epochs=1,
        validation_split=0.1, num_test_examples=2,
        compute_dtype=args.compute_dtype, grad_accum=args.grad_accum,
        log_every=1, seed=1234,
    )

    t0 = time.time()
    print(f"phase A: epochs 0..{args.resume_at - 1}")
    run_training(max_epochs=args.resume_at, **common)
    mid_ckpts = sorted(
        (dataset / "checkpoints").glob("step_*.npz"),
        key=lambda p: int(p.stem.split("_")[1]))
    assert mid_ckpts, "phase A wrote no checkpoint"

    print(f"phase B: resume from {mid_ckpts[-1]} -> epoch {args.epochs}")
    run_training(max_epochs=args.epochs,
                 resume_from_checkpoint=str(mid_ckpts[-1]), **common)
    total_s = time.time() - t0

    # final export -> TTSVoice.load -> synthesis energy sanity: the run
    # must end in a LOADABLE voice whose waveform carries audible energy
    # (VERDICT r4 #2b), mirroring the reference's train -> export_onnx
    # -> voice usage loop (reference phoonnx_train/export_onnx.py).
    export_check = {}
    try:
        from phoonnx_tpu import SynthesisConfig, TTSVoice
        from phoonnx_tpu.train.export import run_export

        final_ckpts = sorted(
            (dataset / "checkpoints").glob("step_*.npz"),
            key=lambda p: int(p.stem.split("_")[1]))
        model_path = run_export(
            checkpoint=str(final_ckpts[-1]),
            config_path=str(dataset / "config.json"),
            output_dir=str(work / "exported"),
            quality=args.quality,
        )
        voice = TTSVoice.load(str(model_path))
        audio = voice.phoneme_ids_to_audio(
            list(range(1, 24)), SynthesisConfig(seed=0))
        rms = float(np.sqrt(np.mean(np.square(audio))))
        export_check = {
            "exported_model": str(model_path),
            "synth_samples": int(len(audio)),
            "synth_rms": round(rms, 5),
            "audible": bool(rms > 1e-3 and np.isfinite(audio).all()),
        }
    except Exception as exc:  # keep the loss evidence even if this trips
        export_check = {"error": repr(exc)}

    steps = sorted(cap.losses)
    epochs = sorted(cap.epoch_seconds)
    # warm epochs exclude each phase's first epoch (compile-dominated);
    # phase B's first epoch index is args.resume_at
    warm = [cap.epoch_seconds[e] for e in epochs
            if e not in (0, args.resume_at)]
    first_loss = cap.losses[steps[0]]
    tail = [cap.losses[s] for s in steps[-5:]]
    summary = {
        "preset": args.quality,
        "batch_size": args.batch_size,
        "compute_dtype": args.compute_dtype,
        "grad_accum": args.grad_accum,
        "utterances": args.utts,
        "epochs": len(epochs),
        "resumed_at_epoch": args.resume_at,
        "loss_g_first": round(first_loss, 2),
        "loss_g_last5_mean": round(float(np.mean(tail)), 2),
        "loss_decreasing": bool(np.mean(tail) < first_loss),
        "epoch_seconds": {e: round(cap.epoch_seconds[e], 2)
                          for e in epochs},
        "warm_epoch_s_mean": round(float(np.mean(warm)), 2),
        "warm_epoch_s_max_over_min": round(
            float(max(warm) / min(warm)), 3) if warm else None,
        "val_loss": {e: round(v, 3) for e, v in sorted(cap.val.items())},
        "hbm": cap.hbm,
        "checkpoints_written": len(cap.checkpoints),
        "total_wall_s": round(total_s, 1),
        # the machine-readable loss CURVE (<=200 points, step->loss_g)
        "loss_curve": {
            str(s): round(cap.losses[s], 2)
            for s in steps[::max(1, len(steps) // 200)]},
        "export_check": export_check,
    }
    print("SCALE_RUN_SUMMARY " + json.dumps(summary))
    if args.summary_json:
        Path(args.summary_json).write_text(json.dumps(summary, indent=1),
                                           encoding="utf-8")


if __name__ == "__main__":
    main()
