"""End-to-end pipeline smoke on the real TPU chip (run as a file so
multiprocessing spawn workers can re-import __main__)."""
import logging
import math
import wave
from pathlib import Path

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO)
    root = Path("/tmp/tpu_e2e/corpus")
    (root / "wavs").mkdir(parents=True, exist_ok=True)
    texts = ["hello world", "testing one two", "the quick brown fox",
             "jumped over", "a lazy dog", "goodbye now",
             "seven eight nine", "final utterance"]
    sr = 16000
    rng = np.random.default_rng(0)
    lines = []
    for i, text in enumerate(texts):
        t = np.arange(int(sr * 0.6)) / sr
        audio = (0.4 * np.sin(2 * math.pi * (150 + 35 * i) * t)
                 + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
        with wave.open(str(root / "wavs" / f"utt{i}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(pcm.tobytes())
        lines.append(f"utt{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")

    from phoonnx_tpu.train.preprocess import run_preprocess
    run_preprocess(
        input_dir=str(root), output_dir="/tmp/tpu_e2e/dataset",
        language="en", phoneme_type="graphemes", alphabet="unicode",
        sample_rate=sr, max_workers=2, single_speaker=True,
        n_fft=128, hop_length=16, win_length=128,
    )
    print("== preprocess done ==", flush=True)

    import jax
    print("devices:", jax.devices(), flush=True)
    from phoonnx_tpu.train.trainer import run_training
    run_training(
        dataset_dir="/tmp/tpu_e2e/dataset", quality="micro", batch_size=2,
        max_epochs=3, checkpoint_epochs=1, validation_split=0.25,
        num_test_examples=0, log_every=1,
    )
    print("== training done ==", flush=True)

    from phoonnx_tpu.train.export import run_export
    ckpts = sorted(Path("/tmp/tpu_e2e/dataset/checkpoints").glob("*.npz"))
    model_path = run_export(
        checkpoint=str(ckpts[-1]),
        config_path="/tmp/tpu_e2e/dataset/config.json",
        output_dir="/tmp/tpu_e2e/voice", quality="micro",
        generate_tokens=True, piper=True,
    )
    print("== exported:", model_path, "==", flush=True)

    from phoonnx_tpu import SynthesisConfig, TTSVoice
    voice = TTSVoice.load(str(model_path))
    with wave.open("/tmp/tpu_e2e/out.wav", "wb") as f:
        voice.synthesize_wav("hello world", f, SynthesisConfig(seed=0))
    with wave.open("/tmp/tpu_e2e/out.wav", "rb") as f:
        n = f.getnframes()
        pcm = np.frombuffer(f.readframes(n), np.int16)
    print(f"== synthesized {n} samples @ {voice.config.sample_rate} Hz, "
          f"peak {abs(pcm).max()} ==", flush=True)

    chunks = list(voice.synthesize_streaming(
        "hello world again", SynthesisConfig(seed=1), chunk_frames=64))
    print(f"== streaming on TPU: {len(chunks)} chunk(s), "
          f"{sum(len(c.audio_float_array) for c in chunks)} samples ==",
          flush=True)


if __name__ == "__main__":
    main()
