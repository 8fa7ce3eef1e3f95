"""Silero-VAD path exercised with a fake ONNX model.

The real silero_vad.onnx blob is not shipped; tests elsewhere cover the
energy fallback. A tiny graph with silero's I/O contract (input/sr/h/c
-> prob + recurrent state, reference norm_audio/vad.py:8-54) drives the
chunk loop, state threading, and trim_silence edge logic for real.
"""

import numpy as np
import pytest

from phoonnx_tpu.onnx.writer import write_onnx
from phoonnx_tpu.train.audio import (
    SileroVoiceActivityDetector,
    trim_silence,
)

_CHUNK = 480


@pytest.fixture(scope="module")
def fake_vad(tmp_path_factory):
    """prob = 20 * mean(|chunk|): ~0 on silence, >1 on a 0.3-amp tone."""
    path = tmp_path_factory.mktemp("vad") / "silero_vad.onnx"
    write_onnx(
        str(path),
        initializers={"gain": np.asarray(20.0, np.float32)},
        inputs=["input", "sr", "h", "c"],
        outputs=["prob", "h_out", "c_out"],
        nodes=[
            ("Abs", ["input"], ["absin"]),
            ("ReduceMean", ["absin"], ["mean"]),
            ("Mul", ["mean", "gain"], ["prob"]),
            ("Identity", ["h"], ["h_out"]),
            ("Identity", ["c"], ["c_out"]),
        ],
    )
    return SileroVoiceActivityDetector(model_path=str(path))


def test_fake_vad_probs_track_energy(fake_vad):
    assert fake_vad._executor is not None  # really using the model
    silence = np.zeros(_CHUNK * 3, np.float32)
    tone = 0.3 * np.sin(2 * np.pi * 220 * np.arange(_CHUNK * 3) / 16000)
    probs = fake_vad.speech_probs(
        np.concatenate([silence, tone.astype(np.float32)]))
    assert probs.shape == (6,)
    assert (probs[:3] < 0.2).all()
    assert (probs[3:] > 0.2).all()


def test_fake_vad_trim_silence_keeps_context(fake_vad):
    silence = np.zeros(_CHUNK * 10, np.float32)
    tone = (0.3 * np.sin(2 * np.pi * 220 * np.arange(_CHUNK * 5) / 16000)
            ).astype(np.float32)
    audio = np.concatenate([silence, tone, silence])
    start, end = trim_silence(audio, detector=fake_vad)
    # speech spans chunks [10, 15); the reference keeps 2 chunks of
    # context on each side (trim.py:8-54)
    assert start == (10 - 2) * _CHUNK
    assert end == (15 + 2) * _CHUNK


def test_fake_vad_all_silence_returns_full_range(fake_vad):
    audio = np.zeros(_CHUNK * 4, np.float32)
    start, end = trim_silence(audio, detector=fake_vad)
    assert (start, end) == (0, len(audio))
