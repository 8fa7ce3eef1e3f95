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


# -- speech-shaped validation (reference trim behavior: trim.py:8-54,
#    threshold 0.2, keep 2 chunks of context) --------------------------------


def _speech_like(n_lead, n_speech, n_trail, noise_amp=0.01, seed=0):
    """Synthetic utterance: noise floor, AM-modulated tone burst
    (speech-like 3 Hz envelope over a 180 Hz carrier + harmonics),
    noise floor. Returns (audio, speech_start_sample, speech_end_sample).
    """
    rng = np.random.default_rng(seed)
    total = (n_lead + n_speech + n_trail) * _CHUNK
    audio = noise_amp * rng.standard_normal(total).astype(np.float32)
    t = np.arange(n_speech * _CHUNK) / 16000.0
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 3.0 * t + 0.7)
    voiced = (np.sin(2 * np.pi * 180 * t)
              + 0.5 * np.sin(2 * np.pi * 360 * t)
              + 0.25 * np.sin(2 * np.pi * 720 * t))
    s0 = n_lead * _CHUNK
    s1 = s0 + n_speech * _CHUNK
    audio[s0:s1] += (0.3 * env * voiced).astype(np.float32)
    return audio, s0, s1


@pytest.mark.parametrize("n_lead,n_speech,n_trail", [(20, 40, 30),
                                                     (8, 25, 8)])
def test_fake_vad_speech_shaped_trim_bounds(fake_vad, n_lead, n_speech,
                                            n_trail):
    """Fake-silero path on speech-shaped audio: the trim must keep every
    speech sample and start/end within keep-context +/- 2 chunks of the
    true burst boundaries (reference keeps exactly 2, trim.py:46-47)."""
    audio, s0, s1 = _speech_like(n_lead, n_speech, n_trail)
    start, end = trim_silence(audio, detector=fake_vad)
    assert start <= s0 and end >= s1, "speech samples were cut"
    assert s0 - start <= 4 * _CHUNK  # 2 context + 2 tolerance
    assert end - s1 <= 4 * _CHUNK


@pytest.mark.parametrize("n_lead,n_speech,n_trail", [(20, 40, 30),
                                                     (8, 25, 8)])
def test_energy_fallback_speech_shaped_trim_bounds(n_lead, n_speech,
                                                   n_trail):
    """The energy fallback (no silero model) must find the same burst.

    Its adaptive normalization maps the noise floor to ~0 and voiced
    peaks to ~1, so boundaries land within the same +/- 2-chunk
    tolerance — the AM envelope's low-energy dips sit INSIDE the burst
    and cannot move first/last speech chunks by more than the dip width.
    """
    detector = SileroVoiceActivityDetector(model_path=None)
    assert detector._executor is None
    audio, s0, s1 = _speech_like(n_lead, n_speech, n_trail)
    start, end = trim_silence(audio, detector=detector)
    assert start <= s0 and end >= s1, "speech samples were cut"
    assert s0 - start <= 4 * _CHUNK
    assert end - s1 <= 4 * _CHUNK


def test_energy_fallback_matches_fake_vad_on_speech(fake_vad):
    """On clean speech-shaped input the two paths agree to +/- 2 chunks."""
    audio, _, _ = _speech_like(15, 30, 25)
    s_sil, e_sil = trim_silence(audio, detector=fake_vad)
    s_en, e_en = trim_silence(
        audio, detector=SileroVoiceActivityDetector(model_path=None))
    assert abs(s_sil - s_en) <= 2 * _CHUNK
    assert abs(e_sil - e_en) <= 2 * _CHUNK


def test_energy_fallback_divergence_documented():
    """Where the energy fallback DIVERGES from a speech detector, by
    design: its normalization is relative, so any loud non-speech
    segment (music, a door slam) reads as 'speech' and is kept, where
    silero would score it low. Conversely pure steady noise (peak ==
    floor) returns all-ones probs -> untrimmed, never a bogus trim."""
    detector = SileroVoiceActivityDetector(model_path=None)
    # loud noise burst amid quiet noise: energy VAD keeps the burst
    rng = np.random.default_rng(1)
    audio = 0.005 * rng.standard_normal(60 * _CHUNK).astype(np.float32)
    audio[20 * _CHUNK:30 * _CHUNK] *= 60.0  # non-speech transient
    start, end = trim_silence(audio, detector=detector)
    assert start >= 16 * _CHUNK and end <= 34 * _CHUNK  # trimmed to burst
    # steady noise: adaptive floor == peak -> full range kept
    steady = 0.005 * rng.standard_normal(40 * _CHUNK).astype(np.float32)
    s2, e2 = trim_silence(steady, detector=detector)
    assert s2 == 0 and e2 >= 38 * _CHUNK


def test_runtime_runner_failure_falls_back_to_interpreter(tmp_path):
    """A compiled-runner crash mid-call must degrade to the interpreter
    (ADVICE r2), not propagate out of the preprocess worker."""
    from phoonnx_tpu.onnx.executor import OnnxExecutor

    path = tmp_path / "silero_vad.onnx"
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
    det = SileroVoiceActivityDetector(model_path=str(path))
    assert det._executor is not None

    class Boom:
        def run(self, feeds):
            raise RuntimeError("trace failed")

    det._executor = Boom()
    tone = (0.3 * np.sin(2 * np.pi * 220 * np.arange(_CHUNK * 3) / 16000)
            ).astype(np.float32)
    probs = det.speech_probs(tone)
    assert isinstance(det._executor, OnnxExecutor)
    assert probs.shape == (3,)
    assert (probs > 0.2).all()
