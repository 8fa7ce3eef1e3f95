"""Synthesis CLI surface (python -m phoonnx_tpu.synthesize)."""

import json
import wave

import numpy as np
import pytest
from click.testing import CliRunner

import jax

from phoonnx_tpu.models.vits import model as vits_model
from phoonnx_tpu.models.vits.load import params_to_flat
from phoonnx_tpu.models.vits.model import VitsHParams
from phoonnx_tpu.onnx.writer import write_onnx
from phoonnx_tpu.synthesize import main as synthesize_main


@pytest.fixture(scope="module")
def voice_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_voice")
    hp = VitsHParams.preset("micro")
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    model_path = tmp / "model.onnx"
    write_onnx(
        str(model_path),
        {k: np.asarray(v) for k, v in params_to_flat(params).items()},
        metadata={"model_type": "vits", "sample_rate": "16000"},
        inputs=["input", "input_lengths", "scales"],
        outputs=["output"],
    )
    id_map = {"_": 0, "^": 1, "$": 2, " ": 3}
    id_map.update({c: i + 4 for i, c in enumerate("abcdefghijklmnop")})
    (tmp / "model.onnx.json").write_text(json.dumps({
        "phoneme_type": "raw", "lang_code": "en", "alphabet": "ipa",
        "phoneme_id_map": id_map, "num_symbols": len(id_map),
        "num_speakers": 1, "audio": {"sample_rate": 16000},
        "inference": {"noise_scale": 0.667, "length_scale": 1.0,
                      "noise_w": 0.8},
    }), encoding="utf-8")
    return model_path


def _check_wav(path, sample_rate=16000):
    with wave.open(str(path), "rb") as w:
        assert w.getframerate() == sample_rate
        n = w.getnframes()
        pcm = np.frombuffer(w.readframes(n), np.int16)
    assert n > 0 and np.abs(pcm).max() > 0
    return pcm


def test_cli_synthesize(voice_files, tmp_path):
    out = tmp_path / "out.wav"
    result = CliRunner().invoke(synthesize_main, [
        "-m", str(voice_files), "-t", "[[abc def]]", "-o", str(out),
        "--seed", "3", "--stats",
    ])
    assert result.exit_code == 0, result.output
    _check_wav(out)


def test_cli_synthesize_stream_matches(voice_files, tmp_path):
    out_full = tmp_path / "full.wav"
    out_stream = tmp_path / "stream.wav"
    common = ["-m", str(voice_files), "-t", "[[abc def gah]]",
              "--seed", "5", "--no-normalize"]
    r1 = CliRunner().invoke(synthesize_main,
                            common + ["-o", str(out_full)])
    r2 = CliRunner().invoke(synthesize_main,
                            common + ["-o", str(out_stream), "--stream"])
    assert r1.exit_code == 0, r1.output
    assert r2.exit_code == 0, r2.output
    full = _check_wav(out_full)
    stream = _check_wav(out_stream)
    assert len(full) == len(stream)
    np.testing.assert_allclose(stream, full, atol=2)


def test_cli_voice_conversion(tmp_path):
    from dataclasses import replace as _replace

    from phoonnx_tpu.convert import main as convert_main

    hp = _replace(VitsHParams.preset("micro"), n_speakers=3,
                  gin_channels=16)
    params = vits_model.random_params(jax.random.PRNGKey(2), hp)
    model_path = tmp_path / "ms.onnx"
    write_onnx(
        str(model_path),
        {k: np.asarray(v) for k, v in params_to_flat(params).items()},
        metadata={"model_type": "vits", "sample_rate": "16000",
                  "n_speakers": "3"},
        inputs=["input", "input_lengths", "scales", "sid"],
        outputs=["output"],
    )
    id_map = {"_": 0, "^": 1, "$": 2, " ": 3, "a": 4, "b": 5}
    (tmp_path / "ms.onnx.json").write_text(json.dumps({
        "phoneme_type": "raw", "lang_code": "en", "alphabet": "ipa",
        "phoneme_id_map": id_map, "num_symbols": len(id_map),
        "num_speakers": 3, "audio": {"sample_rate": 16000},
        "inference": {"noise_scale": 0.667, "length_scale": 1.0,
                      "noise_w": 0.8},
    }), encoding="utf-8")

    src = tmp_path / "src.wav"
    rng = np.random.default_rng(0)
    pcm = (0.2 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000)
           + 0.01 * rng.standard_normal(8000))
    with wave.open(str(src), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes((pcm * 32767).astype(np.int16).tobytes())

    out = tmp_path / "converted.wav"
    result = CliRunner().invoke(convert_main, [
        "-m", str(model_path), "-i", str(src), "-o", str(out),
        "--from-speaker", "0", "--to-speaker", "2", "--seed", "1",
    ])
    assert result.exit_code == 0, result.output
    converted = _check_wav(out)
    # frames -> samples contract: output = spec frames * hop, i.e. about
    # the input length (exact count depends on the STFT edge padding)
    assert len(converted) % 16 == 0
    assert abs(len(converted) - 8000) <= 256

    # wrong sample rate input is rejected cleanly
    bad = CliRunner().invoke(convert_main, [
        "-m", str(model_path), "-i", str(src), "-o", str(out),
        "--from-speaker", "0", "--to-speaker", "1",
    ], env={})
    assert bad.exit_code == 0  # same file is fine; now break the rate
    with wave.open(str(tmp_path / "bad.wav"), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(b"\x00\x00" * 100)
    bad = CliRunner().invoke(convert_main, [
        "-m", str(model_path), "-i", str(tmp_path / "bad.wav"),
        "-o", str(out), "--from-speaker", "0", "--to-speaker", "1",
    ])
    assert bad.exit_code != 0
    assert "resample" in bad.output

    # out-of-range speaker ids are rejected (jnp.take would clamp them
    # silently and convert to the wrong speaker)
    bad = CliRunner().invoke(convert_main, [
        "-m", str(model_path), "-i", str(src), "-o", str(out),
        "--from-speaker", "0", "--to-speaker", "999",
    ])
    assert bad.exit_code != 0
    assert "out of range" in bad.output


def test_cli_stdin_input(voice_files, tmp_path):
    out = tmp_path / "stdin.wav"
    result = CliRunner().invoke(synthesize_main, [
        "-m", str(voice_files), "-o", str(out), "--seed", "1",
    ], input="[[ab cd]]")
    assert result.exit_code == 0, result.output
    _check_wav(out)


def test_cli_synthesize_empty_text_writes_valid_wav(voice_files, tmp_path):
    """Zero-chunk input must not crash Wave_write.close() — headers are
    set upfront from the voice config."""
    from phoonnx_tpu.synthesize import main as synthesize_main

    out = tmp_path / "empty.wav"
    result = CliRunner().invoke(synthesize_main, [
        "-m", str(voice_files), "-o", str(out), "-t", "   ",
    ])
    assert result.exit_code == 0, result.output
    with wave.open(str(out), "rb") as f:
        assert f.getnchannels() == 1
        assert f.getnframes() == 0


def test_cli_quantize_voice(voice_files, tmp_path):
    """python -m phoonnx_tpu.quantize: fp32 voice -> int8 executable
    graph that reloads on the compiled engine and synthesizes."""
    from phoonnx_tpu.quantize import main as quantize_main

    out_model = tmp_path / "voice.int8.onnx"
    result = CliRunner().invoke(quantize_main, [
        "-m", str(voice_files), "-o", str(out_model)])
    assert result.exit_code == 0, result.output
    assert out_model.exists()
    assert (tmp_path / "voice.int8.onnx.json").exists()  # config copied
    assert out_model.stat().st_size < voice_files.stat().st_size * 0.6

    from phoonnx_tpu import SynthesisConfig, TTSVoice
    from phoonnx_tpu.infer.engine import VitsEngine

    voice = TTSVoice.load(str(out_model))
    assert isinstance(voice.engine, VitsEngine)
    audio = voice.phoneme_ids_to_audio([1, 4, 5, 6, 2],
                                       SynthesisConfig(seed=0))
    assert np.isfinite(audio).all() and len(audio) > 0

    # idempotent: re-quantizing the int8 voice still works
    out2 = tmp_path / "voice.int8b.onnx"
    again = CliRunner().invoke(quantize_main, [
        "-m", str(out_model), "-o", str(out2)])
    assert again.exit_code == 0, again.output


def test_cli_quantize_rejects_foreign_graph(tmp_path):
    from phoonnx_tpu.quantize import main as quantize_main

    path = tmp_path / "foreign.onnx"
    write_onnx(str(path), {"w": np.zeros((8, 8), np.float32)},
               inputs=["input"], outputs=["output"],
               nodes=[("MatMul", ["input", "w"], ["output"])])
    result = CliRunner().invoke(quantize_main, [
        "-m", str(path), "-o", str(tmp_path / "out.onnx")])
    assert result.exit_code != 0
    assert "import layout" in result.output
