"""End-to-end: ONNX container round-trip + TTSVoice synthesis to WAV."""

import io
import json
import wave

import numpy as np
import pytest

import jax

from phoonnx_tpu.models.vits.load import (
    infer_hparams_from_flat,
    params_from_flat,
    params_to_flat,
)
from phoonnx_tpu.models.vits.model import VitsHParams, random_params
from phoonnx_tpu.onnx.reader import read_onnx
from phoonnx_tpu.onnx.writer import write_onnx

SMALL_HP = VitsHParams(
    n_vocab=64,
    spec_channels=65,
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
)


@pytest.fixture(scope="module")
def voice_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("voice")
    params = random_params(jax.random.PRNGKey(0), SMALL_HP)
    flat = params_to_flat(params)
    model_path = tmp / "model.onnx"
    write_onnx(
        str(model_path),
        {k: np.asarray(v) for k, v in flat.items()},
        metadata={"model_type": "vits", "sample_rate": "22050"},
        inputs=["input", "input_lengths", "scales"],
        outputs=["output"],
    )
    id_map = {"_": 0, "^": 1, "$": 2, " ": 3}
    id_map.update({c: i + 4 for i, c in enumerate("abcdefghijklmnop")})
    config = {
        "phoneme_type": "raw",
        "lang_code": "en",
        "alphabet": "ipa",
        "phoneme_id_map": id_map,
        "num_symbols": len(id_map),
        "num_speakers": 1,
        "audio": {"sample_rate": 22050},
        "inference": {"noise_scale": 0.667, "length_scale": 1.0,
                      "noise_w": 0.8},
    }
    config_path = tmp / "model.onnx.json"
    config_path.write_text(json.dumps(config), encoding="utf-8")
    return model_path, config_path, params, flat


def test_onnx_roundtrip(voice_files):
    model_path, _, _, flat = voice_files
    model = read_onnx(str(model_path))
    assert model.opset == 15
    assert model.metadata["model_type"] == "vits"
    assert model.inputs == ["input", "input_lengths", "scales"]
    assert set(model.initializers) == set(flat)
    for name, want in flat.items():
        got = model.initializers[name]
        assert got.dtype == np.asarray(want).dtype
        np.testing.assert_array_equal(got, np.asarray(want))


def test_flat_roundtrip_through_importer(voice_files):
    _, _, params, flat = voice_files
    hp = infer_hparams_from_flat(flat)
    assert hp.n_vocab == SMALL_HP.n_vocab
    assert hp.hidden_channels == SMALL_HP.hidden_channels
    assert hp.upsample_rates == SMALL_HP.upsample_rates
    assert hp.resblock == SMALL_HP.resblock
    rebuilt = params_from_flat(flat, hp, strict=True)
    # every exported leaf must equal the original
    flat2 = params_to_flat(rebuilt)
    assert set(flat2) == set(flat)
    for name in flat:
        np.testing.assert_array_equal(flat[name], flat2[name])


def test_ttsvoice_load_and_synthesize(voice_files):
    from phoonnx_tpu import SynthesisConfig, TTSVoice

    model_path, config_path, _, _ = voice_files
    voice = TTSVoice.load(str(model_path), str(config_path))
    assert voice.config.sample_rate == 22050

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wav_file:
        voice.synthesize_wav(
            "[[abc def]]", wav_file,
            SynthesisConfig(seed=1234),
        )
    buf.seek(0)
    with wave.open(buf, "rb") as wav_file:
        assert wav_file.getframerate() == 22050
        assert wav_file.getnchannels() == 1
        frames = wav_file.getnframes()
        assert frames > 0
        pcm = np.frombuffer(wav_file.readframes(frames), np.int16)
    assert np.abs(pcm).max() > 0  # non-silent (normalized random voice)


def test_ttsvoice_streaming_matches_synthesize(voice_files):
    from phoonnx_tpu import SynthesisConfig, TTSVoice

    model_path, config_path, _, _ = voice_files
    voice = TTSVoice.load(str(model_path), str(config_path))
    cfg = SynthesisConfig(seed=11, normalize_audio=False)
    full = np.concatenate([
        c.audio_float_array for c in voice.synthesize("[[abc def]]", cfg)
    ])
    stream_chunks = list(voice.synthesize_streaming(
        "[[abc def]]", cfg, chunk_frames=8, overlap_frames=16))
    assert len(stream_chunks) > 1
    stream = np.concatenate([c.audio_float_array for c in stream_chunks])
    np.testing.assert_allclose(stream, full, atol=2e-5)


def test_ttsvoice_deterministic_seed(voice_files):
    from phoonnx_tpu import SynthesisConfig, TTSVoice

    model_path, config_path, _, _ = voice_files
    voice = TTSVoice.load(str(model_path), str(config_path))
    cfg = SynthesisConfig(seed=7)
    audio1 = voice.phoneme_ids_to_audio([1, 0, 4, 5, 6, 0, 2], cfg)
    audio2 = voice.phoneme_ids_to_audio([1, 0, 4, 5, 6, 0, 2], cfg)
    np.testing.assert_array_equal(audio1, audio2)


def test_engine_bucketing(voice_files):
    _, _, params, _ = voice_files
    from phoonnx_tpu.infer.engine import VitsEngine

    engine = VitsEngine(params, SMALL_HP, text_buckets=(8, 16),
                        frame_buckets=(32, 64, 128))
    short = engine.synthesize_ids([1, 4, 5], seed=0)
    longer = engine.synthesize_ids([1, 4, 5, 6, 7, 8, 9, 10, 11, 12], seed=0)
    assert short.ndim == 1 and longer.ndim == 1
    # trimmed to true frame counts * upsample factor
    assert len(short) % SMALL_HP.total_upsample == 0
    assert len(longer) % SMALL_HP.total_upsample == 0


def test_voice_conversion(tmp_path):
    """voice_conversion between speakers on a multi-speaker model."""
    from dataclasses import replace

    import jax.numpy as jnp

    from phoonnx_tpu.models.vits.model import voice_conversion

    hp = replace(SMALL_HP, n_speakers=3, gin_channels=16)
    params = random_params(jax.random.PRNGKey(1), hp)
    spec = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (1, 24, hp.spec_channels)
        ).astype(np.float32) ** 2
    )
    audio, y_mask = voice_conversion(
        params, hp, spec, jnp.asarray([24]),
        jnp.asarray([0]), jnp.asarray([2]), jax.random.PRNGKey(2),
    )
    assert audio.shape == (1, 24 * hp.total_upsample)
    assert np.isfinite(np.asarray(audio)).all()

    import pytest

    with pytest.raises(ValueError):
        voice_conversion(
            params, SMALL_HP, spec, jnp.asarray([24]),
            jnp.asarray([0]), jnp.asarray([1]), jax.random.PRNGKey(2),
        )


def test_voice_synthesize_batch(voice_files):
    from phoonnx_tpu import SynthesisConfig, TTSVoice

    model_path, config_path, _, _ = voice_files
    voice = TTSVoice.load(str(model_path), str(config_path))
    outs = voice.synthesize_batch(
        ["[[abc]]", "[[de fg]]"], SynthesisConfig(seed=3)
    )
    assert len(outs) == 2
    assert all(o.ndim == 1 and len(o) > 0 for o in outs)
    assert all(np.abs(o).max() <= 1.0 for o in outs)


def test_warm_start_from_torch_checkpoint(tmp_path, voice_files):
    """Generator import from a Lightning-style torch checkpoint, including
    the single->multi-speaker surgery."""
    torch = pytest.importorskip("torch")
    from dataclasses import replace

    from phoonnx_tpu.train.checkpoint import load_generator_warm_start

    _, _, params, flat = voice_files
    state_dict = {
        "model_g." + k: torch.from_numpy(np.asarray(v).copy())
        for k, v in flat.items()
    }
    state_dict["model_d.something.weight"] = torch.zeros(3)
    ckpt_path = tmp_path / "lightning.ckpt"
    torch.save({"state_dict": state_dict, "epoch": 7}, ckpt_path)

    # same-architecture warm start: weights must round-trip exactly
    restored = load_generator_warm_start(str(ckpt_path), SMALL_HP, None)
    np.testing.assert_array_equal(
        np.asarray(restored["enc_p"]["emb"]["weight"]),
        np.asarray(params["enc_p"]["emb"]["weight"]),
    )

    # single -> multi-speaker: conditioning layers appear fresh
    hp_multi = replace(SMALL_HP, n_speakers=4, gin_channels=16)
    multi = load_generator_warm_start(str(ckpt_path), hp_multi, None)
    assert "emb_g" in multi
    assert "cond" in multi["dec"]
    np.testing.assert_array_equal(
        np.asarray(multi["enc_p"]["emb"]["weight"]),
        np.asarray(params["enc_p"]["emb"]["weight"]),
    )


def test_engine_fused_mode(voice_files):
    _, _, params, _ = voice_files
    from phoonnx_tpu.infer.engine import VitsEngine

    engine = VitsEngine(params, SMALL_HP, text_buckets=(8, 16),
                        frame_buckets=(64, 128, 256), mode="fused",
                        frames_per_token=8)
    audio = engine.synthesize_ids([1, 4, 5, 6], seed=0)
    assert audio.ndim == 1 and len(audio) > 0
    assert np.isfinite(audio).all()
    # deterministic per seed within the mode
    audio_again = engine.synthesize_ids([1, 4, 5, 6], seed=0)
    np.testing.assert_array_equal(audio, audio_again)


def test_engine_synthesize_many(voice_files):
    _, _, params, _ = voice_files
    from phoonnx_tpu.infer.engine import VitsEngine

    engine = VitsEngine(params, SMALL_HP, text_buckets=(8, 16),
                        frame_buckets=(64, 128, 256), frames_per_token=8)
    outs = engine.synthesize_many([[1, 4, 5], [2, 6, 7, 8, 9]], seed=3)
    assert len(outs) == 2
    assert all(o.ndim == 1 and len(o) > 0 for o in outs)


def test_engine_pcm16_fetch(voice_files):
    _, _, params, _ = voice_files
    from phoonnx_tpu.infer.engine import VitsEngine

    base = VitsEngine(params, SMALL_HP, text_buckets=(8,),
                      frame_buckets=(64, 128))
    quant = VitsEngine(params, SMALL_HP, text_buckets=(8,),
                       frame_buckets=(64, 128), fetch_pcm16=True)
    a = base.synthesize_ids([1, 4, 5], seed=0)
    b = quant.synthesize_ids([1, 4, 5], seed=0)
    assert len(a) == len(b)
    assert np.abs(a - b).max() <= 1.0 / 32767.0 + 1e-6


def test_params_from_flat_strict_rejects_partial_checkpoint(voice_files):
    """strict=True must reject checkpoints with missing leaves — they
    would otherwise run with random init in the gaps (silent noise)."""
    _, _, _, flat = voice_files
    hp = infer_hparams_from_flat(flat)
    partial = {k: v for k, v in flat.items()
               if not k.startswith("dec.resblocks")}
    with pytest.raises(ValueError, match="leaves missing"):
        params_from_flat(partial, hp, strict=True)
    # non-strict tolerates it (warm starts / surgery)
    params_from_flat(partial, hp, strict=False)


def test_quantized_voice_loads_on_compiled_engine(voice_files, tmp_path):
    """An int8-quantized voice (onnxruntime quantize_dynamic naming:
    X_quantized/X_scale/X_zero_point triples) imports into the compiled
    JAX engine via the dequantization pre-pass instead of falling back
    to the host ONNX interpreter."""
    from phoonnx_tpu import SynthesisConfig, TTSVoice
    from phoonnx_tpu.infer.engine import VitsEngine
    from phoonnx_tpu.onnx.dequant import dequantize_flat, quantize_flat

    model_path, config_path, _, flat = voice_files
    weights = {k: np.asarray(v) for k, v in flat.items()}
    qweights, n_q = quantize_flat(weights)
    assert n_q > 5
    qmodel_path = tmp_path / "model.int8.onnx"
    write_onnx(
        str(qmodel_path), qweights,
        metadata={"model_type": "vits", "sample_rate": "22050",
                  "quantization": "int8-weights"},
        inputs=["input", "input_lengths", "scales"],
        outputs=["output"],
    )
    assert qmodel_path.stat().st_size < model_path.stat().st_size * 0.5

    voice = TTSVoice.load(str(qmodel_path), str(config_path))
    assert isinstance(voice.engine, VitsEngine)  # NOT the fallback

    # engine weights equal the reconstructed triples exactly
    from phoonnx_tpu.models.vits.load import params_to_flat

    restored, _ = dequantize_flat(qweights)
    engine_flat = params_to_flat(voice.engine.params)
    np.testing.assert_array_equal(
        np.asarray(engine_flat["enc_p.emb.weight"], np.float32),
        restored["enc_p.emb.weight"],
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wav_file:
        voice.synthesize_wav("[[abc def]]", wav_file,
                             SynthesisConfig(seed=7))
    buf.seek(0)
    with wave.open(buf, "rb") as wav_file:
        assert wav_file.getnframes() > 0


def test_voice_with_unresolvable_quantization_falls_back(voice_files,
                                                         tmp_path):
    """A voice whose quantized triples can't be resolved by name (square
    per-channel weights) must run on the graph interpreter, not import
    partially onto the compiled engine with random leaves."""
    from phoonnx_tpu import TTSVoice
    from phoonnx_tpu.infer.onnx_engine import OnnxFallbackEngine
    from phoonnx_tpu.onnx.dequant import quantize_flat

    _, config_path, _, flat = voice_files
    weights = {k: np.asarray(v) for k, v in flat.items()}
    qweights, _ = quantize_flat(weights)
    # sabotage one triple into an ambiguous square per-channel layout
    name = next(k[:-len("_quantized")] for k in qweights
                if k.endswith("_quantized"))
    q = qweights[name + "_quantized"]
    sq = np.zeros((16, 16), np.int8)
    qweights[name + "_quantized"] = sq
    qweights[name + "_scale"] = np.full(16, 0.01, np.float32)
    qweights[name + "_zero_point"] = np.zeros(16, np.int8)

    path = tmp_path / "ambiguous.onnx"
    write_onnx(str(path), qweights,
               metadata={"model_type": "vits", "sample_rate": "22050"},
               inputs=["input", "input_lengths", "scales"],
               outputs=["output"])
    voice = TTSVoice.load(str(path), str(config_path))
    assert isinstance(voice.engine, OnnxFallbackEngine)


def test_lang_id_threads_through_every_synthesis_path():
    """SynthesisConfig.lang_id must reach the engine on ALL paths —
    synthesize (per-sentence), synthesize_streaming, and
    synthesize_batch (found by review: streaming/batch silently dropped
    it, so multi-language foreign voices spoke language 0 there)."""
    from phoonnx_tpu import SynthesisConfig
    from phoonnx_tpu.config import VoiceConfig
    from phoonnx_tpu.voice import TTSVoice

    seen = []

    class _Engine:
        class hp:
            sample_rate = 16000
            total_upsample = 1

        def synthesize_ids(self, ids, lang_id=None, **kw):
            seen.append(("one", lang_id))
            return np.zeros(64, np.float32)

        def synthesize_ids_streaming(self, ids, lang_id=None, **kw):
            seen.append(("stream", lang_id))
            yield np.zeros(64, np.float32)

        def synthesize_batch(self, batch_ids, lang_id=None, **kw):
            seen.append(("batch", lang_id))
            return (np.zeros((len(batch_ids), 64), np.float32),
                    [64] * len(batch_ids))

    config = VoiceConfig.from_dict({
        "phoneme_type": "raw", "lang_code": "en", "alphabet": "ipa",
        "phoneme_id_map": {"_": 0, "^": 1, "$": 2, " ": 3, "a": 4,
                           "b": 5, "c": 6},
        "num_symbols": 7, "num_speakers": 1,
        "audio": {"sample_rate": 16000},
    })
    voice = TTSVoice(engine=_Engine(), config=config)
    cfg = SynthesisConfig(lang_id=2)
    list(voice.synthesize("[[abc]]", cfg))
    list(voice.synthesize_streaming("[[abc]]", cfg))
    voice.synthesize_batch(["[[abc]]"], cfg)
    kinds = {k: v for k, v in seen}
    assert kinds.get("one") == 2, seen
    assert kinds.get("stream") == 2, seen
    assert kinds.get("batch") == 2, seen
