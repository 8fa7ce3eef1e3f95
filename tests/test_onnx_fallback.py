"""Foreign ONNX voices run via the fallback graph interpreter.

A voice whose initializers are NOT the piper/phoonnx state-dict layout
cannot be name-imported into the JAX VITS pytree; TTSVoice.load must
fall back to interpreting the voice's own graph (the reference's
architecture-agnostic behavior, voice.py:167).
"""

import json

import numpy as np
import pytest

import jax

from phoonnx_tpu.models.vits.load import params_to_flat
from phoonnx_tpu.models.vits.model import VitsHParams, random_params
from phoonnx_tpu.onnx.reader import read_onnx
from phoonnx_tpu.onnx.vits_graph import export_vits_onnx
from phoonnx_tpu.onnx.writer import write_onnx


@pytest.fixture(scope="module")
def foreign_voice(tmp_path_factory):
    """An executable VITS graph with every name mangled ('foreign/...')
    so the state-dict importer cannot possibly match it."""
    tmp = tmp_path_factory.mktemp("foreign")
    hp = VitsHParams.preset("micro")
    params = random_params(jax.random.PRNGKey(0), hp)
    native = tmp / "native.onnx"
    export_vits_onnx(params_to_flat(params), hp, str(native),
                     metadata={"model_type": "vits"})

    model = read_onnx(str(native))
    rename = {name: f"foreign/{name}" for name in model.initializers}
    io_names = set(model.inputs) | set(model.outputs)
    remap = (lambda n: rename.get(n, n) if n not in io_names else n)
    nodes = [
        (n.op_type,
         [remap(i) for i in n.inputs],
         [remap(o) for o in n.outputs],
         n.attributes)
        for n in model.nodes
    ]
    path = tmp / "model.onnx"
    write_onnx(
        str(path),
        {rename[k]: v for k, v in model.initializers.items()},
        metadata=dict(model.metadata),
        inputs=model.inputs, outputs=model.outputs, nodes=nodes,
    )

    id_map = {"_": 0, "^": 1, "$": 2, " ": 3}
    id_map.update({c: i + 4 for i, c in enumerate("abcdefghijklmnop")})
    config = {
        "phoneme_type": "raw", "lang_code": "en", "alphabet": "ipa",
        "phoneme_id_map": id_map, "num_symbols": len(id_map),
        "num_speakers": 1, "audio": {"sample_rate": hp.sample_rate},
        "inference": {"noise_scale": 0.667, "length_scale": 1.0,
                      "noise_w": 0.8},
    }
    config_path = tmp / "model.onnx.json"
    config_path.write_text(json.dumps(config), encoding="utf-8")
    return path, config_path


def test_foreign_voice_falls_back_and_synthesizes(foreign_voice, caplog):
    from phoonnx_tpu import SynthesisConfig, TTSVoice
    from phoonnx_tpu.infer.onnx_engine import OnnxFallbackEngine

    model_path, config_path = foreign_voice
    with caplog.at_level("WARNING"):
        voice = TTSVoice.load(str(model_path), str(config_path))
    assert isinstance(voice.engine, OnnxFallbackEngine)
    assert any("falling back" in r.getMessage() for r in caplog.records)

    audio = voice.phoneme_ids_to_audio(
        [1, 5, 9, 3, 7, 2], SynthesisConfig())
    assert audio.ndim == 1
    assert len(audio) > 0
    assert np.abs(audio).max() > 0


def test_foreign_voice_batch_and_chunks(foreign_voice):
    from phoonnx_tpu import SynthesisConfig, TTSVoice

    model_path, config_path = foreign_voice
    voice = TTSVoice.load(str(model_path), str(config_path))
    outs = voice.synthesize_batch(["[[abc]]", "[[de fg ab]]"],
                                  SynthesisConfig(normalize_audio=False))
    assert len(outs) == 2
    assert all(len(o) > 0 for o in outs)
    assert len(outs[1]) > len(outs[0])

    chunks = list(voice.synthesize("[[abc def]]",
                                   SynthesisConfig(normalize_audio=False)))
    assert chunks and all(len(c.audio_float_array) > 0 for c in chunks)


def test_foreign_voice_streaming_equals_monolithic(foreign_voice):
    """Foreign voices stream (VERDICT r2 #7): concatenated streamed
    chunks are bit-equal to the monolithic synthesize for the same
    seed (chunks are exact slices of the utterance)."""
    import numpy as np

    from phoonnx_tpu import SynthesisConfig, TTSVoice

    model_path, config_path = foreign_voice
    voice = TTSVoice.load(str(model_path), str(config_path))
    cfg = SynthesisConfig(normalize_audio=False, seed=7)
    mono = np.concatenate([
        c.audio_float_array
        for c in voice.synthesize("[[abc def]]", cfg)])
    streamed = list(voice.synthesize_streaming("[[abc def]]", cfg,
                                               chunk_frames=1))
    assert len(streamed) > 1  # actually chunked
    np.testing.assert_array_equal(
        np.concatenate([c.audio_float_array for c in streamed]), mono)


def test_foreign_voice_seeded_runs_are_reproducible(foreign_voice):
    """seed reseeds the executor-instance RNG feeding graph-internal
    Random* nodes: same seed -> identical audio AND identical shapes
    (so XLA replays cached segments instead of recompiling); different
    seeds draw different noise. The reference's onnxruntime path has no
    equivalent (reference voice.py:350-377 passes no RNG state)."""
    from phoonnx_tpu.infer.onnx_engine import OnnxFallbackEngine
    from phoonnx_tpu.onnx.reader import read_onnx

    model_path, _ = foreign_voice
    model = read_onnx(str(model_path))
    engine = OnnxFallbackEngine(model, 22050, compile=True)
    ids = [1, 5, 9, 3, 7, 2, 11, 4]

    # bit-identical INCLUDING the first call: when seeded and unplanned,
    # the engine discards the planning pass's interpreter results and
    # returns the compiled replay, so call order never changes audio
    a = engine.synthesize_ids(ids, seed=42)
    b = engine.synthesize_ids(ids, seed=42)
    c = engine.synthesize_ids(ids, seed=43)
    np.testing.assert_array_equal(a, b)
    assert len(a) != len(c) or np.abs(a - c).max() > 1e-4


def test_foreign_voice_seeded_lowered_matches_interpreter(foreign_voice):
    """Same seed, same feed, runner level: the planning pass is a pure
    numpy-interpreter run; re-seeding and re-running replays jitted XLA
    segments over the identical noise — an exact lowered-vs-interpreter
    waveform comparison (XLA vs numpy kernel reassociation only)."""
    from phoonnx_tpu.onnx.jax_lowering import JaxGraphRunner
    from phoonnx_tpu.onnx.reader import read_onnx

    model_path, _ = foreign_voice
    model = read_onnx(str(model_path))
    runner = JaxGraphRunner(model)
    feeds = {
        "input": np.asarray([[1, 5, 9, 3, 7, 2]], np.int64),
        "input_lengths": np.asarray([6], np.int64),
        "scales": np.asarray([0.667, 1.0, 0.8], np.float32),
    }
    runner.executor.reseed(7)
    plan_out = runner.run(feeds)[0]      # interpreter (planning pass)
    runner.executor.reseed(7)
    replay_out = runner.run(feeds)[0]    # compiled XLA replay
    assert runner.plan_stats()["plans"] == 1
    assert plan_out.shape == replay_out.shape
    np.testing.assert_allclose(np.asarray(plan_out).reshape(-1),
                               np.asarray(replay_out).reshape(-1),
                               atol=2e-4)


def test_foreign_voice_batch_seed_is_order_independent(foreign_voice):
    """Batch seeding folds the item index, so an item's audio does not
    depend on its position in the batch."""
    from phoonnx_tpu.infer.onnx_engine import OnnxFallbackEngine
    from phoonnx_tpu.onnx.reader import read_onnx

    model_path, _ = foreign_voice
    model = read_onnx(str(model_path))
    engine = OnnxFallbackEngine(model, 22050, compile=False)
    ids_a = [1, 5, 9, 3]
    ids_b = [2, 6, 10, 4, 8]

    both, lens = engine.synthesize_batch([ids_a, ids_b], seed=5)
    solo_a = engine.synthesize_ids(ids_a, seed=5)
    np.testing.assert_array_equal(both[0, : lens[0]], solo_a)


def test_foreign_streaming_chunk_size_scales_with_sample_rate():
    """Chunk pacing is TIME-consistent across voices: the true hop of a
    black-box graph is unknowable, so chunk size derives from the
    native contract's frame duration (hop 256 @ 22.05 kHz) scaled to
    the voice's sample rate — not a hard-coded 256 samples/frame
    (found by review: a 16 kHz voice streamed ~2 s chunks where the
    native engine's chunk_frames=128 means ~1.49 s)."""
    from phoonnx_tpu.infer.onnx_engine import OnnxFallbackEngine

    class _Probe(OnnxFallbackEngine):
        def __init__(self, sample_rate):
            from phoonnx_tpu.infer.onnx_engine import _HpShim

            self.hp = _HpShim(sample_rate)

        def _run_one(self, *a, **k):
            import numpy as np

            return np.zeros(100000, np.float32)

    chunks_22k = list(_Probe(22050).synthesize_ids_streaming(
        [1], chunk_frames=128))
    assert len(chunks_22k[0]) == 128 * 256
    chunks_16k = list(_Probe(16000).synthesize_ids_streaming(
        [1], chunk_frames=128))
    assert len(chunks_16k[0]) == 128 * round(16000 * 256 / 22050)
    # same duration either way (~1.49 s)
    assert abs(len(chunks_16k[0]) / 16000
               - len(chunks_22k[0]) / 22050) < 0.01
