"""Import-path hardening against the reference exporter's real topology.

The reference produces voices with ``torch.onnx.export`` (opset 15,
reference phoonnx_train/export_onnx.py:250-327). Compared to this
framework's own exports, a real reference artifact differs in ways the
importer must survive:

* ``model_g.dec.remove_weight_norm()`` runs before export
  (export_onnx.py:244), so the DECODER's initializers are plain
  ``dec.*.weight`` — but every other weight-normed module (flow,
  posterior encoder, duration predictor) keeps its ``weight_v`` /
  ``weight_g`` state-dict pairs, with the norm computed by traced graph
  nodes (Mul/ReduceSum/Sqrt/Div).
* The trace adds anonymous initializers the state dict never had
  (``onnx::MatMul_1234``-style constants).
* Metadata props carry the exact key set of export_onnx.py:335-350
  (model_type, n_speakers, n_vocab, sample_rate, alphabet,
  phoneme_type, phonemizer_model, phoneme_id_map JSON, has_espeak,
  comment=piper), all stringified.
* I/O contract: input [B,T] i64, input_lengths [B] i64, scales [3] f32,
  + sid [B] i64 when multi-speaker (export_onnx.py:293-305).

``torch.onnx.export`` itself cannot run here (the ``onnx`` package is
absent), so this fixture reconstructs that topology with the in-repo
writer: an EXECUTABLE graph (nodes, not a weights-only container) whose
initializer namespace matches a real export. When the environment
gains onnx/onnxruntime, swap the fixture for a real export and keep
the assertions.
"""

import json

import numpy as np
import pytest

import jax

from phoonnx_tpu.models.vits.load import params_to_flat, routed_fraction
from phoonnx_tpu.models.vits.model import VitsHParams, random_params
from phoonnx_tpu.onnx.reader import read_onnx
from phoonnx_tpu.onnx.vits_graph import export_vits_onnx
from phoonnx_tpu.onnx.writer import write_onnx


def _fold(flat, prefix):
    """remove_weight_norm for one submodule: (v, g) -> weight."""
    out = {}
    for name, value in flat.items():
        if not name.startswith(prefix):
            out[name] = value
            continue
        if name.endswith(".weight_g"):
            continue
        if name.endswith(".weight_v"):
            base = name[: -len(".weight_v")]
            v = np.asarray(value, np.float64)
            g = np.asarray(flat[base + ".weight_g"], np.float64)
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
            out[base + ".weight"] = (g * v / norm).astype(np.float32)
        else:
            out[name] = value
    return out


def _export_shaped(tmp, hp, params, n_speakers=1):
    """Build an export_onnx-topology voice file from a param pytree."""
    flat = {k: np.asarray(v) for k, v in params_to_flat(params).items()}
    # the exporter's remove_weight_norm touches only the decoder
    export_flat = _fold(flat, "dec.")
    assert any(k.endswith(".weight_v") for k in export_flat), \
        "flow/dp/enc_q pairs must survive (only dec is folded)"

    # start from the executable graph (which folds everything), then
    # rewrite the weight-normed initializers back to (v, g) + traced
    # norm-computation nodes — the real exporter's in-graph form
    path = str(tmp / "voice.onnx")
    export_vits_onnx(export_flat, hp, path)
    model = read_onnx(path)

    nodes = [(n.op_type, list(n.inputs), list(n.outputs), n.attributes)
             for n in model.nodes]
    inits = dict(model.initializers)
    prologue = []
    n_rewired = 0
    for name in list(export_flat):
        if not name.endswith(".weight_v"):
            continue
        base = name[: -len(".weight_v")]
        wname = base + ".weight"
        if wname not in inits:
            continue  # not consumed by the graph (e.g. training-only)
        del inits[wname]
        v = np.asarray(export_flat[name], np.float32)
        g = np.asarray(export_flat[base + ".weight_g"], np.float32)
        inits[name] = v
        inits[base + ".weight_g"] = g
        axes = list(range(1, v.ndim))
        sq = f"{base}/wn_sq"
        ssum = f"{base}/wn_sum"
        norm = f"{base}/wn_norm"
        unit = f"{base}/wn_unit"
        ax = f"{base}/wn_axes"
        inits[ax] = np.asarray(axes, np.int64)
        prologue += [
            ("Mul", [name, name], [sq], {}),
            ("ReduceSum", [sq, ax], [ssum], {"keepdims": 1}),
            ("Sqrt", [ssum], [norm], {}),
            ("Div", [name, norm], [unit], {}),
            ("Mul", [unit, base + ".weight_g"], [wname], {}),
        ]
        n_rewired += 1
    assert n_rewired > 0
    # anonymous trace constants a real export carries alongside params
    rng = np.random.default_rng(0)
    for i in range(120):
        inits[f"onnx::MatMul_{1000 + i}"] = rng.standard_normal(
            (4, 4)).astype(np.float32)

    metadata = {
        "model_type": "vits",
        "n_speakers": str(n_speakers),
        "n_vocab": str(hp.n_vocab),
        "sample_rate": str(hp.sample_rate),
        "alphabet": "ipa",
        "phoneme_type": "raw",
        "phonemizer_model": "",
        "phoneme_id_map": json.dumps({"_": [0], "^": [1], "$": [2],
                                      " ": [3]}),
        "has_espeak": "False",
        "comment": "piper",
    }
    write_onnx(path, inits, metadata=metadata, inputs=model.inputs,
               outputs=model.outputs, nodes=prologue + nodes, opset=15)

    id_map = {"_": 0, "^": 1, "$": 2, " ": 3}
    id_map.update({c: i + 4 for i, c in enumerate("abcdefghijklmnop")})
    config = {
        "phoneme_type": "raw", "lang_code": "en", "alphabet": "ipa",
        "phoneme_id_map": id_map, "num_symbols": len(id_map),
        "num_speakers": n_speakers,
        "audio": {"sample_rate": hp.sample_rate},
        "inference": {"noise_scale": 0.667, "length_scale": 1.0,
                      "noise_w": 0.8},
    }
    config_path = str(tmp / "voice.onnx.json")
    with open(config_path, "w", encoding="utf-8") as f:
        json.dump(config, f)
    return path, config_path


@pytest.fixture(scope="module")
def export_shaped_voice(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refshape")
    hp = VitsHParams.preset("micro")
    params = random_params(jax.random.PRNGKey(7), hp)
    path, config_path = _export_shaped(tmp, hp, params)
    return path, config_path, hp, params


def test_import_lands_on_native_engine(export_shaped_voice):
    """A reference-export-shaped file must import onto the compiled
    VITS engine (NOT the graph-interpreter fallback): weight_v/weight_g
    pairs route, dec folded weights route, trace junk is ignored."""
    from phoonnx_tpu import TTSVoice
    from phoonnx_tpu.infer.engine import VitsEngine

    path, config_path, hp, _ = export_shaped_voice
    voice = TTSVoice.load(path, config_path)
    assert isinstance(voice.engine, VitsEngine)
    assert voice.engine.hp.n_vocab == hp.n_vocab
    assert voice.engine.hp.upsample_rates == hp.upsample_rates


def test_routed_fraction_survives_trace_junk(export_shaped_voice):
    path, *_ = export_shaped_voice
    model = read_onnx(path)
    named = dict(model.initializers)
    assert sum(1 for k in named if k.startswith("onnx::")) >= 120
    assert routed_fraction(named) > 0.25


def test_waveform_parity_with_direct_params(export_shaped_voice):
    """Seeded synthesis through the imported voice equals synthesis from
    the ground-truth pytree (same engine, weights recovered through the
    v/g refold) to float roundoff."""
    from phoonnx_tpu import TTSVoice
    from phoonnx_tpu.infer.engine import VitsEngine

    path, config_path, hp, params = export_shaped_voice
    voice = TTSVoice.load(path, config_path)
    direct = VitsEngine(params, hp)

    ids = [1, 5, 9, 3, 7, 2, 4, 11]
    a = voice.engine.synthesize_ids(ids, seed=0)
    c = direct.synthesize_ids(ids, seed=0)
    assert a.shape == c.shape
    scale = max(np.abs(c).max(), 1e-3)
    assert np.abs(a - c).max() / scale < 1e-4


def test_export_shaped_graph_is_executable(export_shaped_voice):
    """The fixture is a real graph, not a weights container: the voice's
    own nodes (incl. the weight-norm prologue) synthesize audio under
    the in-repo executor."""
    from phoonnx_tpu.onnx.executor import OnnxExecutor

    path, *_ = export_shaped_voice
    model = read_onnx(path)
    assert any(n.op_type == "Conv" for n in model.nodes)
    feeds = {
        "input": np.asarray([[1, 5, 9, 3]], np.int64),
        "input_lengths": np.asarray([4], np.int64),
        "scales": np.asarray([0.0, 1.0, 0.0], np.float32),
    }
    feeds = {k: v for k, v in feeds.items() if k in model.inputs}
    audio = OnnxExecutor(model).run(feeds)[0]
    assert audio.size > 0
    assert np.abs(audio).max() > 0


def test_multispeaker_export_shape(tmp_path):
    """Multi-speaker recipe: sid input present (export_onnx.py:300-305),
    emb_g routes, per-speaker synthesis differs."""
    from phoonnx_tpu import TTSVoice
    from phoonnx_tpu.infer.engine import VitsEngine

    hp = VitsHParams.preset("micro", n_speakers=2, gin_channels=16)
    params = random_params(jax.random.PRNGKey(3), hp)
    path, config_path = _export_shaped(tmp_path, hp, params, n_speakers=2)
    model = read_onnx(path)
    assert "sid" in model.inputs
    voice = TTSVoice.load(path, config_path)
    assert isinstance(voice.engine, VitsEngine)
    ids = [1, 5, 9, 3, 7, 2]
    a = voice.engine.synthesize_ids(ids, seed=0, speaker_id=0)
    c = voice.engine.synthesize_ids(ids, seed=0, speaker_id=1)
    assert not np.allclose(a[: min(len(a), len(c))],
                           c[: min(len(a), len(c))])
