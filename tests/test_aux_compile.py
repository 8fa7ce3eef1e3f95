"""Bundled auxiliary models on the compiled (lowered) ONNX path.

The reference runs tashkeel/phonikud/silero through onnxruntime's
compiled engine; the rebuild now runs them through the ONNX -> JAX
lowering with length bucketing (phoonnx_tpu/onnx/aux_compile.py). These
tests pin the integration semantics:

* bucket padding returns the same result as an exact-length run when
  the model masks by its length input (tashkeel input_lengths feeding
  LSTM sequence_lens; phonikud attention_mask),
* the one-time self-check drops the compiled path for models that do
  NOT honor their length input (instead of returning corrupted output),
* plan/compile count stays bounded across varying text lengths,
* PHOONNX_AUX_COMPILE=0 keeps everything on the interpreter.
"""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest

from phoonnx_tpu.onnx.aux_compile import (
    AUX_LEN_BUCKETS,
    bucket_len,
)
from phoonnx_tpu.onnx.writer import write_onnx

DATA_DIR = Path("phoonnx_tpu/thirdparty/tashkeel")


def test_bucket_len_ladder():
    assert bucket_len(1) == 16
    assert bucket_len(16) == 16
    assert bucket_len(17) == 32
    assert bucket_len(500) == 512
    assert bucket_len(AUX_LEN_BUCKETS[-1] + 1) == AUX_LEN_BUCKETS[-1] + 1


# -- tashkeel -----------------------------------------------------------------


def _tashkeel_dir(tmp, nodes, initializers):
    for name in ("input_id_map.json", "target_id_map.json",
                 "hint_id_map.json"):
        shutil.copy(DATA_DIR / name, tmp / name)
    write_onnx(
        str(tmp / "model.onnx"), initializers=initializers,
        inputs=["char_inputs", "diac_inputs", "input_lengths"],
        outputs=["target_ids", "logits"], nodes=nodes,
    )
    return tmp


def _masked_lstm_tashkeel_dir(tmp_path_factory):
    """A length-HONORING fake: LSTM over the char ids with
    sequence_lens=input_lengths, per-position argmax targets. Output
    for positions < len is provably padding-invariant."""
    tmp = tmp_path_factory.mktemp("tashkeel_lstm")
    rng = np.random.default_rng(0)
    hidden, n_cls = 8, 16
    init = {
        "w": (rng.standard_normal((1, 4 * hidden, 1)) * 0.3).astype(
            np.float32),
        "r": (rng.standard_normal((1, 4 * hidden, hidden)) * 0.3).astype(
            np.float32),
        "proj": (rng.standard_normal((hidden, n_cls))).astype(np.float32),
        "perm_axes2": np.asarray([2], np.int64),
        "sq_axes": np.asarray([1, 2], np.int64),
        "red_axes": np.asarray([1], np.int64),
        "b0": np.asarray([0], np.int64),
    }
    nodes = [
        ("Cast", ["char_inputs"], ["cf"], {"to": 1}),
        ("Transpose", ["cf"], ["ct"], {"perm": [1, 0]}),        # [T,1]
        ("Unsqueeze", ["ct", "perm_axes2"], ["x"]),             # [T,1,1]
        ("LSTM", ["x", "w", "r", "", "input_lengths"],
         ["y", "yh", "yc"], {"hidden_size": 8}),                # [T,1,1,H]
        ("Squeeze", ["y", "sq_axes"], ["ysq"]),                 # [T,H]
        ("MatMul", ["ysq", "proj"], ["scores"]),                # [T,C]
        ("ArgMax", ["scores"], ["ids_t"],
         {"axis": 1, "keepdims": 0}),                           # [T]
        ("ReduceMax", ["scores", "red_axes"], ["log_t"],
         {"keepdims": 0}),                                      # [T]
        ("Unsqueeze", ["ids_t", "b0"], ["target_ids"]),         # [1,T]
        ("Unsqueeze", ["log_t", "b0"], ["logits"]),             # [1,T]
    ]
    return _tashkeel_dir(tmp, nodes, init)


def _length_ignoring_tashkeel_dir(tmp_path_factory):
    """A length-IGNORING fake: logits depend on ReduceMean over the
    padded row, so bucket padding changes them — the self-check must
    drop the compiled path."""
    tmp = tmp_path_factory.mktemp("tashkeel_bad")
    target_map = json.loads((DATA_DIR / "target_id_map.json").read_text())
    fatha_id = [v for k, v in target_map.items() if v not in (0,)][3]
    init = {"zero_i64": np.asarray(0, np.int64),
            "c_i64": np.asarray(fatha_id, np.int64)}
    nodes = [
        ("Mul", ["char_inputs", "zero_i64"], ["zeros"]),
        ("Add", ["zeros", "c_i64"], ["target_ids"]),
        ("Cast", ["char_inputs"], ["cf"], {"to": 1}),
        ("ReduceMean", ["cf"], ["mean"]),            # divides by PADDED T
        ("Cast", ["zeros"], ["zf"], {"to": 1}),
        ("Add", ["zf", "mean"], ["logits"]),
    ]
    return _tashkeel_dir(tmp, nodes, init)


TEXT_A = "كتب الولد درسا"
TEXT_B = "قرأ"


def test_tashkeel_bucketed_equals_exact(tmp_path_factory, monkeypatch):
    from phoonnx_tpu.thirdparty.tashkeel import TashkeelDiacritizer

    model_dir = _masked_lstm_tashkeel_dir(tmp_path_factory)
    compiled = TashkeelDiacritizer(model_dir)
    got_a = compiled.diacritize(TEXT_A)
    got_b = compiled.diacritize(TEXT_B)
    assert compiled._runner is not None, "self-check must keep the runner"
    # lengths 14ish and 3 share the 16-bucket: ONE plan serves both
    assert compiled._runner.plan_stats()["plans"] == 1

    monkeypatch.setenv("PHOONNX_AUX_COMPILE", "0")
    exact = TashkeelDiacritizer(model_dir)
    assert exact._get_executor() is not None and exact._runner is None
    assert got_a == exact.diacritize(TEXT_A)
    assert got_b == exact.diacritize(TEXT_B)


def test_tashkeel_taskeen_logits_survive_bucketing(tmp_path_factory,
                                                   monkeypatch):
    from phoonnx_tpu.thirdparty.tashkeel import TashkeelDiacritizer

    model_dir = _masked_lstm_tashkeel_dir(tmp_path_factory)
    compiled = TashkeelDiacritizer(model_dir)
    got = compiled.diacritize(TEXT_A, taskeen_threshold=0.5)
    monkeypatch.setenv("PHOONNX_AUX_COMPILE", "0")
    exact = TashkeelDiacritizer(model_dir)
    assert got == exact.diacritize(TEXT_A, taskeen_threshold=0.5)


def test_tashkeel_self_check_drops_length_ignoring_model(
        tmp_path_factory, monkeypatch, caplog):
    from phoonnx_tpu.thirdparty.tashkeel import TashkeelDiacritizer

    model_dir = _length_ignoring_tashkeel_dir(tmp_path_factory)
    compiled = TashkeelDiacritizer(model_dir)
    with caplog.at_level("WARNING"):
        got = compiled.diacritize(TEXT_A, taskeen_threshold=0.5)
    assert compiled._runner is None, "padding-corrupted model must fall back"
    assert "length padding" in caplog.text

    monkeypatch.setenv("PHOONNX_AUX_COMPILE", "0")
    exact = TashkeelDiacritizer(model_dir)
    assert got == exact.diacritize(TEXT_A, taskeen_threshold=0.5)
    # later calls keep using the interpreter and stay consistent
    assert compiled.diacritize(TEXT_B) == exact.diacritize(TEXT_B)


# -- phonikud -----------------------------------------------------------------


HEB = "שלום עולם"


@pytest.fixture()
def phonikud_model(tmp_path):
    """Mask-honoring by construction: per-position Gather tables."""
    from phoonnx_tpu.thirdparty.phonikud import NIKUD_CLASSES

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
    for ch in sorted(set(HEB.replace(" ", ""))):
        vocab[ch] = len(vocab)
    vocab[" "] = len(vocab)
    rng = np.random.default_rng(1)
    path = tmp_path / "phonikud.int8.onnx"
    write_onnx(
        str(path),
        initializers={
            "nikud_table": rng.standard_normal(
                (len(vocab), len(NIKUD_CLASSES))).astype(np.float32),
            "shin_table": rng.standard_normal(
                (len(vocab), 2)).astype(np.float32),
            "add_table": rng.standard_normal(
                (len(vocab), 3)).astype(np.float32),
        },
        metadata={"vocab": json.dumps(vocab)},
        inputs=["input_ids", "attention_mask"],
        outputs=["nikud_logits", "shin_logits", "additional_logits"],
        nodes=[
            ("Gather", ["nikud_table", "input_ids"], ["nikud_logits"]),
            ("Gather", ["shin_table", "input_ids"], ["shin_logits"]),
            ("Gather", ["add_table", "input_ids"], ["additional_logits"]),
        ],
    )
    return str(path)


def test_phonikud_bucketed_equals_exact(phonikud_model, monkeypatch):
    from phoonnx_tpu.thirdparty.phonikud import PhonikudDiacritizer

    compiled = PhonikudDiacritizer(model_path=phonikud_model)
    got = compiled.diacritize(HEB)
    assert compiled._runner is not None
    assert compiled._runner.plan_stats()["plans"] == 1

    monkeypatch.setenv("PHOONNX_AUX_COMPILE", "0")
    exact = PhonikudDiacritizer(model_path=phonikud_model)
    assert exact._load() and exact._runner is None
    assert got == exact.diacritize(HEB)


# -- silero VAD ---------------------------------------------------------------


def test_vad_runner_matches_interpreter(tmp_path, monkeypatch):
    from phoonnx_tpu.onnx.executor import OnnxExecutor
    from phoonnx_tpu.onnx.jax_lowering import JaxGraphRunner
    from phoonnx_tpu.train.audio import SileroVoiceActivityDetector

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
    compiled = SileroVoiceActivityDetector(model_path=str(path))
    assert isinstance(compiled._executor, JaxGraphRunner)

    monkeypatch.setenv("PHOONNX_AUX_COMPILE", "0")
    interp = SileroVoiceActivityDetector(model_path=str(path))
    assert isinstance(interp._executor, OnnxExecutor)

    rng = np.random.default_rng(2)
    audio = np.concatenate([
        np.zeros(480 * 3, np.float32),
        (0.3 * rng.standard_normal(480 * 5)).astype(np.float32),
        np.zeros(480 * 2, np.float32),
    ])
    np.testing.assert_allclose(compiled.speech_probs(audio),
                               interp.speech_probs(audio),
                               rtol=1e-5, atol=1e-6)
