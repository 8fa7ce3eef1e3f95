"""Phonikud diacritizer full pipeline with a FAKE ONNX model.

Mirrors test_tashkeel_model.py: the real phonikud-1.0.int8.onnx is an
auto-downloaded blob (no network here), so a tiny deterministic graph
with the same I/O contract (input_ids/attention_mask -> nikud_logits,
shin_logits, additional_logits; reference wrapper
phoonnx/thirdparty/phonikud/__init__.py:6-21) exercises the whole
algorithm: vocabulary resolution from ONNX metadata, nikud stripping,
char tokenization with the CLS offset, class decode (incl. the
mater-lectionis no-mark class), the shin/sin dot head, and phonikud's
enhanced binary marks (hatama / vocal shva / prefix boundary).

The fake model predicts per-character via Gather from constant lookup
tables indexed by input id, so each vocab entry gets a chosen class.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from phoonnx_tpu.onnx.writer import write_onnx
from phoonnx_tpu.thirdparty.phonikud import (
    HATAMA, MAT_LECT_TOKEN, NIKUD_CLASSES, PREFIX_SEP, SHIN_CLASSES,
    VOCAL_SHVA, PhonikudDiacritizer, strip_nikud,
)

ALEF, BET, SHIN, VAV = "א", "ב", "ש", "ו"
PATAH = chr(0x05B7)
SHEVA = chr(0x05B0)
DAGESH = "ּ"

VOCAB = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
         ALEF: 4, BET: 5, SHIN: 6, VAV: 7}


def _one_hot_rows(rows, n_classes, scale=5.0):
    table = np.full((len(rows), n_classes), -scale, np.float32)
    for i, cls in enumerate(rows):
        table[i, cls] = scale
    return table


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("phonikud")
    path = tmp / "phonikud.int8.onnx"

    # per-vocab-id predictions:
    #   ALEF -> patah, hatama on;  BET -> dagesh+patah
    #   SHIN -> sin dot + sheva, vocal-shva on;  VAV -> mater lectionis
    #   everything else (specials, UNK) -> class 0 (no mark)
    nikud_rows = [0] * len(VOCAB)
    nikud_rows[VOCAB[ALEF]] = NIKUD_CLASSES.index(PATAH)
    nikud_rows[VOCAB[BET]] = NIKUD_CLASSES.index(DAGESH + PATAH)
    nikud_rows[VOCAB[SHIN]] = NIKUD_CLASSES.index(SHEVA)
    nikud_rows[VOCAB[VAV]] = NIKUD_CLASSES.index(MAT_LECT_TOKEN)
    shin_rows = [0] * len(VOCAB)
    shin_rows[VOCAB[SHIN]] = 1  # sin dot
    add_table = np.full((len(VOCAB), 3), -5.0, np.float32)
    add_table[VOCAB[ALEF], 0] = 5.0   # hatama
    add_table[VOCAB[SHIN], 1] = 5.0   # vocal shva

    write_onnx(
        str(path),
        initializers={
            "nikud_table": _one_hot_rows(nikud_rows, len(NIKUD_CLASSES)),
            "shin_table": _one_hot_rows(shin_rows, len(SHIN_CLASSES)),
            "add_table": add_table,
        },
        metadata={"vocab": json.dumps(VOCAB)},
        inputs=["input_ids", "attention_mask"],
        outputs=["nikud_logits", "shin_logits", "additional_logits"],
        nodes=[
            ("Gather", ["nikud_table", "input_ids"], ["nikud_logits"]),
            ("Gather", ["shin_table", "input_ids"], ["shin_logits"]),
            ("Gather", ["add_table", "input_ids"], ["additional_logits"]),
        ],
    )
    return str(path)


def test_fake_model_marks_every_head(model_path):
    d = PhonikudDiacritizer(model_path=model_path)
    out = d.diacritize(ALEF + BET + SHIN + VAV)
    assert out == (ALEF + PATAH + HATAMA
                   + BET + DAGESH + PATAH
                   + SHIN + SHIN_CLASSES[1] + SHEVA + VOCAL_SHVA
                   + VAV)  # mater lectionis: letter stays bare


def test_fake_model_prefix_boundary(tmp_path, model_path):
    """The third additional head emits the morphological '|' separator."""
    d = PhonikudDiacritizer(model_path=model_path)
    # flip BET's prefix bit via a sidecar model copy
    from phoonnx_tpu.onnx.reader import read_onnx

    model = read_onnx(model_path)
    add = np.array(model.initializers["add_table"], np.float32)
    add[VOCAB[BET], 2] = 5.0
    path2 = tmp_path / "prefix.onnx"
    write_onnx(
        str(path2),
        initializers={
            "nikud_table": model.initializers["nikud_table"],
            "shin_table": model.initializers["shin_table"],
            "add_table": add,
        },
        metadata={"vocab": json.dumps(VOCAB)},
        inputs=["input_ids", "attention_mask"],
        outputs=["nikud_logits", "shin_logits", "additional_logits"],
        nodes=[
            ("Gather", ["nikud_table", "input_ids"], ["nikud_logits"]),
            ("Gather", ["shin_table", "input_ids"], ["shin_logits"]),
            ("Gather", ["add_table", "input_ids"], ["additional_logits"]),
        ],
    )
    d2 = PhonikudDiacritizer(model_path=str(path2))
    assert d2.diacritize(BET + ALEF) == (BET + DAGESH + PATAH + PREFIX_SEP
                                         + ALEF + PATAH + HATAMA)


def test_non_hebrew_passes_through(model_path):
    d = PhonikudDiacritizer(model_path=model_path)
    out = d.diacritize("abc " + ALEF + "! 12")
    assert out == "abc " + ALEF + PATAH + HATAMA + "! 12"
    # no Hebrew at all -> untouched (no model marks leak in)
    assert d.diacritize("hello world") == "hello world"


def test_existing_nikud_is_stripped_and_repredicted(model_path):
    d = PhonikudDiacritizer(model_path=model_path)
    pre_pointed = ALEF + SHEVA + BET + DAGESH  # stale marks
    assert d.diacritize(pre_pointed) == (ALEF + PATAH + HATAMA
                                         + BET + DAGESH + PATAH)


def test_strip_nikud():
    assert strip_nikud(ALEF + PATAH + HATAMA + BET) == ALEF + BET
    assert strip_nikud("abc") == "abc"


def test_long_input_chunks_at_budget(model_path):
    from phoonnx_tpu.thirdparty import phonikud as mod

    d = PhonikudDiacritizer(model_path=model_path)
    text = ((ALEF + BET) * (mod.CHAR_LIMIT // 2) + " ") * 2 + ALEF
    out = d.diacritize(text)
    assert out.count(PATAH) == text.count(ALEF) + text.count(BET)


def test_missing_vocab_degrades_to_identity(tmp_path):
    path = tmp_path / "novocab.onnx"
    write_onnx(
        str(path),
        initializers={"t": np.zeros((2, 2), np.float32)},
        inputs=["input_ids", "attention_mask"],
        outputs=["nikud_logits"],
        nodes=[("Gather", ["t", "input_ids"], ["nikud_logits"])],
    )
    d = PhonikudDiacritizer(model_path=str(path))
    assert d.diacritize(ALEF + BET) == ALEF + BET


def test_missing_model_degrades_to_identity(tmp_path):
    d = PhonikudDiacritizer(model_path=str(tmp_path / "absent.onnx"))
    assert d.diacritize("שלום") == "שלום"


def test_sidecar_vocab_json(tmp_path, model_path):
    """vocab.json beside the model is the fallback vocabulary source."""
    import shutil

    dst = tmp_path / "m.onnx"
    shutil.copy(model_path, dst)
    # strip metadata by rewriting without it
    from phoonnx_tpu.onnx.reader import read_onnx

    model = read_onnx(str(dst))
    write_onnx(
        str(dst),
        initializers=dict(model.initializers),
        inputs=list(model.inputs),
        outputs=list(model.outputs),
        nodes=[(n.op_type, list(n.inputs), list(n.outputs))
               for n in model.nodes],
    )
    (tmp_path / "vocab.json").write_text(json.dumps(VOCAB),
                                         encoding="utf-8")
    d = PhonikudDiacritizer(model_path=str(dst))
    assert PATAH in d.diacritize(ALEF)


def test_no_external_phonikud_import():
    """The port must not depend on the phonikud-onnx package
    (the dependency this build exists to remove)."""
    import inspect

    import phoonnx_tpu.thirdparty.phonikud as mod

    src = inspect.getsource(mod)
    assert "phonikud_onnx" not in src.replace(
        "phonikud_onnx.Phonikud.add_diacritics", "")  # docstring mention ok


def test_runtime_runner_failure_falls_back_to_interpreter(model_path):
    """A compiled-runner crash mid-call must degrade to the interpreter
    (ADVICE r2), not propagate to the caller."""
    d = PhonikudDiacritizer(model_path=model_path)
    d.diacritize(ALEF)  # force the lazy model load first

    class Boom:
        def run(self, feeds):
            raise RuntimeError("trace failed")

    d._runner = Boom()
    out = d.diacritize(ALEF + BET)
    assert d._runner is None
    assert out == ALEF + PATAH + HATAMA + BET + DAGESH + PATAH
