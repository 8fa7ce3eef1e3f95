"""Tashkeel diacritizer full pipeline with a FAKE ONNX model.

The real libtashkeel model blob is absent (also absent from the
reference checkout), so tests elsewhere cover only the identity
fallback. Here a tiny deterministic ONNX graph with the same I/O
contract (char_inputs/diac_inputs/input_lengths -> target ids + logits,
reference thirdparty/tashkeel/__init__.py:92-113) exercises the whole
algorithm: char/diacritic extraction, id mapping, inference plumbing,
annotation, and the taskeen (sukoon) threshold logic.
"""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest

from phoonnx_tpu.onnx.writer import write_onnx

DATA_DIR = Path("phoonnx_tpu/thirdparty/tashkeel")
FATHA = "َ"
SUKOON = "ْ"


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """Copy the real id maps next to a fake constant-prediction model."""
    tmp = tmp_path_factory.mktemp("tashkeel")
    for name in ("input_id_map.json", "target_id_map.json",
                 "hint_id_map.json"):
        shutil.copy(DATA_DIR / name, tmp / name)
    target_map = json.loads((DATA_DIR / "target_id_map.json").read_text())
    fatha_id = target_map[FATHA]

    # target_ids = 0*chars + fatha_id; logits = 0.0 everywhere
    write_onnx(
        str(tmp / "model.onnx"),
        initializers={
            "zero_i64": np.asarray(0, np.int64),
            "fatha_i64": np.asarray(fatha_id, np.int64),
        },
        inputs=["char_inputs", "diac_inputs", "input_lengths"],
        outputs=["target_ids", "logits"],
        nodes=[
            ("Mul", ["char_inputs", "zero_i64"], ["zeros"]),
            ("Add", ["zeros", "fatha_i64"], ["target_ids"]),
            ("Cast", ["zeros"], ["logits"], {"to": 1}),  # float32
        ],
    )
    return tmp


def test_fake_model_diacritizes_every_letter(model_dir):
    from phoonnx_tpu.thirdparty.tashkeel import TashkeelDiacritizer

    d = TashkeelDiacritizer(model_dir=model_dir)
    text = "مرحبا"  # مرحبا
    out = d.diacritize(text)
    assert out != text
    # every letter gets the model's predicted fatha
    assert out == "".join(c + FATHA for c in text)


def test_fake_model_taskeen_threshold(model_dir):
    from phoonnx_tpu.thirdparty.tashkeel import TashkeelDiacritizer

    d = TashkeelDiacritizer(model_dir=model_dir)
    text = "مرحبا"
    # logits are 0.0: above a -1 threshold -> sukoon everywhere
    out = d.diacritize(text, taskeen_threshold=-1.0)
    assert out == "".join(c + SUKOON for c in text)
    # below a 0.5 threshold -> the predicted diacritic is kept
    out = d.diacritize(text, taskeen_threshold=0.5)
    assert out == "".join(c + FATHA for c in text)


def test_fake_model_existing_diacritics_become_hints(model_dir):
    """Pre-diacritized input: marks are stripped into the hint channel
    and the model's predictions replace them."""
    from phoonnx_tpu.thirdparty.tashkeel import TashkeelDiacritizer

    d = TashkeelDiacritizer(model_dir=model_dir)
    text = "م" + SUKOON + "ر"  # م ْ ر with an existing sukoon
    out = d.diacritize(text)
    assert out == "م" + FATHA + "ر" + FATHA


def test_fake_model_out_of_vocab_chars_stay_bare(model_dir):
    """Chars outside the input map (Latin letters) are 'removed chars':
    they pass through with NO predicted diacritic attached; in-vocab
    chars (digits are part of libtashkeel's vocabulary) do get the
    model's prediction."""
    from phoonnx_tpu.thirdparty.tashkeel import TashkeelDiacritizer

    d = TashkeelDiacritizer(model_dir=model_dir)
    out = d.diacritize("abc 123")
    assert out.startswith("abc")          # no diacritic after a/b/c
    assert FATHA not in out[:3]
    assert out.count(FATHA) > 0           # digits are in-vocab


def test_runtime_runner_failure_falls_back_to_interpreter(model_dir):
    """A compiled-runner crash mid-call must degrade to the interpreter
    (ADVICE r2), not propagate to the caller."""
    from phoonnx_tpu.thirdparty.tashkeel import TashkeelDiacritizer

    d = TashkeelDiacritizer(model_dir=model_dir)
    d._get_executor()
    if d._runner is None:  # compiled path disabled in this env
        d._runner = object()

    class Boom:
        def run(self, feeds):
            raise RuntimeError("trace failed")

    d._runner = Boom()
    text = "مرحبا"
    out = d.diacritize(text)
    assert d._runner is None
    assert out == "".join(c + FATHA for c in text)
