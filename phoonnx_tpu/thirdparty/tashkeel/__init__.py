"""Arabic diacritic restoration (tashkeel).

The reference ports libtashkeel (Rust) to Python + an ONNX model
(phoonnx/thirdparty/tashkeel/__init__.py; the model itself is a
large-blob not shipped in the repo). The TPU build loads the same
``model.onnx`` + JSON id maps when present and executes the network with
JAX via the generic ONNX graph executor; without the model it degrades to
identity with a warning (synthesis still works on undiacritized text).
"""

import json
import logging
import os
from typing import Optional

import numpy as np

LOG = logging.getLogger(__name__)

CHAR_LIMIT = 12000

_DATA_DIR = os.path.dirname(__file__)


class TashkeelDiacritizer:
    """Restore Arabic diacritics; identity fallback without a model."""

    def __init__(self, model_dir: Optional[str] = None):
        self.model_dir = model_dir or _DATA_DIR
        self._executor = None
        self._maps = None
        self._tried = False

    def _load(self) -> bool:
        if self._tried:
            return self._executor is not None
        self._tried = True
        model_path = os.path.join(self.model_dir, "model.onnx")
        if not os.path.exists(model_path):
            LOG.warning(
                "tashkeel model.onnx not found in %s — diacritization "
                "disabled (returning text unchanged)", self.model_dir,
            )
            return False
        try:
            from phoonnx_tpu.onnx.executor import OnnxExecutor
            from phoonnx_tpu.onnx.reader import read_onnx

            self._executor = OnnxExecutor(read_onnx(model_path))
            maps = {}
            for name in ("input_id_map", "target_id_map", "hint_id_map"):
                path = os.path.join(self.model_dir, f"{name}.json")
                if os.path.exists(path):
                    with open(path, encoding="utf-8") as f:
                        maps[name] = json.load(f)
            self._maps = maps
            return True
        except Exception as exc:  # pragma: no cover
            LOG.warning("failed to load tashkeel model: %s", exc)
            self._executor = None
            return False

    def diacritize(self, text: str,
                   taskeen_threshold: Optional[float] = 0.8) -> str:
        """Add diacritics to Arabic text (identity if no model)."""
        if len(text) > CHAR_LIMIT:
            text = text[:CHAR_LIMIT]
        if not self._load():
            return text
        return self._diacritize_model(text, taskeen_threshold)

    def _diacritize_model(self, text: str,
                          taskeen_threshold: Optional[float]) -> str:
        input_map = self._maps.get("input_id_map", {})
        target_map = self._maps.get("target_id_map", {})
        id_to_diac = {v: k for k, v in target_map.items()}

        chars = list(text)
        char_ids = np.array(
            [[input_map.get(c, input_map.get("<unk>", 0)) for c in chars]],
            dtype=np.int64,
        )
        diac_ids = np.zeros_like(char_ids)
        lengths = np.array([len(chars)], dtype=np.int64)
        outputs = self._executor.run({
            "char_inputs": char_ids,
            "diac_inputs": diac_ids,
            "input_lengths": lengths,
        })
        target_ids = np.asarray(outputs[0])[0]
        logits = np.asarray(outputs[1])[0] if len(outputs) > 1 else None

        out = []
        sukun = "ْ"
        for i, ch in enumerate(chars):
            out.append(ch)
            if i >= len(target_ids):
                continue
            diac = id_to_diac.get(int(target_ids[i]), "")
            if diac == sukun and taskeen_threshold is not None \
                    and logits is not None:
                probs = _softmax(logits[i])
                if probs[int(target_ids[i])] < taskeen_threshold:
                    diac = ""
            if diac and diac != "<no_diacritic>":
                out.append(diac)
        return "".join(out)


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - np.max(x))
    return e / e.sum()
