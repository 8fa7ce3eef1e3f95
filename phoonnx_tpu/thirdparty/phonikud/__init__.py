"""Hebrew nikud (diacritic) restoration.

The reference wraps the phonikud-onnx package, which downloads an int8
ONNX model (phoonnx/thirdparty/phonikud/__init__.py:6-21). The TPU build
uses the phonikud package when installed; otherwise it degrades to
identity with a warning (synthesis still works on text without nikud).
"""

import logging
import os
from typing import Optional

LOG = logging.getLogger(__name__)


class PhonikudDiacritizer:
    def __init__(self, model_path: Optional[str] = None):
        self.model_path = model_path or os.path.expanduser(
            "~/.local/share/phoonnx/phonikud-1.0.int8.onnx"
        )
        self._model = None
        self._tried = False

    def _load(self) -> bool:
        if self._tried:
            return self._model is not None
        self._tried = True
        try:
            from phonikud_onnx import Phonikud

            if os.path.exists(self.model_path):
                self._model = Phonikud(self.model_path)
                return True
            LOG.warning(
                "phonikud model not found at %s — nikud restoration "
                "disabled", self.model_path,
            )
        except ImportError:
            LOG.warning(
                "phonikud-onnx not installed — nikud restoration disabled"
            )
        return False

    def diacritize(self, text: str) -> str:
        if not self._load():
            return text
        return self._model.add_diacritics(text)
