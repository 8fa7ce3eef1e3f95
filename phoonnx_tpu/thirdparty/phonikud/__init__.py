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

    DL_URL = ("https://huggingface.co/thewh1teagle/phonikud-onnx/"
              "resolve/main/phonikud-1.0.int8.onnx")

    def _download(self) -> bool:
        """Fetch the model like the reference does on first use
        (phoonnx/thirdparty/phonikud/__init__.py:6-21)."""
        import urllib.request

        os.makedirs(os.path.dirname(self.model_path), exist_ok=True)
        tmp = self.model_path + ".part"
        try:
            LOG.info("downloading phonikud model from %s", self.DL_URL)
            with urllib.request.urlopen(self.DL_URL, timeout=60) as resp, \
                    open(tmp, "wb") as f:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            os.replace(tmp, self.model_path)
            return True
        except Exception as exc:
            if os.path.exists(tmp):
                os.remove(tmp)
            LOG.warning("phonikud model download failed (%s) — nikud "
                        "restoration disabled", exc)
            return False

    def _load(self) -> bool:
        if self._tried:
            return self._model is not None
        self._tried = True
        try:
            from phonikud_onnx import Phonikud
        except ImportError:
            LOG.warning(
                "phonikud-onnx not installed — nikud restoration disabled"
            )
            return False
        if not os.path.exists(self.model_path) and not self._download():
            return False
        self._model = Phonikud(self.model_path)
        return True

    def diacritize(self, text: str) -> str:
        if not self._load():
            return text
        return self._model.add_diacritics(text)
