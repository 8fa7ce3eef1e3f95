"""Compiled execution for the bundled auxiliary ONNX models.

The reference runs its auxiliary models (libtashkeel's diacritizer,
phonikud, silero VAD) on onnxruntime's compiled C++ engine (reference
phoonnx/thirdparty/tashkeel/__init__.py, phonikud/__init__.py,
phoonnx_train/norm_audio/vad.py). The rebuild's equivalents previously
ran on the eager numpy interpreter; this module gives them the same
compiled treatment via the ONNX -> JAX lowering
(:mod:`phoonnx_tpu.onnx.jax_lowering`), with two integration concerns
handled here:

* **Opt-out**: ``PHOONNX_AUX_COMPILE=0`` keeps every auxiliary model on
  the interpreter (e.g. for debugging, or environments where the jit
  warm-up is not worth it for a one-shot call).
* **Length bucketing**: text-shaped models see a new sequence length on
  every call; planning + XLA compilation per exact length would be a
  compile storm. Callers pad to :func:`bucket_len` buckets so a handful
  of compiles serves every input, and slice the outputs back. Sound
  only for models that mask by an explicit length input
  (``input_lengths``, ``attention_mask``) — callers validate that
  contract on first use (see TashkeelDiacritizer._infer's self-check).
"""

import logging
import os
from typing import Optional

LOG = logging.getLogger(__name__)

# Generous step ladder: ~1.3-2x growth keeps both the compile count and
# the padding waste (host-side; the models are tiny) bounded.
AUX_LEN_BUCKETS = (16, 32, 64, 128, 192, 256, 384, 512, 768, 1024,
                   1536, 2048, 3072, 4096, 6144, 8192, 12288)


def bucket_len(n: int, buckets=AUX_LEN_BUCKETS) -> int:
    """Smallest bucket >= n; lengths beyond the ladder stay exact
    (correct, just compiled per length — callers cap input sizes long
    before that)."""
    for b in buckets:
        if n <= b:
            return b
    return n


def aux_compile_enabled() -> bool:
    return os.environ.get("PHOONNX_AUX_COMPILE", "1") != "0"


def compiled_runner(model, matmul_precision: Optional[str] = None):
    """A JaxGraphRunner for ``model``, or None when disabled or JAX is
    unavailable (callers keep the interpreter as the fallback)."""
    if not aux_compile_enabled():
        return None
    try:
        from phoonnx_tpu.onnx.jax_lowering import JaxGraphRunner

        return JaxGraphRunner(model, matmul_precision=matmul_precision)
    except Exception as exc:  # pragma: no cover - jax always present here
        LOG.warning("auxiliary model compilation unavailable (%s); "
                    "using the interpreter", exc)
        return None
