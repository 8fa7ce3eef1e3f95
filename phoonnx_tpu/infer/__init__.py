"""TPU inference runtime: bucketed compilation, synthesis engine."""

from phoonnx_tpu.infer.engine import VitsEngine  # noqa: F401
