"""Minimal ONNX I/O: enough protobuf to import/export VITS checkpoints.

The reference depends on onnxruntime (C++) to *execute* ONNX graphs
(phoonnx/voice.py:167). The TPU build executes with XLA instead and only
needs the ONNX *container*: initializers (weights), graph metadata, and the
metadata_props written by the exporter (phoonnx_train/export_onnx.py:335-350).
This package implements that subset of the protobuf wire format from
scratch — no onnx/protobuf runtime dependency.
"""

from phoonnx_tpu.onnx.reader import OnnxModel, read_onnx  # noqa: F401
