"""TPU-native VITS: text encoder, duration flows, coupling flows, HiFi-GAN.

Functional JAX implementation (parameter pytrees + pure apply functions).
Parameter tree keys mirror the reference torch module paths (e.g.
``enc_p.emb.weight``) so ONNX/torch checkpoints import by name
(reference export recipe: phoonnx_train/export_onnx.py:250-327).
"""

from phoonnx_tpu.models.vits.model import (  # noqa: F401
    VitsHParams,
    infer,
    random_params,
    train_forward,
)
