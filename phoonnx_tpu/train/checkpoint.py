"""Checkpoint save/restore + cross-format generator import.

TPU equivalent of the reference's Lightning ModelCheckpoint/resume
machinery (phoonnx_train/train.py:94-96, lightning load_from_checkpoint):

* full train state (G+D params, both optimizer states, step) as a
  keypath-keyed .npz container;
* generator-only warm starts from exported ONNX containers or torch
  Lightning checkpoints, with the reference's missing-key tolerance and
  single->multi-speaker surgery (train.py:15-26, 131-144).
"""

import json
import logging
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

LOG = logging.getLogger(__name__)


def _flatten_state(state):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(state)[0]
    return {
        jax.tree_util.keystr(path): np.asarray(leaf)
        for path, leaf in leaves_with_paths
    }


def save(ckpt_dir: str, state, hp, config: Optional[dict] = None) -> str:
    """Save the train state as ``ckpt_dir/step_N.npz`` (keypath-keyed).

    A flat keypath->array container: robust to the static-metadata pytree
    nodes (kernel sizes etc. live in the treedef, not as saved arrays) and
    trivially inspectable. Returns the checkpoint path.
    """
    step = int(state.step)
    base = Path(ckpt_dir).absolute()
    base.mkdir(parents=True, exist_ok=True)
    path = base / f"step_{step}.npz"
    np.savez(path, **_flatten_state(state))
    meta = {
        "step": step,
        "hparams": {k: v for k, v in vars(hp).items()
                    if isinstance(v, (int, float, str, bool, tuple, list))},
    }
    if config:
        meta["dataset_config"] = config
    with open(base / f"step_{step}.json", "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2, default=list)
    return str(path)


def restore(path: str, target_state):
    """Restore a train state saved by :func:`save` into the target's
    structure (the treedef carries the static metadata)."""
    stored = np.load(path)
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(
        target_state
    )
    leaves = []
    for key_path, leaf in paths_and_leaves:
        key = jax.tree_util.keystr(key_path)
        if key not in stored:
            raise ValueError(f"checkpoint missing leaf {key}")
        value = stored[key]
        if hasattr(leaf, "shape") and tuple(leaf.shape) != value.shape:
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {value.shape} "
                f"vs model {tuple(leaf.shape)}"
            )
        leaves.append(value)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def restore_generator(path: str, hp):
    """Load only the generator params from a train-state checkpoint.

    Robust to training-side differences (discriminator size, optimizer
    states): only ``.params_g`` leaves are read, into a fresh skeleton.
    """
    from phoonnx_tpu.models.vits.model import random_params

    stored = np.load(path)
    skeleton = random_params(jax.random.PRNGKey(0), hp)
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(skeleton)
    leaves = []
    for key_path, leaf in paths_and_leaves:
        key = ".params_g" + jax.tree_util.keystr(key_path)
        if key not in stored:
            raise ValueError(f"checkpoint missing generator leaf {key}")
        value = stored[key]
        if tuple(leaf.shape) != value.shape:
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {value.shape} "
                f"vs model {tuple(leaf.shape)}"
            )
        leaves.append(value)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    base = Path(ckpt_dir)
    if not base.is_dir():
        return None
    steps = []
    for entry in base.iterdir():
        if entry.name.startswith("step_") and entry.suffix == ".npz":
            try:
                steps.append((int(entry.stem.split("_")[1]), entry))
            except ValueError:
                continue
    if not steps:
        return None
    return str(max(steps)[1])


def _flat_from_torch_ckpt(path: str) -> Dict[str, np.ndarray]:
    """Flat generator arrays from a torch Lightning checkpoint."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    flat = {}
    for key, value in state_dict.items():
        if key.startswith("model_g."):
            flat[key[len("model_g."):]] = value.numpy()
    return flat


def load_generator_flat(path: str) -> Dict[str, np.ndarray]:
    """Flat generator arrays from .onnx container or torch .ckpt."""
    if path.endswith(".onnx"):
        from phoonnx_tpu.onnx.reader import read_onnx

        return read_onnx(path).initializers
    return _flat_from_torch_ckpt(path)


_SPEAKER_COND_PREFIXES = ("dec.cond.", "dp.cond.", "enc_q.enc.cond_layer.")


def load_generator_warm_start(path: str, hp, target_params):
    """Import a single-speaker generator into a (possibly multi-speaker)
    model, dropping conditioning layers absent in the source
    (reference surgery: train.py:131-144). Missing keys keep their fresh
    initialization (missing-key-tolerant load, train.py:15-26)."""
    from phoonnx_tpu.models.vits.load import params_from_flat

    flat = load_generator_flat(path)
    flat = {
        k: v for k, v in flat.items()
        if not k.startswith(_SPEAKER_COND_PREFIXES) and
        not k.startswith("emb_g.")
    }
    # params_from_flat fills every loaded leaf and leaves the rest (speaker
    # conditioning layers, emb_g) at fresh random init — exactly the
    # reference's missing-key-tolerant load.
    del target_params
    return params_from_flat(flat, hp, strict=False)
