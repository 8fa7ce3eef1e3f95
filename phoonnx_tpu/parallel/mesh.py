"""Mesh construction and sharding rules.

The reference's only multi-device story is Lightning's implicit DDP
(phoonnx_train/train.py:85-92, no in-repo collective code). The TPU-native
equivalent: a ``jax.sharding.Mesh`` with a ``data`` axis (and a ``model``
axis reserved for tensor parallelism), batch-sharded inputs, replicated
parameters, and XLA-generated gradient all-reduce over ICI. The model
(~20-60M params) fits comfortably per chip, so DP over ICI is the whole
story for training parity; the mesh carries a second axis so TP can be
added without re-plumbing.

Scaling shape: per-chip batch stays constant (weak scaling); gradients
all-reduce over ICI; host->device feeding is per-process in multi-host
runs (standard JAX distributed runtime, no custom backend).
"""

import logging
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LOG = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh with (data, model) axes; defaults to all devices on data."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(
            f"mesh wants {n_data}x{n_model} = {need} devices, "
            f"have {len(devices)}"
        )
    if need == 0:
        raise ValueError(
            f"mesh would be EMPTY: n_model={n_model} exceeds the "
            f"{len(devices)} available devices")
    if need < len(devices):
        import jax as _jax

        if _jax.process_count() > 1:
            # truncation on a multi-process run can exclude entire
            # hosts' devices — their make_array_from_process_local_data
            # would then error or hang instead of failing here
            raise ValueError(
                f"mesh {n_data}x{n_model} = {need} devices would "
                f"exclude devices on a {_jax.process_count()}-process "
                f"run (have {len(devices)}); size the mesh to span "
                "every process's devices")
        LOG.warning("mesh uses %d of %d devices (%d idle)", need,
                    len(devices), len(devices) - need)
        devices = devices[:need]
    if n_model > 1:
        # topology-aware assignment: consecutive jax.devices() entries
        # are not guaranteed ICI neighbors on torus slices; let
        # mesh_utils place the model axis on adjacent links
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh(
                (n_data, n_model), devices=devices)
            return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
        except Exception as exc:  # virtual/CPU meshes: keep the reshape
            LOG.debug("create_device_mesh unavailable (%s)", exc)
    grid = np.array(devices).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch dict onto the mesh, sharded over batch dim."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda a: jax.device_put(a, sharding), batch
    )


def shard_train_state(mesh: Mesh, state: Any) -> Any:
    """Replicate a train state across the mesh (DP: params everywhere)."""
    rep = replicated(mesh)
    return jax.tree.map(
        lambda a: jax.device_put(a, rep) if hasattr(a, "shape") else a,
        state,
    )


# ---------------------------------------------------------------------------
# Tensor parallelism over the `model` axis
# ---------------------------------------------------------------------------

_TP_MIN_DIM = 64  # only shard matrices with a large enough channel dim


def _path_mentions(path_keys, token: str) -> bool:
    for key in path_keys:
        name = getattr(key, "key", None)
        if isinstance(name, str) and token in name:
            return True
    return False


def _tp_spec_for(path_keys, array, n_model: int) -> P:
    """Partition rule for one parameter.

    Large conv/linear kernels shard their OUTPUT-channel dim over
    `model` when divisible; everything else replicates. Output channels
    live on dim 0 for standard [O, I, K] conv weights, but on dim 1 for
    the upsampler's ConvTranspose kernels ([I, O/g, K] torch layout,
    models/vits/nn.py) — sharding those on dim 0 would partition the
    CONTRACTING dim and force partial-sum all-reduces instead of sliced
    outputs. With GSPMD this yields 1D tensor parallelism: each shard
    computes its slice of the output channels and XLA inserts the
    all-gathers where a replicated activation is required.
    """
    if not hasattr(array, "shape") or array.ndim < 2:
        return P()
    if _path_mentions(path_keys, "ups") and array.ndim == 3:
        out_ch = array.shape[1]
        if out_ch >= _TP_MIN_DIM and out_ch % n_model == 0:
            return P(None, MODEL_AXIS, *([None] * (array.ndim - 2)))
        return P()
    leading = array.shape[0]
    if leading >= _TP_MIN_DIM and leading % n_model == 0:
        return P(MODEL_AXIS, *([None] * (array.ndim - 1)))
    return P()


def shard_params_tp(mesh: Mesh, params: Any) -> Any:
    """Place a parameter tree with output-channel TP over `model`.

    The VITS voices are small enough that DP alone matches the reference's
    scale (SURVEY §2.9); this layout exercises the reserved `model` axis so
    larger variants can split weight memory/FLOPs across chips without
    re-plumbing.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def place(path, a):
        if not hasattr(a, "shape"):
            return a
        spec = _tp_spec_for(path, a, n_model)
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
