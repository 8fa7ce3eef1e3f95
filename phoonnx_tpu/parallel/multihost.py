"""Multi-host (multi-process) initialization for pod-slice training.

The reference's multi-device story ends at Lightning's ``--devices``
passthrough (phoonnx_train/train.py:85-92). On TPU pods, JAX's standard
distributed runtime is the whole answer: every host runs the same
program, ``jax.distributed.initialize()`` wires the processes together,
``jax.devices()`` then spans the slice, and the same ``(data, model)``
mesh + GSPMD shardings used single-host (parallel/mesh.py) scale across
DCN with zero custom communication code — XLA places the gradient
all-reduce on ICI within a slice and DCN across slices.

Usage (same script on every host):

    from phoonnx_tpu.parallel import multihost
    multihost.initialize()          # no-op single-host, auto on TPU pods
    mesh = make_mesh()              # now spans all hosts' devices
    ...                             # feed each process its batch shard
"""

import logging
import os
from typing import Optional

LOG = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the JAX distributed runtime; returns True if multi-host.

    On Cloud TPU pods all arguments are auto-detected from the metadata
    server; elsewhere pass them explicitly (or set JAX_COORDINATOR_ADDRESS
    / PHOONNX_NUM_PROCESSES / PHOONNX_PROCESS_ID — jax itself reads only
    the address variable, so this module reads the other two). Calling
    this in a single-host run without coordinator info is a safe no-op.
    """
    import jax

    env_addr = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("PHOONNX_NUM_PROCESSES"):
        num_processes = int(os.environ["PHOONNX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("PHOONNX_PROCESS_ID"):
        process_id = int(os.environ["PHOONNX_PROCESS_ID"])
    # an EXPLICIT multi-host request must fail loudly, never silently
    # degrade to N independent single-host trainers — any of the three
    # arguments counts as explicit (num_processes/process_id without an
    # address previously fell through to the silent no-op below)
    explicit = (env_addr is not None or num_processes is not None
                or process_id is not None)
    if explicit and env_addr is None:
        raise ValueError(
            "num_processes/process_id given but no coordinator address "
            "(pass coordinator_address= or set JAX_COORDINATOR_ADDRESS)")
    # pod hints: GKE (TPU_WORKER_HOSTNAMES), megascale, plain GCE pod VMs
    # (TPU_WORKER_ID / CLOUD_TPU_TASK_ID — jax's own GCE detection then
    # fills the coordinator from the metadata server), or a manual force
    on_pod = any(os.environ.get(v) for v in (
        "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
        "TPU_WORKER_ID", "CLOUD_TPU_TASK_ID", "PHOONNX_MULTIHOST",
    ))
    if env_addr is None and not on_pod:
        LOG.debug("single-host run; skipping jax.distributed.initialize")
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=env_addr,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:
        msg = str(exc).lower()
        if "already initialized" in msg or "only be called once" in msg:
            # idempotent re-entry (second run in one process)
            return jax.process_count() > 1
        if "before any jax" in msg and not explicit:
            # backend already up in this process and multihost was not
            # explicitly requested — stay single-host
            LOG.warning("XLA backend already initialized; running "
                        "single-host (call multihost.initialize() before "
                        "any JAX computation to join a pod)")
            return False
        raise
    except ValueError as exc:
        if explicit:
            raise  # incomplete explicit config (e.g. missing num_processes)
        # pod-like env vars present but no coordinator to auto-detect
        # (e.g. single-host tunnels) — stay single-host
        LOG.debug("distributed init unavailable (%s); single-host", exc)
        return False
    LOG.info("distributed runtime: process %d/%d, %d local / %d global "
             "devices", jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return jax.process_count() > 1


def process_batch_slice(global_batch: int) -> slice:
    """This process's row range of a globally-indexed batch.

    Multi-host feeding is per-process: each host loads only its slice of
    the global batch and places it on its local devices; GSPMD sees one
    global array (jax.make_array_from_process_local_data).
    """
    import jax

    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} must divide evenly across "
            f"{n} processes (trailing rows would silently never train)"
        )
    per = global_batch // n
    start = per * jax.process_index()
    return slice(start, start + per)
