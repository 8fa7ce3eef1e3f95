"""Two-process multi-host smoke worker (launched by
tests/test_train_step.py::test_two_process_distributed_smoke)."""
import os
import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()


def main():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    pid = int(sys.argv[1])
    import numpy as np

    from phoonnx_tpu.parallel import (
        batch_sharding,
        make_mesh,
        multihost,
        shard_train_state,
    )

    port = sys.argv[2]
    ok = multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=pid,
    )
    assert ok, "initialize() must report multi-host"
    assert jax.process_count() == 2
    assert jax.device_count() == 4  # 2 local x 2 processes

    mesh = make_mesh()  # 4-way data axis across both processes
    global_batch = 8
    rows = multihost.process_batch_slice(global_batch)
    assert rows == slice(pid * 4, pid * 4 + 4), rows

    # each process contributes its slice; the assembled global array
    # must sum like the full batch
    full = np.arange(global_batch, dtype=np.float32)[:, None]
    local = full[rows]
    arr = jax.make_array_from_process_local_data(
        batch_sharding(mesh), local, (global_batch, 1)
    )
    total = float(jax.jit(lambda a: a.sum())(arr))
    assert total == float(full.sum()), (total, full.sum())

    # replicated state placement works across processes
    state = {"w": np.ones((3, 3), np.float32)}
    sharded = shard_train_state(mesh, state)
    assert float(jax.jit(lambda s: s["w"].sum())(sharded)) == 9.0

    print(f"proc {pid}: MULTIHOST SMOKE OK (total={total})", flush=True)


if __name__ == "__main__":
    main()
