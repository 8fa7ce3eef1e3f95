"""Guards and bounded-state fixes in parallel/ and observability
(found by review)."""

import numpy as np
import pytest


def test_make_mesh_empty_raises():
    """n_model beyond the device count used to return an EMPTY mesh
    (n_data = count//n_model = 0) that failed cryptically at first use."""
    from phoonnx_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="EMPTY"):
        make_mesh(n_model=1024)


def test_multihost_explicit_args_without_address_raise(monkeypatch):
    """num_processes/process_id without a coordinator address used to
    silently no-op into N independent single-host trainers."""
    from phoonnx_tpu.parallel import multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    for var in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                "TPU_WORKER_ID", "CLOUD_TPU_TASK_ID", "PHOONNX_MULTIHOST"):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(ValueError, match="coordinator address"):
        multihost.initialize(num_processes=4, process_id=2)


def test_synthesis_stats_bounded_window_exact_totals():
    """Percentile history is bounded; lifetime totals/RTF stay exact."""
    from phoonnx_tpu.observability import STATS_WINDOW, SynthesisStats

    stats = SynthesisStats()
    n = STATS_WINDOW + 100
    for i in range(n):
        stats.record(0.01, 1.0)
    s = stats.summary()
    assert s["count"] == n
    assert s["total_audio_s"] == float(n)
    assert abs(s["rtf"] - 0.01) < 1e-9
    assert len(stats.latencies_s) == STATS_WINDOW


def test_istft_requires_win_equals_nfft():
    import jax.numpy as jnp

    from phoonnx_tpu.ops.istft import istft

    mag = jnp.ones((1, 5, 9))
    ph = jnp.zeros((1, 5, 9))
    with pytest.raises(NotImplementedError, match="win_size == n_fft"):
        istft(mag, ph, n_fft=16, hop=4, win_size=12)
