"""Observability: synthesis timers, RTF stats, profiler hooks.

The reference has no tracing/profiling (SURVEY §5.1) — only debug logs.
This module adds the minimum production surface: per-call latency/RTF
aggregation with percentiles, and a context manager around
``jax.profiler`` for device traces.
"""

import contextlib
import logging
import math
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Deque, Dict, Iterator, List

LOG = logging.getLogger(__name__)


# Percentile window: long-lived servers record every synthesis, so the
# history must be bounded (unbounded lists grow forever and summary()
# re-sorts the full history per /stats poll). Totals/RTF stay EXACT
# over the whole lifetime via running sums; percentiles cover the
# window.
STATS_WINDOW = 8192


@dataclass
class SynthesisStats:
    """Aggregated synthesis timing: exact lifetime totals + windowed
    percentiles (last ``STATS_WINDOW`` calls)."""

    latencies_s: Deque[float] = field(
        default_factory=lambda: deque(maxlen=STATS_WINDOW))
    audio_seconds: Deque[float] = field(
        default_factory=lambda: deque(maxlen=STATS_WINDOW))
    total_calls: int = 0
    total_latency_s: float = 0.0
    total_audio_s: float = 0.0

    def record(self, latency_s: float, audio_s: float) -> None:
        self.latencies_s.append(latency_s)
        self.audio_seconds.append(audio_s)
        self.total_calls += 1
        self.total_latency_s += latency_s
        self.total_audio_s += audio_s

    def _percentile(self, values, q: float) -> float:
        """Nearest-rank percentile: smallest value with at least q of the
        sample at or below it (int(q*n) is one rank too high whenever
        q*n lands on an integer — p90 of 10 samples must be the 9th
        value, not the maximum)."""
        if not values:
            return 0.0
        ordered = sorted(values)
        rank = max(math.ceil(q * len(ordered)), 1)
        return ordered[min(rank - 1, len(ordered) - 1)]

    @property
    def rtf(self) -> float:
        if self.total_audio_s <= 0:
            return 0.0
        return self.total_latency_s / self.total_audio_s

    def summary(self) -> Dict[str, float]:
        return {
            "count": self.total_calls,
            "rtf": round(self.rtf, 6),
            "audio_sec_per_sec": round(1.0 / self.rtf, 2) if self.rtf else 0.0,
            "p50_latency_ms": round(
                self._percentile(self.latencies_s, 0.50) * 1000, 2),
            "p90_latency_ms": round(
                self._percentile(self.latencies_s, 0.90) * 1000, 2),
            "p99_latency_ms": round(
                self._percentile(self.latencies_s, 0.99) * 1000, 2),
            "total_audio_s": round(self.total_audio_s, 2),
        }


@contextlib.contextmanager
def timed(stats: SynthesisStats, audio_seconds_fn) -> Iterator[None]:
    """Time a synthesis call; audio_seconds_fn() -> seconds produced."""
    start = time.perf_counter()
    yield
    stats.record(time.perf_counter() - start, float(audio_seconds_fn()))


def enable_compilation_cache(cache_dir: str = "") -> str:
    """Persist XLA compilations across process restarts.

    The first call per (program, shape) pays 20-40 s of XLA compilation;
    for serving, paying it once per MACHINE instead of once per process
    is the difference between instant and minute-long cold starts. Safe
    to call multiple times; returns the cache directory in use.
    """
    import os

    import jax

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "phoonnx_tpu", "xla"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every compilation, however small/fast
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    LOG.info("XLA compilation cache: %s", cache_dir)
    return cache_dir


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/phoonnx_tpu_trace") -> Iterator[None]:
    """jax.profiler trace around a block (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        LOG.info("device trace written to %s", log_dir)


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device HBM usage in MB (empty on backends without stats).

    Production observability the reference has no counterpart for:
    surfaces bytes_in_use / peak_bytes_in_use / bytes_limit from the
    PJRT allocator, for the trainer's per-epoch log line and the
    server's /stats route.
    """
    import jax

    out: Dict[str, Dict[str, float]] = {}
    for dev in jax.local_devices():
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None
        if not stats:
            continue
        mb = 1024 * 1024
        out[str(dev.id)] = {
            "bytes_in_use_mb": round(stats.get("bytes_in_use", 0) / mb, 1),
            "peak_bytes_in_use_mb": round(
                stats.get("peak_bytes_in_use", 0) / mb, 1),
            "bytes_limit_mb": round(stats.get("bytes_limit", 0) / mb, 1),
        }
    return out
