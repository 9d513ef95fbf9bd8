"""Profiling utilities.

TPU-native replacement for the reference's wall-clock accumulators
(/root/reference/src/utils/decorator.py:4-21, backgammon_env.py:331-341):
timers synchronize on device results (block_until_ready), and the trace
helper wraps jax.profiler to produce op-level device timings — the tool that
drove this framework's optimization passes (see PERF.md).
"""
from __future__ import annotations

import collections
import contextlib
import time
from typing import Callable, Dict

import jax

profiling_data: Dict[str, Dict[str, float]] = collections.defaultdict(
    lambda: {"calls": 0, "total_s": 0.0}
)


def profile(fn: Callable) -> Callable:
    """Decorator accumulating synchronized wall time per function (analog of
    the reference's @profile, but blocking on device results so compute time
    is actually attributed)."""

    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        d = profiling_data[fn.__qualname__]
        d["calls"] += 1
        d["total_s"] += dt
        return out

    wrapper.__name__ = getattr(fn, "__name__", "wrapped")
    return wrapper


def print_profiling_data() -> None:
    for name, d in sorted(profiling_data.items(), key=lambda kv: -kv[1]["total_s"]):
        calls = int(d["calls"])
        avg = d["total_s"] / max(calls, 1)
        print(f"{name}: {calls} calls, total {d['total_s']:.3f}s, avg {avg*1000:.2f}ms")


@contextlib.contextmanager
def timed(name: str, sync_on=None):
    """Context manager timing a block; pass the block's result pytree via
    ``sync_on`` (or call jax.block_until_ready yourself) for device work."""
    t0 = time.perf_counter()
    yield
    if sync_on is not None:
        jax.block_until_ready(sync_on)
    dt = time.perf_counter() - t0
    d = profiling_data[name]
    d["calls"] += 1
    d["total_s"] += dt


def device_op_times(fn: Callable, *args, trace_dir: str = "/tmp/jaxtrace_prof"):
    """Run ``fn(*args)`` once under jax.profiler and return {op_name: ms}
    aggregated over device events — the op-level view used to find this
    framework's hot fusions."""
    import glob
    import gzip
    import json

    jax.block_until_ready(fn(*args))  # compile outside the trace
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(fn(*args))
    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as fh:
        trace = json.load(fh)
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    agg: Dict[str, float] = collections.defaultdict(float)
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and "TPU" in pid_names.get(e.get("pid"), ""):
            nm = e.get("name", "?")
            if not nm.startswith("jit_"):
                agg[nm] += e["dur"] / 1000.0
    return dict(sorted(agg.items(), key=lambda kv: -kv[1]))


def device_memory_stats(device=None) -> Dict[str, float]:
    """HBM usage for one device in MB — the TPU analog of the reference's
    NVML utilization/memory prints around each update
    (/root/reference/src/agents/trainer.py:54-62,170-184). Returns {} when
    the backend exposes no stats (e.g. CPU)."""
    try:
        d = device or jax.local_devices()[0]
        stats = d.memory_stats() or {}
        mb = 1.0 / (1024 * 1024)
        out = {}
        if "bytes_in_use" in stats:
            out["hbm_used_mb"] = stats["bytes_in_use"] * mb
        if "bytes_limit" in stats:
            out["hbm_limit_mb"] = stats["bytes_limit"] * mb
        if "peak_bytes_in_use" in stats:
            out["hbm_peak_mb"] = stats["peak_bytes_in_use"] * mb
        return out
    except Exception:
        return {}
