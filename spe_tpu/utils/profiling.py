"""Profiling helpers (aux subsystem; the reference only has commented-out
torch profiler scaffolding, cait.py:649,809, and iter-time meters).

Usage:
    with trace("train_epoch", logdir="/tmp/trace"):
        ...
    with annotate("cam_pseudo_boxes"):
        ...
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(name: str, logdir: str = "/tmp/spe_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in the timeline)."""
    return jax.profiler.TraceAnnotation(name)


def memory_stats() -> dict:
    """Per-device memory stats (replaces torch.cuda.max_memory_allocated in
    MetricLogger, util/misc.py:234-253)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = {k: s[k] for k in
                               ("bytes_in_use", "peak_bytes_in_use") if k in s}
        except Exception:
            pass
    return out
