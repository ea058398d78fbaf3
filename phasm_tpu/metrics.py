"""Structured metrics, stage timing, and profiler hooks.

SURVEY.md §6: the reference has only `logging` timestamps and printed graph
statistics.  The TPU rebuild instruments every stage with counters and
timers (alignments/sec/chip, edges before/after each pass, candidates per
bubble, prune survival) plus an optional `jax.profiler` trace for kernel
roofline work.

Usage:
    from phasm_tpu import metrics
    with metrics.stage("overlap.extend", pairs=n):
        ...
    metrics.incr("overlap.alignments", len(table))
    print(metrics.report())        # JSON-able dict
    metrics.reset()

All state is a module-level registry (single-process pipelines; the
multi-host story aggregates per-host reports).
"""
from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict

log = logging.getLogger("phasm_tpu.metrics")

_counters: dict[str, float] = defaultdict(float)
_timers: dict[str, float] = defaultdict(float)
_calls: dict[str, int] = defaultdict(int)


def incr(name: str, value: float = 1.0) -> None:
    _counters[name] += value


def set_gauge(name: str, value: float) -> None:
    _counters[name] = value


@contextlib.contextmanager
def stage(name: str, **annotations):
    """Time a pipeline stage; annotations become rate denominators.

    `with stage("overlap.extend", pairs=4096):` records elapsed seconds and,
    for each annotation, a `<name>.<key>_per_sec` rate.
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _timers[name] += dt
        _calls[name] += 1
        for k, v in annotations.items():
            incr(f"{name}.{k}", v)
            if dt > 0:
                set_gauge(f"{name}.{k}_per_sec", _counters[f"{name}.{k}"] / _timers[name])
        log.debug("stage %s: %.3fs %s", name, dt, annotations or "")


@contextlib.contextmanager
def device_trace(outdir: str):
    """jax.profiler trace context (Perfetto/XProf-compatible).

    Wrap a hot section to capture per-kernel device timelines:
        with metrics.device_trace("/tmp/trace"):
            engine.overlap_reads(...)
    """
    import jax

    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def report() -> dict:
    out = {"counters": dict(_counters), "seconds": dict(_timers), "calls": dict(_calls)}
    return out


def report_json() -> str:
    return json.dumps(report(), sort_keys=True)


def reset() -> None:
    _counters.clear()
    _timers.clear()
    _calls.clear()
