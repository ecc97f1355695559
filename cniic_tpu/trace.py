"""Structured per-stage tracing (SURVEY §5.1).

The reference's only instrumentation is ad-hoc stdout telemetry (k-means
iteration stats kmeans.rs:401-413, trie memory stats dict.rs:325-399, a dead
wall-clock helper bench.rs:113-121). Here: nested wall-clock spans with a
thread-local stack, aggregated per label, printable per image or per run —
plus an opt-in hook into ``jax.profiler`` for device traces.

Usage:
    with trace.span("huffman.pack"):
        ...
    trace.report()        # {'huffman.pack': (calls, total_s)}

Env:
    CNIIC_TRACE=1         print each span as it closes
    CNIIC_JAX_PROFILE=dir wrap runner encodes in jax.profiler.trace(dir)
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict

_tls = threading.local()
_lock = threading.Lock()
_totals: dict[str, list[float]] = defaultdict(lambda: [0, 0.0])
_ECHO = os.environ.get("CNIIC_TRACE", "") not in ("", "0")


@contextlib.contextmanager
def span(name: str):
    stack = getattr(_tls, "stack", None)
    if stack is None:
        stack = _tls.stack = []
    stack.append(name)
    label = ".".join(stack) if len(stack) > 1 else name
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        stack.pop()
        with _lock:
            agg = _totals[label]
            agg[0] += 1
            agg[1] += dt
        if _ECHO:
            print(f"[trace] {label}: {dt * 1e3:.2f} ms")


def report() -> dict[str, tuple[int, float]]:
    with _lock:
        return {k: (int(v[0]), v[1]) for k, v in sorted(_totals.items())}


def reset() -> None:
    with _lock:
        _totals.clear()


def print_report() -> None:
    rows = report()
    if not rows:
        return
    width = max(len(k) for k in rows)
    print("--- trace ---")
    for k, (n, s) in rows.items():
        print(f"{k:<{width}}  x{n:<6d} {s:9.3f}s  ({s / n * 1e3:8.2f} ms/call)")


@contextlib.contextmanager
def device_profile():
    """jax.profiler capture when CNIIC_JAX_PROFILE is set; no-op otherwise."""
    out_dir = os.environ.get("CNIIC_JAX_PROFILE")
    if not out_dir:
        yield
        return
    import jax

    with jax.profiler.trace(out_dir):
        yield
