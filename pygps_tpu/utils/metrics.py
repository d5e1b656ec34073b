"""Structured metrics / observability.

The reference logs with bare ``print`` in demos and optimizers
(SURVEY.md §5.5); here: per-iteration structured metrics (nlZ, grad norm,
step size, acceptance rate, ESS/R̂, wall-clock per factorization) as JSONL
plus optional stdout mirroring, and ``jax.profiler`` trace annotations
around the hot phases (§5.1)."""

from __future__ import annotations

import json
import time
from contextlib import contextmanager

import jax


class MetricsLogger:
    """Append-only JSONL metrics sink."""

    def __init__(self, path: str | None = None, echo: bool = False):
        self.path = path
        self.echo = echo
        self._f = open(path, "a") if path else None

    def log(self, event: str, **fields):
        rec = {"t": time.time(), "event": event, **fields}
        line = json.dumps(rec)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()
        if self.echo:
            print(line)

    def close(self):
        if self._f:
            self._f.close()
            self._f = None


@contextmanager
def trace_span(name: str):
    """jax.profiler annotation + wall-clock timing; usable around
    Gram/Cholesky/NUTS phases (shows up in Perfetto dumps)."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    _LAST_SPANS[name] = time.perf_counter() - t0


_LAST_SPANS: dict = {}


def last_span(name: str) -> float | None:
    return _LAST_SPANS.get(name)


def start_trace(log_dir: str):
    """Begin a profiler trace (Perfetto/XPlane dump at stop_trace)."""
    jax.profiler.start_trace(log_dir)


def stop_trace():
    jax.profiler.stop_trace()
