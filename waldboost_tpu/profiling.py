"""Observability: device profiling traces and cascade efficiency counters.

The reference's only perf instrument is the ``Model.eval_cost`` running
average (/root/reference/waldboost/model.py:69-89), which this framework
keeps as a first-class on-device counter (see ops.cascade's ``n_weak``).
This module adds the TPU-side tracing the reference lacks: jax.profiler
trace annotations around pipeline phases and a simple wall-clock/throughput
meter for benchmarking loops.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax

__all__ = ["trace_annotation", "start_trace", "stop_trace", "Meter"]


def trace_annotation(name: str):
    """Context manager: annotate a region in the device profiler timeline.

    Usage::
        with trace_annotation("channels"):
            canvas = compute_canvas(image)
    """
    return jax.profiler.TraceAnnotation(name)


def start_trace(log_dir: str) -> None:
    """Start capturing a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


@dataclass
class Meter:
    """Wall-clock throughput meter with named phases.

    Blocks on device results at phase boundaries so the numbers mean what
    they say.  Example::

        meter = Meter()
        with meter.phase("detect", items=batch, pixels=batch*h*w):
            out = fn(images)
        print(meter.report())
    """

    totals: Dict[str, float] = field(default_factory=dict)
    items: Dict[str, float] = field(default_factory=dict)
    pixels: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, items: float = 0, pixels: float = 0,
              block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.items[name] = self.items.get(name, 0.0) + items
            self.pixels[name] = self.pixels.get(name, 0.0) + pixels

    def report(self) -> str:
        lines = []
        for name, dt in sorted(self.totals.items()):
            parts = [f"{name}: {dt * 1e3:.2f} ms"]
            if self.items.get(name):
                parts.append(f"{self.items[name] / dt:.1f} items/s")
            if self.pixels.get(name):
                parts.append(f"{self.pixels[name] / dt / 1e6:.1f} MP/s")
            lines.append("  ".join(parts))
        return "\n".join(lines)
