"""Observability: structured per-stage timing and per-frame codec stats.

The framework counterpart of the reference's START_TIMER/STOP_TIMER TSC
macros (libavutil/timer.h), `ffmpeg -benchmark` reporting, and the Daala
EC's entropy-vs-bits accounting (daala_entropy.c:612).  Collectors are
explicit objects, not globals, so sessions can expose their own stats.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class StageTimer:
    """Accumulates wall time per named stage; use as a context manager."""
    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict:
        return {name: {"total_s": round(self.totals[name], 4),
                       "calls": self.counts[name],
                       "avg_ms": round(1000 * self.totals[name]
                                       / max(self.counts[name], 1), 3)}
                for name in sorted(self.totals)}

    def json(self) -> str:
        return json.dumps(self.report())


@dataclass
class FrameStats:
    """Per-frame encode statistics: bytes per plane/slice, pixel rate."""
    frames: int = 0
    pixels: int = 0
    bytes_out: int = 0
    keyframes: int = 0
    slice_bytes: list = field(default_factory=list)

    def add_frame(self, n_pixels: int, packet: bytes, keyframe: bool,
                  slice_sizes=None):
        self.frames += 1
        self.pixels += n_pixels
        self.bytes_out += len(packet)
        self.keyframes += 1 if keyframe else 0
        if slice_sizes:
            self.slice_bytes.append(list(slice_sizes))

    def report(self) -> dict:
        return {
            "frames": self.frames,
            "keyframes": self.keyframes,
            "bytes_out": self.bytes_out,
            "bits_per_pixel": round(8 * self.bytes_out
                                    / max(self.pixels, 1), 4),
        }
