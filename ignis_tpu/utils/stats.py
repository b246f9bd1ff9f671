"""Render statistics (reference src/runtime/Statistics.h analog).

XLA fuses the whole iteration into a handful of kernels, so the reference's
per-shader-type timers map to: per-iteration wall/compile timers on the host
plus optional in-kernel quantities (rays traced per bounce) returned from a
diagnostic render. `Statistics.dump()` mirrors the --stats report.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class SectionTimer:
    total: float = 0.0
    count: int = 0

    def add(self, dt: float):
        self.total += dt
        self.count += 1


@dataclass
class Statistics:
    sections: Dict[str, SectionTimer] = field(default_factory=dict)
    quantities: Dict[str, int] = field(default_factory=dict)

    def section(self, name: str):
        return _SectionCtx(self, name)

    def add_time(self, name: str, dt: float):
        self.sections.setdefault(name, SectionTimer()).add(dt)

    def add_quantity(self, name: str, n: int):
        self.quantities[name] = self.quantities.get(name, 0) + int(n)

    def dump(self, total_iters: int = 0) -> str:
        lines = ["Statistics:"]
        for name, t in sorted(self.sections.items()):
            avg = t.total / max(t.count, 1)
            lines.append(f"  {name:24s} {t.total:9.3f}s total"
                         f"  {avg * 1e3:9.2f}ms avg  x{t.count}")
        for name, q in sorted(self.quantities.items()):
            per = q / max(total_iters, 1)
            lines.append(f"  {name:24s} {q:12d} total  {per:12.1f}/iter")
        return "\n".join(lines)


class _SectionCtx:
    def __init__(self, stats: Statistics, name: str):
        self.stats = stats
        self.name = name

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.stats.add_time(self.name, time.time() - self.t0)
        return False
