"""Benchmark entry point (driver-run, real TPU).

Mirrors the reference protocol (scripts/benchmark.sh: diamond_scene.json,
64 spp, warmup + timed iterations, Msamples/s) and prints ONE JSON line.

The reference publishes no numeric baseline (BASELINE.md), so vs_baseline
is reported against our own first-round anchor (ANCHOR_MSPS) once recorded;
until then 1.0.
"""
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SCENE = "/root/reference/scenes/diamond_scene.json"
SIZE = 512
SPP = 64
SPI = 8          # samples per iteration (persistent-lane wavefront)
WARMUP = 1
TIMED = 7

# First recorded TPU v5e median Msamples/s for this config (round 1 anchor).
ANCHOR_MSPS = None


def main():
    import jax
    import ignis_tpu

    rt = ignis_tpu.loadFromFile(SCENE, width=SIZE, height=SIZE, spi=SPI)
    n_lanes = rt.framebuffer_width * rt.framebuffer_height * rt.settings.spi

    for _ in range(WARMUP):
        rt.step()
        jax.block_until_ready(rt._film)

    times = []
    iters = min(TIMED, max(1, SPP // SPI - WARMUP))
    for _ in range(iters):
        t0 = time.time()
        rt.step()
        jax.block_until_ready(rt._film)
        times.append(time.time() - t0)

    med = statistics.median(times)
    msps = n_lanes / med / 1e6
    vs = msps / ANCHOR_MSPS if ANCHOR_MSPS else 1.0
    print(json.dumps({
        "metric": "diamond_scene_512_msamples_per_s",
        "value": round(msps, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
