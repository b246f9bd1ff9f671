#!/usr/bin/env python
"""A/B the cycles-mix TPU failure: Pallas kernels vs XLA fallback.

Round-5 finding: cycles-mix-{diff-diff,diff-trans,trans-trans} pass on
CPU (robust relMSE 4e-4..8e-4) but failed the round-4 TPU eval at
0.067/0.073/0.355 — a TPU-specific divergence. This script renders one
scene twice on the TPU (IGNIS_TPU_PALLAS=1 and =0, in separate
subprocesses so the env gate is re-read) and prints both relMSEs to
bisect kernel-path vs XLA-numerics.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

SCENE = sys.argv[1] if len(sys.argv) > 1 else "cycles-mix-diff-diff"
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 64

WORKER = r"""
import sys, numpy as np
sys.path.insert(0, "/root/repo")
import ignis_tpu
from ignis_tpu.utils.exr import load_exr_rgb
name, spp = sys.argv[1], int(sys.argv[2])
rt = ignis_tpu.loadFromFile(f"/root/reference/scenes/evaluation/{name}.json", spi=1)
for _ in range(spp):
    rt.step()
img = rt.framebuffer(normalized=True)
import glob
ref_file = min(glob.glob(f"/root/reference/scenes/evaluation/references/ref-{name}*.exr"), key=len)
ref = load_exr_rgb(ref_file)
d = img - ref
pp = np.mean(d * d / (ref * ref + 1e-2), axis=-1).reshape(-1)
k = max(1, pp.size // 1000)
print("RESULT", float(pp.mean()), float(np.sort(pp)[:-k].mean()))
np.save(sys.argv[3], img)
"""


def run(flag, out_npy):
    env = dict(os.environ, IGNIS_TPU_PALLAS=flag)
    r = subprocess.run([sys.executable, "-u", "-c", WORKER, SCENE, str(SPP),
                        out_npy],
                       capture_output=True, text=True, timeout=1200, env=env)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            _, raw, robust = line.split()
            return float(raw), float(robust)
    return None, (r.stderr or "no output")[-300:]


if __name__ == "__main__":
    for flag, label in (("1", "pallas"), ("0", "xla_fallback")):
        raw, robust = run(flag, f"/tmp/mix_ab_{label}.npy")
        print(f"{SCENE} [{label}] raw={raw} robust={robust}", flush=True)
