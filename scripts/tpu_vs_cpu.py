"""Cross-backend correctness check: render a scene on the default backend
(TPU when available — Pallas kernels live) and on CPU (XLA oracle paths),
compare images. Run: python scripts/tpu_vs_cpu.py [scene.json] [size] [spi]
"""
import subprocess
import sys
import os
import json
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RENDER_SNIPPET = """
import json, sys
import numpy as np
sys.path.insert(0, {repo!r})
import ignis_tpu
rt = ignis_tpu.loadFromFile({scene!r}, width={size}, height={size}, spi={spi})
rt.step()
img = rt.framebuffer(normalized=True)
np.save({out!r}, img)
"""


def render(scene, size, spi, out, env):
    code = RENDER_SNIPPET.format(repo=str(REPO), scene=scene, size=size,
                                 spi=spi, out=out)
    e = dict(os.environ)
    e.update(env)
    r = subprocess.run([sys.executable, "-c", code], env=e,
                       capture_output=True, text=True, timeout=900)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise SystemExit(f"render failed for env={env}")


def main():
    import numpy as np
    scene = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/scenes/diamond_scene.json"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    with tempfile.TemporaryDirectory() as td:
        a, b = f"{td}/dev.npy", f"{td}/cpu.npy"
        render(scene, size, spi, a, {})
        render(scene, size, spi, b, {"JAX_PLATFORMS": "cpu"})
        dev, cpu = np.load(a), np.load(b)
        # same seed/sampler => images should agree to float tolerance
        diff = np.abs(dev - cpu)
        denom = np.abs(cpu) + 1e-3
        rel = diff / denom
        print(json.dumps({
            "scene": scene,
            "max_abs": float(diff.max()),
            "mean_abs": float(diff.mean()),
            "p999_rel": float(np.quantile(rel, 0.999)),
            "mean_dev": float(dev.mean()),
            "mean_cpu": float(cpu.mean()),
            "agree_1pct": float((rel < 0.01).mean()),
        }))


if __name__ == "__main__":
    main()
