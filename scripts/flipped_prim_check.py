#!/usr/bin/env python
"""Reproducible artifact for the flipped-prim reference-scene mismatch.

The evaluation scenes flipped-prim-{diffuse,glass} bundle a Cylinder.ply
whose normals/winding are consistently OUTWARD, under a uniform env of
radiance 0.8 (flipped-prim-base.json) plus one point light. The golden
images were rendered by an external renderer from the original .blend —
whose whole point (the scene NAME) is prims that are genuinely flipped.

For the DIFFUSE variant the exported JSON admits a closed-form check that
needs no renderer at all: a CONVEX diffuse body (a capped cylinder) under
a uniform environment L_env has, at every visible point, irradiance
E = pi * L_env (no point of a convex body sees any other point of the
body), so the body's outgoing radiance is exactly

    L = albedo * L_env = 0.8 * 0.8 = 0.64   (per band, plus the point
    light's positive contribution on its side)

Any image rendered from the exported JSON must therefore show body pixels
with L >= 0.64. This script measures the golden image's body-pixel
statistics and our render's, and prints the verdict: if the golden image
sits clearly below the bound, it was not rendered from the geometry the
JSON exports — corroborating the documented mismatch without trusting
this renderer's own transport.

Usage: python scripts/flipped_prim_check.py [spp]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from evaluate import REF_DIR  # scripts/evaluate.py

BOUND = 0.8 * 0.8  # albedo * uniform env radiance, convex diffuse body


def body_mask(img, env=0.8, tol=0.02):
    """Pixels NOT equal to the bare environment (the cylinder body)."""
    return np.abs(img - env).max(axis=-1) > tol


def stats(tag, img):
    m = body_mask(img)
    body = img[m]
    frac_below = float((body.min(axis=-1) < BOUND - 0.02).mean())
    print(f"{tag:28s} body px={m.sum():6d}  mean={body.mean():.4f}  "
          f"p5={np.percentile(body, 5):.4f}  "
          f"frac<{BOUND - 0.02:.2f}: {frac_below * 100:5.1f}%")
    return frac_below


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from ignis_tpu.utils.exr import load_exr_rgb
    name = "flipped-prim-diffuse"
    ref = load_exr_rgb(sorted(REF_DIR.glob(f"ref-{name}*.exr"))[0])
    print(f"analytic bound: convex diffuse body under uniform env -> "
          f"L >= {BOUND:.2f} everywhere on the body\n")
    ref_frac = stats("golden reference image", np.asarray(ref))

    import ignis_tpu
    rt = ignis_tpu.loadFromFile(
        f"/root/reference/scenes/evaluation/{name}.json", spi=4)
    for _ in range(max(1, spp // 4)):
        rt.step()
    ours_frac = stats("this renderer (exported JSON)",
                      np.asarray(rt.framebuffer(normalized=True)))

    print()
    if ref_frac > 0.25 and ours_frac < 0.05:
        print("VERDICT: the golden image violates the energy bound on a "
              "large fraction of the body -> it was not rendered from the "
              "geometry the exported JSON describes (the original scene's "
              "flipped prims do not survive the PLY export).")
    else:
        print("VERDICT: inconclusive — investigate further.")


if __name__ == "__main__":
    main()
