#!/usr/bin/env python
"""Renderer-free corroboration of the sun-on-plane-and-stick golden
mismatch (scripts/evaluate.py KNOWN_SCENE_MISMATCH).

Claim: the exported JSON sun direction (0.707, -0.707, 0) lies IN the
ground plane (zero z-component against the plane's +z normal) under the
reference's own convention — `sun.art:8` documents the JSON `direction`
as "Scene to Light", i.e. pointing AT the sun — so the plane can receive
only grazing (zero-measure) direct light. The bundled golden instead
shows a brightly lit plane with a hard stick shadow, which requires an
elevated sun; this script derives the implied elevation from the
golden's own pixel values. Conclusion: the axis convention was lost in
the rad->json export, and no renderer consuming the JSON (the reference
included) can reproduce the golden.

Run: python scripts/sun_direction_check.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EVAL = Path("/root/reference/scenes/evaluation")


def main():
    from ignis_tpu.scene.mesh import load_ply
    from ignis_tpu.utils.exr import load_exr_rgb

    scene = json.load(open(EVAL / "sun-on-plane-and-stick.json"))
    sun = next(l for l in scene["lights"] if l["type"] == "sun")
    d = np.asarray(sun["direction"], np.float64)
    d /= np.linalg.norm(d)

    mesh = load_ply(EVAL / "meshes" / "Bottom.ply")
    v, f = mesh.vertices, mesh.indices
    e1 = v[f[0, 1]] - v[f[0, 0]]
    e2 = v[f[0, 2]] - v[f[0, 0]]
    n = np.cross(e1, e2)
    n /= np.linalg.norm(n)

    cos_inc = float(np.dot(d, n))
    print(f"ground-plane normal        : {n}")
    print(f"JSON sun direction (to sun): {d}")
    print(f"cos(incidence)             : {cos_inc:.9f}")

    # Direct irradiance on the plane from a sun disk of angular diameter
    # `angle` deg and radiance R: E = R * Omega * cos(theta).
    R = float(sun.get("radiance", 1.0))
    ang = np.deg2rad(float(sun.get("angle", 0.533))) / 2.0
    omega = 2.0 * np.pi * (1.0 - np.cos(ang))
    albedo = 0.8  # scene's diffuse_bsdf (sun-on-plane-and-stick.rad)
    L_pred = albedo / np.pi * R * omega * max(cos_inc, 0.0)
    print(f"sun solid angle            : {omega:.3e} sr")
    print(f"predicted plane radiance   : {L_pred:.6f}  (JSON direction)")

    ref = load_exr_rgb(EVAL / "references"
                       / "ref-sun-on-plane-and-stick-rad.exr")
    # Lit-plane luminance: median over the bright half of the image
    # (excludes the stick shadow and sky); channels are equal (gray).
    lum = ref.mean(axis=-1)
    lit = np.median(lum[lum > np.percentile(lum, 60)])
    print(f"golden lit-plane radiance  : {lit:.4f}")
    implied_cos = lit * np.pi / (albedo * R * omega)
    implied_cos = min(implied_cos, 1.0)
    print(f"implied sun elevation      : "
          f"{np.rad2deg(np.arcsin(implied_cos)):.1f} deg "
          f"(JSON says {np.rad2deg(np.arcsin(max(cos_inc, 0))):.1f} deg)")

    ok = abs(cos_inc) < 1e-6 and lit > 0.05
    print("VERDICT:", "CONFIRMED mismatch — the golden's sun is elevated, "
          "the JSON's sun is on the horizon" if ok else "NOT confirmed")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
