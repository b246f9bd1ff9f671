"""igtrace-equivalent CLI: ray list in (stdin), radiance out (stdout).

Parity: /root/reference/src/frontend/trace/main.cpp — each input line is
`ox oy oz dx dy dz [tmin tmax]`; each output line is `r g b`.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="igtpu-trace")
    p.add_argument("scene")
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-i", "--input", default="-")
    p.add_argument("-o", "--output", default="-")
    args = p.parse_args(argv)

    src = sys.stdin if args.input == "-" else open(args.input)
    rays = []
    for line in src:
        parts = [float(x) for x in line.split()]
        if len(parts) >= 6:
            rays.append(parts[:8] + [0.0] * (8 - min(len(parts), 8)))
    if not rays:
        print("no rays", file=sys.stderr)
        return 1

    from . import Runtime
    rt = Runtime.load_from_file(args.scene, seed=args.seed)
    out = rt.trace(np.asarray(rays, np.float32), spp=args.spp)

    dst = sys.stdout if args.output == "-" else open(args.output, "w")
    for r, g, b in out:
        print(f"{r} {g} {b}", file=dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
