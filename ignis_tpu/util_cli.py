"""igutil-equivalent tool (reference: src/tools/util/main.cpp).

Subcommands:
  info <image>                 image statistics (ImageInfo.cpp)
  convert <input> <output>     image <-> image with optional tonemap
                               (StbConverter/ExrConverter), or mesh <-> mesh
                               (MeshConverter: obj/ply/serialized)
"""
from __future__ import annotations

import argparse
import sys

IMAGE_EXT = {".exr", ".hdr", ".png", ".jpg", ".jpeg", ".bmp", ".tga"}
MESH_EXT = {".obj", ".ply", ".serialized", ".mts"}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="igtpu-util",
                                description="ignis_tpu utility tool")
    sub = p.add_subparsers(dest="command", required=True)

    pi = sub.add_parser("info", help="Print image statistics")
    pi.add_argument("input")

    pc = sub.add_parser("convert", help="Convert images or meshes")
    pc.add_argument("input")
    pc.add_argument("output")
    pc.add_argument("--exposure", type=float, default=0.0,
                    help="Tonemap exposure (2^x) for LDR outputs")
    pc.add_argument("--offset", type=float, default=0.0,
                    help="Tonemap offset for LDR outputs")
    pc.add_argument("--shape-index", type=int, default=0,
                    help="Shape index for .serialized inputs")
    return p


def _cmd_info(args) -> int:
    import numpy as np
    from .render.tonemap import image_info
    from .utils.image import load_image
    img = load_image(args.input)
    info = image_info(np.asarray(img))
    h, w = img.shape[0], img.shape[1]
    print(f"size: {w}x{h}")
    for k in ("min", "max", "average", "soft_min", "soft_max", "median",
              "inf_count", "nan_count", "neg_count"):
        print(f"{k}: {np.asarray(getattr(info, k))}")
    return 0


def _cmd_convert(args) -> int:
    from pathlib import Path
    in_ext = Path(args.input).suffix.lower()
    out_ext = Path(args.output).suffix.lower()
    if in_ext in MESH_EXT and out_ext in MESH_EXT:
        from .scene import mesh as meshlib
        if in_ext in (".serialized", ".mts"):
            m = meshlib.load_mts_serialized(args.input, args.shape_index)
        elif in_ext == ".obj":
            m = meshlib.load_obj(args.input)
        else:
            m = meshlib.load_ply(args.input)
        if out_ext == ".obj":
            meshlib.save_obj(args.output, m)
        elif out_ext == ".ply":
            meshlib.save_ply(args.output, m)
        else:
            print(f"Cannot write mesh format {out_ext}", file=sys.stderr)
            return 1
        print(f"{args.input} -> {args.output}: {len(m.vertices)} vertices, "
              f"{len(m.indices)} faces")
        return 0
    if in_ext in IMAGE_EXT:
        import numpy as np
        from .utils.image import load_image, save_image
        img = np.asarray(load_image(args.input), np.float32)
        if out_ext not in (".exr", ".hdr"):
            img = img * (2.0 ** args.exposure) + args.offset
        save_image(args.output, img)
        print(f"{args.input} -> {args.output}")
        return 0
    print(f"Unsupported conversion {in_ext} -> {out_ext}", file=sys.stderr)
    return 1


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "info":
        return _cmd_info(args)
    return _cmd_convert(args)


if __name__ == "__main__":
    sys.exit(main())
