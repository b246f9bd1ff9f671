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

    pb = sub.add_parser(
        "inspect", help="Visualize a measured BSDF (bsdfinspector analog)")
    pb.add_argument("input", help=".xml (klems/tensortree) or .bsdf file")
    pb.add_argument("-o", "--output", default="bsdf.exr")
    pb.add_argument("--theta", type=float, default=30.0,
                    help="Incident theta in degrees")
    pb.add_argument("--phi", type=float, default=0.0,
                    help="Incident phi in degrees")
    pb.add_argument("--res", type=int, default=256)

    pg = sub.add_parser(
        "glare", help="Glare analysis (igexplorer evalglare analog)")
    pg.add_argument("input", help="radiance image (EXR/HDR)")
    pg.add_argument("--fov", type=float, default=60.0)
    pg.add_argument("--mul", type=float, default=5.0,
                    help="glare source luminance multiplier over average")
    pg.add_argument("--scale", type=float, default=1.0)
    pg.add_argument("--ev", type=float, default=-1.0,
                    help="vertical illuminance (lx); <0 = automatic")
    pg.add_argument("-o", "--output", default=None,
                    help="optional EXR for the relative source map")

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
    if in_ext == ".xml" and out_ext == ".json":
        from .scene.mitsuba import convert_mitsuba
        convert_mitsuba(args.input, args.output)
        print(f"{args.input} -> {args.output} (mitsuba scene)")
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


def _cmd_inspect(args) -> int:
    """Headless bsdfinspector (src/tools/bsdfinspector/): slice a measured
    BSDF at one incident direction into hemisphere heat maps."""
    import numpy as np

    from .utils.image import write_exr_multilayer

    theta_i = np.deg2rad(args.theta)
    phi_i = np.deg2rad(args.phi)
    res = args.res

    # outgoing hemisphere as a concentric disk image
    ys, xs = np.mgrid[0:res, 0:res]
    px = (xs + 0.5) / res * 2.0 - 1.0
    py = (ys + 0.5) / res * 2.0 - 1.0
    r = np.sqrt(px * px + py * py)
    inside = r <= 1.0
    theta_o = np.arcsin(np.clip(r, 0, 1))
    phi_o = np.arctan2(py, px)

    path = str(args.input)
    layers = {}
    if path.endswith(".bsdf"):
        from .scene.djmeasured import load_djmeasured, phi2u, theta2u
        d = load_djmeasured(path)
        t = int(np.argmin(np.abs(d.theta_nodes - theta_i)))
        # half-vector parameterization slice
        wi = np.array([np.sin(theta_i), 0, np.cos(theta_i)])
        wo = np.stack([np.sin(theta_o) * np.cos(phi_o),
                       np.sin(theta_o) * np.sin(phi_o),
                       np.cos(theta_o)], axis=-1)
        wm = wi + wo
        wm /= np.maximum(np.linalg.norm(wm, axis=-1, keepdims=True), 1e-9)
        th_m = np.arccos(np.clip(wm[..., 2], -1, 1))
        ph_m = np.arctan2(wm[..., 1], wm[..., 0])
        H, W = d.fr.shape[1], d.fr.shape[2]
        ix = np.clip((theta2u(th_m) * W).astype(int), 0, W - 1)
        uy = phi2u(ph_m)
        iy = np.clip(((uy - np.floor(uy)) * H).astype(int), 0, H - 1)
        img = d.fr[t, iy, ix] * np.cos(theta_o)[..., None]
        img[~inside] = 0
        layers[""] = img.astype(np.float32)
        print(f"djmeasured: {len(d.theta_nodes)} theta nodes, slice at "
              f"{np.rad2deg(d.theta_nodes[t]):.1f} deg")
    else:
        txt = open(path).read()
        if "TensorTree" in txt:
            from .scene.tensortree import load_tensortree
            from .models.tensortree import (_disk_to_square, _eval_component,
                                            TensorTreeData)
            import jax.numpy as jnp
            from .models.tensortree import from_numpy
            tt = from_numpy(load_tensortree(path))
            wo_flat = (jnp.asarray(np.sin(theta_o) * np.cos(phi_o)).ravel(),
                       jnp.asarray(np.sin(theta_o) * np.sin(phi_o)).ravel(),
                       jnp.asarray(np.cos(theta_o)).ravel())
            from .core.vec import Vec3
            wi = Vec3(jnp.full(res * res, float(np.sin(theta_i))),
                      jnp.zeros(res * res),
                      jnp.full(res * res, float(np.cos(theta_i))))
            nd = tt.front_transmission.grid.ndim
            for lname, comp in (("FrontTransmission", tt.front_transmission),
                                ("FrontReflection", tt.front_reflection)):
                v = _eval_component(comp, nd,
                                    Vec3(-wi.x, -wi.y, -wi.z)
                                    if lname == "FrontTransmission" else wi,
                                    Vec3(*wo_flat))
                im = np.array(np.asarray(v).reshape(res, res))
                im[~inside] = 0
                layers[lname] = np.stack([im] * 3, -1).astype(np.float32)
                print(f"{lname}: total {float(comp.total):.4f}")
            layers[""] = layers.pop("FrontTransmission")
        else:
            from .scene.klems import load_klems
            k = load_klems(path)
            for lname, comp in (("FrontTransmission", k.front_transmission),
                                ("FrontReflection", k.front_reflection)):
                # incident column index
                ti = np.searchsorted(comp.col.upper, theta_i)
                ti = min(ti, len(comp.col.upper) - 1)
                nphi = comp.col.phi_count[ti]
                pidx = int(phi_i / (2 * np.pi) * nphi + 0.5) % max(nphi, 1)
                col = comp.col.lin_off[ti] + pidx
                vals = comp.matrix[:, col]
                # rasterize outgoing rows
                to_r = np.searchsorted(comp.row.upper, theta_o.ravel())
                to_r = np.minimum(to_r, len(comp.row.upper) - 1)
                nph = comp.row.phi_count[to_r]
                pho = (phi_o.ravel() % (2 * np.pi))
                pidx_o = ((pho / (2 * np.pi) * nph + 0.5) % np.maximum(
                    nph, 1)).astype(int)
                rows = comp.row.lin_off[to_r] + pidx_o
                im = np.array(vals[rows].reshape(res, res))
                im[~inside] = 0
                layers[lname] = np.stack([im] * 3, -1).astype(np.float32)
                print(f"{lname}: total {comp.total:.4f}")
            layers[""] = layers.pop("FrontTransmission")
    write_exr_multilayer(args.output, layers,
                         {"igTheta": float(args.theta),
                          "igPhi": float(args.phi)})
    print(f"wrote {args.output}")
    return 0


def _cmd_glare(args) -> int:
    from .render.glare import compute_glare
    from .utils.image import load_image
    img = load_image(args.input)
    r = compute_glare(img[..., :3], fov_deg=args.fov, mul=args.mul,
                      scale=args.scale, vertical_illuminance=args.ev)
    # the explorer overview table (OverviewWidget.cpp:46-74)
    perception = "Imperceptible"
    if r.dgp > 0.45:
        perception = "Intolerable"
    elif r.dgp > 0.40:
        perception = "Disturbing"
    elif r.dgp > 0.35:
        perception = "Perceptible"
    print(f"DGP     {r.dgp:8.3f}  ({perception})")
    print(f"DGI     {r.dgi:8.3f}")
    print(f"DGI_mod {r.dgi_mod:8.3f}")
    print(f"DGR     {r.dgr:8.3f}")
    print(f"VCP     {r.vcp:8.3f}")
    print(f"UGR     {r.ugr:8.3f}")
    print(f"UGR_exp {r.ugr_exp:8.3f}")
    print(f"UGP     {r.ugp:8.3f}")
    print(f"Ev      {r.vertical_illuminance:8.3f} lx")
    print(f"Lum avg {r.avg_lum:8.3f} cd/m^2   max {r.max_lum:.3f}")
    print(f"Source  lum {r.source_lum:.3f}  omega {r.source_omega:.5f}  "
          f"at ({r.source_x:.1f}, {r.source_y:.1f})")
    if args.output:
        import numpy as np
        from .utils.image import save_image
        m = r.source_map.astype("float32")
        save_image(args.output, np.stack([m, m, m], axis=-1))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "info":
        return _cmd_info(args)
    if args.command == "inspect":
        return _cmd_inspect(args)
    if args.command == "glare":
        return _cmd_glare(args)
    return _cmd_convert(args)


if __name__ == "__main__":
    sys.exit(main())
