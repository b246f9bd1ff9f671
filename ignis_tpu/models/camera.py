"""Cameras: perspective (+DoF), orthogonal, fishlens.

Mirrors /root/reference/src/artic/camera/*.art conventions:
  - view matrix columns (right, up, dir); right = normalize(cross(dir, up))
  - nx in [-1,1] maps left->right, ny in [-1,1] maps bottom->top:
      nx = 2*(x+sx)/w - 1 ; ny = 1 - 2*(y+sy)/h   (driver/camera.art:21)
  - scale = (tan(hfov/2), tan(hfov/2)/aspect) for hfov (perspective.art:1)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vec import Vec2, Vec3, cross, normalize, vselect
from ..core.warp import PI, square_to_concentric_disk
from ..ops.intersect import Rays
from ..scenedata import CameraData, RenderSettings


def pixel_to_normalized(x, y, sx, sy, w: int, h: int):
    nx = 2.0 * (x.astype(jnp.float32) + sx) / w - 1.0
    ny = 1.0 - 2.0 * (y.astype(jnp.float32) + sy) / h
    return nx, ny


def generate_rays(cam: CameraData, settings: RenderSettings, x, y, sx, sy,
                  u0=None, u1=None, rng_state=None) -> Rays:
    nx, ny = pixel_to_normalized(x, y, sx, sy, settings.width, settings.height)
    if settings.camera_type in ("perspective", "orthogonal"):
        right = normalize(cross(cam.dir, cam.up))
        if settings.camera_type == "perspective":
            lx = cam.scale.x * nx
            ly = cam.scale.y * ny
            d = Vec3(
                right.x * lx + cam.up.x * ly + cam.dir.x,
                right.y * lx + cam.up.y * ly + cam.dir.y,
                right.z * lx + cam.up.z * ly + cam.dir.z,
            )
            d = normalize(d)
            org = Vec3(jnp.broadcast_to(cam.eye.x, nx.shape),
                       jnp.broadcast_to(cam.eye.y, nx.shape),
                       jnp.broadcast_to(cam.eye.z, nx.shape))
            if rng_state is not None:
                # Depth of field (perspective.art make_perspective_dof_camera)
                from ..core import rng as rnglib
                _, (ua, ub) = rnglib.next_f32_n(rng_state, 2)
                p = square_to_concentric_disk(ua, ub)
                ax = p.x * cam.aperture
                ay = p.y * cam.aperture
                has_dof = cam.aperture > 1e-6
                focus = Vec3(d.x * cam.focal, d.y * cam.focal, d.z * cam.focal)
                ap = Vec3(right.x * ax + cam.up.x * ay,
                          right.y * ax + cam.up.y * ay,
                          right.z * ax + cam.up.z * ay)
                d_dof = normalize(Vec3(focus.x - ap.x, focus.y - ap.y,
                                       focus.z - ap.z))
                from ..core.vec import vselect
                m = jnp.broadcast_to(has_dof, nx.shape)
                d = vselect(m, d_dof, d)
                org = vselect(m, Vec3(org.x + ap.x, org.y + ap.y,
                                      org.z + ap.z), org)
        else:  # orthogonal (orthogonal.art): parallel rays, scale = extent
            ox = cam.scale.x * nx
            oy = cam.scale.y * ny
            org = Vec3(cam.eye.x + right.x * ox + cam.up.x * oy,
                       cam.eye.y + right.y * ox + cam.up.y * oy,
                       cam.eye.z + right.z * ox + cam.up.z * oy)
            d = Vec3(jnp.broadcast_to(cam.dir.x, nx.shape),
                     jnp.broadcast_to(cam.dir.y, nx.shape),
                     jnp.broadcast_to(cam.dir.z, nx.shape))
    elif settings.camera_type in ("fishlens", "fisheye"):
        org = Vec3(jnp.broadcast_to(cam.eye.x, nx.shape),
                   jnp.broadcast_to(cam.eye.y, nx.shape),
                   jnp.broadcast_to(cam.eye.z, nx.shape))
        d = _fishlens_dir(cam, settings, nx, ny)
    else:
        raise ValueError(f"Unknown camera type {settings.camera_type}")

    n = nx.shape
    return Rays(org, d, jnp.broadcast_to(cam.tmin, n),
                jnp.broadcast_to(cam.tmax, n))


def _fishlens_dir(cam: CameraData, settings: RenderSettings, nx, ny) -> Vec3:
    """Fisheye projection (fishlens.art): equisolid over the image disk.

    Modes (reference FishLensCamera): circular (fit inside), cropped
    (fill frame), full (diagonal fits).
    """
    w, h = settings.width, settings.height
    fw, fh = float(w), float(h)
    if settings.fish_mode == "circular":
        xasp, yasp = min(fw, fh) / fw, min(fw, fh) / fh
    elif settings.fish_mode == "cropped":
        xasp, yasp = max(fw, fh) / fw, max(fw, fh) / fh
    else:  # full
        diam = (fw * fw + fh * fh) ** 0.5
        xasp, yasp = diam / fw, diam / fh

    right = normalize(cross(cam.dir, cam.up))
    xx = nx * xasp
    yy = ny * yasp
    r2 = xx * xx + yy * yy
    r = jnp.sqrt(jnp.maximum(r2, 1e-20))
    theta = r * (PI / 2.0)  # angle from optical axis; r=1 -> 90deg, full 180 fov
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    inv_r = jnp.where(r > 1e-9, 1.0 / r, 0.0)
    dx = sin_t * xx * inv_r
    dy = sin_t * yy * inv_r
    d = Vec3(right.x * dx + cam.up.x * dy + cam.dir.x * cos_t,
             right.y * dx + cam.up.y * dy + cam.dir.y * cos_t,
             right.z * dx + cam.up.z * dy + cam.dir.z * cos_t)
    return normalize(d)


def sample_pixel(cam: CameraData, settings: RenderSettings, point: Vec3):
    """Project a world point to the image (perspective.art
    perspective_pos_to_pixel): returns (valid, pixel_linear, dir_to_camera
    (unnormalized, point->camera), weight)."""
    right = normalize(cross(cam.dir, cam.up))
    d = Vec3(point.x - cam.eye.x, point.y - cam.eye.y, point.z - cam.eye.z)
    ux = right.x * d.x + right.y * d.y + right.z * d.z
    uy = cam.up.x * d.x + cam.up.y * d.y + cam.up.z * d.z
    uz = cam.dir.x * d.x + cam.dir.y * d.y + cam.dir.z * d.z
    nx = ux / (uz * cam.scale.x)
    ny = uy / (uz * cam.scale.y)
    valid = (uz > 1e-6) & (nx >= -1) & (nx <= 1) & (ny >= -1) & (ny <= 1)
    w, h = settings.width, settings.height
    px = jnp.clip(jnp.floor(w * (nx + 1.0) * 0.5).astype(jnp.int32), 0, w - 1)
    py = jnp.clip(jnp.floor(h * (1.0 - ny) * 0.5).astype(jnp.int32), 0, h - 1)
    linear = py * w + px
    s_dir = Vec3(cam.eye.x - point.x, cam.eye.y - point.y, cam.eye.z - point.z)
    # Pinhole importance in image-area measure (Veach / SmallVCM form):
    # We = 1/(A_img * cos^3 theta_cam), with A_img = 4*sx*sy the image-plane
    # area at unit distance; the w*h pixel count cancels against the
    # one-light-path-per-pixel-lane normalization done by the session.
    dlen = jnp.sqrt(jnp.maximum(ux * ux + uy * uy + uz * uz, 1e-24))
    cos_t = jnp.maximum(uz / dlen, 1e-6)
    weight = 1.0 / (4.0 * cam.scale.x * cam.scale.y * cos_t * cos_t * cos_t)
    return valid, linear, s_dir, weight
