"""Orthonormal shading frames.

Duff et al. 2017 branchless ONB construction, matching the reference's
make_orthonormal_mat3x3 (/root/reference/src/artic/core/matrix.art:24) so
sampled hemisphere orientations agree.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .vec import Vec3, dot


class Frame(NamedTuple):
    """Orthonormal basis: t (tangent), b (bitangent), n (normal = +Z)."""
    t: Vec3
    b: Vec3
    n: Vec3

    def to_world(self, v: Vec3) -> Vec3:
        return Vec3(
            self.t.x * v.x + self.b.x * v.y + self.n.x * v.z,
            self.t.y * v.x + self.b.y * v.y + self.n.y * v.z,
            self.t.z * v.x + self.b.z * v.y + self.n.z * v.z,
        )

    def to_local(self, v: Vec3) -> Vec3:
        return Vec3(dot(self.t, v), dot(self.b, v), dot(self.n, v))


def make_frame(n: Vec3) -> Frame:
    sign = jnp.copysign(jnp.float32(1.0), n.z)
    a = -1.0 / (sign + n.z)
    b = n.x * n.y * a
    t = Vec3(1.0 + sign * n.x * n.x * a, sign * b, -sign * n.x)
    bt = Vec3(b, sign + n.y * n.y * a, -n.y)
    return Frame(t, bt, n)
