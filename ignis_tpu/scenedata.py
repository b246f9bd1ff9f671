"""Flat on-device scene representation (the reference's SceneDatabase analog).

The reference serializes scenes into typed byte tables consumed by JIT'd
kernels (/root/reference/src/runtime/table/SceneDatabase.h). Here the scene
is a JAX pytree of SoA arrays: XLA constant-folds / prefetches them, and
sharding annotations control replication across a device mesh.

Static (shape-affecting) configuration lives in `RenderSettings`, which is
hashable and passed as a static argument to jitted render functions.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as _np

from .core.vec import Vec2, Vec3, Color
from .ops.intersect import SphereSoup, TriSoup


class TriAttributes(NamedTuple):
    """Per-triangle shading attributes (SoA, padded like the soup)."""
    n0: Vec3
    n1: Vec3
    n2: Vec3
    uv0: Vec2
    uv1: Vec2
    uv2: Vec2
    ent: jnp.ndarray        # [T] i32 entity id, -1 padding
    area: jnp.ndarray       # [T] f32 world-space area
    shadow_visible: jnp.ndarray  # [T] bool


class SphereAttributes(NamedTuple):
    ent: jnp.ndarray        # [S] i32
    shadow_visible: jnp.ndarray


class Entities(NamedTuple):
    mat: jnp.ndarray        # [E] i32 material row
    light: jnp.ndarray      # [E] i32 area-light id or -1
    med_inner: jnp.ndarray  # [E] i32 medium id or -1
    med_outer: jnp.ndarray  # [E] i32 medium id or -1


class Materials(NamedTuple):
    """Unified SoA material table; one row per scene BSDF.

    Field meaning depends on `kind` (see models/bsdf.py BsdfKind):
      base:  diffuse reflectance / specular reflectance / tint
      extra: specular transmittance (dielectric) / eta (conductor) / ...
      extra2: k (conductor absorption) / sheen... per-kind
      p0..p3: scalars (ior, roughness/alpha, exponent, weight...)
    Texture indirection: *_tex >= 0 selects a texture node evaluated at the
    hit's uv (see models/texture.py); -1 means use the constant.
    """
    kind: jnp.ndarray   # [M] i32
    base: Color
    extra: Color
    extra2: Color
    p0: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    p3: jnp.ndarray
    # extended scalar slots (principled & co.)
    q0: jnp.ndarray
    q1: jnp.ndarray
    q2: jnp.ndarray
    q3: jnp.ndarray
    q4: jnp.ndarray
    q5: jnp.ndarray
    q6: jnp.ndarray
    q7: jnp.ndarray
    q8: jnp.ndarray
    base_tex: jnp.ndarray
    extra_tex: jnp.ndarray
    p0_tex: jnp.ndarray
    p1_tex: jnp.ndarray
    # normal/bump mapping wrapper (reference bsdf/map.art): 0 = none,
    # 1 = normalmap (tangent-space color), 2 = bumpmap (height derivative)
    bump_kind: jnp.ndarray = _np.zeros((0,), _np.int32)
    bump_tex: jnp.ndarray = _np.zeros((0,), _np.int32)
    bump_strength: jnp.ndarray = _np.zeros((0,), _np.float32)


class Lights(NamedTuple):
    """Unified SoA light table; one row per light.

    kind: see models/light.py LightKind. Finite lights come first is NOT
    required; `infinite` flags mark env/sun-like lights.
    Fields by kind:
      point: pos, intensity
      spot:  pos, dir, intensity, p0=cos_cutoff, p1=cos_falloff
      directional: dir (towards scene), intensity (irradiance)
      sun:   dir, intensity, p0=cos_angle of sun disk
      area:  entity (area emitter), intensity=radiance, tri range [p_i0, p_i1)
      env:   intensity=scale/radiance, texture id in tex (-1 = constant)
    """
    kind: jnp.ndarray       # [L] i32
    pos: Vec3
    dir: Vec3
    intensity: Color
    p0: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray         # sphere-area radius / aux
    entity: jnp.ndarray     # [L] i32 (area lights), else -1
    tri_start: jnp.ndarray  # [L] i32 start into area_tris
    tri_count: jnp.ndarray  # [L] i32
    tex: jnp.ndarray        # [L] i32 texture id for env, else -1
    delta: jnp.ndarray      # [L] bool
    infinite: jnp.ndarray   # [L] bool
    # Area-light face sampling: concatenated per-light face CDFs
    area_tris: jnp.ndarray  # [AT] i32 global tri index
    area_cdf: jnp.ndarray   # [AT] f32 inclusive CDF within each light segment
    # flux-weighted light-selection CDF over all lights ([0] if unused)
    select_cdf: jnp.ndarray = _np.zeros((0,), _np.float32)
    # light hierarchy (light_hierarchy.art / LightHierarchy.cpp): binary
    # tree over finite lights; child >= 0 -> leaf light row, < 0 -> inner
    # with left = -child-1 (right = left+1). hier_code backtracks the pdf.
    hier_pos: "Vec3" = Vec3(_np.zeros((0,), _np.float32), _np.zeros((0,), _np.float32),
                            _np.zeros((0,), _np.float32))
    hier_dir: "Vec3" = Vec3(_np.zeros((0,), _np.float32), _np.zeros((0,), _np.float32),
                            _np.zeros((0,), _np.float32))
    hier_flux: jnp.ndarray = _np.zeros((0,), _np.float32)
    hier_has_dir: jnp.ndarray = _np.zeros((0,), bool)
    hier_child: jnp.ndarray = _np.zeros((0,), _np.int32)
    hier_code: jnp.ndarray = _np.zeros((0,), _np.int32)


class EnvMap(NamedTuple):
    """Environment importance-sampling data (one textured env light max for
    now; mirrors reference env CDF baking LoaderLight.cpp). Which table set
    is populated depends on the light's "cdf" method (EnvironmentLight.cpp
    :22-27): conditional (marginal+conditional), sat (sat_table+sat_grid),
    or hierachical (hier_levels pyramid); the static method string lives in
    RenderSettings.env_cdf_method."""
    present: jnp.ndarray      # () bool
    marginal: jnp.ndarray     # [h]
    conditional: jnp.ndarray  # [h, w]
    sat_table: jnp.ndarray = _np.zeros((1, 1), _np.float32)  # [h+1, w+1]
    sat_grid: jnp.ndarray = _np.zeros((1, 1), _np.float32)   # [h, w]
    hier_levels: tuple = ()   # ([S,S], ..., [2,2]) mip pyramid


class CameraData(NamedTuple):
    eye: Vec3     # scalars
    dir: Vec3
    up: Vec3
    scale: Vec2   # tan(fov/2) horizontal/vertical
    tmin: jnp.ndarray
    tmax: jnp.ndarray
    aperture: jnp.ndarray = 0.0
    focal: jnp.ndarray = 1.0


class SceneData(NamedTuple):
    tris: TriSoup
    tri_attr: TriAttributes
    spheres: SphereSoup
    sph_attr: SphereAttributes
    entities: Entities
    materials: Materials
    lights: Lights
    envmap: EnvMap
    camera: CameraData
    media: "Media"
    textures: Optional[tuple] = None  # tuple of texture pytrees (models/texture.py)
    bvh: Optional[tuple] = None       # ops/bvh.py BVHArrays for big scenes
    # python-float defaults: creating jnp arrays at class definition would
    # initialize the XLA backend at import time, which breaks
    # jax.distributed.initialize (must run before any backend touch)
    scene_radius: jnp.ndarray = 1.0
    scene_center: Vec3 = Vec3(0.0, 0.0, 0.0)
    measured: tuple = ()  # measured-BSDF tables (models/klems.py KlemsData)
    # dynamic parameter registry (reference driver/registry.art:5-30 /
    # ParameterSet): name -> traced leaf (shape () num, (3,) vector,
    # (4,) color). PExpr closures read these at trace time, so
    # setParameter updates re-render WITHOUT rebuild or recompile.
    registry: dict = {}
    # two-level acceleration (reference EntityLeaf TLAS, bvh.art:40-61):
    # ops/instanced.py InstancedGeo — one shared local mesh + per-instance
    # world->local transforms. None when every entity is flattened.
    instances: Optional[tuple] = None


class Media(NamedTuple):
    """Homogeneous participating media table (models/medium.py)."""
    sigma_a: Color  # [Md]
    sigma_s: Color
    g: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Hashable static render configuration (jit static arg)."""
    width: int
    height: int
    technique: str = "path"
    max_depth: int = 64
    min_depth: int = 2
    clamp: float = 0.0
    enable_nee: bool = True
    spi: int = 1
    seed: int = 0
    camera_type: str = "perspective"
    fish_mode: str = "circular"
    # counts (static so lax loops unroll/bound correctly)
    infinite_light_rows: Tuple[int, ...] = ()
    n_lights: int = 0
    # technique extras
    aov_normals: bool = False
    light_selector: str = "uniform"
    remat: bool = False  # per-bounce rematerialization (for grad memory)
    debug_mode: int = 0
    # static per-texture descriptors (models/texture.py TexDesc tuples)
    texture_descs: Tuple = ()
    # per-medium PExpr closures: None or (fn_sigma_a|None, fn_sigma_s|None)
    medium_exprs: Tuple = ()
    has_blend: bool = False  # scene contains blend/mask BSDFs (dual dispatch)
    # scene contains straight-through delta transmitters (passthrough /
    # thin smooth dielectric / BRTDfunc-Roos specular transmission):
    # shadow rays walk crossings and carry tint + medium attenuation
    # (techniques/path.py shadow_transmittance) instead of binary occlusion
    transparent_shadows: bool = False
    has_bump: bool = False   # scene contains normal/bump-mapped BSDFs
    pixel_sampler: str = "uniform"  # uniform | mjitt | halton
    # --- adaptive env sampling (AdaptiveEnvPathTechnique.cpp:20) ---------
    learning_iterations: int = 1
    # --- photon mapping (PhotonMappingTechnique.cpp:14-20) ---------------
    photon_count: int = 100000   # "photons" (reference default 1e6)
    max_light_depth: int = 8     # "max_light_depth"
    merge_radius: float = 0.01   # "radius", relative to scene diameter
    ppm_grid: int = 64           # query-grid resolution per axis
    ppm_cell_cap: int = 32       # photons gathered per cell (truncation cap)
    # static set of BsdfKind ints present in the scene (dispatch pruning)
    bsdf_kinds: Tuple = None
    # static set of LightKind ints present (light dispatch pruning)
    light_kinds: Tuple = None
    # env-map importance sampling method ("cdf" light property,
    # EnvironmentLight.cpp:22-27): conditional | sat | hierachical | none
    env_cdf_method: str = "conditional"
