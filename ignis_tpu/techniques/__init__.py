"""Rendering techniques (reference: src/artic/technique/).

IMPORTANT: technique modules are imported eagerly. Importing them lazily
inside a traced function creates their module-level jnp constants *under a
jax trace*, which corrupts constant bookkeeping across executables
(jax 0.9.0: "Execution supplied N buffers but compiled program expected M").
"""
from __future__ import annotations

from . import path as _path
from . import volpath as _volpath
from . import simple as _simple
from . import lighttracer as _lighttracer
from . import ppm as _ppm
from . import aept as _aept


def dispatch_technique(name: str):
    if name in ("path", "pt"):
        return _path.path_trace
    if name in ("volpath",):
        return _volpath.volpath_trace
    if name in ("ao", "aotracer"):
        return _simple.ao_trace
    if name in ("debug",):
        return _simple.debug_trace
    if name in ("wireframe",):
        return _simple.wireframe_trace
    if name in ("lightvisibility",):
        return _simple.light_visibility_trace
    if name in ("camera_check", "cameracheck"):
        return _simple.camera_check_trace
    if name in ("env_check", "envcheck"):
        return _simple.env_check_trace
    if name in ("lt", "lighttracer"):
        # handled at the session level (splats to film, different signature)
        from . import lighttracer
        return lighttracer.lt_trace_film
    if name in ("ppm", "photonmapper"):
        # handled at the session level (photon pass + camera pass)
        from . import ppm
        return ppm.ppm_render
    if name in ("aept", "adaptive_env"):
        # handled at the session level (learning + guided sampling passes)
        from . import aept
        return aept.sample_trace
    raise ValueError(f"Unknown technique '{name}'")
