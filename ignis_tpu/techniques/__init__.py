"""Rendering techniques (reference: src/artic/technique/).

IMPORTANT: technique modules are imported eagerly. Importing them lazily
inside a traced function creates their module-level jnp constants *under a
jax trace*, which corrupts constant bookkeeping across executables
(jax 0.9.0: "Execution supplied N buffers but compiled program expected M").
"""
from __future__ import annotations

from . import path as _path


def dispatch_technique(name: str):
    if name in ("path", "pt", "volpath"):
        # volpath falls back to path until media support lands
        return _path.path_trace
    if name in ("ao", "aotracer"):
        from . import ao
        return ao.ao_trace
    if name in ("debug",):
        from . import debug
        return debug.debug_trace
    raise ValueError(f"Unknown technique '{name}'")
