"""SoA scene-interaction computation — barycentric surface records
(reference: src/librender/mesh.cpp:50-101 compute_scene_interaction,
interaction.h spawn_ray / initialize_sh_frame).

Lane-last layout; ALL per-face data arrives via one one-hot matmul fetch of
the packed face table (core/table.py — per-lane gathers are pathological on
this TPU backend).
"""

import jax.numpy as jnp

from misaki_tpu.core import frame, math as m, table, vec
from misaki_tpu.scene.types import (
    FC_BSDF,
    FC_E1,
    FC_E2,
    FC_EMITTER,
    FC_HAS_N,
    FC_HAS_UV,
    FC_MED_EXT,
    FC_MED_INT,
    FC_N0,
    FC_NG,
    FC_P0,
    FC_TANGENT,
    FC_UV0,
)


def fetch_face(scene, prim):
    """One one-hot matmul fetch of all packed face columns -> (C, L)."""
    return table.fetch(scene.geometry.face_tab, prim)


def _rows3(fd, base):
    return (fd[base], fd[base + 1], fd[base + 2])


def _unit_z(like):
    z = jnp.zeros_like(like)
    return (z, z, jnp.ones_like(like))


def compute_interaction(scene, hit, o, d, wavelengths, fd=None):
    """hit: {"t", "prim", "u", "v"} from accel.traverse; o/d vec3 tuples.

    Returns SoA dict: valid, t, p (vec3), ng (vec3), sh (frame), uv (vec2),
    wi (vec3 local), prim, bsdf (int lanes), emitter (int lanes).
    """
    prim = jnp.maximum(hit["prim"], 0)
    valid = hit["prim"] >= 0
    if fd is None:
        # the Pallas cluster intersector returns the winner's face row
        # in-kernel ("fd"); other accel paths fall back to the one-hot fetch
        fd = hit.get("fd")
    if fd is None:
        fd = fetch_face(scene, prim)
    b1 = hit["u"]
    b2 = hit["v"]
    b0 = 1.0 - b1 - b2

    # hit position from the ray (no table needed; equivalent to the
    # barycentric formula in mesh.cpp:61 up to fp roundoff)
    p = vec.add(o, vec.scale(d, hit["t"]))
    p = vec.where(valid, p, o)
    # Canonical miss-lane convention across accel backends (the cluster
    # kernel and the fused brute fetch return all-zero rows on miss; the
    # BVH fallback fetches face 0): substitute n = +z so every path yields
    # the identical safe frame for invalid lanes.
    ng = vec.where(valid, _rows3(fd, FC_NG), _unit_z(fd[0]))

    # shading normal (mesh.cpp:83-99)
    n0 = _rows3(fd, FC_N0)
    n1 = _rows3(fd, FC_N0 + 3)
    n2 = _rows3(fd, FC_N0 + 6)
    ns = vec.normalize(
        vec.add(vec.scale(n0, b0), vec.add(vec.scale(n1, b1), vec.scale(n2, b2)))
    )
    has_n = fd[FC_HAS_N] > 0.5
    n_sh = vec.where(has_n, ns, ng)

    # UVs: interpolated texcoords or barycentrics (mesh.cpp:66-73)
    has_uv = fd[FC_HAS_UV] > 0.5
    uv_u = fd[FC_UV0] * b0 + fd[FC_UV0 + 2] * b1 + fd[FC_UV0 + 4] * b2
    uv_v = fd[FC_UV0 + 1] * b0 + fd[FC_UV0 + 3] * b1 + fd[FC_UV0 + 5] * b2
    uv = (jnp.where(has_uv, uv_u, b1), jnp.where(has_uv, uv_v, b2))

    # initialize_sh_frame (interaction.h:54-60): Gram-Schmidt the precompiled
    # per-face tangent against the (possibly interpolated) shading normal
    dp_du = _rows3(fd, FC_TANGENT)
    s_raw = vec.sub(dp_du, vec.scale(n_sh, vec.dot(n_sh, dp_du)))
    degenerate = vec.norm2(s_raw) < 1e-12
    s_fallback, _ = frame.coordinate_system(n_sh)
    s = vec.normalize(vec.where(degenerate, s_fallback, s_raw))
    t = vec.cross(n_sh, s)
    sh = {"s": s, "t": t, "n": n_sh}

    wi = frame.to_local(sh, vec.neg(d))

    return {
        "valid": valid,
        "t": jnp.where(valid, hit["t"], jnp.inf),
        "p": p,
        "ng": ng,
        "sh": sh,
        "uv": uv,
        "wi": wi,
        "prim": hit["prim"],
        "bsdf": jnp.where(valid, fd[FC_BSDF].astype(jnp.int32), 0),
        "emitter": jnp.where(valid, fd[FC_EMITTER].astype(jnp.int32) - 1, -1),
        # medium transition data (interaction.cpp:11-21): -1 = none
        "med_int": jnp.where(valid, fd[FC_MED_INT].astype(jnp.int32) - 1, -1),
        "med_ext": jnp.where(valid, fd[FC_MED_EXT].astype(jnp.int32) - 1, -1),
    }


def target_medium(si, d, current):
    """SceneInteraction::target_medium (interaction.cpp:11-13): the medium on
    the side of the surface that direction `d` points into — exterior when
    d.n > 0, interior otherwise. Lanes without a transition keep `current`."""
    transition = (si["med_int"] >= 0) | (si["med_ext"] >= 0)
    tgt = jnp.where(vec.dot(d, si["ng"]) > 0.0, si["med_ext"], si["med_int"])
    return jnp.where(si["valid"] & transition, tgt, current)


def spawn_ray_mint(p):
    """Origin offset epsilon (interaction.h spawn_ray:40-44)."""
    return (1.0 + vec.max_abs(p)) * m.RayEpsilon
