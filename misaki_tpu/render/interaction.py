"""SoA scene-interaction computation — barycentric surface records
(reference: src/librender/mesh.cpp:50-101 compute_scene_interaction,
interaction.h spawn_ray / initialize_sh_frame).
"""

import jax.numpy as jnp

from misaki_tpu.core import frame, math as m


def compute_interaction(scene, hit, o, d, wavelengths):
    """hit: {"t", "prim", "u", "v"} from accel.traverse. Returns SoA dict:
    valid, t, p, ng (geometric normal), sh (shading frame), uv, wi (local),
    shape, bsdf, emitter.
    """
    g = scene.geometry
    prim = jnp.maximum(hit["prim"], 0)
    valid = hit["prim"] >= 0
    b1 = hit["u"][:, None]
    b2 = hit["v"][:, None]
    b0 = 1.0 - b1 - b2

    p0 = g.p0[prim]
    e1 = g.e1[prim]
    e2 = g.e2[prim]
    p = p0 + e1 * b1 + e2 * b2
    ng = m.normalize(jnp.cross(e1, e2))

    # shading normal (mesh.cpp:83-99)
    ns = m.normalize(g.n0[prim] * b0 + g.n1[prim] * b1 + g.n2[prim] * b2)
    has_n = g.has_normals[prim]
    n_sh = jnp.where(has_n[:, None], ns, ng)

    # UVs: interpolated texcoords or barycentrics (mesh.cpp:66-73)
    uv_interp = g.uv0[prim] * b0 + g.uv1[prim] * b1 + g.uv2[prim] * b2
    uv = jnp.where(
        g.has_uvs[prim][:, None],
        uv_interp,
        jnp.concatenate([b1, b2], axis=-1),
    )

    # dp_du for the Gram-Schmidt sh frame: UV-derived partials when texcoords
    # exist (mesh.cpp:68-79), else the canonical ONB of the normal.
    duv1 = g.uv1[prim] - g.uv0[prim]
    duv2 = g.uv2[prim] - g.uv0[prim]
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    dp_du_uv = (duv2[:, 1:2] * e1 - duv1[:, 1:2] * e2) * inv_det[:, None]
    s_canon, _ = frame.coordinate_system(ng)
    use_uv = g.has_uvs[prim] & (det != 0.0)
    dp_du = jnp.where(use_uv[:, None], dp_du_uv, s_canon)

    # initialize_sh_frame (interaction.h:54-60): Gram-Schmidt dp_du against n
    s_raw = dp_du - n_sh * m.dot(n_sh, dp_du)[:, None]
    # fall back to canonical frame when degenerate
    degenerate = m.dot(s_raw, s_raw) < 1e-12
    s_fallback, _ = frame.coordinate_system(n_sh)
    s = m.normalize(jnp.where(degenerate[:, None], s_fallback, s_raw))
    t = jnp.cross(n_sh, s)
    sh = {"s": s, "t": t, "n": n_sh}

    wi = frame.to_local(sh, -d)

    shape = jnp.where(valid, g.shape_idx[prim], 0)
    return {
        "valid": valid,
        "t": jnp.where(valid, hit["t"], jnp.inf),
        "p": p,
        "ng": ng,
        "sh": sh,
        "uv": uv,
        "wi": wi,
        "prim": hit["prim"],
        "shape": shape,
        "bsdf": jnp.where(valid, scene.shape_bsdf[shape], 0),
        "emitter": jnp.where(valid, scene.shape_emitter[shape], -1),
    }


def spawn_ray_mint(p):
    """Origin offset epsilon (interaction.h spawn_ray:40-44)."""
    return (1.0 + jnp.max(jnp.abs(p), axis=-1)) * m.RayEpsilon
