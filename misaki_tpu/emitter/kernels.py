"""Wavefront emitter kernels: NEE direct sampling, pdf, and radiance eval
(reference: src/librender/emitters/{area,constant,point}.cpp and the uniform
emitter selection in scene.cpp:68-112).

Because scenes have few emitters, per-emitter work is unrolled statically
(a python loop over `scene.n_emitters` with lane masks) — there is no dynamic
dispatch on device.
"""

import jax.numpy as jnp

from misaki_tpu.core import frame, math as m, warp
from misaki_tpu.render import textures as tex
from misaki_tpu.scene.types import EM_AREA, EM_CONSTANT, EM_POINT


def eval_emitter(scene, emitter_ids, wi_local, uv, wavelengths):
    """Emitter::eval at a surface hit — area lights emit on the front side
    only (area.cpp:51-54: cos_theta(si.wi) > 0). Lanes with emitter_ids < 0
    return 0."""
    ids = jnp.maximum(emitter_ids, 0)
    rad = tex.eval_spectrum(
        scene.textures, scene.emitters.radiance_tex[ids], uv, wavelengths
    )
    front = frame.cos_theta(wi_local) > 0.0
    valid = emitter_ids >= 0
    return jnp.where((valid & front)[:, None], rad, 0.0)


def eval_environment(scene, wavelengths):
    """Constant env radiance (constant.cpp eval) — direction-independent."""
    if not scene.has_environment:
        return jnp.zeros(wavelengths.shape)
    ids = jnp.full(wavelengths.shape[:-1], scene.environment_idx, jnp.int32)
    uv = jnp.zeros(wavelengths.shape[:-1] + (2,))
    return tex.eval_spectrum(
        scene.textures, scene.emitters.radiance_tex[ids], uv, wavelengths
    )


def _sample_area_emitter(scene, ei, ref_p, wavelengths, u2):
    """Area-light direct sampling: area-uniform position on the emissive
    shape (mesh.cpp:103-133) converted to solid angle (shape.cpp:66-80),
    one-sided (area.cpp:38-45)."""
    em = scene.emitters
    cdf = em.face_cdf[ei]     # (Fmax,) — static row slice
    faces = em.face_global[ei]

    # sample face by area CDF with sample reuse (distribution.h sample_reuse)
    uy = u2[:, 1]
    idx = jnp.clip(jnp.searchsorted(cdf, uy, side="right"), 0, cdf.shape[0] - 1)
    lo = jnp.where(idx > 0, cdf[jnp.maximum(idx - 1, 0)], 0.0)
    hi = cdf[idx]
    uy = jnp.clip((uy - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0 - 1e-7)
    prim = faces[idx]

    b = warp.square_to_uniform_triangle(
        jnp.stack([u2[:, 0], uy], axis=-1)
    )
    g = scene.geometry
    p = g.p0[prim] + g.e1[prim] * b[:, 0:1] + g.e2[prim] * b[:, 1:2]
    ng = m.normalize(jnp.cross(g.e1[prim], g.e2[prim]))
    # shading normal if present (mesh.cpp:120-127)
    ns = m.normalize(
        g.n0[prim] * (1.0 - b[:, 0:1] - b[:, 1:2])
        + g.n1[prim] * b[:, 0:1]
        + g.n2[prim] * b[:, 1:2]
    )
    n = jnp.where(g.has_normals[prim][:, None], ns, ng)
    uv = (
        g.uv0[prim] * (1.0 - b[:, 0:1] - b[:, 1:2])
        + g.uv1[prim] * b[:, 0:1]
        + g.uv2[prim] * b[:, 1:2]
    )
    uv = jnp.where(g.has_uvs[prim][:, None], uv, b)

    d = p - ref_p
    dist2 = jnp.sum(d * d, axis=-1)
    dist = jnp.sqrt(dist2)
    d = d / jnp.maximum(dist, 1e-20)[:, None]

    pdf_area = 1.0 / jnp.maximum(em.area[ei], 1e-20)
    dp = jnp.abs(m.dot(d, n))
    pdf = jnp.where(dp != 0.0, pdf_area * dist2 / jnp.maximum(dp, 1e-20), 0.0)

    # one-sided emission: only where d . n < 0 (area.cpp:38)
    front = m.dot(d, n) < 0.0
    pdf = jnp.where(front, pdf, 0.0)
    rad = tex.eval_spectrum(
        scene.textures,
        jnp.full(prim.shape, em.radiance_tex[ei], jnp.int32),
        uv,
        wavelengths,
    )
    spec = jnp.where(
        (pdf > 0.0)[:, None], rad / jnp.maximum(pdf, 1e-20)[:, None], 0.0
    )
    return {"d": d, "dist": dist, "pdf": pdf, "spec": spec, "n": n}


def _sample_constant_emitter(scene, ei, ref_p, wavelengths, u2):
    """Uniform-sphere env sampling (constant.cpp:53-74)."""
    em = scene.emitters
    d = warp.square_to_uniform_sphere(u2)
    dist = jnp.full(d.shape[:-1], 2.0 * em.bsphere_radius)
    pdf = warp.square_to_uniform_sphere_pdf(d)
    rad = tex.eval_spectrum(
        scene.textures,
        jnp.full(d.shape[:-1], em.radiance_tex[ei], jnp.int32),
        jnp.zeros(d.shape[:-1] + (2,)),
        wavelengths,
    )
    return {
        "d": d,
        "dist": dist,
        "pdf": pdf,
        "spec": rad / pdf[:, None],
        "n": -d,
    }


def _sample_point_emitter(scene, ei, ref_p, wavelengths, u2):
    """Delta position light, 1/r^2 falloff (stale emitters/point.cpp parity)."""
    em = scene.emitters
    p = em.position[ei]
    d = p[None, :] - ref_p
    dist2 = jnp.sum(d * d, axis=-1)
    dist = jnp.sqrt(dist2)
    d = d / jnp.maximum(dist, 1e-20)[:, None]
    rad = tex.eval_spectrum(
        scene.textures,
        jnp.full(dist.shape, em.radiance_tex[ei], jnp.int32),
        jnp.zeros(dist.shape + (2,)),
        wavelengths,
    )
    return {
        "d": d,
        "dist": dist,
        "pdf": jnp.ones_like(dist),
        "spec": rad / jnp.maximum(dist2, 1e-20)[:, None],
        "n": -d,
    }


def sample_emitter_direct(scene, ref_p, wavelengths, u2):
    """Scene::sample_emitter_direct (scene.cpp:68-103) minus the visibility
    test (the integrator casts the shadow ray so it can batch it).

    Uniform emitter pick with sample reuse; returns SoA dict
    {d, dist, pdf, spec, delta} where spec = radiance/pdf (and the selection
    count factor), pdf includes the selection pdf.
    """
    n = scene.n_emitters
    L = ref_p.shape[0]
    if n == 0:
        z3 = jnp.zeros((L, 3))
        return {
            "d": z3,
            "dist": jnp.zeros(L),
            "pdf": jnp.zeros(L),
            "spec": jnp.zeros((L, 4)),
            "delta": jnp.zeros(L, bool),
        }

    ux = u2[:, 0]
    if n == 1:
        index = jnp.zeros(L, jnp.int32)
        ux_r = ux
        sel_pdf = 1.0
    else:
        index = jnp.minimum((ux * n).astype(jnp.int32), n - 1)
        ux_r = (ux - index.astype(jnp.float32) / n) * n
        sel_pdf = 1.0 / n
    u2r = jnp.stack([ux_r, u2[:, 1]], axis=-1)

    out = None
    delta = jnp.zeros(L, bool)
    samplers = {
        EM_AREA: _sample_area_emitter,
        EM_CONSTANT: _sample_constant_emitter,
        EM_POINT: _sample_point_emitter,
    }
    kinds = scene.emitter_kinds
    for ei in range(n):
        r = samplers[kinds[ei]](scene, ei, ref_p, wavelengths, u2r)
        mask = index == ei
        if out is None:
            out = {k: jnp.where(_b(mask, v), v, 0.0) for k, v in r.items()}
        else:
            out = {
                k: jnp.where(_b(mask, r[k]), r[k], out[k]) for k in out
            }
        delta = delta | (mask & (kinds[ei] == EM_POINT))

    if n > 1:
        out["pdf"] = out["pdf"] * sel_pdf
        out["spec"] = out["spec"] * n
    out["delta"] = delta
    return out


def pdf_emitter_direct(scene, emitter_ids, d, dist, n_at_hit):
    """Scene::pdf_emitter_direct (scene.cpp:105-112) for MIS when a BSDF ray
    hits an emitter. emitter_ids: per-lane emitter index (env hits pass the
    environment index). Area: (1/area) * dist^2/|d.n| (shape.cpp:82-88);
    constant env: uniform-sphere pdf."""
    em = scene.emitters
    ids = jnp.maximum(emitter_ids, 0)
    kind = em.kind[ids]
    area = em.area[ids]
    dp = jnp.abs(m.dot(d, n_at_hit))
    pdf_area = jnp.where(
        dp != 0.0,
        (1.0 / jnp.maximum(area, 1e-20)) * dist * dist / jnp.maximum(dp, 1e-20),
        0.0,
    )
    pdf_env = jnp.full_like(dist, m.InvFourPi)
    pdf = jnp.where(kind == EM_AREA, pdf_area, 0.0)
    pdf = jnp.where(kind == EM_CONSTANT, pdf_env, pdf)
    if scene.n_emitters > 1:
        pdf = pdf / scene.n_emitters
    return jnp.where(emitter_ids >= 0, pdf, 0.0)


def _b(mask, like):
    return mask[:, None] if like.ndim == 2 else mask
