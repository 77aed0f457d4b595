"""Wavefront medium kernels: homogeneous free-flight sampling, analytic
transmittance, and phase functions
(reference: src/librender/media/homogeneous.cpp:21-55,
src/librender/phase/isotropic.cpp:12-27,
src/librender/scene.cpp:114-184 eval_transmittance).

TPU-native redesign notes
-------------------------
* The reference keeps RGB extinction coefficients and channel-samples over
  3 RGB channels (volpath.cpp:39). Our pipeline is spectral: sigma_s/sigma_a
  are upsampled to the 4 hero wavelengths via the same sigmoid model as every
  other color (amplitude carried separately since extinction can exceed 1),
  and the distance-sampling channel is one of the 4 hero wavelengths. The
  pdf is the spectral mean, exactly mirroring homogeneous.cpp:26-44.
* Per-lane medium state is an int32 id (-1 = vacuum); medium parameters are
  fetched gather-free with the one-hot matmul (core/table.py) since M is
  tiny.
* Phase: Henyey-Greenstein with g stored per medium — g == 0 reduces
  *exactly* to the reference's isotropic (uniform sphere, pdf = 1/4pi,
  weight 1).
"""

import jax.numpy as jnp

from misaki_tpu.core import frame, math as m, table, vec

_TINY = 1e-20
INV_4PI = 1.0 / (4.0 * jnp.pi)


def fetch_medium(scene, med_ids, wavelengths):
    """Per-lane spectral medium parameters for int32 medium ids (-1 = vacuum).

    Returns dict {sigma_s (4, L), sigma_t (4, L), g (L,), vacuum (L,)}.
    Lanes in vacuum get sigma == 0 and g == 0.
    """
    med = scene.media
    M = med.kind.shape[0]
    L = med_ids.shape[0]
    if M == 0:
        z = jnp.zeros((4, L))
        return {
            "sigma_s": z,
            "sigma_t": z,
            "g": jnp.zeros(L),
            "vacuum": jnp.ones(L, bool),
        }
    # Pack the per-medium scalars into one (C, M) matrix -> single one-hot
    # fetch. Columns: ss coeffs(3), sa coeffs(3), ss_amp, sa_amp, scale, g.
    cols = jnp.concatenate(
        [
            med.sigma_s_coeff.T,                       # 0-2
            med.sigma_a_coeff.T,                       # 3-5
            (med.sigma_s_amp * med.scale)[None, :],    # 6
            (med.sigma_a_amp * med.scale)[None, :],    # 7
            med.g[None, :],                            # 8
        ],
        axis=0,
    )
    vacuum = med_ids < 0
    f = table.fetch(cols, jnp.maximum(med_ids, 0))  # (9, L)

    def sig_eval(c0, c1, c2):
        v = (c0[None, :] * wavelengths + c1[None, :]) * wavelengths + c2[None, :]
        return jnp.maximum(0.5 * v / jnp.sqrt(v * v + 1.0) + 0.5, 0.0)

    sigma_s = sig_eval(f[0], f[1], f[2]) * f[6][None, :]
    sigma_a = sig_eval(f[3], f[4], f[5]) * f[7][None, :]
    sigma_s = jnp.where(vacuum[None, :], 0.0, sigma_s)
    sigma_a = jnp.where(vacuum[None, :], 0.0, sigma_a)
    return {
        "sigma_s": sigma_s,
        "sigma_t": sigma_s + sigma_a,
        "g": jnp.where(vacuum, 0.0, f[8]),
        "vacuum": vacuum,
    }


def sample_distance(mp, channel, u1, tmax):
    """HomogeneousMedium::sample_distance (homogeneous.cpp:21-50), SoA.

    mp: fetch_medium dict; channel: (L,) int32 hero-wavelength index in
    [0, 4); u1: (L,) uniform; tmax: (L,) distance to the surface hit.

    Returns {scatter (L,) bool, t (L,), pdf (L,), tr (4, L)} where
    * scatter: the free-flight ended before the surface;
    * t: sampled distance (only meaningful when scatter);
    * pdf: spectral-mean pdf of what happened (density if scatter, survival
      probability otherwise);
    * tr: transmittance over the traveled segment.
    """
    onehot = (
        jnp.arange(4, dtype=jnp.int32)[:, None] == channel[None, :]
    ).astype(jnp.float32)
    sigma_c = jnp.sum(mp["sigma_t"] * onehot, axis=0)  # (L,)
    # -log(1-u)/sigma; vacuum (sigma==0) -> inf
    dist = -jnp.log1p(-jnp.minimum(u1, 1.0 - 1e-7)) / jnp.maximum(sigma_c, _TINY)
    dist = jnp.where(sigma_c > 0.0, dist, jnp.inf)
    scatter = dist < tmax
    traveled = jnp.where(scatter, dist, jnp.minimum(tmax, 3e38))
    tr = jnp.exp(-mp["sigma_t"] * traveled[None, :])
    # spectral-mean pdfs (homogeneous.cpp:36-42)
    pdf_scatter = jnp.mean(tr * mp["sigma_t"], axis=0)
    pdf_escape = jnp.mean(tr, axis=0)
    pdf = jnp.where(scatter, pdf_scatter, pdf_escape)
    # tr.maxCoeff() < 1e-20 -> zero (homogeneous.cpp:45-46)
    tr = jnp.where(jnp.max(tr, axis=0) < 1e-20, 0.0, tr)
    return {"scatter": scatter, "t": dist, "pdf": pdf, "tr": tr}


def eval_transmittance(mp, dist):
    """exp(-sigma_t * dist) (homogeneous.cpp:52-55). dist: (L,) -> (4, L)."""
    return jnp.exp(-mp["sigma_t"] * jnp.maximum(dist, 0.0)[None, :])


# ---------------------------------------------------------------------------
# phase functions (Henyey-Greenstein; g = 0 == reference isotropic)
# ---------------------------------------------------------------------------

def hg_pdf(cos_theta, g):
    """HG phase density over solid angle, cos_theta measured between the
    direction of travel and the scattered direction (mean cosine == g,
    forward-peaked for g > 0); g==0 -> 1/4pi (isotropic.cpp)."""
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return INV_4PI * (1.0 - g * g) / jnp.maximum(denom * jnp.sqrt(denom), _TINY)


def phase_eval(wi_world, wo_world, g):
    """PhaseFunction::eval — density of scattering from direction of travel
    `wi_world` (the ray direction) into `wo_world`. isotropic.cpp:24-27
    returns the uniform-sphere pdf; HG generalizes by cos(theta)."""
    return hg_pdf(vec.dot(wi_world, wo_world), g)


def phase_sample(wi_world, g, u2):
    """PhaseFunction::sample -> (wo (vec3), pdf (L,), weight (L,)).

    weight == 1 always (perfect importance sampling), matching
    isotropic.cpp:15-22 at g == 0.
    """
    # HG inverse-CDF for cos(theta) around the direction of travel; the
    # g -> 0 limit is cos = 1 - 2u (uniform sphere).
    safe_g = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
    sqr_term = (1.0 - safe_g * safe_g) / (1.0 - safe_g + 2.0 * safe_g * u2[0])
    cos_hg = (1.0 + safe_g * safe_g - sqr_term * sqr_term) / (2.0 * safe_g)
    cos_theta = jnp.where(jnp.abs(g) < 1e-4, 1.0 - 2.0 * u2[0], cos_hg)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u2[1]
    fr = frame.make_frame(wi_world)
    local = (sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
    wo = frame.to_world(fr, local)
    pdf = hg_pdf(cos_theta, g)
    return wo, pdf, jnp.ones_like(pdf)
