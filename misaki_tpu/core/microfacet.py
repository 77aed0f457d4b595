"""GGX/Beckmann microfacet distribution, component-tuple SoA + differentiable
(reference: include/misaki/render/microfacet.h).

Same sampling as the reference (classic NDF polar sampling — sample_visible
is not implemented there either, SURVEY.md 2.3); GGX eval/sample fully, plus
Beckmann's Smith G1. Alphas clamp to >= 1e-4 (configure()).

Directions are vec3 component tuples; scalars (L,).
"""

import jax.numpy as jnp

from misaki_tpu.core import frame
from misaki_tpu.core import math as m
from misaki_tpu.core import vec

ALPHA_MIN = 1e-4

GGX = 1
BECKMANN = 0


def clamp_alpha(alpha):
    return jnp.maximum(alpha, ALPHA_MIN)


def eval_ggx(mv, alpha_u, alpha_v):
    """Anisotropic GGX NDF D(m) (microfacet.h:11-18), 0 below the horizon."""
    mx, my, mz = mv
    cos_theta = mz
    cos_theta2 = jnp.maximum(cos_theta * cos_theta, 1e-20)
    beckmann_exp = (
        mx * mx / (alpha_u * alpha_u) + my * my / (alpha_v * alpha_v)
    ) / cos_theta2
    root = (1.0 + beckmann_exp) * cos_theta2
    d = 1.0 / (m.Pi * alpha_u * alpha_v * root * root)
    valid = jnp.logical_and(cos_theta > 0.0, d * cos_theta > 1e-20)
    return jnp.where(valid, d, 0.0)


def pdf_ggx(mv, alpha_u, alpha_v):
    """pdf(m) = D(m) cos_theta(m) (microfacet.h pdf())."""
    return eval_ggx(mv, alpha_u, alpha_v) * mv[2]


def sample_ggx(sample, alpha_u, alpha_v):
    """Polar anisotropic GGX NDF sample (microfacet.h:20-40).

    sample: (u, v) tuple. Returns (m vec3, pdf)."""
    s0, s1 = sample
    phi_m = jnp.arctan(
        alpha_u / alpha_v * jnp.tan(m.Pi + 2.0 * m.Pi * s1)
    ) + m.Pi * jnp.floor(2.0 * s1 + 0.5)
    sin_phi_m = jnp.sin(phi_m)
    cos_phi_m = jnp.cos(phi_m)
    c = cos_phi_m / alpha_u
    s = sin_phi_m / alpha_v
    alpha_sqr = 1.0 / (c * c + s * s)
    tan_theta_m_sqr = alpha_sqr * s0 / jnp.maximum(1.0 - s0, 1e-20)
    cos_theta_m = 1.0 / jnp.sqrt(1.0 + tan_theta_m_sqr)
    tmp = 1.0 + tan_theta_m_sqr / alpha_sqr
    pdf = m.InvPi / (
        alpha_u * alpha_v * cos_theta_m * cos_theta_m * cos_theta_m * tmp * tmp
    )
    pdf = jnp.where(pdf < 1e-20, 0.0, pdf)
    sin_theta_m = m.safe_sqrt(1.0 - cos_theta_m * cos_theta_m)
    mv = (sin_theta_m * cos_phi_m, sin_theta_m * sin_phi_m, cos_theta_m)
    return mv, pdf


def smith_g1(v, mv, alpha_u, alpha_v, distr_type=GGX):
    """Smith masking term for one direction (microfacet.h:150-175)."""
    vx, vy, vz = v
    xy_alpha_2 = m.sqr(alpha_u * vx) + m.sqr(alpha_v * vy)
    tan_theta_alpha_2 = xy_alpha_2 / jnp.maximum(m.sqr(vz), 1e-20)

    g_ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + tan_theta_alpha_2))
    a = 1.0 / jnp.sqrt(jnp.maximum(tan_theta_alpha_2, 1e-20))
    a_sqr = a * a
    g_b = jnp.where(
        a >= 1.6,
        1.0,
        (3.535 * a + 2.181 * a_sqr) / (1.0 + 2.276 * a + 2.577 * a_sqr),
    )
    g = jnp.where(jnp.asarray(distr_type) == GGX, g_ggx, g_b)
    g = jnp.where(xy_alpha_2 == 0.0, 1.0, g)
    g = jnp.where(vec.dot(v, mv) * vz <= 0.0, 0.0, g)
    return g


def G(wi, wo, mv, alpha_u, alpha_v, distr_type=GGX):
    return smith_g1(wi, mv, alpha_u, alpha_v, distr_type) * smith_g1(
        wo, mv, alpha_u, alpha_v, distr_type
    )
