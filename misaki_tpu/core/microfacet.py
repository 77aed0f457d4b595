"""GGX/Beckmann microfacet distribution, SoA + differentiable
(reference: include/misaki/render/microfacet.h).

The reference's sampling is the classic (non-visible-normal) NDF sampling; we
keep the same sampling to match images (SURVEY.md 2.3: sample_visible is not
implemented there). Only GGX eval/sample works in the reference (Beckmann eval
is a stub); we implement GGX fully and Beckmann's Smith G1 for completeness.

Alphas are clamped to >= 1e-4 (microfacet.h configure()).
"""

import jax.numpy as jnp

from misaki_tpu.core import math as m
from misaki_tpu.core import frame

ALPHA_MIN = 1e-4

GGX = 1
BECKMANN = 0


def clamp_alpha(alpha):
    return jnp.maximum(alpha, ALPHA_MIN)


def eval_ggx(mvec, alpha_u, alpha_v):
    """Anisotropic GGX NDF D(m) (microfacet.h:11-18), 0 below the horizon."""
    cos_theta = frame.cos_theta(mvec)
    cos_theta2 = jnp.maximum(cos_theta * cos_theta, 1e-20)
    beckmann_exp = (
        mvec[..., 0] ** 2 / (alpha_u * alpha_u)
        + mvec[..., 1] ** 2 / (alpha_v * alpha_v)
    ) / cos_theta2
    root = (1.0 + beckmann_exp) * cos_theta2
    d = 1.0 / (m.Pi * alpha_u * alpha_v * root * root)
    # reference eval(): zero when cos_theta <= 0 or result*cos < 1e-20
    valid = jnp.logical_and(cos_theta > 0.0, d * cos_theta > 1e-20)
    return jnp.where(valid, d, 0.0)


def pdf_ggx(mvec, alpha_u, alpha_v):
    """pdf(m) = D(m) cos_theta(m) (microfacet.h pdf())."""
    return eval_ggx(mvec, alpha_u, alpha_v) * frame.cos_theta(mvec)


def sample_ggx(sample, alpha_u, alpha_v):
    """Polar anisotropic GGX NDF sample (microfacet.h:20-40).

    sample: (..., 2) uniforms. Returns (m, pdf). (The reference signature
    takes wi but ignores it — no VNDF.)
    """
    s0 = sample[..., 0]
    s1 = sample[..., 1]
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
    mvec = jnp.stack(
        [sin_theta_m * cos_phi_m, sin_theta_m * sin_phi_m, cos_theta_m], axis=-1
    )
    return mvec, pdf


def smith_g1(v, mvec, alpha_u, alpha_v, distr_type=GGX):
    """Smith masking term for one direction (microfacet.h:150-175)."""
    xy_alpha_2 = m.sqr(alpha_u * v[..., 0]) + m.sqr(alpha_v * v[..., 1])
    tan_theta_alpha_2 = xy_alpha_2 / jnp.maximum(m.sqr(v[..., 2]), 1e-20)

    # GGX branch
    g_ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + tan_theta_alpha_2))
    # Beckmann rational fit
    a = 1.0 / jnp.sqrt(jnp.maximum(tan_theta_alpha_2, 1e-20))
    a_sqr = a * a
    g_b = jnp.where(
        a >= 1.6,
        1.0,
        (3.535 * a + 2.181 * a_sqr) / (1.0 + 2.276 * a + 2.577 * a_sqr),
    )
    g = jnp.where(jnp.asarray(distr_type) == GGX, g_ggx, g_b)
    g = jnp.where(xy_alpha_2 == 0.0, 1.0, g)
    g = jnp.where(m.dot(v, mvec) * frame.cos_theta(v) <= 0.0, 0.0, g)
    return g


def G(wi, wo, mvec, alpha_u, alpha_v, distr_type=GGX):
    return smith_g1(wi, mvec, alpha_u, alpha_v, distr_type) * smith_g1(
        wo, mvec, alpha_u, alpha_v, distr_type
    )
