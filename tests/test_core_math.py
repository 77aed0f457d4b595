"""Unit tests for the L0 math substrate against closed forms and the
reference's formulas (SURVEY.md section 4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from misaki_tpu.core import frame, fresnel, math as m, microfacet, rng, warp
from misaki_tpu.core import spectrum as spec
from misaki_tpu.core.srgb_upsample import (
    fit_srgb_coeffs,
    srgb_model_eval_flat as srgb_model_eval,
)


# ---------------------------------------------------------------- PCG32
def _pcg32_scalar_reference(initstate, initseq, n):
    """Pure-python uint64 PCG32 (mathutils.h:89-143) as the oracle."""
    MASK = (1 << 64) - 1
    MULT = 0x5851F42D4C957F2D
    state = 0
    inc = ((initseq << 1) | 1) & MASK

    def step_out():
        nonlocal state
        old = state
        state = (old * MULT + inc) & MASK
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF

    step_out()
    state = (state + initstate) & MASK
    step_out()
    out = [step_out() for _ in range(n)]
    return out


def test_pcg32_bit_exact():
    seeds = np.array([0, 1, 42, 123456789, 0xDEADBEEF], dtype=np.uint32)
    seqs = np.array([1, 1, 7, 54, 1], dtype=np.uint32)
    state = rng.seed(jnp.asarray(seeds), jnp.asarray(seqs))
    draws = []
    for _ in range(8):
        v, state = rng.next_uint32(state)
        draws.append(np.asarray(v))
    draws = np.stack(draws, axis=1)  # (lane, draw)
    for i, (s, q) in enumerate(zip(seeds, seqs)):
        expect = _pcg32_scalar_reference(int(s), int(q), 8)
        assert draws[i].tolist() == expect, f"lane {i} mismatch"


def test_pcg32_float_range():
    state = rng.seed(jnp.arange(1000, dtype=jnp.uint32))
    f, state = rng.next_float32(state)
    f2, _ = rng.next_float32(state)
    assert float(jnp.min(f)) >= 0.0 and float(jnp.max(f)) < 1.0
    # decorrelated streams: means near 0.5
    assert abs(float(jnp.mean(f)) - 0.5) < 0.05
    assert abs(float(jnp.mean(f2)) - 0.5) < 0.05


# ---------------------------------------------------------------- frames
def _t3(a):
    """(N, 3) numpy -> vec3 component tuple of jnp arrays."""
    a = jnp.asarray(a, jnp.float32)
    return (a[:, 0], a[:, 1], a[:, 2])


def _n3(v):
    """vec3 tuple -> (N, 3) numpy."""
    return np.stack([np.asarray(c) for c in v], axis=-1)


def test_coordinate_system_orthonormal():
    from misaki_tpu.core import vec

    n = np.random.default_rng(0).normal(size=(256, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    fr = frame.make_frame(_t3(n))
    s, t = fr["s"], fr["t"]
    assert np.allclose(np.asarray(vec.dot(s, t)), 0, atol=1e-5)
    assert np.allclose(np.asarray(vec.dot(s, fr["n"])), 0, atol=1e-5)
    assert np.allclose(np.asarray(vec.norm(s)), 1, atol=1e-5)
    assert np.allclose(_n3(vec.cross(s, t)), n, atol=1e-4)


def test_frame_roundtrip():
    rs = np.random.default_rng(1)
    n = rs.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    fr = frame.make_frame(_t3(n))
    v = rs.normal(size=(64, 3)).astype(np.float32)
    v_local = frame.to_local(fr, _t3(v))
    v_back = frame.to_world(fr, v_local)
    assert np.allclose(_n3(v_back), v, atol=1e-4)


# ---------------------------------------------------------------- warps
def _chi2_uniformity(samples_xyz, pdf_fn, n_theta=8, n_phi=16):
    """Histogram directions on the sphere vs. analytic pdf integral."""
    v = np.asarray(samples_xyz)
    n = v.shape[0]
    cos_t = np.clip(v[:, 2], -1, 1)
    phi = np.mod(np.arctan2(v[:, 1], v[:, 0]), 2 * np.pi)
    ti = np.minimum((0.5 * (cos_t + 1) * n_theta).astype(int), n_theta - 1)
    pi_ = np.minimum((phi / (2 * np.pi) * n_phi).astype(int), n_phi - 1)
    hist = np.zeros((n_theta, n_phi))
    np.add.at(hist, (ti, pi_), 1.0)
    hist /= n
    # expected mass per bin via pdf at bin center * solid angle of the bin
    dct = 2.0 / n_theta
    dphi = 2 * np.pi / n_phi
    centers_ct = -1 + (np.arange(n_theta) + 0.5) * dct
    expected = np.zeros((n_theta, n_phi))
    for i, ct in enumerate(centers_ct):
        st = np.sqrt(max(1 - ct * ct, 0))
        for j in range(n_phi):
            ph = (j + 0.5) * dphi
            d = np.array([st * np.cos(ph), st * np.sin(ph), ct])
            expected[i, j] = pdf_fn(d) * dct * dphi
    return hist, expected


def _t2(a):
    a = jnp.asarray(a, jnp.float32)
    return (a[:, 0], a[:, 1])


def test_cosine_hemisphere_chi2():
    n = 200_000
    u = np.random.default_rng(2).uniform(size=(n, 2)).astype(np.float32)
    v = _n3(warp.square_to_cosine_hemisphere(_t2(u)))
    pdf = lambda d: max(d[2], 0.0) / np.pi
    hist, expected = _chi2_uniformity(v, pdf)
    assert np.abs(hist - expected).max() < 5e-3


def test_uniform_sphere_chi2():
    n = 200_000
    u = np.random.default_rng(3).uniform(size=(n, 2)).astype(np.float32)
    v = _n3(warp.square_to_uniform_sphere(_t2(u)))
    assert np.allclose(np.linalg.norm(v, axis=-1), 1, atol=1e-4)
    hist, expected = _chi2_uniformity(v, lambda d: 1 / (4 * np.pi))
    assert np.abs(hist - expected).max() < 5e-3


def test_uniform_triangle():
    u = np.random.default_rng(4).uniform(size=(100_000, 2)).astype(np.float32)
    b = np.stack([np.asarray(c) for c in warp.square_to_uniform_triangle(_t2(u))], -1)
    assert (b >= 0).all() and (b.sum(-1) <= 1 + 1e-6).all()
    # centroid of uniform barycentrics = (1/3, 1/3)
    assert np.allclose(b.mean(0), [1 / 3, 1 / 3], atol=5e-3)


# ---------------------------------------------------------------- fresnel
def test_fresnel_normal_incidence():
    F, ctt, eta_it, eta_ti = fresnel.fresnel(jnp.asarray([1.0]), 1.5)
    # R0 = ((n-1)/(n+1))^2 = 0.04
    assert np.allclose(F, ((1.5 - 1) / (1.5 + 1)) ** 2, atol=1e-6)
    assert np.allclose(ctt, -1.0, atol=1e-6)


def test_fresnel_tir():
    # from inside (cos<0) beyond critical angle -> F = 1
    ct = np.cos(np.deg2rad(50.0))  # critical for 1.5 is ~41.8deg
    F, ctt, _, _ = fresnel.fresnel(jnp.asarray([-ct]), 1.5)
    assert np.allclose(F, 1.0, atol=1e-6)
    assert np.allclose(ctt, 0.0, atol=1e-6)


def test_fresnel_energy_and_reciprocity():
    cos_i = np.linspace(0.05, 1.0, 64).astype(np.float32)
    F, _, _, _ = fresnel.fresnel(jnp.asarray(cos_i), 1.5)
    f = np.asarray(F)
    assert (f >= 0).all() and (f <= 1).all()
    assert f[0] > f[-1]  # grazing reflectance higher


def test_fresnel_conductor_bounds():
    eta = jnp.full((4, 1), 0.9)
    k = jnp.full((4, 1), 2.4)
    F = fresnel.fresnel_conductor(jnp.asarray([0.7]), eta, k)
    f = np.asarray(F)
    assert (f > 0).all() and (f <= 1).all()


def test_reflect_refract():
    wi = _t3(np.asarray([[0.3, 0.4, np.sqrt(1 - 0.25)]], dtype=np.float32))
    wo = fresnel.reflect(wi)
    assert np.allclose(_n3(wo)[0], [-0.3, -0.4, np.sqrt(0.75)], atol=1e-6)
    F, ctt, eta_it, eta_ti = fresnel.fresnel(wi[2], 1.5)
    wt = fresnel.refract(wi, ctt, eta_ti)
    # Snell: sin_t = sin_i / eta
    wtn = _n3(wt)[0]
    sin_i = np.linalg.norm(_n3(wi)[0, :2])
    sin_t = np.linalg.norm(wtn[:2])
    assert np.allclose(sin_t, sin_i / 1.5, atol=1e-5)
    assert np.allclose(np.linalg.norm(wtn), 1.0, atol=1e-5)


# ---------------------------------------------------------------- microfacet
def test_ggx_normalization():
    """Integral of D(m) cos_theta dm over the hemisphere == 1."""
    alpha = 0.3
    n = 256
    ct = np.linspace(0, 1, n, endpoint=False) + 0.5 / n
    phi = np.linspace(0, 2 * np.pi, n, endpoint=False)
    CT, PHI = np.meshgrid(ct, phi, indexing="ij")
    ST = np.sqrt(1 - CT**2)
    mvec = np.stack([ST * np.cos(PHI), ST * np.sin(PHI), CT], -1).astype(np.float32)
    mt = tuple(jnp.asarray(mvec[..., i]) for i in range(3))
    d = np.asarray(microfacet.eval_ggx(mt, alpha, alpha))
    integral = (d * CT).sum() * (1.0 / n) * (2 * np.pi / n)
    assert abs(integral - 1.0) < 2e-2


def test_ggx_sample_pdf_consistency():
    """Sampled pdf equals the analytic pdf D(m) cos(m) (chi^2-style)."""
    alpha_u, alpha_v = 0.2, 0.5
    u = np.random.default_rng(5).uniform(size=(50_000, 2)).astype(np.float32)
    mvec, pdf_s = microfacet.sample_ggx(_t2(u), alpha_u, alpha_v)
    pdf_a = microfacet.pdf_ggx(mvec, alpha_u, alpha_v)
    ps, pa = np.asarray(pdf_s), np.asarray(pdf_a)
    ok = ps > 1e-6
    assert np.allclose(ps[ok], pa[ok], rtol=2e-3)


def test_smith_g1_limits():
    mvec = _t3(np.asarray([[0.0, 0.0, 1.0]]))
    v = _t3(np.asarray([[0.0, 0.0, 1.0]]))
    g = microfacet.smith_g1(v, mvec, 0.3, 0.3)
    assert np.allclose(g, 1.0, atol=1e-6)  # normal incidence: no shadowing


# ---------------------------------------------------------------- spectra
def test_sample_shifted():
    s = spec.sample_shifted(jnp.asarray([0.9]))
    assert np.allclose(np.asarray(s)[:, 0], [0.9, 0.15, 0.4, 0.65], atol=1e-6)


def test_sample_rgb_spectrum_range_and_pdf():
    u = jnp.asarray(np.random.default_rng(6).uniform(size=(4, 10_000)).astype(np.float32))
    lam, w = spec.sample_rgb_spectrum(u)
    l = np.asarray(lam)
    assert (l >= 360).all() and (l <= 830).all()
    # weight = 1/pdf
    p = np.asarray(spec.pdf_rgb_spectrum(lam))
    assert np.allclose(np.asarray(w) * p, 1.0, rtol=1e-3)


def test_rgb_spectrum_integrates_to_one():
    """MC estimate of integral pdf dlambda over [360,830] should be ~1."""
    lam = np.linspace(360.0, 830.0, 100_000).astype(np.float32)
    p = np.asarray(spec.pdf_rgb_spectrum(jnp.asarray(lam)))
    integral = p.mean() * (830 - 360)
    assert abs(integral - 1.0) < 1e-2


def test_cie_lerp_matches_table():
    lam = jnp.asarray([360.0, 830.0, 555.0]).reshape(3, 1)
    X, Y, Z = spec.cie1931_xyz(lam)
    # Y peaks near 555nm at ~1.0
    assert 0.99 < float(Y[2, 0]) <= 1.01
    assert float(Y[0, 0]) < 1e-4


def test_xyz_srgb_roundtrip():
    rgb0 = np.random.default_rng(7).uniform(size=(32, 3)).astype(np.float32)
    rgb = (jnp.asarray(rgb0[:, 0]), jnp.asarray(rgb0[:, 1]), jnp.asarray(rgb0[:, 2]))
    back = np.stack(
        [np.asarray(c) for c in spec.xyz_to_srgb(spec.srgb_to_xyz(rgb))], -1
    )
    rgb = rgb0
    # The reference's two matrices (spectrum.h:131-143) are independently
    # truncated published values, not exact inverses — roundtrip is ~1e-2.
    assert np.allclose(np.asarray(back), np.asarray(rgb), atol=2e-2)


# ---------------------------------------------------------------- upsampling
@pytest.mark.parametrize(
    "rgb",
    [
        (0.5, 0.5, 0.5),
        (0.885809, 0.698859, 0.666422),  # cbox white walls
        (0.105421, 0.37798, 0.076425),  # cbox green
        (0.570068, 0.0430135, 0.0443706),  # cbox red
        (0.45, 0.30, 0.90),
        (0.2, 0.2, 0.2),
    ],
)
def test_srgb_upsample_roundtrip(rgb):
    """Fitted sigmoid spectrum must reproduce the color under D65."""
    coeff = fit_srgb_coeffs(rgb)
    lam = np.linspace(360, 830, 95)
    refl = np.asarray(
        srgb_model_eval(jnp.asarray(coeff, jnp.float32), jnp.asarray(lam, jnp.float32))
    )
    assert (refl >= 0).all() and (refl <= 1 + 1e-5).all()
    from misaki_tpu.core.cie_data import CIE1931_X, CIE1931_Y, CIE1931_Z, D65_DATA

    W = D65_DATA * np.stack([CIE1931_X, CIE1931_Y, CIE1931_Z], 0)
    xyz = (W * refl).sum(-1) / (D65_DATA * CIE1931_Y).sum()
    got = np.asarray(spec.xyz_to_srgb(jnp.asarray(xyz, jnp.float32)))
    assert np.allclose(got, rgb, atol=2e-3), (got, rgb)


def test_srgb_model_eval_differentiable():
    coeff = jnp.asarray(fit_srgb_coeffs((0.4, 0.6, 0.2)), jnp.float32)
    lam = jnp.asarray([450.0, 550.0, 650.0, 600.0])

    def f(c):
        return jnp.sum(srgb_model_eval(c, lam))

    g = jax.grad(f)(coeff)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
