"""BSDF-level consistency tests for the parity materials
(reference: bsdfs/roughconductor.cpp:52-100, roughdielectric.cpp:69-190,
diffuse.cpp:18-57) — VERDICT round-1 item: these kernels previously had zero
coverage.

Three properties per sampled kind:
  * sample<->eval/pdf cross-check: the sample weight must equal
    eval(wi, wo) / pdf(wi, wo) for the returned wo;
  * pdf normalization: the solid-angle pdf must integrate to ~1 over the
    sphere (uniform-sphere MC), i.e. the sampler covers its lobes with a
    properly normalized density;
  * energy conservation (furnace): integral of f cos over the sphere <= 1
    for unit reflectance/transmittance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from misaki_tpu.bsdf import kernels as bk
from misaki_tpu.core import warp
from misaki_tpu.scene.types import (
    BSDF_DIFFUSE,
    BSDF_DISNEY,
    BSDF_PLASTIC,
    BSDF_ROUGH_CONDUCTOR,
    BSDF_ROUGH_DIELECTRIC,
    DIST_GGX,
)

L = 1 << 14


def make_params(kind, alpha=0.2, eta=1.5, eta_c=(0.2, 0.92, 1.1),
                k_c=(3.9, 2.45, 2.14)):
    """Hand-built material_params dict (one uniform material on all lanes)."""
    ones = jnp.ones(L)
    spec1 = jnp.ones((4, L))
    wav = jnp.broadcast_to(jnp.asarray([480.0, 530.0, 580.0, 630.0])[:, None], (4, L))
    return {
        "kind": jnp.full((L,), kind, jnp.int32),
        "twosided": jnp.zeros(L, bool),
        "distr": jnp.full((L,), DIST_GGX, jnp.int32),
        "reflectance": spec1 * 0.8,
        "spec_refl": spec1,
        "spec_trans": spec1,
        "alpha_u": ones * alpha,
        "alpha_v": ones * alpha,
        "eta": ones * eta,
        "eta_spec": bk.rgb_to_spectral(tuple(jnp.full(L, c) for c in eta_c), wav),
        "k_spec": bk.rgb_to_spectral(tuple(jnp.full(L, c) for c in k_c), wav),
        "smooth": jnp.ones(L, bool),
        # roughplastic extras (fdr of eta=1.49 per fresnel.h d'Eon-Irving fit)
        "ssw": ones * 0.6,
        "fdr": ones * 0.075,
        "nonlinear": jnp.zeros(L, bool),
        "mask": None,
        "opacity": None,
        # disney extras (used only by BSDF_DISNEY lanes; ALL_KINDS pruning
        # means every hand-built dict must carry them)
        "disney": {
            "subsurface": ones * 0.3,
            "metallic": ones * 0.3,
            "specular": ones * 0.5,
            "spec_tint": ones * 0.2,
            "aniso": ones * 0.3,
            "sheen": ones * 0.5,
            "sheen_tint": ones * 0.5,
            "clearcoat": ones * 0.8,
            "cc_gloss": ones * 0.6,
        },
        "ds_spec0": spec1 * 0.3,
        "ds_sheen": spec1 * 0.2,
    }


def fixed_wi(z=0.6):
    s = np.sqrt(1.0 - z * z)
    return (jnp.full(L, s), jnp.zeros(L), jnp.full(L, z))


def rand_u(seed):
    rng = np.random.default_rng(seed)
    u1 = jnp.asarray(rng.uniform(size=L).astype(np.float32))
    u2 = (
        jnp.asarray(rng.uniform(size=L).astype(np.float32)),
        jnp.asarray(rng.uniform(size=L).astype(np.float32)),
    )
    return u1, u2


@pytest.mark.parametrize("kind,alpha", [
    (BSDF_DIFFUSE, 0.0),
    (BSDF_ROUGH_CONDUCTOR, 0.1),
    (BSDF_ROUGH_CONDUCTOR, 0.4),
    (BSDF_PLASTIC, 0.2),
    (BSDF_DISNEY, 0.4),
])
def test_sample_eval_pdf_crosscheck(kind, alpha):
    """weight == eval(wi, wo) / pdf(wi, wo) for sampled directions."""
    p = make_params(kind, alpha=max(alpha, 1e-3))
    wi = fixed_wi()
    u1, u2 = rand_u(1)
    bs = bk.sample_bsdf(p, wi, u1, u2)
    valid = np.asarray(bs["valid"])
    assert valid.mean() > 0.5
    f = np.asarray(bk.eval_bsdf(p, wi, bs["wo"]))
    pdf = np.asarray(bk.pdf_bsdf(p, wi, bs["wo"]))
    w = np.asarray(bs["weight"])
    ok = valid & (pdf > 1e-6) & (np.abs(np.asarray(bs["wo"][2])) > 0.05)
    ratio = f[:, ok] / pdf[ok][None, :]
    rel = np.abs(ratio - w[:, ok]) / np.maximum(np.abs(w[:, ok]), 1e-3)
    # allow a small fraction of grazing/numerical outliers
    assert (rel < 1e-2).mean() > 0.995, rel.max()


def test_roughdielectric_weight_quirk():
    """Rough dielectric deliberately mirrors the reference's scaled-alpha
    estimator (roughdielectric.cpp:69-76 + 104-112): `sample` draws the
    half-vector from the SCALED distribution (alpha * (1.2 - 0.2 sqrt|cti|))
    and returns that pdf, but the weight is f cos / pdf_UNSCALED (the classic
    Walter et al. trick — slightly biased, variance-reducing). Verify
    weight == eval / pdf_unscaled exactly, where pdf_unscaled is obtained by
    feeding alpha/s so the kernel's internal scaling cancels."""
    alpha, z = 0.2, 0.6
    p = make_params(BSDF_ROUGH_DIELECTRIC, alpha=alpha)
    s = 1.2 - 0.2 * np.sqrt(z)
    p_noscale = dict(p)
    p_noscale["alpha_u"] = p["alpha_u"] / s
    p_noscale["alpha_v"] = p["alpha_v"] / s
    wi = fixed_wi(z)
    u1, u2 = rand_u(1)
    bs = bk.sample_bsdf(p, wi, u1, u2)
    valid = np.asarray(bs["valid"])
    assert valid.mean() > 0.5
    f = np.asarray(bk.eval_bsdf(p, wi, bs["wo"]))
    pdf_u = np.asarray(bk.pdf_bsdf(p_noscale, wi, bs["wo"]))
    w = np.asarray(bs["weight"])
    ok = valid & (pdf_u > 1e-5) & (np.abs(np.asarray(bs["wo"][2])) > 0.05)
    ratio = f[:, ok] / pdf_u[ok][None, :]
    rel = np.abs(ratio - w[:, ok]) / np.maximum(np.abs(w[:, ok]), 1e-3)
    # tail: lobe-selection boundaries (u1 ~ F) and near-TIR half-vectors
    # reclassify between the lobes; the identity holds on the body
    assert (rel < 1e-2).mean() > 0.97, rel.max()
    assert np.median(rel) < 1e-4


@pytest.mark.parametrize("kind,alpha", [
    (BSDF_DIFFUSE, 0.0),
    (BSDF_ROUGH_CONDUCTOR, 0.3),
    (BSDF_ROUGH_DIELECTRIC, 0.3),
    (BSDF_PLASTIC, 0.3),
    (BSDF_DISNEY, 0.5),
])
def test_pdf_normalizes(kind, alpha):
    """Uniform-sphere MC: E[pdf] * 4pi must equal the sampler's valid-sample
    probability (the non-VNDF polar sampler discards half-vectors whose
    reflection lands below the horizon — the reference does not renormalize,
    microfacet.h sample; MIS stays consistent because pdf() matches the
    same truncated density)."""
    p = make_params(kind, alpha=max(alpha, 1e-3))
    wi = fixed_wi()
    _, u2 = rand_u(2)
    wo = warp.square_to_uniform_sphere(u2)
    pdf = np.asarray(bk.pdf_bsdf(p, wi, wo))
    est = pdf.mean() * 4.0 * np.pi

    u1s, u2s = rand_u(7)
    bs = bk.sample_bsdf(p, wi, u1s, u2s)
    p_valid = float(np.asarray(bs["valid"] & (bs["pdf"] > 0)).mean())
    assert abs(est - p_valid) < 0.05, (est, p_valid)
    assert p_valid > 0.6  # the lobe is mostly above-horizon for wi.z=0.6


@pytest.mark.parametrize("kind,alpha,cap", [
    (BSDF_DIFFUSE, 0.0, 0.83),           # reflectance 0.8 (+MC noise margin)
    (BSDF_ROUGH_CONDUCTOR, 0.2, 1.02),
    (BSDF_ROUGH_DIELECTRIC, 0.2, 1.03),  # both lobes, unit spec
    (BSDF_PLASTIC, 0.2, 1.02),
    (BSDF_DISNEY, 0.4, 1.10),  # sheen + clearcoat add on top of base
])
def test_furnace_energy(kind, alpha, cap):
    """integral of f cos over the sphere <= cap (white-furnace energy bound;
    GGX without multiple scattering loses energy, never gains)."""
    p = make_params(kind, alpha=max(alpha, 1e-3))
    wi = fixed_wi()
    _, u2 = rand_u(3)
    wo = warp.square_to_uniform_sphere(u2)
    f = np.asarray(bk.eval_bsdf(p, wi, wo))  # f * cos_theta_o
    est = np.abs(f).mean(axis=1) * 4.0 * np.pi
    assert (est <= cap).all(), est


def test_directional_histogram_matches_pdf():
    """Binned chi^2 test on the sampled lobe: per cos-theta bin, the sample
    frequency must match the pdf mass (roughconductor, GGX alpha=0.3)."""
    p = make_params(BSDF_ROUGH_CONDUCTOR, alpha=0.3)
    wi = fixed_wi()
    u1, u2 = rand_u(4)
    bs = bk.sample_bsdf(p, wi, u1, u2)
    valid = np.asarray(bs["valid"]) & (np.asarray(bs["pdf"]) > 0)
    woz = np.asarray(bs["wo"][2])[valid]
    wox = np.asarray(bs["wo"][0])[valid]
    inv_pdf = 1.0 / np.asarray(bs["pdf"])[valid]

    # pdf mass per bin via self-normalized importance estimate:
    # mass(bin) ~= (#samples in bin) / N_valid; reference mass via
    # uniform-sphere MC of the pdf
    _, u2b = rand_u(5)
    wo_u = warp.square_to_uniform_sphere(u2b)
    pdf_u = np.asarray(bk.pdf_bsdf(p, wi, wo_u))
    zu = np.asarray(wo_u[2])
    bins = np.linspace(0, 1, 9)
    for lo, hi in zip(bins[:-1], bins[1:]):
        m_s = ((woz >= lo) & (woz < hi)).mean()
        sel = (zu >= lo) & (zu < hi)
        m_p = (pdf_u * sel).mean() * 4.0 * np.pi
        assert abs(m_s - m_p) < 0.02 + 0.15 * m_p, (lo, hi, m_s, m_p)


def make_mask_params(nested_kind=BSDF_DIFFUSE, opacity=0.6):
    """Mask-wrapped nested BSDF (bsdfs/mask.cpp), uniform opacity."""
    p = make_params(nested_kind, alpha=0.2)
    p["mask"] = jnp.ones(L, bool)
    p["opacity"] = jnp.full((4, L), opacity)
    return p


def test_mask_sample_split_and_weights():
    """Null-lobe selection frequency must match 1 - opacity-luminance; both
    branches must carry the unbiased weights (nested: w*opacity/prob, null:
    (1-opacity)/(1-prob) — see the mask.cpp deviation note in sample_bsdf)."""
    op = 0.6
    p = make_mask_params(opacity=op)
    wi = fixed_wi()
    u1, u2 = rand_u(11)
    bs = bk.sample_bsdf(p, wi, u1, u2)
    null = np.asarray(bs["null"])
    assert abs(null.mean() - (1.0 - op)) < 0.02
    # null lobe: exact pass-through with weight (1-op)/(1-prob) == 1 here
    w = np.asarray(bs["weight"])
    np.testing.assert_allclose(w[:, null], 1.0, rtol=1e-5)
    wo = np.stack([np.asarray(c) for c in bs["wo"]], 0)
    wi_np = np.stack([np.asarray(c) for c in wi], 0)
    np.testing.assert_allclose(wo[:, null], -wi_np[:, null], rtol=1e-6)
    # nested branch: weight == (eval * opacity) / (pdf * prob) == eval/pdf
    # for uniform opacity (opacity == prob)
    sel = ~null & np.asarray(bs["valid"])
    f = np.asarray(bk.eval_bsdf(p, wi, bs["wo"]))       # includes x opacity
    pdf = np.asarray(bk.pdf_bsdf(p, wi, bs["wo"]))      # includes x prob
    ratio = f[:, sel] / np.maximum(pdf[sel], 1e-12)[None, :]
    np.testing.assert_allclose(ratio, w[:, sel], rtol=1e-3, atol=1e-5)


def test_mask_eval_pdf_scale():
    """eval = nested_eval * opacity; pdf = nested_pdf * opacity-luminance."""
    op = 0.35
    pm = make_mask_params(opacity=op)
    pn = make_params(BSDF_DIFFUSE, alpha=0.2)
    wi = fixed_wi()
    _, u2 = rand_u(4)
    wo = warp.square_to_uniform_sphere(u2)
    fm = np.asarray(bk.eval_bsdf(pm, wi, wo))
    fn = np.asarray(bk.eval_bsdf(pn, wi, wo))
    np.testing.assert_allclose(fm, fn * op, rtol=1e-5)
    gm = np.asarray(bk.pdf_bsdf(pm, wi, wo))
    gn = np.asarray(bk.pdf_bsdf(pn, wi, wo))
    np.testing.assert_allclose(gm, gn * op, rtol=1e-5)


def test_disney_e2e_scene(tmp_path):
    """End-to-end: a disney-material floor under the cbox-style area light
    renders finite, non-black, and darker when metallic goes to 1 with a
    dark base (metals kill the diffuse lobe) — exercises the compiler row
    packing + textured slots + the full path integrator."""
    xml = """<scene version="0.5.0">
      <integrator type="path"><integer name="max_depth" value="3"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <transform name="to_world">
          <lookat origin="0, 1.2, 3" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
          <integer name="width" value="48"/><integer name="height" value="36"/>
        </film>
        <sampler type="independent"><integer name="sample_count" value="8"/></sampler>
      </sensor>
      <shape type="obj">
        <string name="filename" value="floor.obj"/>
        <bsdf type="disney">
          <rgb name="base_color" value="0.7, 0.3, 0.2"/>
          <float name="roughness" value="%s"/>
          <float name="metallic" value="%s"/>
          <float name="clearcoat" value="0.5"/>
          <float name="sheen" value="0.4"/>
        </bsdf>
      </shape>
      <shape type="obj">
        <string name="filename" value="light.obj"/>
        <emitter type="area"><rgb name="radiance" value="6, 6, 6"/></emitter>
      </shape>
    </scene>"""
    floor = ("v -2 0 -2\nv 2 0 -2\nv 2 0 2\nv -2 0 2\n"
             "f 1 3 2\nf 1 4 3\n")
    light = ("v -0.5 2 -0.5\nv 0.5 2 -0.5\nv 0.5 2 0.5\nv -0.5 2 0.5\n"
             "f 1 2 3\nf 1 3 4\n")
    (tmp_path / "floor.obj").write_text(floor)
    (tmp_path / "light.obj").write_text(light)

    from misaki_tpu.scene.compiler import load_and_compile
    from misaki_tpu.render.driver import render

    means = {}
    for tag, rough, met in (("dielectric", "0.4", "0.0"),
                            ("metal", "0.4", "1.0")):
        (tmp_path / "scene.xml").write_text(xml % (rough, met))
        sc = load_and_compile(str(tmp_path / "scene.xml"))
        from misaki_tpu.scene.types import BSDF_DISNEY as K
        assert K in sc.bsdf_kinds
        out = render(sc, seed=0)
        rgb = np.asarray(out["rgb"])
        assert np.isfinite(rgb).all()
        means[tag] = rgb.mean()
    assert means["dielectric"] > 0.01
    # metallic=1 removes diffuse; with a warm base color under white light
    # the specular-only floor reflects less total energy toward the camera
    assert means["metal"] < means["dielectric"]
