"""Differentiability (finite-difference validation) and multi-chip sharding
tests (BASELINE.md: pixel-gradient allclose vs. finite differences; >= 85%
scaling efficiency is measured on hardware, correctness here on the virtual
8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from misaki_tpu.render import film as film_mod
from misaki_tpu.render.driver import render
from misaki_tpu.scene.compiler import compile_scene, load_and_compile
from misaki_tpu.scene.loader import load_string

CBOX = "/root/reference/assets/cbox/scene.xml"


def _render_rgb_with_params(scene, mat_params, seed=0, depth_cap=2):
    scene2 = scene.replace(materials=type(scene.materials)(params=mat_params))
    out = render(scene2, seed=seed, chunk_size=1 << 14, depth_cap=depth_cap)
    return out["rgb"]


@pytest.fixture(scope="module")
def cbox_tiny():
    return load_and_compile(CBOX, spp=8, width=16, height=12)


def test_reflectance_gradient_finite_difference(cbox_tiny):
    """d(mean image) / d(material sigmoid coeffs) vs. central differences.

    Detached sampling makes the estimator's gradient exactly the gradient of
    the estimate for a FIXED random stream, so FD on the same seed must agree
    tightly (not just statistically)."""
    scene = cbox_tiny
    coeff0 = jnp.asarray(scene.materials.params)

    def f(c):
        return jnp.mean(_render_rgb_with_params(scene, c))

    g = jax.jit(jax.grad(f))(coeff0)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0

    f = jax.jit(f)
    # Directional-derivative FD check over the top-8 gradient entries.
    #
    # Step-size calibration: params rows 10..48 are spectral slots whose
    # sigmoid coefficients live in the *nanometer* domain (srgb.h:8-19), so
    # c0 multiplies lambda^2 ~ 3.6e5 and c1 multiplies lambda ~ 6e2. The FD
    # step must be divided by that lever arm or the sigmoid saturates and the
    # secant measures a 0->1 jump instead of the local slope. The floor on
    # eps is the bf16 compute in the hot path (~1.3e-3 output granularity);
    # a single-coordinate secant at the usable eps has O(30%) quantization
    # noise, so we test the *directional* derivative along the top-k entries
    # instead — signal adds linearly across coordinates, the quantization
    # noise does not.
    flat = np.abs(g).reshape(-1)
    order = np.argsort(flat)[::-1][:8]
    dc = np.zeros_like(g)
    for idx in order:
        i, j = np.unravel_index(idx, g.shape)
        off = (i - 10) % 13 if 10 <= i < 49 else None
        lever = {1: 600.0**2, 2: 600.0}.get(off, 1.0)
        dc[i, j] = np.sign(g[i, j]) * 0.6 / lever
    expected = float(np.sum(g * dc))
    fd = (float(f(coeff0 + dc)) - float(f(coeff0 - dc))) / 2.0
    assert expected > 0
    assert abs(fd - expected) <= 0.1 * max(abs(fd), abs(expected)), (
        f"directional fd={fd} grad.dc={expected}"
    )


def test_emitter_gradient_flows(cbox_tiny):
    """Gradients w.r.t. emitter radiance curves must be nonzero and positive
    for a brightness loss."""
    from dataclasses import replace as dc_replace

    scene = cbox_tiny
    reg0 = jnp.asarray(scene.emitters.rad_curve)

    def f(reg):
        scene2 = scene.replace(
            emitters=dc_replace(scene.emitters, rad_curve=reg)
        )
        out = render(scene2, seed=0, chunk_size=1 << 13, depth_cap=2)
        return jnp.mean(out["rgb"])

    g = np.asarray(jax.jit(jax.grad(f))(reg0))
    assert np.isfinite(g).all()
    # The cbox area light's d65 row must carry positive gradient
    assert g.max() > 0


def test_sharded_render_matches_single_device(cbox_tiny):
    """shard_map over the 8-device CPU mesh must reproduce the single-chip
    film. Lane seeding is global, so samples are identical by construction —
    but XLA compiles the shard_map program separately and may fuse/FMA
    differently, which can flip an fp-sensitive branch (BVH edge tie, RR
    threshold) on a handful of lanes. Verified empirically: ~3/1536 lanes
    differ between an identical 1-device shard_map and the plain jit of the
    same function. So assert near-total agreement (catches any real
    partitioning/seeding bug, which would corrupt whole device blocks) while
    tolerating isolated sample-level flips."""
    from misaki_tpu.parallel.sharding import make_mesh, render_sharded

    scene = cbox_tiny
    mesh = make_mesh(8)
    film_multi = np.asarray(render_sharded(mesh, scene, seed=5, depth_cap=3))

    out = render(scene, seed=5, chunk_size=1 << 20, depth_cap=3)
    film_single = np.asarray(out["film"])
    mismatched = ~np.isclose(film_multi, film_single, rtol=1e-3, atol=1e-5)
    frac = mismatched.mean()
    # budget ~2.5x the empirically observed 0.2% of fp-sensitive lane flips;
    # broader corruption (a bug touching >1 in 200 texels) must fail
    assert frac < 0.005, f"{mismatched.sum()} / {mismatched.size} texels differ"
    # ...and the mismatched texels themselves must stay sane in magnitude
    # (an isolated branch flip changes a texel by one sample's contribution,
    # not by orders of magnitude)
    if mismatched.any():
        scale = max(float(np.abs(film_single).max()), 1e-6)
        max_err = float(np.abs(film_multi - film_single)[mismatched].max())
        assert max_err <= 0.5 * scale, f"mismatch magnitude {max_err} vs scale {scale}"
    # aggregate radiance must agree tightly (a block-level bug would not)
    assert np.allclose(
        film_multi.sum(axis=(0, 1)), film_single.sum(axis=(0, 1)), rtol=1e-3
    )


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_2d_host_chip_mesh_matches_1d(cbox_tiny):
    """render_sharded_2d over a (2, 4) host-chip mesh must reproduce the 1D
    8-device mesh image (the flattened lane split is identical)."""
    import jax
    from jax.sharding import Mesh
    from misaki_tpu.parallel.sharding import render_sharded, render_sharded_2d

    devices = np.asarray(jax.devices("cpu")[:8])
    mesh1d = Mesh(devices, ("wavefront",))
    mesh2d = Mesh(devices.reshape(2, 4), ("host", "chip"))
    f1 = np.asarray(render_sharded(mesh1d, cbox_tiny, seed=2, depth_cap=2))
    f2 = np.asarray(render_sharded_2d(mesh2d, cbox_tiny, seed=2, depth_cap=2))
    mism = ~np.isclose(f1, f2, rtol=1e-3, atol=1e-5)
    assert mism.mean() < 0.005, f"{mism.sum()}/{mism.size} texels differ"
