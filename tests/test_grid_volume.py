"""Grid-volume (heterogeneous medium) tests — reference volume.h declares
the Volume::eval interface and ships only constant3d; the grid volume +
fixed-step heterogeneous transmittance/distance sampling generalize it
(render/medium.py grid_density / transmittance_ray / sample_distance)."""

import numpy as np
import jax.numpy as jnp
import pytest

from misaki_tpu.scene.compiler import load_and_compile
from misaki_tpu.render import medium as med
from misaki_tpu.render.driver import render

CUBE_OBJ = """
v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0
v 0 0 1\nv 1 0 1\nv 1 1 1\nv 0 1 1
f 1 3 2\nf 1 4 3
f 5 6 7\nf 5 7 8
f 1 2 6\nf 1 6 5
f 2 3 7\nf 2 7 6
f 3 4 8\nf 3 8 7
f 4 1 5\nf 4 5 8
"""

SCENE_XML = """<scene version="0.5.0">
  <integrator type="volpath"><integer name="max_depth" value="4"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <transform name="to_world">
      <lookat origin="0.5, 0.5, -2.5" target="0.5, 0.5, 0.5" up="0, 1, 0"/>
    </transform>
    <film type="hdrfilm">
      <integer name="width" value="32"/><integer name="height" value="24"/>
    </film>
    <sampler type="independent"><integer name="sample_count" value="4"/></sampler>
  </sensor>
  <emitter type="constant"><rgb name="radiance" value="1, 1, 1"/></emitter>
  <shape type="obj">
    <string name="filename" value="cube.obj"/>
    <bsdf type="null"/>
    <medium name="interior" type="heterogeneous">
      <rgb name="sigma_a" value="%(sa)s, %(sa)s, %(sa)s"/>
      <rgb name="sigma_s" value="0.0, 0.0, 0.0"/>
      <volume name="density" type="gridvolume">
        <string name="filename" value="grid.npy"/>
      </volume>
    </medium>
  </shape>
</scene>"""


@pytest.fixture(scope="module")
def slab_scene(tmp_path_factory):
    """Unit cube with density = x (linear gradient along +x), sigma_a = 4."""
    d = tmp_path_factory.mktemp("vol")
    (d / "cube.obj").write_text(CUBE_OBJ)
    W = H = D = 16
    x = (np.arange(W) + 0.5) / W
    grid = np.broadcast_to(x[None, None, :], (D, H, W)).astype(np.float32)
    np.save(d / "grid.npy", grid)
    (d / "scene.xml").write_text(SCENE_XML % {"sa": "4.0"})
    return load_and_compile(str(d / "scene.xml"))


def test_grid_registered(slab_scene):
    sc = slab_scene
    assert len(sc.volume_meta) == 1
    off, W, H, D, m12 = sc.volume_meta[0]
    assert (W, H, D) == (16, 16, 16)
    assert int(np.asarray(sc.media.density_vol)[0]) == 0


def test_grid_density_trilinear(slab_scene):
    """density(x, y, z) == x for the gradient grid (within the clamped
    border half-texel)."""
    sc = slab_scene
    L = 64
    xs = np.linspace(0.05, 0.95, L).astype(np.float32)
    p = (jnp.asarray(xs), jnp.full(L, 0.5), jnp.full(L, 0.5))
    vol_ids = jnp.zeros(L, jnp.int32)
    rho = np.asarray(med.grid_density(sc, vol_ids, p))
    np.testing.assert_allclose(rho, np.clip(xs, 0.5 / 16, 1 - 0.5 / 16),
                               atol=2e-2)
    # outside the bbox -> 0; vol_id -1 -> 1
    p_out = (jnp.full(L, 2.0), jnp.full(L, 0.5), jnp.full(L, 0.5))
    assert np.asarray(med.grid_density(sc, vol_ids, p_out)).max() == 0.0
    assert np.allclose(
        np.asarray(med.grid_density(sc, jnp.full(L, -1, jnp.int32), p)), 1.0
    )


def test_hetero_transmittance_matches_analytic(slab_scene):
    """Ray along +x through the gradient slab: tau = sigma_a * int_0^1 x dx
    = 4 * 0.5 = 2 -> T = exp(-2), within the fixed-step discretization
    tolerance."""
    sc = slab_scene
    L = 8
    o = (jnp.zeros(L), jnp.full(L, 0.5), jnp.full(L, 0.5))
    d = (jnp.ones(L), jnp.zeros(L), jnp.zeros(L))
    med_ids = jnp.zeros(L, jnp.int32)
    wl = jnp.broadcast_to(jnp.asarray([500.0, 550.0, 600.0, 650.0])[:, None],
                          (4, L))
    mp = med.fetch_medium(sc, med_ids, wl)
    tr = np.asarray(med.transmittance_ray(sc, mp, med_ids, o, d,
                                          jnp.full(L, 1.0)))
    np.testing.assert_allclose(tr, np.exp(-2.0), rtol=0.05)


def test_hetero_distance_sampling_consistent(slab_scene):
    """E[scatter] must equal 1 - E[T] for the marched medium (the sampled
    free-flight CDF and the marched transmittance describe the same
    sigma(t)); the sampled t distribution must skew toward the dense side."""
    sc = slab_scene
    L = 4096
    rng = np.random.default_rng(5)
    o = (jnp.zeros(L), jnp.full(L, 0.5), jnp.full(L, 0.5))
    d = (jnp.ones(L), jnp.zeros(L), jnp.zeros(L))
    med_ids = jnp.zeros(L, jnp.int32)
    wl = jnp.broadcast_to(jnp.asarray([500.0, 550.0, 600.0, 650.0])[:, None],
                          (4, L))
    mp = med.fetch_medium(sc, med_ids, wl)
    u1 = jnp.asarray(rng.uniform(size=L).astype(np.float32))
    ms = med.sample_distance(mp, jnp.zeros(L, jnp.int32), u1,
                             jnp.full(L, 1.0), scene=sc, o=o, d=d,
                             med_ids=med_ids)
    scatter = np.asarray(ms["scatter"])
    assert abs(scatter.mean() - (1.0 - np.exp(-2.0))) < 0.03
    t = np.asarray(ms["t"])[scatter]
    # density rises with x: the median scatter distance must sit past the
    # halfway point of a homogeneous medium with the same mean extinction
    assert np.median(t) > 0.5


def test_hetero_sample_distance_returns_scatter_density(slab_scene):
    """sample_distance must report rho(x_scatter) (advisor r4 #1): the
    in-scatter weight is sigma_s * rho / pdf and the pdf already contains
    rho, so omitting it biases contributions by 1/rho. For the gradient
    slab rho(x) == x at the scatter point."""
    sc = slab_scene
    L = 4096
    rng = np.random.default_rng(11)
    o = (jnp.zeros(L), jnp.full(L, 0.5), jnp.full(L, 0.5))
    d = (jnp.ones(L), jnp.zeros(L), jnp.zeros(L))
    med_ids = jnp.zeros(L, jnp.int32)
    wl = jnp.broadcast_to(jnp.asarray([500.0, 550.0, 600.0, 650.0])[:, None],
                          (4, L))
    mp = med.fetch_medium(sc, med_ids, wl)
    u1 = jnp.asarray(rng.uniform(size=L).astype(np.float32))
    ms = med.sample_distance(mp, jnp.zeros(L, jnp.int32), u1,
                             jnp.full(L, 1.0), scene=sc, o=o, d=d,
                             med_ids=med_ids)
    scatter = np.asarray(ms["scatter"])
    assert scatter.any()
    t = np.asarray(ms["t"])[scatter]
    rho = np.asarray(ms["rho"])[scatter]
    # rho(x) == x within the march's piecewise-constant step + border clamp
    np.testing.assert_allclose(rho, np.clip(t, 0.5 / 16, 1 - 0.5 / 16),
                               atol=0.08)
    # homogeneous lanes (med_id -1 has no grid): rho == 1
    ms_h = med.sample_distance(mp, jnp.zeros(L, jnp.int32), u1,
                               jnp.full(L, 1.0))
    assert np.allclose(np.asarray(ms_h["rho"]), 1.0)


def test_hetero_scattering_energy_bounded(tmp_path_factory):
    """Purely scattering gradient slab under a unit constant env: with the
    rho-correct in-scatter weight the interior cannot exceed the env level
    (scattering only redirects energy); the 1/rho bug inflated thin-density
    scatter events by up to 16x (advisor r4 #1)."""
    d = tmp_path_factory.mktemp("vol_s")
    (d / "cube.obj").write_text(CUBE_OBJ)
    W = H = D = 16
    x = (np.arange(W) + 0.5) / W
    grid = np.broadcast_to(x[None, None, :], (D, H, W)).astype(np.float32)
    np.save(d / "grid.npy", grid)
    xml = SCENE_XML % {"sa": "0.0"}
    xml = xml.replace('value="0.0, 0.0, 0.0"', 'value="4.0, 4.0, 4.0"')
    (d / "scene.xml").write_text(xml)
    sc = load_and_compile(str(d / "scene.xml"))
    out = render(sc, seed=0)
    rgb = np.asarray(out["rgb"])
    assert np.isfinite(rgb).all()
    lum = rgb.mean(axis=-1)
    # energy conservation: nothing in a non-emissive scattering medium can
    # exceed the env radiance by more than the tonemap/noise margin
    assert lum.max() < 1.3, lum.max()
    assert lum.mean() > 0.3  # but light does get through


def test_hetero_slab_renders(slab_scene):
    out = render(slab_scene, seed=0)
    rgb = np.asarray(out["rgb"])
    assert np.isfinite(rgb).all()
    assert rgb.mean() > 0.05  # constant env shines through partially
    # absorption-only slab: columns covered by the cube (attenuated below
    # the env level ~1.0) must show the density gradient — one interior
    # edge much darker than the other
    lum = rgb.mean(axis=-1)
    col = lum.mean(axis=0)
    interior = np.where(col < 0.9)[0]
    assert len(interior) > 6  # the slab actually covers part of the frame
    a, b = col[interior].min(), col[interior].max()
    # measured profile: ~0.38 on the dense side vs ~0.84 on the thin side
    assert (b - a) / b > 0.3, (a, b)
    # and the dark region must hug ONE edge of the slab (a gradient, not a
    # centered lump): the darkest column sits in the outer third
    k = int(np.argmin(col[interior]))
    assert k < len(interior) / 3 or k > 2 * len(interior) / 3, k
