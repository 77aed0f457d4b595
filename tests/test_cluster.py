"""Cluster-BVH Pallas intersector tests (accel/cluster.py) — the Embree
replacement's TPU path (reference scene.cpp:216-273). Runs in Pallas
interpret mode on the CPU test backend; hardware execution is exercised by
bench.py and the TPU render flows."""

import numpy as np
import jax.numpy as jnp
import pytest

from misaki_tpu.accel import cluster as cl
from misaki_tpu.accel import traverse as tr
from misaki_tpu.scene.types import Geometry


@pytest.fixture(scope="module")
def soup():
    """Random triangle soup + rays, with a brute-force oracle geometry."""
    rng = np.random.default_rng(7)
    F = 1500
    p0 = rng.uniform(-1, 1, (F, 3)).astype(np.float32)
    e1 = rng.uniform(-0.1, 0.1, (F, 3)).astype(np.float32)
    e2 = rng.uniform(-0.1, 0.1, (F, 3)).astype(np.float32)
    acc = cl.build_clusters(p0, e1, e2)

    L = 600
    o = tuple(jnp.asarray(rng.uniform(-2, 2, L).astype(np.float32)) for _ in range(3))
    dn = rng.normal(size=(L, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    d = tuple(jnp.asarray(dn[:, k]) for k in range(3))

    Fpad = -(-F // 128) * 128
    pad = lambda a: np.pad(a, ((0, Fpad - F), (0, 0)))
    geom = Geometry(
        p0=jnp.asarray(pad(p0).T), e1=jnp.asarray(pad(e1).T),
        e2=jnp.asarray(pad(e2).T), face_tab=jnp.zeros((1, Fpad)),
    )
    return acc, geom, o, d, F, L


def test_build_invariants(soup):
    acc, _, _, _, F, _ = soup
    tri = np.asarray(acc.tri)   # (C, B, 10)
    C = acc.n_clusters
    assert tri.shape[0] == C
    # every face appears exactly once across cluster slots
    fids = tri[:, :, 9].reshape(-1)
    fids = fids[fids >= 0].astype(np.int64)
    assert len(fids) == F
    assert np.array_equal(np.sort(fids), np.arange(F))
    # cluster bounds contain their faces
    b = np.asarray(acc.bounds)
    for ci in range(C):
        m = tri[ci, :, 9] >= 0
        v0 = tri[ci, m, 0:3]
        v1 = v0 + tri[ci, m, 3:6]
        v2 = v0 + tri[ci, m, 6:9]
        lo = np.minimum(np.minimum(v0, v1), v2).min(axis=0)
        hi = np.maximum(np.maximum(v0, v1), v2).max(axis=0)
        assert (b[0:3, ci] <= lo + 1e-5).all()
        assert (b[3:6, ci] >= hi - 1e-5).all()
    # padded clusters are inverted boxes (never hit)
    assert np.all(b[0:3, C:] == np.inf)
    assert np.all(b[3:6, C:] == -np.inf)


def test_closest_hit_matches_brute(soup):
    acc, geom, o, d, F, L = soup
    mint = jnp.full((L,), 1e-4)
    maxt = jnp.full((L,), np.inf)
    res = cl.intersect_clusters(acc, o, d, mint, maxt, interpret=True)
    ref = tr.intersect_brute(geom, o, d, mint, maxt, F)
    rp = np.asarray(ref["prim"])
    cp = np.asarray(res["prim"])
    assert ((rp >= 0) == (cp >= 0)).all()
    both = rp >= 0
    assert both.sum() > 30  # the soup must actually be hit
    ref_t = np.asarray(ref["t"])
    np.testing.assert_allclose(
        np.asarray(res["t"])[both], ref_t[both], rtol=1e-4, atol=1e-5
    )
    assert (cp[both] == rp[both]).mean() > 0.99  # modulo exact-tie winners
    # misses are encoded as t = inf
    assert np.isinf(np.asarray(res["t"])[~both]).all()


def test_fused_face_fetch(soup):
    """The kernel's in-kernel face_tab fetch must return exactly the winning
    face's packed row (zeros on miss)."""
    _, geom, o, d, F, L = soup
    rng = np.random.default_rng(11)
    p0 = np.asarray(geom.p0).T[:F]
    e1 = np.asarray(geom.e1).T[:F]
    e2 = np.asarray(geom.e2).T[:F]
    tab = rng.normal(size=(5, F)).astype(np.float32)
    tab[0] = np.arange(F)  # identity row for an exact check
    acc = cl.build_clusters(p0, e1, e2, face_tab=tab)
    mint = jnp.full((L,), 1e-4)
    maxt = jnp.full((L,), np.inf)
    res = cl.intersect_clusters(acc, o, d, mint, maxt, interpret=True)
    prim = np.asarray(res["prim"])
    fd = np.asarray(res["fd"])
    assert fd.shape == (5, L)
    hitm = prim >= 0
    np.testing.assert_allclose(fd[0][hitm], prim[hitm].astype(np.float32))
    np.testing.assert_allclose(fd[:, hitm], tab[:, prim[hitm]], rtol=1e-6)
    assert (fd[:, ~hitm] == 0).all()


def test_anyhit_matches_brute(soup):
    acc, geom, o, d, F, L = soup
    mint = jnp.full((L,), 1e-4)
    maxt = jnp.full((L,), 1.5)
    occ = np.asarray(cl.ray_test_clusters(acc, o, d, mint, maxt, interpret=True))
    ref = np.asarray(tr.ray_test_brute(geom, o, d, mint, maxt, F))
    assert (occ == ref).all()


def test_finite_maxt_clips(soup):
    acc, _, o, d, _, L = soup
    mint = jnp.full((L,), 1e-4)
    res_far = cl.intersect_clusters(
        acc, o, d, mint, jnp.full((L,), np.inf), interpret=True
    )
    tcap = 0.8
    res_near = cl.intersect_clusters(
        acc, o, d, mint, jnp.full((L,), tcap), interpret=True
    )
    t_far = np.asarray(res_far["t"])
    t_near = np.asarray(res_near["t"])
    keep = t_far <= tcap
    np.testing.assert_allclose(t_near[keep], t_far[keep], rtol=1e-5)
    assert np.isinf(t_near[~keep]).all()


def test_scene_dispatch_builds_cluster_accel():
    """compile_scene must attach a cluster accel for large scenes and an
    empty one below the brute threshold."""
    from misaki_tpu.scene.compiler import load_and_compile

    scene = load_and_compile(
        "/root/reference/assets/cbox/scene.xml", spp=1, width=8, height=8
    )
    assert scene.cluster.n_clusters == 0  # 36 faces -> brute

    bunny = load_and_compile(
        "/root/reference/assets/bunny/scene.xml", spp=1, width=8, height=8
    )
    assert bunny.cluster.n_clusters > 0
    assert bunny.cluster.tri.shape[0] == bunny.cluster.n_clusters


def test_swizzle_path_matches_unswizzled(soup):
    """The pixel-tile coherence swizzle (production TPU data path: traverse.py
    always passes image_cols/spp) must be a pure relayout — identical results
    to the unswizzled call, including the in-kernel face-row fetch."""
    acc, geom, o, d, F, L = soup
    # image-shaped wavefront: 40 rows x 15 px x spp=1 -> L = 600 lanes
    image_cols, spp = 15, 1
    mint = jnp.full((L,), 1e-4)
    maxt = jnp.full((L,), jnp.inf)
    plain = cl.intersect_clusters(acc, o, d, mint, maxt, interpret=True)
    swz = cl.intersect_clusters(
        acc, o, d, mint, maxt, interpret=True, image_cols=image_cols, spp=spp
    )
    assert np.array_equal(np.asarray(plain["prim"]), np.asarray(swz["prim"]))
    np.testing.assert_allclose(
        np.asarray(plain["t"]), np.asarray(swz["t"]), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(plain["fd"]), np.asarray(swz["fd"])
    )
    occ_p = np.asarray(cl.ray_test_clusters(acc, o, d, mint, jnp.full((L,), 1.5),
                                            interpret=True))
    occ_s = np.asarray(cl.ray_test_clusters(acc, o, d, mint, jnp.full((L,), 1.5),
                                            interpret=True,
                                            image_cols=image_cols, spp=spp))
    assert np.array_equal(occ_p, occ_s)


def test_raw_tile_major_path_matches(soup):
    """raw=True returns tile-major results + the relayout handle; callers
    shade in tile order and inverse-relayout their own outputs — the manual
    round-trip must reproduce the standard path exactly (the debug frame's
    relayout-elimination depends on it)."""
    import jax.numpy as jnp

    acc, geom, o, d, F, L = soup
    image_cols, spp = 15, 1
    mint = jnp.full((L,), 1e-4)
    maxt = jnp.full((L,), jnp.inf)
    plain = cl.intersect_clusters(
        acc, o, d, mint, maxt, interpret=True, image_cols=image_cols, spp=spp
    )
    raw = cl.intersect_clusters(
        acc, o, d, mint, maxt, interpret=True, image_cols=image_cols,
        spp=spp, raw=True,
    )
    sw = raw["sw"]
    assert sw is not None and raw["n_lanes"] == L
    rows = jnp.stack([raw["t"], raw["u"], raw["v"],
                      raw["prim"].astype(jnp.float32)], axis=0)
    (back,) = sw.inv_multi([rows[:, : sw.Lp]], L)
    np.testing.assert_array_equal(
        np.asarray(back[3]).astype(np.int32), np.asarray(plain["prim"])
    )
    t_back = np.where(np.asarray(back[3]) >= 0, np.asarray(back[0]), np.inf)
    np.testing.assert_allclose(t_back, np.asarray(plain["t"]), rtol=1e-6)
    (fd_back,) = sw.inv_multi([raw["fd"][:, : sw.Lp]], L)
    np.testing.assert_array_equal(np.asarray(fd_back),
                                  np.asarray(plain["fd"]))


def test_sort_reorder_path_matches_plain(soup):
    """The secondary-cast Morton ray sort (coherent=False) must be a pure
    permutation round-trip — identical results to the unsorted call, with
    masked (maxt < 0) lanes compacted but still returned in lane order."""
    acc, geom, o, d, F, L = soup
    mint = jnp.full((L,), 1e-4)
    maxt = jnp.full((L,), jnp.inf)
    # mask a third of the lanes dead, like a bounce wavefront
    dead = np.zeros(L, bool)
    dead[::3] = True
    maxt_m = jnp.where(jnp.asarray(dead), -1.0, maxt)
    plain = cl.intersect_clusters(acc, o, d, mint, maxt_m, interpret=True)
    srt = cl.intersect_clusters(acc, o, d, mint, maxt_m, interpret=True,
                                coherent=False)
    assert np.array_equal(np.asarray(plain["prim"]), np.asarray(srt["prim"]))
    np.testing.assert_allclose(
        np.asarray(plain["t"]), np.asarray(srt["t"]), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(plain["fd"]),
                                  np.asarray(srt["fd"]))
    assert np.asarray(srt["prim"])[dead].max() < 0  # dead lanes stay misses
    occ_p = np.asarray(cl.ray_test_clusters(acc, o, d, mint,
                                            jnp.full((L,), 1.5),
                                            interpret=True))
    occ_s = np.asarray(cl.ray_test_clusters(acc, o, d, mint,
                                            jnp.full((L,), 1.5),
                                            interpret=True, coherent=False))
    assert np.array_equal(occ_p, occ_s)
