"""BVH correctness vs. brute-force O(N) intersection (SURVEY.md section 4:
'BVH correctness vs. brute-force on small meshes')."""

import jax.numpy as jnp
import numpy as np

from misaki_tpu.accel import traverse
from misaki_tpu.accel.build import build_bvh
from misaki_tpu.scene import procedural
from misaki_tpu.scene.types import Geometry


def _geometry_from_mesh(mesh):
    P = mesh["positions"].astype(np.float64)
    F = len(P)
    p0 = P[:, 0]
    e1 = P[:, 1] - P[:, 0]
    e2 = P[:, 2] - P[:, 0]
    Fpad = max(
        traverse.FACE_BLOCK, -(-F // traverse.FACE_BLOCK) * traverse.FACE_BLOCK
    )

    def rows(a):
        out = np.zeros((3, Fpad), np.float32)
        out[:, :F] = a.T
        return out

    from misaki_tpu.scene.types import N_FACE_COLS

    face_tab = np.zeros((N_FACE_COLS, Fpad), np.float32)
    geom = Geometry(p0=rows(p0), e1=rows(e1), e2=rows(e2), face_tab=face_tab)
    return geom, F, p0, e1, e2


def _random_rays(n, rs):
    o = rs.normal(size=(n, 3)) * 2.0
    target = rs.normal(size=(n, 3)) * 0.3
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t3 = lambda a: tuple(jnp.asarray(a[:, i], jnp.float32) for i in range(3))
    return t3(o), t3(d)


def test_bvh_matches_brute_force():
    mesh = procedural.sphere_standin(1.0, (0, 0, 0), sub=4)  # 5120 tris
    geom, F, p0, e1, e2 = _geometry_from_mesh(mesh)
    bvh = build_bvh(p0, e1, e2, force=True)
    assert bvh.node_lo.shape[0] > 1

    rs = np.random.default_rng(0)
    o, d = _random_rays(512, rs)
    mint = jnp.full(512, 1e-4)
    maxt = jnp.full(512, jnp.inf)

    brute = traverse.intersect_brute(geom, o, d, mint, maxt, F)
    fast = traverse.intersect_bvh(bvh, geom, o, d, mint, maxt)

    t_b = np.asarray(brute["t"])
    t_f = np.asarray(fast["t"])
    hit_b = np.asarray(brute["prim"]) >= 0
    hit_f = np.asarray(fast["prim"]) >= 0
    assert (hit_b == hit_f).all()
    ok = hit_b
    assert np.allclose(t_b[ok], t_f[ok], rtol=1e-4), np.abs(t_b[ok] - t_f[ok]).max()
    assert ok.sum() > 100  # sanity: rays actually hit


def test_bvh_any_hit_matches():
    mesh = procedural.sphere_standin(1.0, (0, 0, 0), sub=3)
    geom, F, p0, e1, e2 = _geometry_from_mesh(mesh)
    bvh = build_bvh(p0, e1, e2, force=True)

    rs = np.random.default_rng(1)
    o, d = _random_rays(512, rs)
    mint = jnp.full(512, 1e-4)
    maxt = jnp.full(512, 10.0)
    occ_b = np.asarray(traverse.ray_test_brute(geom, o, d, mint, maxt, F))
    occ_f = np.asarray(traverse.ray_test_bvh(bvh, geom, o, d, mint, maxt))
    assert (occ_b == occ_f).all()


def test_brute_respects_maxt():
    mesh = procedural.rectangle()  # z=0 plane
    geom, F, *_ = _geometry_from_mesh(mesh)
    t3 = lambda rows: tuple(jnp.asarray(r, jnp.float32) for r in rows)
    o = t3([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]])
    d = t3([[0.0, 0.0], [0.0, 0.0], [-1.0, -1.0]])
    mint = jnp.asarray([0.0, 0.0])
    maxt = jnp.asarray([2.0, 0.5])  # second ray stops before the plane
    res = traverse.intersect_brute(geom, o, d, mint, maxt, F)
    assert int(res["prim"][0]) >= 0
    assert int(res["prim"][1]) == -1


def test_large_mesh_bvh_builds():
    mesh = procedural.bunny_standin()
    assert len(mesh["positions"]) >= 20000
    geom, F, p0, e1, e2 = _geometry_from_mesh(mesh)
    bvh = build_bvh(p0, e1, e2)
    assert bvh.node_lo.shape[0] > 1000
    rs = np.random.default_rng(2)
    o, d = _random_rays(64, rs)
    mint = jnp.full(64, 1e-4)
    maxt = jnp.full(64, jnp.inf)
    brute = traverse.intersect_brute(geom, o, d, mint, maxt, F)
    fast = traverse.intersect_bvh(bvh, geom, o, d, mint, maxt)
    assert (np.asarray(brute["prim"] >= 0) == np.asarray(fast["prim"] >= 0)).all()
    ok = np.asarray(brute["prim"]) >= 0
    assert np.allclose(
        np.asarray(brute["t"])[ok], np.asarray(fast["t"])[ok], rtol=1e-4
    )
