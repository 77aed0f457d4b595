#!/usr/bin/env python
"""Stage-split profile of ONE cluster-BVH frame (judge r4 ask #1: profile
FIRST, then fix — split cull/argsort XLA time vs Pallas kernel time vs
swizzle relayout vs dispatch floor for the bunny intersection benchmark).

Methodology (this tunneled backend has a ~25 ms dispatch+sync floor, so
per-rep hard syncs would swamp millisecond stages): each stage is jitted,
REPS calls are queued back-to-back with a varying dummy operand (no two
calls can be served from a cached result), then ONE 4-byte scalar transfer
drains the queue. The same measurement of an empty jitted program gives the
floor, which is subtracted once. Writes PROFILE_BUNNY.md when --write is
passed.

Usage: python tools/profile_cluster_frame.py [scene.xml] [--write]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPS = int(os.environ.get("PROFILE_REPS", 20))


def queue_time(fn, reps=REPS):
    """Queue `reps` async dispatches (seed-varied), one hard sync at the end.
    Returns seconds per call INCLUDING the per-call device time but
    amortizing the single sync across all reps."""
    fn(0).block_until_ready()          # compile
    float(fn(1))                       # warm sync path
    t0 = time.perf_counter()
    out = None
    for i in range(reps):
        out = fn(i + 2)
    float(out)                         # 4-byte transfer = true sync
    return (time.perf_counter() - t0) / reps


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?",
                    default="/root/reference/assets/bunny/scene.xml")
    ap.add_argument("--write", action="store_true",
                    help="write PROFILE_BUNNY.md at the repo root")
    args = ap.parse_args()

    from misaki_tpu.scene.compiler import load_and_compile
    from misaki_tpu.render import driver
    from misaki_tpu.accel import cluster as cl

    scene = load_and_compile(args.scene)
    W, H, spp = scene.film_width, scene.film_height, scene.spp
    L = W * H * spp
    acc = scene.cluster
    print(f"{args.scene}: {scene.n_faces} faces, C={acc.n_clusters}, "
          f"L={L} lanes, backend={jax.default_backend()}")

    lane = jnp.arange(L, dtype=jnp.uint32)
    ray, _, _ = jax.jit(
        lambda: driver.primary_rays(scene, lane, jnp.uint32(0)))()
    ray = jax.tree_util.tree_map(lambda x: x.block_until_ready(), ray)

    # precomputed stage inputs (device-resident)
    rays_packed, _, Lp, sw = cl._pack_rays(
        ray["o"], ray["d"], ray["mint"], ray["maxt"],
        image_cols=W * spp, spp=spp,
    )
    rays_packed = rays_packed.block_until_ready()
    bounds = jnp.asarray(acc.bounds)
    order, keys, count, sbounds = jax.jit(
        lambda r: cl._cull_order(r, bounds, acc.n_clusters))(rays_packed)
    order = order.block_until_ready()

    # visit statistics — what the schedule asks of the kernel
    cnt = np.asarray(count).reshape(-1)
    full = cnt < 0
    visits = np.where(full, acc.n_clusters, cnt)
    vis_line = (f"tiles={len(cnt)} full-scan={int(full.sum())} "
                f"visits mean={visits.mean():.1f} "
                f"p50={np.median(visits):.0f} "
                f"p90={np.percentile(visits, 90):.0f} max={visits.max()}")
    print(vis_line)

    # ---- stages ----
    tiny = jnp.zeros((8, 128))

    @jax.jit
    def st_floor(s):
        return jnp.sum(tiny) + s

    @jax.jit
    def st_primary(s):
        r, _, _ = driver.primary_rays(scene, lane, jnp.uint32(0))
        return jnp.sum(r["o"][0]) + s

    @jax.jit
    def st_pack(s):
        r, _, _, _ = cl._pack_rays(
            (ray["o"][0] + s * 1e-12, ray["o"][1], ray["o"][2]),
            ray["d"], ray["mint"], ray["maxt"],
            image_cols=W * spp, spp=spp)
        return jnp.sum(r[0])

    @jax.jit
    def st_cull(s):
        o, k, c, sb = cl._cull_order(rays_packed + s * 1e-12, bounds,
                                     acc.n_clusters)
        return (jnp.sum(k[:, 0, 0]) + jnp.sum(c).astype(jnp.float32)
                + jnp.sum(sb[:, 0, 0]))

    tri = jnp.asarray(acc.tri)
    tab = jnp.asarray(acc.tab)

    def kernel_only(rp, odr, ky, cn, sb):
        from functools import partial
        from jax.experimental import pallas as pl  # noqa: F401

        plm, pltpu, grid, in_specs, sched_specs = cl._common_specs(acc, Lp)
        T = tab.shape[1]
        out, face = plm.pallas_call(
            partial(cl._closest_kernel, acc.n_clusters, cl._gate_policy(True)),
            out_shape=(
                jax.ShapeDtypeStruct((8, Lp), jnp.float32),
                jax.ShapeDtypeStruct((T, Lp), jnp.float32),
            ),
            grid=grid,
            in_specs=in_specs
            + [plm.BlockSpec(memory_space=pltpu.VMEM)]
            + sched_specs,
            out_specs=(
                plm.BlockSpec((8, cl.R_TILE), lambda i: (0, i),
                              memory_space=pltpu.VMEM),
                plm.BlockSpec((T, cl.R_TILE), lambda i: (0, i),
                              memory_space=pltpu.VMEM),
            ),
            compiler_params=cl._compiler_params(),
        )(rp, tri, tab, odr, ky, cn, sb)
        return out

    @jax.jit
    def st_kernel(s):
        out = kernel_only(rays_packed + s * 1e-12, order, keys, count,
                          sbounds)
        return jnp.sum(out[0])

    # kernel decomposition: the same launch with an EMPTY schedule (count=0
    # everywhere -> the while_loop exits immediately) isolates the pure
    # per-program grid cost; the difference to st_kernel is the true
    # per-visit MT/slab work. Tells whether to grow R_TILE (program-bound)
    # or shrink issued pairs (visit-bound).
    count0 = jnp.zeros_like(count)

    @jax.jit
    def st_kernel_novisit(s):
        out = kernel_only(rays_packed + s * 1e-12, order, keys, count0,
                          sbounds)
        return jnp.sum(out[0])

    @jax.jit
    def st_unswizzle(s):
        res = sw.inv_cols(rays_packed[:4] + s * 1e-12, L)
        return jnp.sum(res[0])

    @jax.jit
    def st_intersect(s):
        res = cl.intersect_clusters(
            acc, (ray["o"][0] + s * 1e-12, ray["o"][1], ray["o"][2]),
            ray["d"], ray["mint"], ray["maxt"],
            image_cols=W * spp, spp=spp)
        return jnp.sum(jnp.where(jnp.isfinite(res["t"]), res["t"], 0.0))

    @jax.jit
    def st_frame(s):
        _, rgb, _ = driver.render_frame_single(
            scene, L, jnp.uint32(s), L, 4)
        return jnp.sum(rgb)

    rows = []
    for name, fn in (
        ("dispatch floor (empty jit)", st_floor),
        ("primary_rays", st_primary),
        ("pack+swizzle fwd", st_pack),
        ("cull+argsort (XLA)", st_cull),
        ("pallas closest kernel", st_kernel),
        ("kernel, empty schedule", st_kernel_novisit),
        ("inverse swizzle (4+T rows)", st_unswizzle),
        ("intersect_clusters (e2e)", st_intersect),
        ("full debug frame", st_frame),
    ):
        try:
            dt = queue_time(fn)
            rows.append((name, dt))
            print(f"{name:30s} {dt * 1e3:9.3f} ms")
        except Exception as e:
            rows.append((name, None))
            print(f"{name:30s} FAILED: {type(e).__name__}: {e}")

    floor = rows[0][1] or 0.0
    frame_t = dict(rows).get("full debug frame")
    if frame_t:
        print(f"\nframe net of floor: {(frame_t - floor) * 1e3:.3f} ms "
              f"-> {L / (frame_t - floor) / 1e6:.1f} M rays/s device-side; "
              f"{L / frame_t / 1e6:.1f} M rays/s wall")

    if args.write:
        lines = [
            "# PROFILE_BUNNY — cluster-frame stage split",
            "",
            f"Scene `{args.scene}` — {scene.n_faces} faces, "
            f"C={acc.n_clusters} clusters, L={L} rays, "
            f"backend={jax.default_backend()}, "
            f"R_TILE={cl.R_TILE}, CLUSTER_FACES={cl.CLUSTER_FACES}, "
            f"MAX_VISITS={cl.MAX_VISITS}.",
            "",
            f"Schedule: {vis_line}",
            "",
            "Measured with queued async dispatches + one scalar sync "
            f"(REPS={REPS}); the dispatch floor row is the same "
            "measurement of an empty program.",
            "",
            "| stage | ms/call |",
            "|---|---|",
        ]
        for name, dt in rows:
            lines.append(
                f"| {name} | "
                f"{'%.3f' % (dt * 1e3) if dt is not None else 'FAILED'} |")
        if frame_t:
            lines += [
                "",
                f"Full frame net of dispatch floor: "
                f"{(frame_t - floor) * 1e3:.3f} ms = "
                f"{L / (frame_t - floor) / 1e6:.1f} M rays/s device-side "
                f"({L / frame_t / 1e6:.1f} M wall).",
            ]
        out_path = os.path.join(os.path.dirname(__file__), "..",
                                "PROFILE_BUNNY.md")
        with open(out_path, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {os.path.abspath(out_path)}")


if __name__ == "__main__":
    main()
