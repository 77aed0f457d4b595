#!/usr/bin/env python
"""Microbench for the cluster-BVH intersector on the bunny scene: times the
intersect + ray_test kernels alone (closest / anyhit), plus visit-count
statistics from the host-side cull, so kernel changes can be evaluated in
seconds instead of via the full bench."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from misaki_tpu.scene.compiler import load_and_compile
    from misaki_tpu.render import driver
    from misaki_tpu.accel import cluster as cl

    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/assets/bunny/scene.xml"
    scene = load_and_compile(path)
    W, H, spp = scene.film_width, scene.film_height, scene.spp
    L = W * H * spp
    print(f"{path}: {scene.n_faces} faces, C={scene.cluster.n_clusters}, "
          f"L={L} lanes")

    lane = jnp.arange(L, dtype=jnp.uint32)
    ray, _, _ = jax.jit(lambda: driver.primary_rays(scene, lane, jnp.uint32(0)))()
    ray = jax.tree_util.tree_map(lambda x: x.block_until_ready(), ray)

    # ---- host-side visit statistics (what the schedule asks of the kernel)
    rays_packed, _, Lp, sw = cl._pack_rays(
        ray["o"], ray["d"], ray["mint"], ray["maxt"],
        image_cols=W * spp, spp=spp,
    )
    order, keys, count, _sb = cl._cull_order(
        rays_packed, jnp.asarray(scene.cluster.bounds), scene.cluster.n_clusters
    )
    cnt = np.asarray(count).reshape(-1)
    full = cnt < 0
    visits = np.where(full, scene.cluster.n_clusters, cnt)
    print(f"tiles={len(cnt)}  full-scan={full.sum()}  "
          f"visits mean={visits.mean():.1f} p50={np.median(visits):.0f} "
          f"p90={np.percentile(visits, 90):.0f} max={visits.max()}")

    @jax.jit
    def closest(seed):
        # vary mint by seed so no run is served from a cache
        res = cl.intersect_clusters(
            scene.cluster, ray["o"], ray["d"],
            ray["mint"] + seed * 1e-9, ray["maxt"],
            image_cols=W * spp, spp=spp,
        )
        return jnp.sum(jnp.where(jnp.isfinite(res["t"]), res["t"], 0.0))

    @jax.jit
    def anyhit(seed):
        occ = cl.ray_test_clusters(
            scene.cluster, ray["o"], ray["d"],
            ray["mint"] + seed * 1e-9, jnp.full((L,), 20.0),
            image_cols=W * spp, spp=spp,
        )
        return jnp.sum(occ)

    for name, fn in (("closest", closest), ("anyhit", anyhit)):
        fn(0).block_until_ready()
        np.asarray(fn(1))
        reps = 10
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(i + 2)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt * 1e3:8.3f} ms  -> {L / dt / 1e6:8.1f} M rays/s")


if __name__ == "__main__":
    main()
