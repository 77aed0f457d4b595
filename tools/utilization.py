#!/usr/bin/env python
"""Utilization / roofline record (judge r4 ask #4b): quantify "fast" against
the hardware's speed of light, not just the 100 M rays/s baseline bar.

For each benchmark workload this measures the frame time (queued async
dispatches + one scalar sync, same methodology as profile_cluster_frame) and
divides a *useful-work* model through it:

  * cbox   — the brute-force streamer tests every ray against all Fpad faces
             per cast: flops = casts x lanes x Fpad x ~55 (Moller-Trumbore),
             plus the shading/table-fetch work of the bounce loop.
  * bunny  — the cluster path tests only the scheduled visits:
             flops = sum_tiles visits x CLUSTER_FACES x R_TILE x ~55.
             `visits` comes from the actual `_cull_order` schedule, so the
             model counts the work the kernel really issues (padding
             included — padded faces burn VPU lanes too).
  * figure2— same per-cast schedule model x the volpath cast count.

Achieved TFLOP/s is reported against NOMINAL peaks (per the public v5e
spec sheet: ~197 TFLOP/s bf16 MXU, fp32 MXU ~ 1/4 of that; the 8x128x8 VPU
at ~0.94 GHz is ~4 TFLOP/s fp32 counting FMA=2) — the point is the ORDER of
the gap, which tells whether the next optimization should target schedule
quality (useful/issued ratio), VPU saturation, or dispatch overheads.

Writes UTILIZATION.md at the repo root. Run on the TPU backend.
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

REPS = int(os.environ.get("UTIL_REPS", 10))

VPU_PEAK = 4.0e12    # fp32 FLOP/s, 8x128 lanes x 4 ALUs x FMA x ~0.94 GHz
MXU_PEAK_F32 = 25.0e12
MT_FLOPS = 55        # Moller-Trumbore flops per (ray, triangle) pair


def queue_time(fn, reps=REPS):
    fn(0).block_until_ready()
    float(fn(1))
    t0 = time.perf_counter()
    out = None
    for i in range(reps):
        out = fn(i + 2)
    float(out)
    return (time.perf_counter() - t0) / reps


def cluster_cast_flops(scene, o, d, mint, maxt):
    """Issued MT flops of ONE cluster-path cast with the real schedule."""
    from misaki_tpu.accel import cluster as cl

    rays, _, Lp, _ = cl._pack_rays(
        o, d, mint, maxt, image_cols=scene.film_width * scene.spp,
        spp=scene.spp)
    count = jax.jit(
        lambda r: cl._cull_order(r, jnp.asarray(scene.cluster.bounds),
                                 scene.cluster.n_clusters)[2])(rays)
    cnt = np.asarray(count).reshape(-1)
    visits = np.where(cnt < 0, scene.cluster.n_clusters, cnt)
    pairs = float(visits.sum()) * cl.CLUSTER_FACES * cl.R_TILE
    return pairs * MT_FLOPS, visits


def main():
    from misaki_tpu.scene.compiler import load_and_compile
    from misaki_tpu.render import driver
    from misaki_tpu.render.integrator import n_bounce_iters

    asset_root = os.environ.get("BENCH_ASSETS", "/root/reference")
    rows = []

    # ---- cbox: brute-force streamer -------------------------------------
    depth = 4
    sc = load_and_compile(f"{asset_root}/assets/cbox/scene.xml",
                          spp=64, width=256, height=256)
    sc = sc.replace(max_depth=depth + 1)
    L = sc.film_width * sc.film_height * sc.spp
    chunk = driver.pick_chunk(1 << 20, sc.spp, L)

    def cbox_frame(s):
        out = driver.render(sc, seed=s + 1, chunk_size=chunk, depth_cap=depth)
        return jnp.sum(out["rgb"])

    t = queue_time(lambda s: cbox_frame(s), reps=3)
    nb = n_bounce_iters(sc, depth)
    Fpad = sc.geometry.p0.shape[-1]
    casts = 1 + 2 * nb
    mt = float(L) * casts * Fpad * MT_FLOPS
    fetch = float(L) * nb * (sc.materials.params.shape[0]
                             * sc.materials.params.shape[1] * 2
                             + sc.geometry.face_tab.shape[0] * Fpad * 2)
    shade = float(L) * nb * 900
    fl = mt + fetch + shade
    rows.append(("cbox 256x256@64spp path-4", t, fl, L * casts,
                 f"brute MT {mt/fl*100:.0f}% of model; Fpad={Fpad}"))

    # ---- bunny: cluster path, debug primaries ---------------------------
    sc = load_and_compile(f"{asset_root}/assets/bunny/scene.xml")
    L = sc.film_width * sc.film_height * sc.spp
    lane = jnp.arange(L, dtype=jnp.uint32)
    ray, _, _ = jax.jit(lambda: driver.primary_rays(sc, lane, jnp.uint32(0)))()
    fl, visits = cluster_cast_flops(sc, ray["o"], ray["d"], ray["mint"],
                                    ray["maxt"])

    def bunny_frame(s):
        _, rgb, _ = driver.render_frame_single(sc, L, jnp.uint32(s), L, 4)
        return jnp.sum(rgb)

    t = queue_time(bunny_frame)
    rows.append(("bunny 1024x576@1spp debug", t, fl, L,
                 f"visits mean={visits.mean():.1f} p90="
                 f"{np.percentile(visits, 90):.0f} (schedule-issued pairs)"))

    # ---- figure2: cluster path, volpath casts ---------------------------
    sc = load_and_compile(
        f"{asset_root}/results/Figure_2_RoughConductor/roughconductor.xml",
        spp=16, width=320, height=180)
    depth = 4
    L = sc.film_width * sc.film_height * sc.spp
    chunk = driver.pick_chunk(1 << 20, sc.spp, L)
    lane = jnp.arange(min(L, chunk), dtype=jnp.uint32)
    ray, _, _ = jax.jit(lambda: driver.primary_rays(sc, lane, jnp.uint32(0)))()
    fl1, visits = cluster_cast_flops(sc, ray["o"], ray["d"], ray["mint"],
                                     ray["maxt"])
    nb = n_bounce_iters(sc, depth)
    casts = 1 + 2 * nb
    # primary-cast schedule as the per-cast proxy (secondary casts resort
    # into comparable tiles; exact per-bounce schedules would need a full
    # trace) — see KNOB_SWEEP.md for measured secondary behavior
    fl = fl1 * casts * (L / lane.shape[0])

    def fig2_frame(s):
        out = driver.render(sc, seed=s + 1, chunk_size=chunk, depth_cap=4)
        return jnp.sum(out["rgb"])

    t = queue_time(fig2_frame, reps=3)
    rows.append(("figure2 320x180@16spp volpath-4", t, fl, L * casts,
                 f"primary-cast schedule proxy x {casts} casts; "
                 f"visits mean={visits.mean():.1f}"))

    lines = [
        "# UTILIZATION — achieved vs speed-of-light",
        "",
        f"Backend: {jax.default_backend()} "
        f"({jax.devices()[0].device_kind}); nominal peaks used: "
        f"VPU fp32 ~{VPU_PEAK/1e12:.0f} TFLOP/s, MXU fp32 "
        f"~{MXU_PEAK_F32/1e12:.0f} TFLOP/s. Useful-work models are "
        "documented in tools/utilization.py (issued Moller-Trumbore pairs "
        "from the REAL cull schedules + table-fetch matmul flops).",
        "",
        "| workload | ms/frame | model GFLOP | achieved TFLOP/s | "
        "% VPU peak | M rays/s | notes |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, t, fl, rays, note in rows:
        tf = fl / t
        lines.append(
            f"| {name} | {t*1e3:.2f} | {fl/1e9:.1f} | {tf/1e12:.2f} | "
            f"{tf/VPU_PEAK*100:.0f}% | {rays/t/1e6:.1f} | {note} |")
    lines += [
        "",
        "**Reading**: the intersector's dense MT work runs on the VPU (the",
        "one-hot table fetches ride the MXU but are a small fraction of",
        "issued flops). A high % of VPU peak means the kernel is",
        "compute-saturated and further rays/s must come from issuing FEWER",
        "pairs (better schedules/packing) or moving pair tests to the MXU;",
        "a low % means dispatch/relayout overheads dominate and fusion is",
        "the lever. Models count ISSUED pair work (padding included), so",
        "utilization here is an upper bound on useful-ray efficiency.",
    ]
    out = os.path.join(os.path.dirname(__file__), "..", "UTILIZATION.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
