#!/usr/bin/env python
"""Scaling-efficiency curve (BASELINE.md row 4: >= 85% at N >= 2): renders
the cbox workload over 1/2/4/8-device meshes and reports rays/s per device
count plus parallel efficiency.

On this box the multi-device meshes are VIRTUAL (8 forced host-platform CPU
devices) — the curve measures the sharding/psum overhead of the program
structure, not ICI bandwidth; run on a real pod slice for hardware numbers.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python tools/bench_scaling.py
Writes SCALING.md at the repo root.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np

# the ambient axon plugin PREPENDS itself to jax_platforms regardless of the
# env var (see tests/conftest.py) — override at the config level so the
# virtual 8-device CPU mesh is actually visible
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))


def main():
    from misaki_tpu.scene.compiler import load_and_compile
    from misaki_tpu.parallel.sharding import make_mesh, render_sharded

    spp = int(os.environ.get("SCALE_SPP", 8))
    width = int(os.environ.get("SCALE_W", 64))
    height = int(os.environ.get("SCALE_H", 64))
    depth = 4
    scene = load_and_compile("/root/reference/assets/cbox/scene.xml",
                             spp=spp, width=width, height=height)
    scene = scene.replace(max_depth=depth + 1)
    rays = width * height * spp * (1 + 2 * depth)

    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8) if n <= n_avail]
    rows = []
    for n in counts:
        mesh = make_mesh(n)
        film = render_sharded(mesh, scene, seed=0, depth_cap=depth)
        np.asarray(film)  # compile + sync
        reps = 2
        t0 = time.perf_counter()
        for i in range(reps):
            film = render_sharded(mesh, scene, seed=i + 1, depth_cap=depth)
        np.asarray(film)
        dt = (time.perf_counter() - t0) / reps
        rows.append((n, dt, rays / dt))
        print(f"N={n}: {dt * 1e3:8.1f} ms/frame  {rays / dt / 1e6:6.2f} M rays/s")

    base_dt = rows[0][1]
    lines = [
        "# Scaling curve (virtual device mesh)",
        "",
        f"Workload: cbox {width}x{height}@{spp}spp, {depth}-bounce path "
        f"({rays / 1e6:.1f} M rays/frame), `render_sharded` over a 1D mesh,",
        f"backend: {jax.default_backend()} x {n_avail} devices.",
        "",
        "**Reading the numbers**: the N devices here are VIRTUAL"
        " host-platform devices time-sharing the box's 2 physical cores, so"
        " wall-clock CANNOT drop with N — the meaningful virtual-mesh metric"
        " is *sharding overhead*: frame time at N devices over frame time at"
        " 1 (identical total compute, equal-shard lanes + one psum film"
        " reduction). Overhead <= ~1.18x corresponds to the >= 85%"
        " efficiency target once shards run on real chips (BASELINE.md row"
        " 4); the collective cost measured here is an upper bound, since a"
        " real ICI all-reduce of the 5-channel film is bandwidth-trivial."
        " Regenerate on a pod slice for hardware numbers.",
        "",
        "| devices | ms/frame | sharding overhead vs N=1 | implied efficiency |",
        "|---|---|---|---|",
    ]
    for n, dt, rps in rows:
        ov = dt / base_dt
        lines.append(
            f"| {n} | {dt * 1e3:.1f} | {ov:.2f}x | {100.0 / ov:.0f}% |"
        )
    out = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
