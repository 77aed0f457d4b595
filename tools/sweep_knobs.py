#!/usr/bin/env python
"""Cluster-kernel knob sweep: CLUSTER_FACES x R_TILE (x MAX_VISITS) over the
bunny (pure intersect) and figure2 (incoherent bounce) workloads — judge r3
ask #10. Each config runs in a fresh subprocess (the knobs are module-load
constants) and prints one line; the table lands in KNOB_SWEEP.md.

Usage: python tools/sweep_knobs.py [--quick]
"""

import itertools
import os
import subprocess
import sys

CHILD = r"""
import os, sys, time, json
sys.path.insert(0, %(root)r)
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from misaki_tpu.scene.compiler import load_and_compile
from misaki_tpu.render.driver import render

out = {}
for name, path, reps, depth, kw in (
    ("bunny", "/root/reference/assets/bunny/scene.xml", 5, 4, {}),
    ("figure2",
     "/root/reference/results/Figure_2_RoughConductor/roughconductor.xml",
     2, 4, dict(spp=16, width=320, height=180)),
):
    sc = load_and_compile(path, **kw)
    o = render(sc, seed=0, depth_cap=depth)
    float(jnp.sum(o["rgb"]))
    t0 = time.perf_counter()
    for i in range(reps):
        o = render(sc, seed=i + 1, depth_cap=depth)
    float(jnp.sum(o["rgb"]))
    dt = (time.perf_counter() - t0) / reps
    ns = sc.film_width * sc.film_height * sc.spp
    from misaki_tpu.render.integrator import n_bounce_iters
    rps = 1 if sc.integrator == "debug" else 1 + 2 * n_bounce_iters(sc, depth)
    out[name] = ns * rps / dt
print("RESULT " + json.dumps(out))
"""


def run_config(faces, rtile, visits):
    env = dict(os.environ)
    env["MISAKI_CLUSTER_FACES"] = str(faces)
    env["MISAKI_R_TILE"] = str(rtile)
    env["MISAKI_MAX_VISITS"] = str(visits)
    p = subprocess.run(
        [sys.executable, "-c", CHILD % {"root": os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))}],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            import json

            return json.loads(line[7:])
    print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
    return None


def main():
    quick = "--quick" in sys.argv
    grid = [
        (256, 256, 128),   # current defaults
        (256, 128, 128),
        (256, 512, 128),
        (128, 256, 256),
        (128, 128, 256),
        (128, 512, 256),
    ]
    if quick:
        grid = grid[:2]
    rows = []
    for faces, rtile, visits in grid:
        r = run_config(faces, rtile, visits)
        if r is None:
            rows.append((faces, rtile, visits, None, None))
            print(f"faces={faces} rtile={rtile} visits={visits} FAILED",
                  flush=True)
            continue
        rows.append((faces, rtile, visits, r["bunny"], r["figure2"]))
        print(f"faces={faces} rtile={rtile} visits={visits} "
              f"bunny={r['bunny'] / 1e6:.1f}M fig2={r['figure2'] / 1e6:.2f}M",
              flush=True)

    with open(os.path.join(os.path.dirname(__file__), "..",
                           "KNOB_SWEEP.md"), "w") as f:
        f.write("# Cluster-kernel knob sweep (TPU v5e, judge r3 ask #10)\n\n"
                "Measured by `tools/sweep_knobs.py` — bunny = 768x768x1 "
                "debug (pure intersect), figure2 = 320x180x16 path depth 4 "
                "(incoherent bounce casts, Morton-sorted).\n\n"
                "| CLUSTER_FACES | R_TILE | MAX_VISITS | bunny Mrays/s | "
                "figure2 Mrays/s |\n|---|---|---|---|---|\n")
        for faces, rtile, visits, b, g in rows:
            bs = "fail" if b is None else f"{b / 1e6:.1f}"
            gs = "fail" if g is None else f"{g / 1e6:.2f}"
            f.write(f"| {faces} | {rtile} | {visits} | {bs} | {gs} |\n")
    print("wrote KNOB_SWEEP.md")


if __name__ == "__main__":
    main()
