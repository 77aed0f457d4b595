"""Wavefront path integrator with NEE + MIS + Russian roulette
(reference: src/librender/integrators/path.cpp:19-141, driver loop
integrator.cpp:82-126).

The reference's per-ray recursion becomes a lockstep `lax.fori_loop` over
bounces on a lane-last SoA wavefront: every lane runs every stage under an
active mask; XLA fuses each bounce into one megakernel (intersect ->
interaction -> NEE -> BSDF sample -> next intersect -> MIS -> RR).

RNG discipline: every lane owns a PCG32 stream; draws happen unconditionally
in a fixed order per bounce (NEE 2D, BSDF 1D + 2D, RR 1D) so the sequence is
identical regardless of masking, device, chunking or sharding — the
deliberate replacement for the reference's per-thread sampler clone quirk
(samplers/independent.cpp:14-18, see SURVEY.md section 7b).
"""

import jax
import jax.numpy as jnp

from misaki_tpu.accel import traverse
from misaki_tpu.bsdf import kernels as bsdf
from misaki_tpu.core import frame, math as m, rng, vec
from misaki_tpu.emitter import kernels as emitter
from misaki_tpu.render import interaction as inter

DEFAULT_MAX_DEPTH_CAP = 16


def n_bounce_iters(scene, depth_cap=DEFAULT_MAX_DEPTH_CAP):
    """Static number of NEE+BSDF bounce iterations: the reference breaks
    before NEE once depth >= max_depth (path.cpp:49-50); max_depth == -1
    means unbounded, which we cap (RR terminates long before)."""
    if scene.max_depth > 0:
        return scene.max_depth - 1
    return depth_cap


def sample_path(scene, ray, rng_state, depth_cap=DEFAULT_MAX_DEPTH_CAP):
    """Per-wavefront radiance estimate.

    ray: dict {o, d (vec3 tuples), mint, maxt (L,), wavelengths (4, L)}.
    Returns (spectrum (4, L), rng_state).
    """
    L = ray["o"][0].shape[0]
    wavelengths = ray["wavelengths"]

    hit = traverse.intersect(scene, ray["o"], ray["d"], ray["mint"], ray["maxt"])
    si = inter.compute_interaction(scene, hit, ray["o"], ray["d"], wavelengths)

    throughput = jnp.ones((4, L))
    result = jnp.zeros((4, L))
    eta = jnp.ones((L,))

    # ---- depth == 1: directly visible emitters / environment
    # (path.cpp:34-47; hide_emitters defaults to false)
    if not scene.hide_emitters:
        if scene.has_environment:
            env = emitter.eval_environment(scene, wavelengths)
            result = result + jnp.where((~si["valid"])[None, :], env, 0.0)
        em_val = emitter.eval_emitter(
            scene, si["emitter"], si["wi"], si["uv"], wavelengths
        )
        result = result + jnp.where(si["valid"][None, :], em_val, 0.0)

    active = si["valid"]
    n_iters = n_bounce_iters(scene, depth_cap)
    if n_iters <= 0:
        return result, rng_state

    def bounce(i, carry):
        depth = i + 1  # the reference's loop variable
        (active, throughput, eta, result, si, rng_state) = carry

        # -------- draws (unconditional, fixed order) --------
        u_nee, rng_state = rng.next_2d(rng_state)
        u_bsdf1, rng_state = rng.next_float32(rng_state)
        u_bsdf2, rng_state = rng.next_2d(rng_state)
        u_rr, rng_state = rng.next_float32(rng_state)

        # -------- material params: ONE packed fetch per bounce --------
        p = bsdf.material_params(scene, si["bsdf"], si["uv"], wavelengths)

        # -------- NEE (path.cpp:53-67), only from Smooth BSDFs --------
        smooth = p["smooth"]
        ds = emitter.sample_emitter_direct(scene, si["p"], wavelengths, u_nee)
        nee_possible = active & smooth & (ds["pdf"] > 0.0)
        # shadow ray (scene.cpp:90-97); masked lanes get degenerate rays
        sh_mint = m.RayEpsilon * (1.0 + vec.max_abs(si["p"]))
        sh_maxt = ds["dist"] * (1.0 - m.ShadowEpsilon)
        occluded = traverse.ray_test(
            scene,
            si["p"],
            ds["d"],
            jnp.where(nee_possible, sh_mint, 0.0),
            jnp.where(nee_possible, sh_maxt, -1.0),
        )
        wo_nee = frame.to_local(si["sh"], ds["d"])
        f_nee = bsdf.eval_bsdf(p, si["wi"], wo_nee)
        pdf_nee_bsdf = bsdf.pdf_bsdf(p, si["wi"], wo_nee)
        # Detached sampling: MIS weights are pdf ratios — stop their gradient
        # (the "pdf-stopgrad" VJP convention from BASELINE.md north star).
        mis_w = jax.lax.stop_gradient(
            jnp.where(ds["delta"], 1.0, m.mis_power2(ds["pdf"], pdf_nee_bsdf))
        )
        contrib = throughput * ds["spec"] * f_nee * mis_w[None, :]
        take = nee_possible & ~occluded
        result = result + jnp.where(take[None, :], contrib, 0.0)

        # -------- BSDF sampling (path.cpp:71-98) --------
        bs = bsdf.sample_bsdf(p, si["wi"], u_bsdf1, u_bsdf2)
        wo_world = frame.to_world(si["sh"], bs["wo"])
        new_mint = inter.spawn_ray_mint(si["p"])
        next_hit = traverse.intersect(
            scene,
            si["p"],
            wo_world,
            jnp.where(active, new_mint, 0.0),
            jnp.where(active, jnp.inf, -1.0),
        )
        si_next = inter.compute_interaction(
            scene, next_hit, si["p"], wo_world, wavelengths
        )

        throughput = throughput * bs["weight"]
        eta = eta * bs["eta"]

        # -------- emitter-hit MIS (path.cpp:84-108) --------
        hit_area = si_next["valid"] & (si_next["emitter"] >= 0)
        em_val = emitter.eval_emitter(
            scene, si_next["emitter"], si_next["wi"], si_next["uv"], wavelengths
        )
        em_pdf_area = emitter.pdf_emitter_direct(
            scene, si_next["emitter"], wo_world, si_next["t"], si_next["ng"]
        )
        value = jnp.where(hit_area[None, :], em_val, 0.0)
        em_pdf = jnp.where(hit_area, em_pdf_area, 0.0)
        if scene.has_environment:
            hit_env = ~si_next["valid"]
            env_val = emitter.eval_environment(scene, wavelengths)
            value = jnp.where(hit_env[None, :], env_val, value)
            env_ids = jnp.full((L,), scene.environment_idx, jnp.int32)
            env_pdf = emitter.pdf_emitter_direct(
                scene, env_ids, wo_world, si_next["t"], vec.neg(wo_world)
            )
            em_pdf = jnp.where(hit_env, env_pdf, em_pdf)
            hit_emitter = hit_area | hit_env
        else:
            hit_emitter = hit_area
        em_pdf = jnp.where(bs["delta"], 0.0, em_pdf)
        mis_b = jax.lax.stop_gradient(m.mis_power2(bs["pdf"], em_pdf))
        add = throughput * value * mis_b[None, :]
        result = result + jnp.where((active & hit_emitter)[None, :], add, 0.0)

        # -------- continuation --------
        active = active & bs["valid"] & si_next["valid"]

        # -------- Russian roulette (path.cpp:116-122) --------
        do_rr = depth + 1 >= scene.rr_depth
        q = jax.lax.stop_gradient(
            jnp.minimum(jnp.max(throughput, axis=0) * eta * eta, 0.95)
        )
        kill = do_rr & (u_rr >= q)
        active = active & ~kill
        throughput = jnp.where(
            (do_rr & active)[None, :],
            throughput / jnp.maximum(q, 1e-8)[None, :],
            throughput,
        )

        return (active, throughput, eta, result, si_next, rng_state)

    carry = (active, throughput, eta, result, si, rng_state)
    carry = jax.lax.fori_loop(0, n_iters, bounce, carry)
    (_, _, _, result, _, rng_state) = carry
    return result, rng_state


AOV_NAMES = ("depth", "position", "uv", "geo_normal", "sh_normal")


def sample_aovs(scene, ray, rng_state):
    """The `aov` integrator's channel set (integrators/aov.cpp:29-144):
    depth / position / uv / geo_normal / sh_normal from the primary hit."""
    hit = traverse.intersect(scene, ray["o"], ray["d"], ray["mint"], ray["maxt"])
    si = inter.compute_interaction(
        scene, hit, ray["o"], ray["d"], ray["wavelengths"]
    )
    v = si["valid"]

    def mask3(x):
        return tuple(jnp.where(v, c, 0.0) for c in x)

    return {
        "depth": jnp.where(v, si["t"], 0.0),
        "position": mask3(si["p"]),
        "uv": tuple(jnp.where(v, c, 0.0) for c in si["uv"]),
        "geo_normal": mask3(si["ng"]),
        "sh_normal": mask3(si["sh"]["n"]),
    }, rng_state


def sample_debug(scene, ray, rng_state):
    """The `debug` integrator (integrators/debug.cpp): |shading normal| as
    color. Used by the bunny intersection-rate benchmark."""
    hit = traverse.intersect(scene, ray["o"], ray["d"], ray["mint"], ray["maxt"])
    si = inter.compute_interaction(
        scene, hit, ray["o"], ray["d"], ray["wavelengths"]
    )
    n = si["sh"]["n"]
    rgb = tuple(jnp.where(si["valid"], jnp.abs(c), 0.0) for c in n)
    return rgb, rng_state
