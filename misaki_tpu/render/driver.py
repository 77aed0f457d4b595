"""Render driver: wavefront orchestration + film assembly
(reference: SamplingIntegrator::render, integrator.cpp:31-126 — the TBB
tile loop replaced by jit-batched wavefront chunks).

The full (pixels x spp) sample set is split into fixed-size lane chunks; one
jitted step function renders a chunk and scatter-adds it into the film, which
stays resident on device. Determinism: lane index == pixel * spp + sample,
and each lane's PCG32 stream is seeded by (lane, seed), so the image is
independent of chunk size and device placement.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from misaki_tpu.core import rng, spectrum as spec
from misaki_tpu.render import camera as cam
from misaki_tpu.render import film as film_mod
from misaki_tpu.render import integrator as integ

DEFAULT_CHUNK = 1 << 20


def make_rng(lane, seed):
    """Per-lane PCG32 streams: initstate = lane, initseq mixes the seed so
    different seeds give uncorrelated sequences."""
    seed32 = jnp.uint32(seed)
    return rng.seed(
        (seed32 * jnp.uint32(0x9E3779B9), lane.astype(jnp.uint32)),
        (lane.astype(jnp.uint32) ^ (seed32 * jnp.uint32(2654435761)), seed32 | jnp.uint32(1)),
    )


def primary_rays(scene, lane, seed):
    """Camera rays for global lane ids. Draw order matches the reference's
    render_sample (integrator.cpp:103-126): pixel jitter 2D, wavelength 1D,
    lens/aperture 2D (drawn but unused by the pinhole camera)."""
    spp = scene.spp
    pixel = lane // spp
    px = (pixel % scene.film_width).astype(jnp.float32)
    py = (pixel // scene.film_width).astype(jnp.float32)

    state = make_rng(lane, seed)
    jitter, state = rng.next_2d(state)
    wav_u, state = rng.next_float32(state)
    _lens, state = rng.next_2d(state)

    pos = (px + jitter[0], py + jitter[1])
    ray = cam.sample_ray(scene.camera, pos, wav_u)
    return ray, pos, state


def _render_chunk(scene, film_flat, lane0, n_total, seed, chunk, depth_cap):
    """Render `chunk` lanes (spp-aligned) into the flat padded film."""
    lane = lane0 + jnp.arange(chunk, dtype=jnp.uint32)
    in_range = lane < n_total
    ray, pos, state = primary_rays(scene, lane, seed)

    if scene.integrator == "debug":
        rgb, state = integ.sample_debug(scene, ray, state)
        xyz = spec.srgb_to_xyz(rgb)
    else:
        if scene.integrator == "volpath":
            L_spec, state = integ.sample_volpath(scene, ray, state, depth_cap)
        elif scene.integrator == "direct":
            L_spec, state = integ.sample_direct(scene, ray, state)
        else:
            L_spec, state = integ.sample_path(scene, ray, state, depth_cap)
        L_spec = L_spec * ray["wav_weight"]
        xyz = spec.spectrum_to_xyz(L_spec, ray["wavelengths"])

    ones = jnp.ones(chunk)
    # XYZAW channels (integrator.cpp:119-123: alpha=1, filter weight=1)
    values = tuple(xyz) + (ones, ones)
    values = tuple(
        jnp.where(in_range & jnp.isfinite(c), c, 0.0) for c in values
    )
    pixel0 = (lane0 // scene.spp).astype(jnp.int32)
    return film_mod.splat_aligned(
        film_flat, pixel0, pos, values,
        scene.film_width, scene.film_height, scene.spp,
        scene.filter_type, scene.filter_stddev,
    )


@partial(
    jax.jit,
    static_argnames=("n_total", "chunk", "depth_cap"),
    donate_argnames=("film_flat",),
)
def render_chunk(scene, film_flat, lane0, n_total, seed, chunk, depth_cap):
    return _render_chunk(scene, film_flat, lane0, n_total, seed, chunk, depth_cap)


def pick_chunk(chunk_size, spp, n_total):
    """Largest spp-multiple <= chunk_size (min spp) so chunks stay
    pixel-aligned for the dense splat."""
    chunk = max(spp, (chunk_size // spp) * spp)
    return min(chunk, -(-n_total // spp) * spp)


def render(
    scene,
    seed=0,
    chunk_size=DEFAULT_CHUNK,
    depth_cap=integ.DEFAULT_MAX_DEPTH_CAP,
):
    """Render the scene; returns dict with the raw film and developed image.
    An `aov` integrator dispatches to the AOV driver (aov.cpp semantics) and
    additionally returns {"aovs": {name: (H, W, C)}}."""
    if scene.integrator == "aov":
        from misaki_tpu.render.aov import render_aovs

        out = render_aovs(
            scene, seed=seed, chunk_size=chunk_size,
            include_rgb=True, depth_cap=depth_cap,
        )
        return {
            "film": None,
            "rgb": jnp.asarray(out["rgb"]),
            "alpha": jnp.asarray(out["alpha"]),
            "aovs": out["aovs"],
        }
    W, H, spp = scene.film_width, scene.film_height, scene.spp
    n_total = W * H * spp
    chunk = pick_chunk(chunk_size, spp, n_total)
    film_flat = film_mod.new_film_flat(
        H, W, 5, scene.filter_type, scene.filter_stddev
    )

    n_chunks = -(-n_total // chunk)
    for c in range(n_chunks):
        film_flat = render_chunk(
            scene,
            film_flat,
            jnp.uint32(c * chunk),
            n_total,
            jnp.uint32(seed),
            chunk,
            depth_cap,
        )
    film, rgb, alpha = develop_film(
        film_flat, H, W, scene.filter_type, scene.filter_stddev
    )
    return {"film": film, "rgb": rgb, "alpha": alpha}


@partial(jax.jit, static_argnames=("H", "W", "filter_type", "stddev"))
def develop_film(film_flat, H, W, filter_type, stddev):
    """film assembly + XYZ->sRGB development in ONE jit call: eager per-op
    dispatch is expensive on tunneled TPU backends, and a frame's worth of
    small eager ops would otherwise dominate short renders."""
    film = film_mod.film_from_flat(film_flat, H, W, filter_type, stddev)
    rgb, alpha = film_mod.develop(film)
    return film, rgb, alpha
