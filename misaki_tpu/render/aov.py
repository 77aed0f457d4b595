"""AOV render driver (reference: integrators/aov.cpp) — renders arbitrary
output variables of the primary intersection into per-channel images, plus
(optionally) the nested radiance integrator's RGB."""

import jax
import jax.numpy as jnp
import numpy as np

from misaki_tpu.render import film as film_mod
from misaki_tpu.render import integrator as integ
from misaki_tpu.render.driver import pick_chunk, primary_rays


def render_aovs(scene, seed=0, chunk_size=1 << 20, include_rgb=False):
    """Returns dict name -> (H, W, C) images, averaged over spp with the
    scene's reconstruction filter."""
    from misaki_tpu.core import spectrum as spec

    W, H, spp = scene.film_width, scene.film_height, scene.spp
    n_total = W * H * spp
    chunk = pick_chunk(chunk_size, spp, n_total)

    widths = {"depth": 1, "position": 3, "uv": 2, "geo_normal": 3, "sh_normal": 3}
    if include_rgb:
        widths["rgb"] = 3
    C = sum(widths.values()) + 1  # + filter weight

    @jax.jit
    def chunk_fn(scene, film_flat, lane0):
        lane = lane0 + jnp.arange(chunk, dtype=jnp.uint32)
        in_range = lane < n_total
        ray, pos, state = primary_rays(scene, lane, seed)
        aovs, state = integ.sample_aovs(scene, ray, state)
        cols = (
            (aovs["depth"],)
            + aovs["position"]
            + aovs["uv"]
            + aovs["geo_normal"]
            + aovs["sh_normal"]
        )
        if include_rgb:
            L_spec, state = integ.sample_path(scene, ray, state)
            xyz = spec.spectrum_to_xyz(
                L_spec * ray["wav_weight"], ray["wavelengths"]
            )
            cols = cols + spec.xyz_to_srgb(xyz)
        cols = cols + (jnp.ones(chunk),)
        cols = tuple(jnp.where(in_range, c, 0.0) for c in cols)
        pixel0 = (lane0 // spp).astype(jnp.int32)
        return film_mod.splat_aligned(
            film_flat, pixel0, pos, cols, W, H, spp,
            scene.filter_type, scene.filter_stddev,
        )

    film_flat = film_mod.new_film_flat(H, W, C, scene.filter_type, scene.filter_stddev)
    n_chunks = -(-n_total // chunk)
    for c in range(n_chunks):
        film_flat = chunk_fn(scene, film_flat, jnp.uint32(c * chunk))

    film = film_mod.film_from_flat(film_flat, H, W, scene.filter_type, scene.filter_stddev)
    weight = np.asarray(film[..., -1:])
    inv_w = np.where(weight != 0, 1.0 / weight, 0.0)
    out = {}
    offset = 0
    for name, w in widths.items():
        out[name] = np.asarray(film[..., offset : offset + w]) * inv_w
        offset += w
    return out
