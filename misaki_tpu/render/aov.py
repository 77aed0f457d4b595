"""AOV render driver (reference: integrators/aov.cpp) — renders arbitrary
output variables of the primary intersection into per-channel images, plus
(optionally) the nested radiance integrator's RGB."""

import jax
import jax.numpy as jnp
import numpy as np

from misaki_tpu.render import film as film_mod
from misaki_tpu.render.driver import primary_rays
from misaki_tpu.render import integrator as integ


def render_aovs(scene, seed=0, chunk_size=1 << 20, include_rgb=False):
    """Returns dict name -> (H, W, C) images, averaged over spp with the
    scene's reconstruction filter."""
    from misaki_tpu.core import spectrum as spec

    W, H, spp = scene.film_width, scene.film_height, scene.spp
    n_total = W * H * spp

    # channels: depth 1, position 3, uv 2, geo_normal 3, sh_normal 3 [+rgb 3]
    widths = {"depth": 1, "position": 3, "uv": 2, "geo_normal": 3, "sh_normal": 3}
    if include_rgb:
        widths["rgb"] = 3
    C = sum(widths.values()) + 1  # + filter weight

    @jax.jit
    def chunk_fn(scene, film, lane0):
        lane = lane0 + jnp.arange(chunk_size, dtype=jnp.uint32)
        in_range = lane < n_total
        ray, pos, state = primary_rays(scene, lane, seed)
        aovs, state = integ.sample_aovs(scene, ray, state)
        cols = [
            aovs["depth"][:, None],
            aovs["position"],
            aovs["uv"],
            aovs["geo_normal"],
            aovs["sh_normal"],
        ]
        if include_rgb:
            L_spec, state = integ.sample_path(scene, ray, state)
            xyz = spec.spectrum_to_xyz(L_spec * ray["wav_weight"], ray["wavelengths"])
            cols.append(spec.xyz_to_srgb(xyz))
        cols.append(jnp.ones((chunk_size, 1)))
        values = jnp.concatenate(cols, axis=-1)
        values = jnp.where(in_range[:, None], values, 0.0)
        return film_mod.splat(film, pos, values, scene.filter_type, scene.filter_stddev)

    film = jnp.zeros((H, W, C), jnp.float32)
    n_chunks = -(-n_total // chunk_size)
    for c in range(n_chunks):
        film = chunk_fn(scene, film, jnp.uint32(c * chunk_size))

    weight = np.asarray(film[..., -1:])
    inv_w = np.where(weight != 0, 1.0 / weight, 0.0)
    out = {}
    offset = 0
    for name, w in widths.items():
        out[name] = np.asarray(film[..., offset : offset + w]) * inv_w
        offset += w
    return out
