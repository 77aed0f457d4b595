"""AOV render driver (reference: integrators/aov.cpp:29-144) — renders
arbitrary output variables of the primary intersection into per-channel
images, plus the nested radiance integrator's RGB.

The reference parses a comma-separated ``"name:type"`` list from the `aovs`
property (aov.cpp:31-60) and appends the nested integrator's RGBA channels;
we mirror that: `parse_aov_spec` maps the scene's spec to supported kinds and
`render_aovs` produces one (H, W, C) image per requested variable next to the
standard radiance image."""

import jax
import jax.numpy as jnp
import numpy as np

from misaki_tpu.core import spectrum as spec
from misaki_tpu.render import film as film_mod
from misaki_tpu.render import integrator as integ
from misaki_tpu.render.driver import pick_chunk, primary_rays

# kind -> channel count (aov.cpp Type enum: Depth/Position/UV/GeometricNormal/
# ShadingNormal)
AOV_KINDS = {"depth": 1, "position": 3, "uv": 2, "geo_normal": 3, "sh_normal": 3}


def parse_aov_spec(aovs):
    """`("name:type", ...)` -> list of (out_name, kind). Unknown kinds raise,
    matching the reference's Throw on an invalid AOV type (aov.cpp:50-58).
    A bare `type` entry (no colon) uses the kind as the name."""
    out = []
    for entry in aovs:
        entry = entry.strip()
        if not entry:
            continue
        if ":" in entry:
            name, kind = (s.strip() for s in entry.split(":", 1))
        else:
            name = kind = entry
        if kind not in AOV_KINDS:
            raise ValueError(
                f"aov: unknown type '{kind}' (supported: {sorted(AOV_KINDS)})"
            )
        out.append((name, kind))
    if not out:  # default: everything (useful for debugging scenes sans spec)
        out = [(k, k) for k in AOV_KINDS]
    return out


def render_aovs(
    scene,
    seed=0,
    chunk_size=1 << 20,
    include_rgb=True,
    depth_cap=integ.DEFAULT_MAX_DEPTH_CAP,
):
    """Render the scene's AOVs (+ nested radiance pass when include_rgb).

    Returns {"rgb": (H,W,3) or None, "alpha": (H,W) or None,
    "aovs": {name: (H, W, C) np.ndarray}} — averaged over spp with the
    scene's reconstruction filter, like the reference's film normalization."""
    W, H, spp = scene.film_width, scene.film_height, scene.spp
    n_total = W * H * spp
    chunk = pick_chunk(chunk_size, spp, n_total)

    spec_list = parse_aov_spec(scene.aovs)
    kinds = [k for _, k in spec_list]
    widths = [AOV_KINDS[k] for k in kinds]
    C = sum(widths) + (4 if include_rgb else 0) + 1  # + XYZ/alpha + weight

    @jax.jit
    def chunk_fn(scene, film_flat, lane0):
        lane = lane0 + jnp.arange(chunk, dtype=jnp.uint32)
        in_range = lane < n_total
        ray, pos, state = primary_rays(scene, lane, seed)
        aovs, state = integ.sample_aovs(scene, ray, state)
        cols = ()
        for k in kinds:
            a = aovs[k]
            cols = cols + (a if isinstance(a, tuple) else (a,))
        if include_rgb:
            # nested child integrator (aov.cpp renders the child's channels
            # alongside the AOVs); scene.aov_nested is set by the compiler
            # from the nested <integrator> or the presence of media
            nested = getattr(scene, "aov_nested", "path")
            if nested == "volpath":
                L_spec, state = integ.sample_volpath(scene, ray, state, depth_cap)
            elif nested == "direct":
                L_spec, state = integ.sample_direct(scene, ray, state)
            else:
                L_spec, state = integ.sample_path(scene, ray, state, depth_cap)
            xyz = spec.spectrum_to_xyz(
                L_spec * ray["wav_weight"], ray["wavelengths"]
            )
            cols = cols + tuple(xyz) + (jnp.ones(chunk),)
        cols = cols + (jnp.ones(chunk),)
        cols = tuple(jnp.where(in_range & jnp.isfinite(c), c, 0.0) for c in cols)
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
    out = {"rgb": None, "alpha": None, "aovs": {}}
    offset = 0
    for (name, kind), w in zip(spec_list, widths):
        out["aovs"][name] = np.asarray(film[..., offset: offset + w]) * inv_w
        offset += w
    if include_rgb:
        xyz = np.asarray(film[..., offset: offset + 3]) * inv_w
        out["rgb"] = np.asarray(spec.xyz_to_srgb_image(jnp.asarray(xyz)))
        out["alpha"] = (np.asarray(film[..., offset + 3]) * inv_w[..., 0])
    return out
