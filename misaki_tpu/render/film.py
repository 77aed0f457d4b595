"""Film accumulation and development — the TPU replacement for
ImageBlock/BlockGenerator/HDRFilm (reference: src/librender/imageblock.cpp,
films/hdrfilm.cpp).

The reference renders 32x32 spiral tiles into per-thread blocks with a
discretized-filter splat, merged under a mutex. On TPU the film is one
(H, W, 5) XYZAW accumulator in HBM and every sample performs a scatter-add
over its reconstruction-filter footprint — no tiles, no borders, no locks,
and the result is deterministic.

The gaussian filter is evaluated exactly instead of via the reference's
32-bin LUT (rfilter.h eval_discretized) — the LUT is a CPU-era optimization
that would only add error on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from misaki_tpu.core import spectrum as spec


def filter_footprint(filter_type, stddev):
    """Static footprint half-width in pixels."""
    if filter_type == "box":
        return 0, 0.5
    radius = 4.0 * stddev  # gaussian.cpp: m_radius = 4 * stddev
    return int(np.ceil(radius)), radius


def splat(film, pos, values, filter_type="gaussian", stddev=0.5):
    """Scatter-add samples into the film.

    film: (H, W, C); pos: (L, 2) continuous raster coords; values: (L, C).
    Gaussian weights follow gaussian.cpp:9-20 (truncated, bias-subtracted);
    the tap grid follows ImageBlock::put (imageblock.cpp:85-114).
    """
    H, W, C = film.shape
    pad, radius = filter_footprint(filter_type, stddev)

    # discrete-coordinate sample position (imageblock.cpp:87-89)
    px = pos[:, 0] - 0.5
    py = pos[:, 1] - 0.5

    if filter_type == "box":
        x = jnp.clip(jnp.round(px).astype(jnp.int32), 0, W - 1)
        y = jnp.clip(jnp.round(py).astype(jnp.int32), 0, H - 1)
        flat = y * W + x
        film = film.reshape(H * W, C).at[flat].add(values).reshape(H, W, C)
        return film

    alpha = -1.0 / (2.0 * stddev * stddev)
    bias = np.exp(alpha * radius * radius)

    n_taps = 2 * pad + 1
    lo_x = jnp.ceil(px - radius).astype(jnp.int32)
    lo_y = jnp.ceil(py - radius).astype(jnp.int32)

    offs = jnp.arange(n_taps, dtype=jnp.int32)
    tx = lo_x[:, None] + offs[None, :]  # (L, T)
    ty = lo_y[:, None] + offs[None, :]
    wx = jnp.maximum(
        jnp.exp(alpha * (tx.astype(jnp.float32) - px[:, None]) ** 2) - bias, 0.0
    )
    wy = jnp.maximum(
        jnp.exp(alpha * (ty.astype(jnp.float32) - py[:, None]) ** 2) - bias, 0.0
    )
    in_x = (tx >= 0) & (tx < W)
    in_y = (ty >= 0) & (ty < H)
    wx = jnp.where(in_x, wx, 0.0)
    wy = jnp.where(in_y, wy, 0.0)

    w2 = wx[:, None, :] * wy[:, :, None]  # (L, Ty, Tx)
    fx = jnp.clip(tx, 0, W - 1)
    fy = jnp.clip(ty, 0, H - 1)
    flat = (fy[:, :, None] * W + fx[:, None, :]).reshape(-1)  # (L*T*T,)
    contrib = (w2[..., None] * values[:, None, None, :]).reshape(-1, C)
    film = film.reshape(H * W, C).at[flat].add(contrib).reshape(H, W, C)
    return film


def new_film(H, W, channels=5):
    return jnp.zeros((H, W, channels), jnp.float32)


def develop(film):
    """XYZAW -> linear sRGB + alpha (hdrfilm.cpp:44-88)."""
    xyz = film[..., 0:3]
    alpha = film[..., 3]
    weight = film[..., 4]
    inv_w = jnp.where(weight != 0.0, 1.0 / weight, 0.0)
    rgb = spec.xyz_to_srgb(xyz) * inv_w[..., None]
    return rgb, alpha * inv_w


def to_srgb8(rgb):
    """Linear -> sRGB gamma, 8-bit (bitmap.cpp tonemap for PNG output)."""
    rgb = np.clip(np.asarray(rgb), 0.0, 1.0)
    srgb = np.where(
        rgb <= 0.0031308, 12.92 * rgb, 1.055 * rgb ** (1 / 2.4) - 0.055
    )
    return (srgb * 255.0 + 0.5).astype(np.uint8)


def write_exr(path, rgb, alpha=None):
    """Multi-channel EXR via imageio (replaces OIIO, image.cpp:21-44)."""
    import imageio.v3 as iio

    rgb = np.asarray(rgb, np.float32)
    if alpha is not None:
        img = np.concatenate([rgb, np.asarray(alpha)[..., None]], axis=-1)
    else:
        img = rgb
    iio.imwrite(str(path), img.astype(np.float32), extension=".exr")


def write_png(path, rgb):
    from PIL import Image

    Image.fromarray(to_srgb8(rgb)).save(str(path))
