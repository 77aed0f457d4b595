"""Perspective camera ray generation
(reference: src/librender/sensors/perspective.cpp:23-42 + sensor.cpp:43).

One fused kernel: pixel positions -> world rays + hero wavelengths.
Lane-last layout: positions are (px, py) tuples; rays are vec3 tuples.
"""

import jax.numpy as jnp

from misaki_tpu.core import spectrum as spec
from misaki_tpu.core import vec


def sample_ray(camera, pos_sample, wavelength_sample):
    """pos_sample: (px, py) tuple of (L,) raster coords; wavelength_sample (L,).

    Returns dict {o, d (vec3), mint, maxt (L,), wavelengths, wav_weight (4, L)}.
    """
    wavelengths, wav_weight = spec.sample_wavelength(wavelength_sample)

    s2c = camera.sample_to_camera
    px, py = pos_sample
    # apply_point with z=0 and w-divide (transform.h apply_point)
    nx = s2c[0, 0] * px + s2c[0, 1] * py + s2c[0, 3]
    ny = s2c[1, 0] * px + s2c[1, 1] * py + s2c[1, 3]
    nz = s2c[2, 0] * px + s2c[2, 1] * py + s2c[2, 3]
    nw = s2c[3, 0] * px + s2c[3, 1] * py + s2c[3, 3]
    inv_w = 1.0 / nw
    near_p = (nx * inv_w, ny * inv_w, nz * inv_w)
    d = vec.normalize(near_p)
    inv_z = 1.0 / d[2]
    mint = camera.near * inv_z
    maxt = camera.far * inv_z

    c2w = camera.to_world
    o = vec.splat3((c2w[0, 3], c2w[1, 3], c2w[2, 3]), px)
    dx, dy, dz = d
    d_world = (
        c2w[0, 0] * dx + c2w[0, 1] * dy + c2w[0, 2] * dz,
        c2w[1, 0] * dx + c2w[1, 1] * dy + c2w[1, 2] * dz,
        c2w[2, 0] * dx + c2w[2, 1] * dy + c2w[2, 2] * dz,
    )
    return {
        "o": o,
        "d": d_world,
        "mint": mint,
        "maxt": maxt,
        "wavelengths": wavelengths,
        "wav_weight": wav_weight,
    }
