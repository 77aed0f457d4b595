"""Perspective camera ray generation
(reference: src/librender/sensors/perspective.cpp:23-42 + sensor.cpp:43).

One fused kernel: pixel positions -> world rays + hero wavelengths.
"""

import jax.numpy as jnp

from misaki_tpu.core import math as m
from misaki_tpu.core import spectrum as spec


def sample_ray(camera, pos_sample, wavelength_sample):
    """pos_sample: (L, 2) raster coords in [0,W)x[0,H); wavelength_sample (L,).

    Returns dict {o, d, mint, maxt, wavelengths, wav_weight}.
    """
    wavelengths, wav_weight = spec.sample_wavelength(wavelength_sample)

    s2c = camera.sample_to_camera
    px, py = pos_sample[:, 0], pos_sample[:, 1]
    # apply_point with z=0 and w-divide (transform.h apply_point)
    v = jnp.stack([px, py, jnp.zeros_like(px), jnp.ones_like(px)], axis=-1)
    near_p = v @ s2c.T
    near_p = near_p[:, :3] / near_p[:, 3:4]
    d = m.normalize(near_p)
    inv_z = 1.0 / d[:, 2]
    mint = camera.near * inv_z
    maxt = camera.far * inv_z

    c2w = camera.to_world
    o = jnp.broadcast_to(c2w[:3, 3], d.shape)
    d_world = d @ c2w[:3, :3].T
    return {
        "o": o,
        "d": d_world,
        "mint": mint,
        "maxt": maxt,
        "wavelengths": wavelengths,
        "wav_weight": wav_weight,
    }
