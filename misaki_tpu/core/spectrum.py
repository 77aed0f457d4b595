"""Hero-wavelength spectral transport core
(reference: include/misaki/core/spectrum.h, src/librender/spectrum.cpp).

Every ray carries `N_WAVELENGTHS = 4` hero wavelengths; radiance values are
(..., 4) arrays ("Spectrum") and wavelengths are (..., 4) arrays in nm.
All functions are jnp, batched over arbitrary leading dims, differentiable.
"""

import jax.numpy as jnp
import numpy as np

from misaki_tpu.core.cie_data import (
    CIE1931_X,
    CIE1931_Y,
    CIE1931_Z,
    CIE_MAX,
    CIE_MIN,
    CIE_SAMPLES,
    D65_DATA,
    D65_TABLE_NORMALIZATION,
)

N_WAVELENGTHS = 4
WAVELENGTH_MIN = 360.0
WAVELENGTH_MAX = 830.0

_CIE_XYZ = jnp.asarray(np.stack([CIE1931_X, CIE1931_Y, CIE1931_Z], axis=0))


def cie1931_xyz(wavelengths):
    """Linear interpolation into the 95-sample CIE table (spectrum.h:82-107).

    Returns (X, Y, Z), each shaped like `wavelengths`.
    """
    t = (wavelengths - CIE_MIN) * ((CIE_SAMPLES - 1) / (CIE_MAX - CIE_MIN))
    i0 = jnp.clip(t.astype(jnp.int32), 0, CIE_SAMPLES - 2)
    w1 = t - i0.astype(t.dtype)
    w0 = 1.0 - w1
    v0 = _CIE_XYZ[:, i0]  # (3, ...) gathers
    v1 = _CIE_XYZ[:, i0 + 1]
    out = w0[None] * v0 + w1[None] * v1
    return out[0], out[1], out[2]


def spectrum_to_xyz(value, wavelengths):
    """Mean-reduce over hero wavelengths (spectrum.h:109-115). Returns (...,3)."""
    X, Y, Z = cie1931_xyz(wavelengths)
    return jnp.stack(
        [
            jnp.mean(X * value, axis=-1),
            jnp.mean(Y * value, axis=-1),
            jnp.mean(Z * value, axis=-1),
        ],
        axis=-1,
    )


# sRGB <-> XYZ (ITU-R BT.709 primaries, spectrum.h:131-143)
_SRGB_TO_XYZ = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float32,
)
_XYZ_TO_SRGB = np.array(
    [
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ],
    dtype=np.float32,
)


def srgb_to_xyz(rgb):
    return rgb @ jnp.asarray(_SRGB_TO_XYZ).T


def xyz_to_srgb(xyz):
    return xyz @ jnp.asarray(_XYZ_TO_SRGB).T


def sample_shifted(sample):
    """Stratified hero-wavelength shift (mathutils.h:167-182).

    sample: (...,) scalar in [0,1) -> (..., 4) shifted copies mod 1.
    """
    shift = jnp.arange(N_WAVELENGTHS, dtype=jnp.float32) / N_WAVELENGTHS
    value = sample[..., None] + shift
    return jnp.where(value <= 1.0, value, value - 1.0)


def sample_rgb_spectrum(sample):
    """Importance-sampled visible-range wavelengths (spectrum.h:152-173).

    The pdf is proportional to sech^2(0.0072 (lambda - 538)); `weight`
    returned is 1/pdf. sample: (..., 4) -> (wavelengths, weight), both (..., 4).
    """
    wavelengths = (
        538.0
        - jnp.arctanh(0.8569106254698279 - 1.8275019724092267 * sample)
        * 138.88888888888889
    )
    tmp = jnp.cosh(0.0072 * (wavelengths - 538.0))
    weight = 253.82 * tmp * tmp
    return wavelengths, weight


def pdf_rgb_spectrum(wavelengths):
    """Reciprocal of the sample_rgb_spectrum weight, zero outside the range."""
    tmp = 1.0 / jnp.cosh(0.0072 * (wavelengths - 538.0))
    inside = jnp.logical_and(
        wavelengths >= WAVELENGTH_MIN, wavelengths <= WAVELENGTH_MAX
    )
    return jnp.where(inside, tmp * tmp / 253.82, 0.0)


def sample_wavelength(sample):
    """Stratified-shift + rgb importance sampling (spectrum.h:175-181).

    sample: (...,) -> ((..., 4) wavelengths, (..., 4) weights).
    """
    return sample_rgb_spectrum(sample_shifted(sample))


# --- D65 illuminant as a regular spectrum -----------------------------------

_D65 = jnp.asarray(D65_DATA)


def eval_d65(wavelengths, scale=1.0):
    """D65 radiance lerped on the 95-bin grid, with the reference's 1/10568
    normalization (spectra/d65.cpp:22 + regular.cpp eval_pdf lerp)."""
    return eval_regular(
        _D65, CIE_MIN, CIE_MAX, wavelengths
    ) * (scale * D65_TABLE_NORMALIZATION)


def eval_regular(values, lambda_min, lambda_max, wavelengths):
    """Regularly-sampled spectrum, linear interp (spectra/regular.cpp eval_pdf).

    Out-of-range wavelengths clamp to the edge bins (matching the reference's
    index clamping).
    """
    size = values.shape[-1]
    x = (wavelengths - lambda_min) * ((size - 1) / (lambda_max - lambda_min))
    i0 = jnp.clip(x.astype(jnp.int32), 0, size - 2)
    w1 = x - i0.astype(x.dtype)
    w0 = 1.0 - w1
    return w0 * values[i0] + w1 * values[i0 + 1]


def luminance(rgb):
    return (
        rgb[..., 0] * 0.212671 + rgb[..., 1] * 0.715160 + rgb[..., 2] * 0.072169
    )
