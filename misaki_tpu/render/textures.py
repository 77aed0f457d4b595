"""Wavefront texture evaluation — the L4 texture/spectra plugins as one
compute-all-and-select kernel (reference: src/librender/spectra/*.cpp,
textures/checkerboard.cpp, texture.h eval/eval_1/eval_3).

Per lane: an int32 texture id indexes the SoA TextureTable; all leaf kinds
are evaluated and selected (they are a handful of VPU flops each).
Checkerboards do one level of child indirection (the reference's checkers
only nest leaf textures too).
"""

import jax.numpy as jnp

from misaki_tpu.core.cie_data import CIE_MAX, CIE_MIN
from misaki_tpu.core.spectrum import WAVELENGTH_MAX, WAVELENGTH_MIN
from misaki_tpu.core.srgb_upsample import srgb_model_eval
from misaki_tpu.scene.types import (
    TEX_CHECKERBOARD,
    TEX_D65,
    TEX_SRGB,
    TEX_SRGB_D65,
    TEX_UNIFORM,
)


def _eval_leaf(tt, ids, wavelengths):
    """Evaluate non-checker kinds. ids (L,), wavelengths (L,4) -> (L,4)."""
    kind = tt.kind[ids]  # (L,)
    coeff = tt.coeff[ids]  # (L,3)
    in_range = (wavelengths >= WAVELENGTH_MIN) & (wavelengths <= WAVELENGTH_MAX)

    # UNIFORM (spectra/uniform.cpp:15-29)
    v_uniform = jnp.where(in_range, coeff[:, 0:1], 0.0)

    # SRGB sigmoid (spectra/srgb.cpp:14-27)
    v_srgb = srgb_model_eval(coeff, wavelengths)

    # regular-spectrum lerp on the common 95-bin grid
    # (spectra/regular.cpp eval_pdf; D65 and srgb_d65 use it)
    size = tt.reg_values.shape[-1]
    x = (wavelengths - CIE_MIN) * ((size - 1) / (CIE_MAX - CIE_MIN))
    i0 = jnp.clip(x.astype(jnp.int32), 0, size - 2)
    w1 = x - i0.astype(x.dtype)
    y0 = tt.reg_values[ids[:, None], i0]
    y1 = tt.reg_values[ids[:, None], i0 + 1]
    v_reg = (1.0 - w1) * y0 + w1 * y1

    # SRGB_D65 (spectra/srgb_d65.cpp eval): d65 regular x sigmoid
    v_srgb_d65 = v_reg * v_srgb

    out = jnp.where((kind == TEX_UNIFORM)[:, None], v_uniform, 0.0)
    out = jnp.where((kind == TEX_SRGB)[:, None], v_srgb, out)
    out = jnp.where((kind == TEX_SRGB_D65)[:, None], v_srgb_d65, out)
    out = jnp.where((kind == TEX_D65)[:, None], v_reg, out)
    return out


def _checker_child(tt, ids, uv):
    """Resolve checkerboard indirection: returns the effective leaf tex id
    (checkerboard.cpp: to_uv transform, u>.5 == v>.5 picks color0)."""
    is_checker = tt.kind[ids] == TEX_CHECKERBOARD
    T = tt.uv_transform[ids]  # (L,2,3)
    u = T[:, 0, 0] * uv[:, 0] + T[:, 0, 1] * uv[:, 1] + T[:, 0, 2]
    v = T[:, 1, 0] * uv[:, 0] + T[:, 1, 1] * uv[:, 1] + T[:, 1, 2]
    u = u - jnp.floor(u)
    v = v - jnp.floor(v)
    pick0 = (u > 0.5) == (v > 0.5)
    child = jnp.where(pick0, tt.child[ids, 0], tt.child[ids, 1])
    return jnp.where(is_checker, child, ids)


def eval_spectrum(tt, ids, uv, wavelengths):
    """Texture::eval — hero-wavelength spectral value (L, 4)."""
    ids = jnp.clip(ids, 0, tt.kind.shape[0] - 1)
    ids = _checker_child(tt, ids, uv)
    return _eval_leaf(tt, ids, wavelengths)


def eval_rgb(tt, ids, uv):
    """Texture::eval_3 — RGB value (conductor eta/k, rgbfilm paths)."""
    ids = jnp.clip(ids, 0, tt.kind.shape[0] - 1)
    ids = _checker_child(tt, ids, uv)
    return tt.rgb[ids]


def eval_scalar(tt, ids, uv):
    """Texture::eval_1 — scalar (microfacet alphas). Uniform textures store
    the value in coeff[0]; colored textures use luminance of the source rgb."""
    ids = jnp.clip(ids, 0, tt.kind.shape[0] - 1)
    ids = _checker_child(tt, ids, uv)
    kind = tt.kind[ids]
    rgb = tt.rgb[ids]
    lum = rgb[:, 0] * 0.212671 + rgb[:, 1] * 0.715160 + rgb[:, 2] * 0.072169
    return jnp.where(kind == TEX_UNIFORM, tt.coeff[ids, 0], lum)
