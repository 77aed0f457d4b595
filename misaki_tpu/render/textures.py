"""Texture-slot evaluation on packed material columns
(reference: src/librender/spectra/{uniform,srgb}.cpp,
textures/checkerboard.cpp; see scene/types.py slot layout).

Every BSDF texture is baked into its material's packed columns at scene
compile: a spectral slot holds two sigmoid-coefficient triples (A and the
checkerboard's second color B) plus a 2x3 UV transform; `uniform` values are
encoded as degenerate sigmoids (exactly representable). Evaluation is pure
closed-form VPU math — no table indirection, no gathers.
"""

import jax.numpy as jnp


def _sigmoid_spectrum(c0, c1, c2, wavelengths):
    """srgb.h:8-19 sigmoid model; c* are (L,), wavelengths (4, L)."""
    v = (c0[None, :] * wavelengths + c1[None, :]) * wavelengths + c2[None, :]
    return jnp.maximum(0.5 * v / jnp.sqrt(v * v + 1.0) + 0.5, 0.0)


def _checker_pick(slot, uv):
    """checkerboard.cpp: to_uv transform, (u>.5 == v>.5) picks color0/A."""
    uu, vv = uv
    u = slot[-6] * uu + slot[-5] * vv + slot[-4]
    v = slot[-3] * uu + slot[-2] * vv + slot[-1]
    u = u - jnp.floor(u)
    v = v - jnp.floor(v)
    return (u > 0.5) == (v > 0.5)


def eval_spectral_slot(slot, uv, wavelengths):
    """slot: (13, L) rows [is_checker, cA(3), cB(3), uvT(6)] -> (4, L)."""
    is_checker = slot[0] > 0.5
    pick_a = jnp.where(is_checker, _checker_pick(slot, uv), True)
    c0 = jnp.where(pick_a, slot[1], slot[4])
    c1 = jnp.where(pick_a, slot[2], slot[5])
    c2 = jnp.where(pick_a, slot[3], slot[6])
    return _sigmoid_spectrum(c0, c1, c2, wavelengths)


def eval_scalar_slot(slot, uv):
    """slot: (9, L) rows [is_checker, vA, vB, uvT(6)] -> (L,)."""
    is_checker = slot[0] > 0.5
    pick_a = jnp.where(is_checker, _checker_pick(slot, uv), True)
    return jnp.where(pick_a, slot[1], slot[2])
