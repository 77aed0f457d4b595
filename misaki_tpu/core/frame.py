"""Orthonormal shading frames, SoA (reference: include/misaki/core/frame.h,
coordinate_system in mathutils.h:186-203).

A frame is a dict {"s": (...,3), "t": (...,3), "n": (...,3)}.
Directions in local frame coordinates have n == +z.
"""

import jax.numpy as jnp

from misaki_tpu.core import math as m


def coordinate_system(n):
    """Branchless Duff et al. ONB from a unit normal (mathutils.h:186-203)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    t = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return s, t


def make_frame(n):
    s, t = coordinate_system(n)
    return {"s": s, "t": t, "n": n}


def to_local(frame, v):
    return jnp.stack(
        [m.dot(v, frame["s"]), m.dot(v, frame["t"]), m.dot(v, frame["n"])],
        axis=-1,
    )


def to_world(frame, v):
    return (
        frame["s"] * v[..., 0:1]
        + frame["t"] * v[..., 1:2]
        + frame["n"] * v[..., 2:3]
    )


# Trig-free helpers on local-frame directions (frame.h:40-70).
def cos_theta(v):
    return v[..., 2]


def cos_theta_2(v):
    return v[..., 2] * v[..., 2]


def sin_theta_2(v):
    return jnp.maximum(1.0 - cos_theta_2(v), 0.0)


def sin_theta(v):
    return jnp.sqrt(sin_theta_2(v))


def tan_theta(v):
    return sin_theta(v) / v[..., 2]
