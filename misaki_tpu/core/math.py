"""Math constants and safe helpers (reference: include/misaki/core/mathutils.h).

Everything here is plain jnp, differentiable, and shape-polymorphic: functions
take arrays of any leading batch shape (the wavefront dimension).
"""

import jax.numpy as jnp
import numpy as np

Pi = float(np.pi)
InvPi = 1.0 / Pi
TwoPi = 2.0 * Pi
InvTwoPi = 1.0 / TwoPi
InvFourPi = 1.0 / (4.0 * Pi)
Inf = float(np.inf)

# mathutils.h:19-20 — float32 machine epsilon / 2 scaled up.
Epsilon = float(np.finfo(np.float32).eps) / 2.0
RayEpsilon = Epsilon * 1500.0          # ~8.94e-5
ShadowEpsilon = RayEpsilon * 10.0      # ~8.94e-4


def safe_sqrt(x):
    """sqrt clamped away from 0 so the *gradient* is finite at x <= 0.

    sqrt'(0) = inf would poison reverse-mode AD even under jnp.where masking
    (the unselected branch's vjp still evaluates); clamping at 1e-20 changes
    the value by at most 1e-10 and keeps every cotangent finite.
    """
    return jnp.sqrt(jnp.maximum(x, 1e-20))


def safe_rsqrt(x):
    return 1.0 / jnp.sqrt(jnp.maximum(x, jnp.finfo(jnp.float32).tiny))


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


def sqr(x):
    return x * x


def deg_to_rad(x):
    return x * (Pi / 180.0)


def dot(a, b):
    """Batched dot product over the trailing axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def normalize(v):
    return v * safe_rsqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def norm(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def cross(a, b):
    return jnp.cross(a, b)


def lerp(a, b, t):
    return a * (1.0 - t) + b * t


def mis_power2(pdf_a, pdf_b):
    """Power-2 MIS heuristic (reference: integrators/path.cpp:127-131)."""
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    return jnp.where(a2 > 0.0, a2 / jnp.maximum(a2 + b2, jnp.finfo(jnp.float32).tiny), 0.0)
