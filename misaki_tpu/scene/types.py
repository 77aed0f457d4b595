"""Compiled scene representation: frozen SoA device arrays + static tables.

This replaces the reference's runtime object graph (Object/Class/Properties,
include/misaki/core/{object,class,manager,properties}.h) with the TPU-native
equivalent: a **scene compiler output** — one flat pytree of arrays consumed
by jitted wavefront kernels, plus hashable static metadata. Pointer-chasing
virtual dispatch becomes integer tables + compute-all-and-select kernels.
"""

from dataclasses import dataclass, field, fields, replace
from typing import Any

import jax
import numpy as np

# ---- integer enums (static, used inside kernels via jnp.where selects) ----

# BSDF kinds
BSDF_DIFFUSE = 0
BSDF_ROUGH_CONDUCTOR = 1
BSDF_ROUGH_DIELECTRIC = 2
BSDF_DIELECTRIC = 3       # smooth dielectric (delta lobes)
BSDF_CONDUCTOR = 4        # smooth conductor (delta reflection; stale-set parity)
BSDF_NULL = 5             # pass-through (mask/volume boundaries)
BSDF_PLASTIC = 6          # rough plastic (stale-set parity)

# Distribution types (microfacet)
DIST_BECKMANN = 0
DIST_GGX = 1

# Texture kinds
TEX_UNIFORM = 0        # constant value inside [WAVELENGTH_MIN, MAX]
TEX_SRGB = 1           # sigmoid-coefficient reflectance spectrum
TEX_SRGB_D65 = 2       # sigmoid coeffs x D65 regular spectrum x scale
TEX_D65 = 3            # plain D65 x scale
TEX_CHECKERBOARD = 4   # two child textures selected by UV checker
TEX_BITMAP = 5         # image texture (H,W,3 sigmoid coeff planes)

# Emitter kinds
EM_AREA = 0
EM_CONSTANT = 1
EM_POINT = 2
EM_ENVMAP = 3

# Medium kinds
MED_NONE = -1
MED_HOMOGENEOUS = 0


def pytree_dataclass(cls):
    """Register a dataclass as a JAX pytree; fields named in `_static`
    are aux (hashable) data, the rest are leaves."""
    cls = dataclass(cls, frozen=True)
    static_names = tuple(getattr(cls, "_static", ()))
    data_names = tuple(
        f.name for f in fields(cls) if f.name not in static_names
    )

    def flatten(obj):
        data = tuple(getattr(obj, n) for n in data_names)
        aux = tuple(getattr(obj, n) for n in static_names)
        return data, aux

    def unflatten(aux, data):
        kwargs = dict(zip(data_names, data))
        kwargs.update(dict(zip(static_names, aux)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@pytree_dataclass
class Geometry:
    """All triangles of all shapes concatenated, world-space, SoA.

    Mirrors the reference Mesh's interleaved buffers (mesh.h:89-93) but
    decomposed into planes and pre-transformed to world space at compile time
    (obj.cpp applies to_world at load too).
    """

    p0: Any  # (F, 3) float32 — first vertex
    e1: Any  # (F, 3) — v1 - v0
    e2: Any  # (F, 3) — v2 - v0
    n0: Any  # (F, 3) shading normals at vertices (geometric if absent)
    n1: Any
    n2: Any
    uv0: Any  # (F, 2)
    uv1: Any
    uv2: Any
    shape_idx: Any      # (F,) int32 shape id per face
    has_normals: Any    # (F,) bool — per-face vertex-normal availability
    has_uvs: Any        # (F,) bool


@pytree_dataclass
class TextureTable:
    """SoA texture records; `eval_texture` in render/textures.py interprets."""

    kind: Any        # (T,) int32
    coeff: Any       # (T, 3) float32 — sigmoid coeffs, or [value, 0, 0]
    scale: Any       # (T,) float32 — multiplier (d65 scale etc.)
    child: Any       # (T, 2) int32 — checkerboard children (-1 otherwise)
    uv_transform: Any  # (T, 2, 3) float32 — affine UV transform rows
    reg_values: Any  # (T, 95) float32 — regular spectrum on the CIE grid
    rgb: Any         # (T, 3) float32 — source RGB (for eval_3-style queries)


@pytree_dataclass
class BSDFTable:
    """SoA material records (one per shape's resolved BSDF)."""

    kind: Any           # (B,) int32
    twosided: Any       # (B,) bool — twosided.cpp adapter flattened to a flag
    distr_type: Any     # (B,) int32 (microfacet)
    reflectance_tex: Any       # (B,) int32
    specular_reflectance_tex: Any   # (B,) int32
    specular_transmittance_tex: Any  # (B,) int32
    alpha_u_tex: Any    # (B,) int32
    alpha_v_tex: Any    # (B,) int32
    eta: Any            # (B,) float32 — dielectric int_ior/ext_ior ratio
    eta_rgb: Any        # (B, 3) float32 — conductor complex IOR (real)
    k_rgb: Any          # (B, 3) float32 — conductor complex IOR (imag)


@pytree_dataclass
class EmitterTable:
    kind: Any          # (E,) int32
    shape: Any         # (E,) int32 — owning shape for area lights (-1 else)
    radiance_tex: Any  # (E,) int32
    position: Any      # (E, 3) float32 — point lights
    # Area sampling: per-emitter face CDFs padded to a rectangle so that
    # row slices are static under jit (ragged layouts would need dynamic
    # shapes, which XLA cannot compile).
    face_global: Any   # (E, Fmax) int32 — global face indices (padded)
    face_cdf: Any      # (E, Fmax) float32 — normalized CDF (padded with 1.0)
    area: Any          # (E,) float32 — total surface area per emitter
    # Scene bounding sphere for infinite emitters (constant.cpp set_scene).
    bsphere_center: Any  # (3,) float32
    bsphere_radius: Any  # () float32


@pytree_dataclass
class MediumTable:
    """Homogeneous media parameters (media/homogeneous.cpp)."""

    kind: Any      # (M,) int32
    sigma_s: Any   # (M, 3) float32 (rgb -> upsampled at eval via sigmoid? kept rgb)
    sigma_a: Any   # (M, 3)
    sigma_s_coeff: Any  # (M, 3) sigmoid coeffs for spectral sigma_s
    sigma_a_coeff: Any  # (M, 3)
    scale: Any     # (M,) float32
    g: Any         # (M,) float32 — HG phase anisotropy (0 = isotropic)


@pytree_dataclass
class Camera:
    to_world: Any          # (4, 4) float32
    sample_to_camera: Any  # (4, 4) float32
    near: Any              # () float32
    far: Any               # () float32


@pytree_dataclass
class BVH:
    """Flat BVH2 arrays (accel/build.py). Empty (0-node) => brute force."""

    node_lo: Any       # (N, 3) float32 AABB min
    node_hi: Any       # (N, 3) float32 AABB max
    node_left: Any     # (N,) int32 — left child, or first-prim for leaves
    node_right: Any    # (N,) int32 — right child, or prim count for leaves
    node_is_leaf: Any  # (N,) bool
    prim_order: Any    # (F,) int32 — leaf primitive permutation


@pytree_dataclass
class CompiledScene:
    geometry: Geometry
    bvh: BVH
    textures: TextureTable
    bsdfs: BSDFTable
    emitters: EmitterTable
    media: MediumTable
    camera: Camera
    shape_bsdf: Any        # (S,) int32
    shape_emitter: Any     # (S,) int32 (-1 = none)
    shape_interior_medium: Any  # (S,) int32 (-1 = none)
    shape_exterior_medium: Any  # (S,) int32
    # ---- static configuration (hashable aux data) ----
    film_width: int
    film_height: int
    spp: int
    max_depth: int
    rr_depth: int
    hide_emitters: bool
    integrator: str        # "path" | "aov" | "debug" | "volpath"
    filter_type: str       # "gaussian" | "box"
    filter_stddev: float
    film_format: str       # "hdrfilm" | "rgbfilm"
    n_faces: int
    n_shapes: int
    n_emitters: int
    has_environment: bool
    environment_idx: int   # emitter index of the env light (-1 = none)
    emitter_kinds: tuple   # static per-emitter kind ints (EM_*) for unrolling
    aovs: tuple            # aov integrator channel spec

    _static = (
        "film_width",
        "film_height",
        "spp",
        "max_depth",
        "rr_depth",
        "hide_emitters",
        "integrator",
        "filter_type",
        "filter_stddev",
        "film_format",
        "n_faces",
        "n_shapes",
        "n_emitters",
        "has_environment",
        "environment_idx",
        "emitter_kinds",
        "aovs",
    )

    def replace(self, **kw):
        return replace(self, **kw)
