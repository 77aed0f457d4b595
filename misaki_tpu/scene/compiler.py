"""Scene compiler: plugin-dict graph -> CompiledScene (flat SoA device arrays).

This is the TPU-native replacement for the reference's InstanceManager plugin
instantiation (src/librender/manager.cpp) + Scene constructor
(src/librender/scene.cpp:26-64): instead of building a pointer graph of
virtual objects, we bake every plugin into rows of fixed tables that the
wavefront kernels index with integers.

Geometry is transformed to world space here (as obj.cpp does at load);
sRGB colors are upsampled to sigmoid spectra here (replacing the rgb2spec
table); per-emitter area CDFs are prebuilt here (mesh.cpp area_distr_build).
"""

import os
from pathlib import Path

import numpy as np

from misaki_tpu.core import transform as tr
from misaki_tpu.core.cie_data import CIE_MAX, CIE_MIN, D65_DATA, D65_TABLE_NORMALIZATION
from misaki_tpu.core.srgb_upsample import fit_srgb_coeffs
from misaki_tpu.scene import procedural
from misaki_tpu.scene.obj_loader import load_obj
from misaki_tpu.scene.types import (
    BSDF_CONDUCTOR,
    BSDF_DIELECTRIC,
    BSDF_DIFFUSE,
    BSDF_NULL,
    BSDF_ROUGH_CONDUCTOR,
    BSDF_ROUGH_DIELECTRIC,
    BVH,
    BSDFTable,
    Camera,
    CompiledScene,
    DIST_BECKMANN,
    DIST_GGX,
    EM_AREA,
    EM_CONSTANT,
    EM_POINT,
    EmitterTable,
    Geometry,
    MED_HOMOGENEOUS,
    MediumTable,
    TEX_CHECKERBOARD,
    TEX_D65,
    TEX_SRGB,
    TEX_SRGB_D65,
    TEX_UNIFORM,
    TextureTable,
)

_CIE_GRID = np.linspace(CIE_MIN, CIE_MAX, 95)


class _TextureBuilder:
    """Interns texture plugins into SoA rows (render/textures.py interprets)."""

    def __init__(self):
        self.kind = []
        self.coeff = []
        self.scale = []
        self.child = []
        self.uv_transform = []
        self.rgb = []
        self.reg_values = []

    def _push(self, kind, coeff=(0, 0, 0), scale=1.0, child=(-1, -1),
              uv_t=None, rgb=(0, 0, 0), reg=None):
        self.kind.append(kind)
        self.coeff.append(np.asarray(coeff, np.float64))
        self.scale.append(scale)
        self.child.append(child)
        self.uv_transform.append(
            uv_t if uv_t is not None else np.array([[1, 0, 0], [0, 1, 0]], np.float64)
        )
        self.rgb.append(np.asarray(rgb, np.float64))
        self.reg_values.append(
            reg if reg is not None else np.zeros(95, np.float64)
        )
        return len(self.kind) - 1

    def uniform(self, value):
        return self._push(TEX_UNIFORM, coeff=(value, 0, 0), rgb=(value,) * 3)

    def srgb(self, color):
        return self._push(TEX_SRGB, coeff=fit_srgb_coeffs(color), rgb=color)

    def srgb_d65(self, color, scale=1.0):
        """srgb_d65.cpp:15-40 — normalize by 2*max, fold into a d65 scale."""
        color = np.asarray(color, np.float64)
        s = float(color.max()) * 2.0
        if s != 0.0:
            color = color / s
        coeff = fit_srgb_coeffs(color)
        d65 = D65_DATA * (scale * s * D65_TABLE_NORMALIZATION)
        return self._push(TEX_SRGB_D65, coeff=coeff, scale=scale * s,
                          rgb=color, reg=d65)

    def d65(self, scale=1.0):
        d65 = D65_DATA * (scale * D65_TABLE_NORMALIZATION)
        return self._push(TEX_D65, scale=scale, reg=d65, rgb=(1.0, 1.0, 1.0))

    def regular(self, lambda_min, lambda_max, values):
        """Resample any regular spectrum onto the common 95-bin CIE grid."""
        src_grid = np.linspace(lambda_min, lambda_max, len(values))
        reg = np.interp(_CIE_GRID, src_grid, values, left=values[0], right=values[-1])
        # Outside the declared range the reference clamps to edge bins too
        # (regular.cpp eval_pdf index clamp) so edge extension matches.
        return self._push(TEX_D65, scale=1.0, reg=reg,
                          rgb=(float(np.mean(values)),) * 3)

    def checkerboard(self, tex0, tex1, uv_transform_3x3):
        uv_t = np.asarray(uv_transform_3x3, np.float64)[:2, :3]
        return self._push(TEX_CHECKERBOARD, child=(tex0, tex1), uv_t=uv_t)

    def from_plugin(self, obj):
        t = obj["type"]
        p = obj["props"]
        if t == "uniform":
            return self.uniform(float(p["value"]))
        if t == "srgb":
            return self.srgb(np.asarray(p["color"], np.float64))
        if t == "srgb_d65":
            return self.srgb_d65(np.asarray(p["color"], np.float64),
                                 float(p.get("scale", 1.0)))
        if t == "d65":
            return self.d65(float(p.get("scale", 1.0)))
        if t == "regular":
            return self.regular(p["lambda_min"], p["lambda_max"],
                                np.asarray(p["values"], np.float64))
        if t == "checkerboard":
            c0 = self.child_tex(obj, "color0", 0.4)
            c1 = self.child_tex(obj, "color1", 0.2)
            uv_t = p.get("to_uv", tr.identity())
            uv3 = np.asarray(uv_t, np.float64)[:3, :3]
            # 2D affine from the 4x4's upper block (Transform4f::extract)
            m = np.eye(3)
            m[:2, :2] = uv3[:2, :2]
            m[:2, 2] = np.asarray(uv_t, np.float64)[:2, 3]
            return self.checkerboard(c0, c1, m)
        raise ValueError(f"Unsupported texture plugin '{t}'")

    def child_tex(self, obj, name, default):
        """Properties::texture semantics: named child plugin, else a uniform
        constant default (properties.cpp:194-234)."""
        for n, ch in obj["children"]:
            if n == name:
                return self.from_plugin(ch)
        if name in obj["props"]:
            v = obj["props"][name]
            if isinstance(v, (int, float)):
                return self.uniform(float(v))
        return self.uniform(float(default))

    def finalize(self):
        return TextureTable(
            kind=np.asarray(self.kind, np.int32),
            coeff=np.asarray(self.coeff, np.float32),
            scale=np.asarray(self.scale, np.float32),
            child=np.asarray(self.child, np.int32),
            uv_transform=np.asarray(self.uv_transform, np.float32),
            reg_values=np.asarray(self.reg_values, np.float32),
            rgb=np.asarray(self.rgb, np.float32),
        )


_DIST_MAP = {"beckmann": DIST_BECKMANN, "ggx": DIST_GGX}


class _BSDFBuilder:
    def __init__(self, textures):
        self.tex = textures
        self.rows = []
        self._cache = {}

    def compile(self, obj):
        key = id(obj)
        if key in self._cache:
            return self._cache[key]
        t = obj["type"]
        p = obj["props"]
        row = {
            "kind": BSDF_DIFFUSE,
            "twosided": False,
            "distr_type": _DIST_MAP.get(p.get("distribution", "beckmann"), DIST_BECKMANN),
            "reflectance_tex": -1,
            "specular_reflectance_tex": -1,
            "specular_transmittance_tex": -1,
            "alpha_u_tex": -1,
            "alpha_v_tex": -1,
            "eta": 1.5,
            "eta_rgb": np.zeros(3),
            "k_rgb": np.ones(3),
        }
        if t == "twosided":
            # twosided.cpp: adapter around (up to two) nested BSDFs; the live
            # scenes always nest one — flatten to a flag.
            nested = [ch for _, ch in obj["children"] if ch["type"] != "twosided"]
            if not nested:
                raise ValueError("twosided: a nested one-sided material is required")
            inner = self.compile(nested[0])
            idx = len(self.rows)
            self.rows.append({**self.rows[inner], "twosided": True})
            self._cache[key] = idx
            return idx
        if t == "diffuse":
            row["kind"] = BSDF_DIFFUSE
            row["reflectance_tex"] = self.tex.child_tex(obj, "reflectance", 0.5)
        elif t == "roughconductor":
            row["kind"] = BSDF_ROUGH_CONDUCTOR
            row["specular_reflectance_tex"] = self.tex.child_tex(
                obj, "specular_reflectance", 1.0
            )
            au, av = self._alphas(obj, p)
            row["alpha_u_tex"], row["alpha_v_tex"] = au, av
            row["eta_rgb"], row["k_rgb"] = self._conductor_ior(obj, p)
        elif t == "conductor":
            row["kind"] = BSDF_CONDUCTOR
            row["specular_reflectance_tex"] = self.tex.child_tex(
                obj, "specular_reflectance", 1.0
            )
            row["eta_rgb"], row["k_rgb"] = self._conductor_ior(obj, p)
        elif t == "roughdielectric":
            row["kind"] = BSDF_ROUGH_DIELECTRIC
            row["specular_reflectance_tex"] = self.tex.child_tex(
                obj, "specular_reflectance", 1.0
            )
            row["specular_transmittance_tex"] = self.tex.child_tex(
                obj, "specular_transmittance", 1.0
            )
            au, av = self._alphas(obj, p)
            row["alpha_u_tex"], row["alpha_v_tex"] = au, av
            row["eta"] = float(p.get("int_ior", 1.5046)) / float(p.get("ext_ior", 1.00028))
        elif t == "dielectric":
            row["kind"] = BSDF_DIELECTRIC
            row["specular_reflectance_tex"] = self.tex.child_tex(
                obj, "specular_reflectance", 1.0
            )
            row["specular_transmittance_tex"] = self.tex.child_tex(
                obj, "specular_transmittance", 1.0
            )
            row["eta"] = float(p.get("int_ior", 1.49)) / float(p.get("ext_ior", 1.00028))
        elif t == "null":
            row["kind"] = BSDF_NULL
        else:
            raise ValueError(f"Unsupported BSDF plugin '{t}'")
        idx = len(self.rows)
        self.rows.append(row)
        self._cache[key] = idx
        return idx

    def _alphas(self, obj, p):
        if "alpha_u" in p or "alpha_v" in p:
            return (
                self.tex.child_tex(obj, "alpha_u", 0.1),
                self.tex.child_tex(obj, "alpha_v", 0.1),
            )
        a = self.tex.child_tex(obj, "alpha", 0.1)
        return a, a

    def _conductor_ior(self, obj, p):
        eta = np.zeros(3)
        k = np.ones(3)
        for name, ch in obj["children"]:
            if name == "eta":
                eta = np.asarray(ch["props"].get("color", (0, 0, 0)), np.float64)
            if name == "k":
                k = np.asarray(ch["props"].get("color", (1, 1, 1)), np.float64)
        if "eta" in p:
            eta = np.asarray(p["eta"], np.float64)
        if "k" in p:
            k = np.asarray(p["k"], np.float64)
        return eta, k

    def finalize(self):
        if not self.rows:
            # guarantee at least one row so tables are never empty
            self.rows.append(
                {
                    "kind": BSDF_DIFFUSE,
                    "twosided": False,
                    "distr_type": DIST_BECKMANN,
                    "reflectance_tex": self.tex.uniform(0.5),
                    "specular_reflectance_tex": -1,
                    "specular_transmittance_tex": -1,
                    "alpha_u_tex": -1,
                    "alpha_v_tex": -1,
                    "eta": 1.5,
                    "eta_rgb": np.zeros(3),
                    "k_rgb": np.ones(3),
                }
            )
        get = lambda k, dt: np.asarray([r[k] for r in self.rows], dt)
        return BSDFTable(
            kind=get("kind", np.int32),
            twosided=get("twosided", bool),
            distr_type=get("distr_type", np.int32),
            reflectance_tex=get("reflectance_tex", np.int32),
            specular_reflectance_tex=get("specular_reflectance_tex", np.int32),
            specular_transmittance_tex=get("specular_transmittance_tex", np.int32),
            alpha_u_tex=get("alpha_u_tex", np.int32),
            alpha_v_tex=get("alpha_v_tex", np.int32),
            eta=get("eta", np.float32),
            eta_rgb=np.stack([r["eta_rgb"] for r in self.rows]).astype(np.float32),
            k_rgb=np.stack([r["k_rgb"] for r in self.rows]).astype(np.float32),
        )


def _find_child(obj, type_names, name=None):
    for n, ch in obj["children"]:
        if ch["type"] in type_names and (name is None or n == name):
            return ch
    return None


def _load_mesh_for_shape(shape, base_dir):
    p = shape["props"]
    to_world = p.get("to_world", None)
    if shape["type"] == "obj":
        fname = p["filename"]
        path = Path(base_dir) / fname
        if path.exists():
            return load_obj(
                path, to_world, p.get("filp_tex_coords", p.get("flip_tex_coords", True))
            )
        mesh = procedural.get_procedural_mesh(Path(fname).name, to_world)
        if mesh is None:
            raise FileNotFoundError(
                f"Mesh '{fname}' not found and no procedural substitute exists"
            )
        return mesh
    if shape["type"] == "rectangle":
        mesh = procedural.rectangle()
        return procedural.get_procedural_mesh("rectangle.obj", to_world) or mesh
    if shape["type"] == "sphere":
        radius = float(p.get("radius", 1.0))
        center = np.asarray(p.get("center", (0, 0, 0)), np.float64)
        m = procedural.sphere_standin(radius, center, sub=4)
        if to_world is not None:
            m = procedural._tris_mesh(
                m["positions"], m["normals"], m["uvs"], to_world
            )
        return m
    raise ValueError(f"Unsupported shape plugin '{shape['type']}'")


_INTEGRATOR_TYPES = {"path", "aov", "debug", "volpath", "direct"}
_EMITTER_TYPES = {"area", "constant", "point", "envmap"}


def compile_scene(desc, spp=None, width=None, height=None, max_depth=None):
    """Lower a loaded scene description to a CompiledScene."""
    base_dir = desc.get("base_dir", ".")
    tex = _TextureBuilder()
    bsdfs = _BSDFBuilder(tex)

    # ---------------- integrator / sensor / film / sampler ----------------
    integ = _find_child(desc, _INTEGRATOR_TYPES) or {
        "type": "path", "props": {}, "children": [],
    }
    sensor = _find_child(desc, {"perspective"})
    if sensor is None:
        raise ValueError("Scene needs a perspective sensor")
    sp = sensor["props"]
    film = _find_child(sensor, {"hdrfilm", "rgbfilm"}) or {
        "type": "hdrfilm", "props": {}, "children": [],
    }
    sampler = _find_child(sensor, {"independent"}) or {
        "type": "independent", "props": {}, "children": [],
    }
    W = int(width or film["props"].get("width", 640))
    H = int(height or film["props"].get("height", 320))
    n_spp = int(spp or sampler["props"].get("sample_count", 4))
    rfilter = _find_child(film, {"gaussian", "box"})
    filter_type = rfilter["type"] if rfilter else "gaussian"
    filter_stddev = float(rfilter["props"].get("stddev", 0.5)) if rfilter else 0.5

    fov = float(sp.get("fov", 30.0))
    near = float(sp.get("near_clip", 1e-2))
    far = float(sp.get("far_clip", 1e4))
    cam_to_world = np.asarray(sp.get("to_world", tr.identity()), np.float64)
    c2s = tr.camera_to_sample(W, H, fov, near, far)
    camera = Camera(
        to_world=cam_to_world.astype(np.float32),
        sample_to_camera=np.linalg.inv(c2s).astype(np.float32),
        near=np.float32(near),
        far=np.float32(far),
    )

    # ---------------- media ----------------
    media_rows = []

    def compile_medium(obj):
        p = obj["props"]

        def _rgb_of(name, default):
            for n, ch in obj["children"]:
                if n == name and "color" in ch["props"]:
                    return np.asarray(ch["props"]["color"], np.float64)
            return np.asarray(default, np.float64)

        sigma_s = _rgb_of("sigma_s", (0.0, 0.0, 0.0))
        sigma_a = _rgb_of("sigma_a", (0.0, 0.0, 0.0))
        row = {
            "kind": MED_HOMOGENEOUS,
            "sigma_s": sigma_s,
            "sigma_a": sigma_a,
            "sigma_s_coeff": fit_srgb_coeffs(np.clip(sigma_s, 0, 1)),
            "sigma_a_coeff": fit_srgb_coeffs(np.clip(sigma_a, 0, 1)),
            "scale": float(p.get("scale", 1.0)),
            "g": float(p.get("g", 0.0)),
        }
        media_rows.append(row)
        return len(media_rows) - 1

    # ---------------- shapes + geometry + area emitters ----------------
    shape_rows = []
    emitter_objs = []  # (kind, shape_idx, plugin)
    face_blocks = []

    for name, ch in desc["children"]:
        if ch["type"] in ("obj", "rectangle", "sphere"):
            mesh = _load_mesh_for_shape(ch, base_dir)
            bsdf_obj = _find_child(ch, {
                "diffuse", "roughconductor", "roughdielectric", "dielectric",
                "twosided", "conductor", "null",
            })
            bsdf_idx = bsdfs.compile(bsdf_obj) if bsdf_obj else bsdfs.compile(
                {"type": "diffuse", "props": {}, "children": []}
            )
            em = _find_child(ch, {"area"})
            emitter_idx = -1
            if em is not None:
                emitter_idx = len(emitter_objs)
                emitter_objs.append((EM_AREA, len(shape_rows), em))
            interior = -1
            exterior = -1
            for n2, ch2 in ch["children"]:
                if ch2["type"] == "homogeneous":
                    mid = compile_medium(ch2)
                    if n2 == "interior":
                        interior = mid
                    elif n2 == "exterior":
                        exterior = mid
            shape_rows.append(
                {"bsdf": bsdf_idx, "emitter": emitter_idx,
                 "interior": interior, "exterior": exterior}
            )
            face_blocks.append(mesh)
        elif ch["type"] in ("constant", "envmap", "point"):
            kind = {"constant": EM_CONSTANT, "envmap": EM_CONSTANT, "point": EM_POINT}[
                ch["type"]
            ]
            emitter_objs.append((kind, -1, ch))

    if not face_blocks:
        raise ValueError("Scene has no shapes")

    # concatenate all faces
    P = np.concatenate([b["positions"] for b in face_blocks], axis=0)
    Nrm = np.concatenate([b["normals"] for b in face_blocks], axis=0)
    UV = np.concatenate([b["uvs"] for b in face_blocks], axis=0)
    shape_idx = np.concatenate(
        [np.full(len(b["positions"]), i, np.int32) for i, b in enumerate(face_blocks)]
    )
    has_n = np.concatenate(
        [np.full(len(b["positions"]), b["has_normals"], bool) for b in face_blocks]
    )
    has_uv = np.concatenate(
        [np.full(len(b["positions"]), b["has_uvs"], bool) for b in face_blocks]
    )
    F = len(P)
    p0 = P[:, 0]
    e1 = P[:, 1] - P[:, 0]
    e2 = P[:, 2] - P[:, 0]
    geom = Geometry(
        p0=p0.astype(np.float32),
        e1=e1.astype(np.float32),
        e2=e2.astype(np.float32),
        n0=Nrm[:, 0].astype(np.float32),
        n1=Nrm[:, 1].astype(np.float32),
        n2=Nrm[:, 2].astype(np.float32),
        uv0=UV[:, 0].astype(np.float32),
        uv1=UV[:, 1].astype(np.float32),
        uv2=UV[:, 2].astype(np.float32),
        shape_idx=shape_idx,
        has_normals=has_n,
        has_uvs=has_uv,
    )

    # scene bbox -> bounding sphere (constant.cpp set_scene)
    lo = P.reshape(-1, 3).min(axis=0)
    hi = P.reshape(-1, 3).max(axis=0)
    center = 0.5 * (lo + hi)
    radius = float(np.linalg.norm(hi - center))
    radius = max(8.94e-5, radius * (1.0 + 8.94e-5))

    # ---------------- emitters ----------------
    em_kind, em_shape, em_tex, em_pos = [], [], [], []
    em_face_global, em_face_cdf, em_area = [], [], []
    face_area = 0.5 * np.linalg.norm(np.cross(e2, e1), axis=-1)

    env_idx = -1
    for ei, (kind, s_idx, obj) in enumerate(emitter_objs):
        em_kind.append(kind)
        em_shape.append(s_idx)
        em_pos.append(np.asarray(obj["props"].get("position", (0, 0, 0)), np.float64))
        # radiance texture (area.cpp / constant.cpp default: D65(1))
        rad = None
        for n2, ch2 in obj["children"]:
            if n2 in ("radiance", "intensity"):
                rad = tex.from_plugin(ch2)
        if rad is None:
            rad = tex.d65(1.0)
        em_tex.append(rad)
        if kind == EM_AREA:
            mask = shape_idx == s_idx
            fidx = np.nonzero(mask)[0]
            areas = face_area[fidx]
            total = float(areas.sum())
            cdf = np.cumsum(areas) / max(total, 1e-30)
            em_face_global.append(fidx.astype(np.int32))
            em_face_cdf.append(cdf.astype(np.float32))
            em_area.append(total)
        else:
            em_face_global.append(np.zeros(1, np.int32))
            em_face_cdf.append(np.ones(1, np.float32))
            em_area.append(4.0 * np.pi * radius * radius)
            if kind == EM_CONSTANT:
                env_idx = ei

    n_emitters = len(em_kind)
    fmax = max([len(f) for f in em_face_global], default=1)
    fg_pad = np.zeros((n_emitters, fmax), np.int32)
    fc_pad = np.ones((n_emitters, fmax), np.float32)
    for i, (fg, fc) in enumerate(zip(em_face_global, em_face_cdf)):
        fg_pad[i, : len(fg)] = fg
        fg_pad[i, len(fg):] = fg[-1] if len(fg) else 0
        fc_pad[i, : len(fc)] = fc
    emitters = EmitterTable(
        kind=np.asarray(em_kind, np.int32).reshape(-1),
        shape=np.asarray(em_shape, np.int32).reshape(-1),
        radiance_tex=np.asarray(em_tex, np.int32).reshape(-1),
        position=(
            np.stack(em_pos).astype(np.float32) if em_pos else np.zeros((0, 3), np.float32)
        ),
        face_global=fg_pad,
        face_cdf=fc_pad,
        area=np.asarray(em_area, np.float32).reshape(-1),
        bsphere_center=center.astype(np.float32),
        bsphere_radius=np.float32(radius),
    )

    # ---------------- finalize tables ----------------
    bsdf_table = bsdfs.finalize()
    tex_table = tex.finalize()

    media = MediumTable(
        kind=(
            np.asarray([r["kind"] for r in media_rows], np.int32)
            if media_rows else np.zeros(0, np.int32)
        ),
        sigma_s=(
            np.stack([r["sigma_s"] for r in media_rows]).astype(np.float32)
            if media_rows else np.zeros((0, 3), np.float32)
        ),
        sigma_a=(
            np.stack([r["sigma_a"] for r in media_rows]).astype(np.float32)
            if media_rows else np.zeros((0, 3), np.float32)
        ),
        sigma_s_coeff=(
            np.stack([r["sigma_s_coeff"] for r in media_rows]).astype(np.float32)
            if media_rows else np.zeros((0, 3), np.float32)
        ),
        sigma_a_coeff=(
            np.stack([r["sigma_a_coeff"] for r in media_rows]).astype(np.float32)
            if media_rows else np.zeros((0, 3), np.float32)
        ),
        scale=(
            np.asarray([r["scale"] for r in media_rows], np.float32)
            if media_rows else np.zeros(0, np.float32)
        ),
        g=(
            np.asarray([r["g"] for r in media_rows], np.float32)
            if media_rows else np.zeros(0, np.float32)
        ),
    )

    from misaki_tpu.accel.build import build_bvh

    bvh = build_bvh(p0, e1, e2)

    ip = integ["props"]
    scene = CompiledScene(
        geometry=geom,
        bvh=bvh,
        textures=tex_table,
        bsdfs=bsdf_table,
        emitters=emitters,
        media=media,
        camera=camera,
        shape_bsdf=np.asarray([r["bsdf"] for r in shape_rows], np.int32),
        shape_emitter=np.asarray([r["emitter"] for r in shape_rows], np.int32),
        shape_interior_medium=np.asarray([r["interior"] for r in shape_rows], np.int32),
        shape_exterior_medium=np.asarray([r["exterior"] for r in shape_rows], np.int32),
        film_width=W,
        film_height=H,
        spp=n_spp,
        max_depth=int(max_depth if max_depth is not None else ip.get("max_depth", -1)),
        rr_depth=int(ip.get("rr_depth", 5)),
        hide_emitters=bool(ip.get("hide_emitters", False)),
        integrator=integ["type"],
        filter_type=filter_type,
        filter_stddev=filter_stddev,
        film_format=film["type"],
        n_faces=F,
        n_shapes=len(shape_rows),
        n_emitters=n_emitters,
        has_environment=env_idx >= 0,
        environment_idx=env_idx,
        emitter_kinds=tuple(int(k) for k in em_kind),
        aovs=tuple(ip.get("aovs", "").split(",")) if ip.get("aovs") else (),
    )
    return scene


def load_and_compile(path, params=None, **kw):
    from misaki_tpu.scene.loader import load_file

    return compile_scene(load_file(path, params), **kw)
