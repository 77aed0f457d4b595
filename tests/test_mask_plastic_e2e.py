"""End-to-end scene tests for the round-3 material additions:
roughplastic (bsdfs/roughplastic.cpp) and mask (bsdfs/mask.cpp)."""

import numpy as np
import pytest

from misaki_tpu.render.driver import render
from misaki_tpu.scene.compiler import load_and_compile


SCENE_XML = """<scene version="0.6.0">
  <integrator type="path"><integer name="max_depth" value="{depth}"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="to_world">
      <lookat origin="0, 1.2, 2.5" target="0, 0, 0" up="0, 1, 0"/>
    </transform>
    <sampler type="independent"><integer name="sample_count" value="32"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="24"/>
      <integer name="height" value="18"/>
    </film>
  </sensor>
  <!-- 1/106.8 = y-bar CIE integral: unobstructed pixel == 1 (furnace) -->
  <emitter type="constant"><spectrum name="radiance" value="0.00936329"/></emitter>
  <shape type="obj">
    <string name="filename" value="quad.obj"/>
    {bsdf}
  </shape>
</scene>
"""


def _quad_up(path):
    path.write_text(
        "v -1 0 -1\nv 1 0 -1\nv 1 0 1\nv -1 0 1\n"
        "f 1 3 2\nf 1 4 3\n"
    )


def _compile(tmp_path, bsdf, depth=4):
    _quad_up(tmp_path / "quad.obj")
    (tmp_path / "scene.xml").write_text(
        SCENE_XML.format(bsdf=bsdf, depth=depth)
    )
    return load_and_compile(str(tmp_path / "scene.xml"))


def test_roughplastic_renders_plausibly(tmp_path):
    """A white roughplastic floor in a unit furnace must reflect below unity
    (Fresnel + single-scatter GGX lose energy) but clearly above the
    diffuse-only component; no NaNs, no fireflies beyond MC noise."""
    scene = _compile(
        tmp_path,
        """<bsdf type="roughplastic">
             <float name="alpha" value="0.2"/>
             <string name="distribution" value="ggx"/>
             <rgb name="diffuse_reflectance" value="0.8, 0.8, 0.8"/>
           </bsdf>""",
    )
    from misaki_tpu.scene.types import BSDF_PLASTIC

    assert BSDF_PLASTIC in scene.bsdf_kinds
    rgb = np.asarray(render(scene, seed=0, depth_cap=4)["rgb"])
    assert np.isfinite(rgb).all()
    floor = rgb[12:, :, :]  # bottom rows see the quad
    assert 0.3 < floor.mean() < 1.05, floor.mean()


def test_mask_blends_toward_background(tmp_path):
    """Furnace + masked diffuse quad: opacity 0 must reproduce the empty
    furnace (pixel == 1 through the null lobe), opacity 1 the plain diffuse
    render, and opacity 0.5 must land between them."""
    def scene_with(op):
        return _compile(
            tmp_path,
            f"""<bsdf type="mask">
                  <spectrum name="opacity" value="{op}"/>
                  <bsdf type="diffuse">
                    <rgb name="reflectance" value="0.25, 0.25, 0.25"/>
                  </bsdf>
                </bsdf>""",
            depth=6,
        )

    imgs = {}
    for op in (0.02, 0.5, 0.98):
        rgb = np.asarray(render(scene_with(op), seed=0, depth_cap=6)["rgb"])
        assert np.isfinite(rgb).all()
        imgs[op] = rgb[12:, :, :].mean()  # quad region

    # nearly transparent: the furnace shines through -> ~1
    assert abs(imgs[0.02] - 1.0) < 0.08, imgs
    # nearly opaque: mostly the dark diffuse quad
    assert imgs[0.98] < 0.75, imgs
    # half opacity sits strictly between
    assert imgs[0.98] < imgs[0.5] < imgs[0.02], imgs


def test_mask_volpath_transmittance(tmp_path):
    """volpath NEE shadow rays must pass through mask surfaces with
    (1 - opacity) attenuation (_attenuated_transmittance mask branch)."""
    _quad_up(tmp_path / "quad.obj")
    xml = SCENE_XML.format(
        bsdf="""<bsdf type="mask">
                  <spectrum name="opacity" value="0.5"/>
                  <bsdf type="diffuse"/>
                </bsdf>""",
        depth=6,
    ).replace('type="path"', 'type="volpath"')
    (tmp_path / "scene.xml").write_text(xml)
    scene = load_and_compile(str(tmp_path / "scene.xml"))
    rgb = np.asarray(render(scene, seed=0, depth_cap=6)["rgb"])
    assert np.isfinite(rgb).all()
    assert rgb.mean() > 0.3  # light reaches the camera through the mask
