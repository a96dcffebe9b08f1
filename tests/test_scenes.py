"""Scene registry: every reference scene compiles to device tables."""
import numpy as np
import pytest

from hanamaru_tpu import models
from hanamaru_tpu.scene.compile import compile_scene

# rtcamp6_v4 needs models/fractal_icosahedron.obj which the reference asset
# tree does not ship (main.rs:1156-1212 would panic identically)
BUILDABLE = [n for n in models.names() if n != "rtcamp6_v4"]


def test_registry_lists_reference_scenes():
    assert models.DEFAULT_SCENE == "rtcamp6_v3_1"
    for n in (
        "simple", "material_examples", "rtcamp5", "tbf3",
        "rtcamp6_v1", "rtcamp6_v2", "rtcamp6_v3", "rtcamp6_v3_1", "rtcamp6_v4",
    ):
        assert n in models.names()


@pytest.mark.parametrize("name", BUILDABLE)
def test_scene_compiles(name):
    cs = compile_scene(models.build(name), models.asset_root())
    st = cs.stats
    assert st["num_materials"] > 0
    a = cs.arrays
    # structural invariants
    assert a.tri_v0x.shape[0] == a.tri_mat.shape[0] >= 1
    assert a.bvh_hit.shape == a.bvh_miss.shape
    assert a.sph_radius.shape[0] == st["num_spheres"]
    for leaf in [a.tri_v0x, a.sph_cx, a.mat_albedo_r, a.tex_r, a.sky_r]:
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_v4_raises_like_reference_panic():
    with pytest.raises(FileNotFoundError):
        compile_scene(models.build("rtcamp6_v4"), models.asset_root())


def test_default_scene_inventory():
    """rtcamp6_v3_1 contents (main.rs:1020-1153): 1 light sphere, floor
    cuboid, bunny + mirror + frame + 6 armadillos = 9 meshes, Powerlines
    skybox, magic-circle floor texture."""
    cs = compile_scene(models.build("rtcamp6_v3_1"), models.asset_root())
    st = cs.stats
    assert st["num_spheres"] == 1
    assert st["num_cuboids"] == 1
    assert st["num_meshes"] == 9
    assert st["num_lights"] == 1
    assert st["num_textures"] == 1
    assert st["num_triangles"] > 10000


def test_collision_checked_placement():
    from hanamaru_tpu.scene.desc import (
        DIFFUSE, CameraDesc, MaterialDesc, SceneDesc, SkyboxDesc, SphereDesc,
    )

    s = SceneDesc(
        camera=CameraDesc(eye=(0, 0, 5), target=(0, 0, 0)),
        elements=[SphereDesc((0, 0, 0), 1.0, MaterialDesc(DIFFUSE))],
        skybox=SkyboxDesc(),
    )
    # overlapping AABB rejected (scene.rs:366-376)
    assert not s.add_with_check_collisions(SphereDesc((0.5, 0, 0), 1.0, MaterialDesc(DIFFUSE)))
    assert len(s.elements) == 1
    # disjoint accepted
    assert s.add_with_check_collisions(SphereDesc((5, 0, 0), 1.0, MaterialDesc(DIFFUSE)))
    assert len(s.elements) == 2
