"""OBJ loader parity with the reference's minimal parser (loader.rs:12-59)."""
import numpy as np

from hanamaru_tpu.scene import matrix as M
from hanamaru_tpu.utils.obj import load_obj

OBJ = """# comment
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.0
v 0.0 1.0 0.0
vn 0.0 0.0 1.0
vt 0.5 0.5
f 1 2 3
f 1/1 2/1/1 3/1 4/1
s off
"""


def _write(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(OBJ)
    return str(p)


def test_parse_v_f_and_quad_fan(tmp_path):
    v, f = load_obj(_write(tmp_path))
    assert v.shape == (4, 3)
    # triangle + quad split as (v1,v2,v3)+(v1,v3,v4) (loader.rs:45-52)
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 1, 2], [0, 2, 3]])


def test_world_space_bake(tmp_path):
    m = M.translate(1.0, 2.0, 3.0) @ M.scale_linear(2.0)
    v, _ = load_obj(_write(tmp_path), m)
    # scale first, then translate (M * vertex semantics, loader.rs:31)
    np.testing.assert_allclose(v[1], [3.0, 2.0, 3.0])


def test_matrix_composition_matches_reference_order():
    # reference: scale_linear(1.5) * translate(1.2,0,0) * rotate_y(0.2)
    # applied as M*v => rotate, then translate, then scale
    m = M.scale_linear(1.5) @ M.translate(1.2, 0.0, 0.0) @ M.rotate_y(0.2)
    v = np.array([[1.0, 0.0, 0.0]])
    out = M.transform_points(m, v)[0]
    rot = np.array([np.cos(0.2), 0.0, -np.sin(0.2)])
    expect = (rot + [1.2, 0, 0]) * 1.5
    np.testing.assert_allclose(out, expect, atol=1e-12)


def test_real_asset_loads():
    from hanamaru_tpu import models
    import os

    root = models.asset_root()
    v, f = load_obj(os.path.join(root, "models/box.obj"))
    assert len(f) == 12 and len(v) == 8   # a cube
