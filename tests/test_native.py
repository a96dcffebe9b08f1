"""C++ fast path (native/objbvh.cpp) matches the pure-Python scene compiler."""
import os

import numpy as np
import pytest

from hanamaru_tpu.scene import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native/libobjbvh.so not built")


def test_obj_parse_matches_python(lib_available, tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nvt 0 0\nf 1 2 3\nf 1/1 2/2 3/3 4/4\n"
    )
    nv, nf = native.parse_obj(str(p))
    os.environ["HANAMARU_NO_NATIVE"] = "1"
    try:
        from hanamaru_tpu.utils.obj import _parse_obj

        _parse_obj.cache_clear()
        pv, pf = _parse_obj(str(p))
    finally:
        del os.environ["HANAMARU_NO_NATIVE"]
        _parse_obj.cache_clear()
    np.testing.assert_array_equal(nv, pv)
    np.testing.assert_array_equal(nf, pf)


def test_obj_parse_real_assets(lib_available):
    from hanamaru_tpu import models
    from hanamaru_tpu.utils.obj import _parse_obj

    root = models.asset_root()
    for rel in ("models/box.obj", "models/bunny/bunny_wired_300.obj", "models/armadilo_1000.obj"):
        path = os.path.join(root, rel)
        nv, nf = native.parse_obj(path)
        os.environ["HANAMARU_NO_NATIVE"] = "1"
        try:
            _parse_obj.cache_clear()
            pv, pf = _parse_obj(path)
        finally:
            del os.environ["HANAMARU_NO_NATIVE"]
            _parse_obj.cache_clear()
        np.testing.assert_array_equal(nv, pv, err_msg=rel)
        np.testing.assert_array_equal(nf, pf, err_msg=rel)


def test_bvh_build_matches_python(lib_available, rng):
    from hanamaru_tpu.scene import bvh as pybvh

    t = 300
    base = rng.uniform(-2, 2, (t, 1, 3))
    tri = base + rng.uniform(-0.3, 0.3, (t, 3, 3))
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    amin = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    amax = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    key = (v0 + v1 + v2).astype(np.float64)

    nat = native.build_bvh(amin, amax, key)
    os.environ["HANAMARU_NO_NATIVE"] = "1"
    try:
        py = pybvh.build_bvh(amin, amax, key)
    finally:
        del os.environ["HANAMARU_NO_NATIVE"]
    np.testing.assert_array_equal(nat.hit_link, py.hit_link)
    np.testing.assert_array_equal(nat.miss_link, py.miss_link)
    np.testing.assert_array_equal(nat.first, py.first)
    np.testing.assert_array_equal(nat.count, py.count)
    np.testing.assert_array_equal(nat.order, py.order)
    np.testing.assert_allclose(nat.aabb_min, py.aabb_min, rtol=1e-6)
    np.testing.assert_allclose(nat.aabb_max, py.aabb_max, rtol=1e-6)
    assert nat.depth == py.depth
