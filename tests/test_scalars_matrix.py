import numpy as np

from hanamaru_tpu.scene import matrix as M
from hanamaru_tpu.utils.scalars import clamp, equals_eps, mix, modulo, saturate


def test_modulo_positive():
    np.testing.assert_allclose(modulo(np.array([-0.25, 0.25, 1.25]), 1.0), [0.75, 0.25, 0.25])


def test_saturate_clamp_mix_eps():
    np.testing.assert_allclose(saturate(np.array([-1.0, 0.5, 2.0])), [0, 0.5, 1])
    np.testing.assert_allclose(clamp(np.array([1, 5, 9]), 2, 8), [2, 5, 8])
    np.testing.assert_allclose(mix(0.0, 10.0, 0.25), 2.5)
    assert bool(equals_eps(1.0, 1.0 + 5e-5))
    assert not bool(equals_eps(1.0, 1.001))


def test_matrix_inverse_roundtrip(rng):
    m = M.translate(1, 2, 3) @ M.rotate_y(0.7) @ M.scale(2.0, 3.0, 0.5)
    inv = M.inverse(m)
    np.testing.assert_allclose(m @ inv, np.eye(4), atol=1e-12)


def test_matrix_inverse_singular_is_identity():
    m = M.scale(1.0, 0.0, 1.0)   # singular
    np.testing.assert_allclose(M.inverse(m), np.eye(4))
