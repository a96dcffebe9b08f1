"""ops/dgather.py: gather adjoints equal XLA's scatter adjoint.

The custom VJPs re-express d(gather)/d(table) in hardware-friendly forms
(one-hot matmul / sort+unique-scatter, see the module docstring); these
tests pin them against the plain `t[idx]` formulation whose adjoint XLA
derives itself."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hanamaru_tpu.ops import dgather


@pytest.fixture(autouse=True)
def _restore_mode():
    old = dgather.TEXEL_ADJOINT
    yield
    dgather.TEXEL_ADJOINT = old


def _grads(fn, args):
    return jax.jit(jax.grad(fn))(args)


def test_gather_tables_matches_plain_gather_grad(rng):
    k = 13
    n = 4096
    idx = jnp.asarray(rng.randint(0, k, n), jnp.int32)
    tables = tuple(jnp.asarray(rng.standard_normal(k), jnp.float32)
                   for _ in range(4))
    w = tuple(jnp.asarray(rng.standard_normal(n), jnp.float32)
              for _ in range(4))

    def loss_custom(tabs):
        outs = dgather.gather_tables(idx, tabs)
        return sum((o * wi).sum() for o, wi in zip(outs, w))

    def loss_plain(tabs):
        outs = tuple(t[idx] for t in tabs)
        return sum((o * wi).sum() for o, wi in zip(outs, w))

    g_c = _grads(loss_custom, tables)
    g_p = _grads(loss_plain, tables)
    for a, b in zip(g_c, g_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["scatter", "sort"])
def test_gather_texels_matches_plain_gather_grad(mode, rng):
    dgather.TEXEL_ADJOINT = mode
    size = 500
    idx = jnp.asarray(rng.randint(0, size, (4, 1024)), jnp.int32)
    tables = tuple(jnp.asarray(rng.standard_normal(size), jnp.float32)
                   for _ in range(3))
    w = jnp.asarray(rng.standard_normal((4, 1024)), jnp.float32)

    def loss_custom(tabs):
        r, g, b = dgather.gather_texels(idx, tabs)
        return ((r + 2.0 * g) * w).sum() + (b * b).sum()

    def loss_plain(tabs):
        r, g, b = (t[idx] for t in tabs)
        return ((r + 2.0 * g) * w).sum() + (b * b).sum()

    g_c = _grads(loss_custom, tables)
    g_p = _grads(loss_plain, tables)
    for a, b in zip(g_c, g_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_sorted_segment_add_equals_scatter_add(rng):
    size = 257
    m = 10_000
    idx = jnp.asarray(rng.randint(0, size, m), jnp.int32)
    cts = tuple(jnp.asarray(rng.standard_normal(m), jnp.float32)
                for _ in range(3))
    outs = jax.jit(
        lambda i, c: dgather.sorted_segment_add(i, c, size)
    )(idx, cts)
    for ct, out in zip(cts, outs):
        ref = np.zeros(size, np.float32)
        np.add.at(ref, np.asarray(idx), np.asarray(ct))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_sorted_segment_add_empty_and_single_segment():
    # all taps on one texel (worst-case collision) and a never-touched rest
    size = 64
    idx = jnp.full((1000,), 7, jnp.int32)
    ct = jnp.ones((1000,), jnp.float32)
    (out,) = jax.jit(
        lambda i, c: dgather.sorted_segment_add(i, (c,), size)
    )(idx, ct)
    assert float(out[7]) == pytest.approx(1000.0, rel=1e-6)
    assert float(jnp.abs(out).sum()) == pytest.approx(1000.0, rel=1e-6)


def test_sorted_segment_add_zero_length_idx():
    # latent trap fixed in round 4 (advisor): zero-length idx used to
    # crash on the (1,)-vs-(0,) concatenate inside the segment bounds
    outs = jax.jit(
        lambda i, c: dgather.sorted_segment_add(i, (c, c), 16)
    )(jnp.zeros((0,), jnp.int32), jnp.zeros((0,), jnp.float32))
    for out in outs:
        assert out.shape == (16,)
        assert float(jnp.abs(out).sum()) == 0.0
