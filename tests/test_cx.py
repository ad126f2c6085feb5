"""Split-complex (hpfx.cx) arithmetic vs numpy complex ground truth."""
import jax
import jax.numpy as jnp
import numpy as np

from hpfx import cx
from hpfx.cx import Cx

rng = np.random.default_rng(42)


def _rand(*shape):
    return rng.normal(size=shape) + 1j * rng.normal(size=shape)


def _chk(got: Cx, want, atol=1e-12):
    np.testing.assert_allclose(got.to_numpy(), want, atol=atol)


def test_elementwise_ops():
    a_np, b_np = _rand(3, 4), _rand(3, 4)
    a, b = cx.from_numpy(a_np), cx.from_numpy(b_np)
    _chk(a + b, a_np + b_np)
    _chk(a - b, a_np - b_np)
    _chk(a * b, a_np * b_np)
    _chk(a / b, a_np / b_np)
    _chk(-a, -a_np)
    _chk(a.conj(), a_np.conj())
    _chk(a.jmul(), 1j * a_np)
    _chk(a.reciprocal(), 1 / a_np)
    np.testing.assert_allclose(np.asarray(a.abs()), np.abs(a_np))
    np.testing.assert_allclose(np.asarray(a.abs2()), np.abs(a_np) ** 2)
    np.testing.assert_allclose(np.asarray(a.angle()), np.angle(a_np))
    _chk(a * 2.5, a_np * 2.5)
    _chk(2.5 * a, a_np * 2.5)
    _chk(a + 1.0, a_np + 1.0)
    _chk(1.0 - a, 1.0 - a_np)
    _chk(a / 2.0, a_np / 2.0)
    _chk(2.0 / a, 2.0 / a_np)


def test_polar_and_expj():
    m = rng.normal(size=(5,))           # signed magnitudes allowed
    t = rng.normal(size=(5,))
    _chk(cx.polar(jnp.asarray(m), jnp.asarray(t)), m * np.exp(1j * t))
    _chk(cx.expj(jnp.asarray(t)), np.exp(1j * t))


def test_contractions():
    A_np, B_np = _rand(4, 5), _rand(5, 3)
    v_np = _rand(5)
    A, B, v = map(cx.from_numpy, (A_np, B_np, v_np))
    _chk(cx.matmul(A, B), A_np @ B_np)
    _chk(cx.matvec(A, v), A_np @ v_np)
    T_np = _rand(2, 4, 5)
    T = cx.from_numpy(T_np)
    V2_np = _rand(2, 5)
    V2 = cx.from_numpy(V2_np)
    _chk(cx.einsum("hij,hj->hi", T, V2),
         np.einsum("hij,hj->hi", T_np, V2_np))


def test_solve_matches_numpy():
    A_np = _rand(6, 6) + 4 * np.eye(6)
    b_np = _rand(6)
    X = cx.solve(cx.from_numpy(A_np), cx.from_numpy(b_np))
    _chk(X, np.linalg.solve(A_np, b_np), atol=1e-10)
    B_np = _rand(6, 3)
    X2 = cx.solve(cx.from_numpy(A_np), cx.from_numpy(B_np))
    _chk(X2, np.linalg.solve(A_np, B_np), atol=1e-10)


def test_indexing_and_structure():
    a_np = _rand(4, 6)
    a = cx.from_numpy(a_np)
    _chk(a[1:3, ::2], a_np[1:3, ::2])
    _chk(a.T, a_np.T)
    _chk(a.reshape(-1), a_np.reshape(-1))
    _chk(a[None], a_np[None])
    _chk(cx.concatenate([a, a], axis=1), np.concatenate([a_np, a_np], 1))
    upd = a.at_set((0, slice(None)), cx.from_numpy(np.zeros(6, complex)))
    want = a_np.copy(); want[0] = 0
    _chk(upd, want)
    add = a.at_add((slice(None), 0), cx.from_numpy(np.ones(4, complex)))
    want = a_np.copy(); want[:, 0] += 1
    _chk(add, want)


def test_cx_is_pytree():
    a = cx.from_numpy(_rand(3, 3))
    out = jax.jit(lambda z: z * z + z.conj())(a)
    want = a.to_numpy() ** 2 + a.to_numpy().conj()
    _chk(out, want, atol=1e-10)
    # vmap over leading axis
    vm = jax.vmap(lambda z: (z * z).abs())(a)
    np.testing.assert_allclose(np.asarray(vm), np.abs(a.to_numpy() ** 2),
                               atol=1e-10)
