"""Derivative-correctness suite for the vf layer.

Mirrors the reference test strategy
(`asset_asrl/test/test_VectorFunctions/__init__.py:11-62`): for each
expression, analytic computeall (fx, jx, gx, hx) is checked against
finite-difference Jacobians of the function and of its adjoint gradient
(built with PyVectorFunction), with the exact-adjoint invariant
|J^T L - g| < 1e-12 and FD errors < 1e-4.
"""

import numpy as np
import pytest

import asset_asrl_tpu as ast

vf = ast.VectorFunctions
Args = vf.Arguments


def check_function(fun, X, L, jsize=1e-6, hsize=1e-6,
                   maxjerror=1e-4, maxherror=1e-4):
    X = np.asarray(X, dtype=float)
    L = np.asarray(L, dtype=float)
    irows, orows = fun.IRows(), fun.ORows()

    jac_fd = vf.PyVectorFunction(irows, orows, lambda x: fun.compute(x),
                                 jsize, jsize)
    hes_fd = vf.PyVectorFunction(irows, irows,
                                 lambda x: fun.adjointgradient(x, L),
                                 hsize, hsize)

    fx, jx, gx, hx = fun.computeall(X, L)

    assert fx.shape == (orows,)
    assert jx.shape == (orows, irows)
    assert gx.shape == (irows,)
    assert hx.shape == (irows, irows)

    adj_err = np.abs(jx.T @ L - gx).max()
    assert adj_err < 1e-12, f"adjoint gradient mismatch: {adj_err}"

    jx2 = jac_fd.jacobian(X)
    assert np.abs(jx - jx2).max() < maxjerror, "jacobian vs FD"

    hx2 = hes_fd.jacobian(X)
    hx2 = (hx2 + hx2.T) / 2
    assert np.abs(hx - hx2).max() < maxherror, "hessian vs FD"
    assert np.abs(hx - hx.T).max() < 1e-12, "hessian not symmetric"


def test_args_normalized():
    for n in range(1, 8):
        fun = Args(n).normalized()
        X = np.arange(1, n + 1, dtype=float)
        L = np.arange(2, n + 2, dtype=float)
        check_function(fun, X, L)


def test_elementwise_ops():
    x = Args(3)
    a, b, c = x.tolist()
    funs = [
        vf.sin(a) * vf.cos(b) + c,
        vf.sqrt(a) * vf.exp(b / 4.0),
        vf.log(a + 2.0) - vf.tan(c / 5.0),
        vf.arctan2(a, b),
        a ** 3 + b ** 2 / c,
        vf.stack([vf.sin(a), vf.cos(b), a * b * c]),
        vf.tanh(a) + vf.sinh(b / 3.0) + vf.cosh(c / 3.0),
        vf.arcsin(a / 10.0) + vf.arccos(b / 10.0) + vf.arctan(c),
    ]
    X = np.array([1.1, 2.3, 0.7])
    for fun in funs:
        L = np.arange(2.0, 2.0 + fun.ORows())
        check_function(fun, X, L)


def test_vector_ops():
    x = Args(6)
    r, v = x.head(3), x.tail(3)
    funs = [
        r.dot(v),
        r.cross(v),
        r.norm() * v.inverse_norm(),
        r.normalized_power3(),
        r.squared_norm() + v.sum(),
        vf.sum(r.norm(), v.norm(), 1.5),
    ]
    X = np.array([1.0, 2.0, -0.5, 0.3, -1.2, 2.2])
    for fun in funs:
        L = np.arange(2.0, 2.0 + fun.ORows())
        check_function(fun, X, L)


def test_composition():
    inner = vf.stack([Args(2)[0] * Args(2)[1], Args(2)[0] + Args(2)[1]])
    outer = Args(2).normalized()
    fun = outer.eval(inner)
    check_function(fun, np.array([1.2, 0.7]), np.array([2.0, 3.0]))
    fun2 = outer(inner)
    assert np.allclose(fun2.compute([1.2, 0.7]), fun.compute([1.2, 0.7]))


def test_matrix_ops():
    rng = np.random.default_rng(0)
    for lt, rt in [(vf.RowMatrix, vf.RowMatrix), (vf.ColMatrix, vf.ColMatrix),
                   (vf.RowMatrix, vf.ColMatrix)]:
        lrows, lcols, rrows, rcols = 2, 3, 3, 2
        m1 = rng.random((lrows, lcols))
        m2 = rng.random((rrows, rcols))
        X = Args(lrows * lcols + rrows * rcols)
        M1 = lt(X.head(lrows * lcols), lrows, lcols)
        M2 = rt(X.tail(rrows * rcols), rrows, rcols)
        s1, s2 = 0.7, 1.3
        shift = rng.random((lrows, lcols))
        prod = (M1 * s1 + shift) * (M2 * s2)
        truth = ((m1 * s1 + shift) @ (m2 * s2)).flatten("F")

        xin = np.zeros(lrows * lcols + rrows * rcols)
        xin[:lrows * lcols] = m1.flatten("F" if lt is vf.ColMatrix else "C")
        xin[lrows * lcols:] = m2.flatten("F" if rt is vf.ColMatrix else "C")

        assert np.allclose(prod.compute(xin), truth)
        L = np.arange(1.0, 1.0 + prod.ORows())
        check_function(prod, xin, L)


def test_matrix_inverse():
    X = Args(6)
    Mvec = vf.stack(vf.cos(X[0]), 0.5, X[1] + 2.0, X[2] * vf.cos(X[0]))
    M = vf.RowMatrix(Mvec, 2, 2)
    Q = vf.stack([-9.81 * vf.sin(X[0]), X[3] + X[4] * X[5]])
    fun = M.inverse() * Q
    Xv = np.array([0.3, 1.0, 2.0, 0.5, 0.2, 1.5])
    check_function(fun, Xv, np.array([1.0, 2.0]))
    # value check
    m = np.array([[np.cos(0.3), 0.5], [3.0, 2.0 * np.cos(0.3)]])
    q = np.array([-9.81 * np.sin(0.3), 0.5 + 0.2 * 1.5])
    assert np.allclose(fun.compute(Xv), np.linalg.solve(m, q))


def test_ifelse_minmax():
    x = Args(2)
    f = vf.ifelse(x[0] < 1.0, x[1] * 2.0, x[1] ** 2)
    assert np.allclose(f.compute([0.5, 3.0]), [6.0])
    assert np.allclose(f.compute([1.5, 3.0]), [9.0])
    check_function(f, np.array([0.5, 3.0]), np.array([1.0]))
    check_function(f, np.array([1.5, 3.0]), np.array([1.0]))

    g = vf.max(x[0], x[1])
    assert np.allclose(g.compute([1.0, 2.0]), [2.0])
    h = vf.min(x[0] * 2.0, x[1])
    assert np.allclose(h.compute([1.0, 3.0]), [2.0])

    comb = vf.ifelse((x[0] < 1.0) & (x[1] > 0.0), x.sum(), -x.sum())
    assert np.allclose(comb.compute([0.5, 1.0]), [1.5])
    assert np.allclose(comb.compute([0.5, -1.0]), [0.5])


def test_quaternions():
    q = np.array([0.2, -0.3, 0.4, 0.84261498])  # unit-ish
    q = q / np.linalg.norm(q)
    v = np.array([1.0, 2.0, 3.0])
    X = Args(7)
    fun = vf.quatRotate(X.head(4), X.tail(3))
    xin = np.concatenate([q, v])

    # rotation matrix reference
    x, y, z, w = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])
    assert np.allclose(fun.compute(xin), R @ v)
    check_function(fun, xin, np.array([1.0, 2.0, 3.0]))

    prod = vf.quatProduct(X.head(4), vf.stack([X[4], X[5], X[6], X[0]]))
    check_function(prod, xin, np.arange(1.0, 5.0))


def test_padding_segments():
    x = Args(4)
    f = x.segment(1, 2).padded_lower(2).padded_upper(1)
    out = f.compute([1.0, 2.0, 3.0, 4.0])
    assert np.allclose(out, [0.0, 2.0, 3.0, 0.0, 0.0])
    check_function(f, np.array([1.0, 2.0, 3.0, 4.0]), np.arange(1.0, 6.0))


def test_scalar_broadcasting():
    x = Args(3)
    f = 2.0 * x - 1.0
    assert np.allclose(f.compute([1.0, 2.0, 3.0]), [1.0, 3.0, 5.0])
    g = x[0] * x.tail(2)   # scalar func times vector func
    assert np.allclose(g.compute([2.0, 3.0, 4.0]), [6.0, 8.0])
    h = 1.0 / x[2]
    assert np.allclose(h.compute([1.0, 2.0, 4.0]), [0.25])
    check_function(g, np.array([2.0, 3.0, 4.0]), np.array([1.0, 2.0]))
