"""Free functions of the vf namespace (cwise ops, stack, ifelse, min/max...).

Reference surface: `src/VectorFunctions/CommonFunctions/CwiseOperators.h`,
`Conditional.h`, `Comparative.h`, the `vf.*` bindings in
`src/VectorFunctions/ASSET_VectorFunctions.cpp`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_DTYPE
from .function import (VectorFunction, ConditionalFunction, as_function,
                       _stack_arg, stack)

__all__ = [
    "sin", "cos", "tan", "arcsin", "arccos", "arctan", "arctan2",
    "sinh", "cosh", "tanh", "sqrt", "cbrt", "exp", "log", "log10",
    "abs", "sign", "squared", "cubed", "inverse",
    "sum", "SumElems", "dot", "cross", "normalize", "ifelse",
    "min", "max", "doublecross", "quatProduct", "quatRotate",
]


def _cwise(op, name):
    def apply(f):
        f = _stack_arg(f)
        return f.cwise(op, name=name)
    apply.__name__ = name
    return apply


sin = _cwise(jnp.sin, "sin")
cos = _cwise(jnp.cos, "cos")
tan = _cwise(jnp.tan, "tan")
arcsin = _cwise(jnp.arcsin, "arcsin")
arccos = _cwise(jnp.arccos, "arccos")
arctan = _cwise(jnp.arctan, "arctan")
sinh = _cwise(jnp.sinh, "sinh")
cosh = _cwise(jnp.cosh, "cosh")
tanh = _cwise(jnp.tanh, "tanh")
sqrt = _cwise(jnp.sqrt, "sqrt")
cbrt = _cwise(jnp.cbrt, "cbrt")
exp = _cwise(jnp.exp, "exp")
log = _cwise(jnp.log, "log")
log10 = _cwise(jnp.log10, "log10")
sign = _cwise(jnp.sign, "sign")
squared = _cwise(jnp.square, "squared")
cubed = _cwise(lambda v: v * v * v, "cubed")
inverse = _cwise(lambda v: 1.0 / v, "inverse")


def abs(f):  # noqa: A001 - mirrors vf.abs
    if isinstance(f, VectorFunction):
        return f.__abs__()
    import builtins
    return builtins.abs(f)


def arctan2(y, x):
    """Two-argument arctangent of scalar functions (vf.arctan2)."""
    y = _stack_arg(y)
    x = _stack_arg(x, irows=y.IRows())
    if y.ORows() != 1 or x.ORows() != 1:
        raise ValueError("arctan2 requires scalar functions")
    fy, fx = y._fn, x._fn
    return VectorFunction(
        lambda v: jnp.arctan2(jnp.atleast_1d(fy(v)), jnp.atleast_1d(fx(v))),
        y.IRows(), 1, name="arctan2")


def sum(*funcs):  # noqa: A001 - mirrors vf.sum
    """Sum of several functions/constants (vf.sum). With one vector function,
    sums its elements (SumElems)."""
    if len(funcs) == 1 and isinstance(funcs[0], (list, tuple)):
        funcs = tuple(funcs[0])
    if len(funcs) == 1 and isinstance(funcs[0], VectorFunction):
        return funcs[0].sum()
    ir = None
    for f in funcs:
        if isinstance(f, VectorFunction):
            ir = f.IRows()
            break
    if ir is None:
        raise ValueError("vf.sum needs at least one VectorFunction")
    out = None
    for f in funcs:
        f = as_function(f, irows=ir) if not isinstance(f, VectorFunction) else f
        out = f if out is None else out + f
    return out


def SumElems(f):
    return _stack_arg(f).sum()


def dot(a, b):
    a = _stack_arg(a)
    if not isinstance(a, VectorFunction):
        b = _stack_arg(b)
        a = as_function(a, irows=b.IRows())
    return a.dot(b)


def cross(a, b):
    if isinstance(a, VectorFunction):
        return a.cross(b)
    b = _stack_arg(b)
    return as_function(a, irows=b.IRows()).cross(b)


def doublecross(a, b, c):
    return cross(a, b).cross(c) if isinstance(cross(a, b), VectorFunction) else None


def normalize(f):
    return _stack_arg(f).normalized()


def ifelse(cond, tfunc, ffunc):
    """Conditional function: both branches traced, selected with jnp.where.

    Reference: `CommonFunctions/Conditional.h` vf.ifelse.  Derivatives follow
    the active branch (matches reference scalar-path semantics).
    """
    if not isinstance(cond, ConditionalFunction):
        raise TypeError("ifelse: first argument must be a comparison "
                        "(e.g. Args(2)[0] < 1.0)")
    ir = cond.IRows()
    tfunc = as_function(tfunc, irows=ir) if not isinstance(tfunc, VectorFunction) else tfunc
    ffunc = as_function(ffunc, irows=ir) if not isinstance(ffunc, VectorFunction) else ffunc
    if tfunc.IRows() != ir or ffunc.IRows() != ir:
        raise ValueError("ifelse: input sizes must match the condition's")
    orows = int(np.broadcast_shapes((tfunc.ORows(),), (ffunc.ORows(),))[0])
    c, tf, ff = cond._fn, tfunc._fn, ffunc._fn
    return VectorFunction(
        lambda x: jnp.where(c(x), jnp.atleast_1d(tf(x)), jnp.atleast_1d(ff(x))),
        ir, orows, name="ifelse")


def _comparative(op, name):
    def apply(a, b):
        a = _stack_arg(a)
        if not isinstance(a, VectorFunction):
            b0 = _stack_arg(b)
            a = as_function(a, irows=b0.IRows())
        return a._binary(b, op, name)
    apply.__name__ = name
    return apply


min = _comparative(jnp.minimum, "min")  # noqa: A001
max = _comparative(jnp.maximum, "max")  # noqa: A001


def quatProduct(q1, q2):
    """Hamilton product of two quaternions stored [x, y, z, w].

    Reference: quaternion helpers bound in ASSET_VectorFunctions.cpp (used by
    attitude examples); [vec, scalar] component order.
    """
    q1 = _stack_arg(q1)
    q2 = _stack_arg(q2, irows=q1.IRows())
    f1, f2 = q1._fn, q2._fn

    def impl(x):
        a = jnp.atleast_1d(f1(x))
        b = jnp.atleast_1d(f2(x))
        av, aw = a[:3], a[3]
        bv, bw = b[:3], b[3]
        v = aw * bv + bw * av + jnp.cross(av, bv)
        w = aw * bw - jnp.dot(av, bv)
        return jnp.concatenate([v, w[None]])

    return VectorFunction(impl, q1.IRows(), 4, name="quatProduct")


def quatRotate(q, v):
    """Rotate 3-vector v by quaternion q=[x,y,z,w]."""
    q = _stack_arg(q)
    v = _stack_arg(v, irows=q.IRows())
    fq, fv = q._fn, v._fn

    def impl(x):
        qq = jnp.atleast_1d(fq(x))
        vv = jnp.atleast_1d(fv(x))
        qv, qw = qq[:3], qq[3]
        t = 2.0 * jnp.cross(qv, vv)
        return vv + qw * t + jnp.cross(qv, t)

    return VectorFunction(impl, q.IRows(), 3, name="quatRotate")


def Scaled(func, value):
    """Scalar multiple of a function: value * f(x) (reference
    `src/VectorFunctions/CommonFunctions/Scaled.h:49` Scaled/StaticScaled,
    bound as the user-facing unit-scaling wrapper)."""
    from .function import as_function, VectorFunction
    func = as_function(func)
    value = float(value)
    fn = func._fn
    return VectorFunction(lambda x: value * jnp.atleast_1d(fn(x)),
                          func.IRows(), func.ORows(), name="Scaled")


def RowScaled(func, row_scales):
    """Per-output-row scaling: diag(row_scales) @ f(x) (reference
    `Scaled.h` RowScaled)."""
    from .function import as_function, VectorFunction
    func = as_function(func)
    rs = np.asarray(row_scales, np.float64).ravel()
    if rs.shape[0] != func.ORows():
        raise ValueError(
            f"RowScaled: {rs.shape[0]} scales for {func.ORows()} outputs")
    fn = func._fn
    return VectorFunction(lambda x: rs * jnp.atleast_1d(fn(x)),
                          func.IRows(), func.ORows(), name="RowScaled")


def IOScaled(func, input_scales, output_scales):
    """Unit-scaling wrapper g(x) = out_scales * f(in_scales * x)
    (reference `src/VectorFunctions/CommonFunctions/IOScaled.h`, applied
    to ODEs by auto-scaling at `src/OptimalControl/ODEPhase.h:104`).
    Lets a user express a function in canonical units while the solver
    works in scaled variables."""
    from .function import as_function, VectorFunction
    func = as_function(func)
    ins = np.asarray(input_scales, np.float64).ravel()
    outs = np.asarray(output_scales, np.float64).ravel()
    if ins.shape[0] != func.IRows():
        raise ValueError(
            f"IOScaled: {ins.shape[0]} input scales for {func.IRows()} "
            "inputs")
    if outs.shape[0] != func.ORows():
        raise ValueError(
            f"IOScaled: {outs.shape[0]} output scales for {func.ORows()} "
            "outputs")
    fn = func._fn
    return VectorFunction(lambda x: outs * jnp.atleast_1d(fn(ins * x)),
                          func.IRows(), func.ORows(), name="IOScaled")
