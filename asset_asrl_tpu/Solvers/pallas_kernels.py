"""Pallas TPU kernels for the block-KKT hot path.

The block-cyclic-reduction factorization (`kkt_block.bcr_factor`) spends its
time in batched inverses of the odd macro-diagonal blocks.  The pure-XLA
formulation (`_inv_gj_pivots`) is a W-step `fori_loop` of rank-1 updates:
every step is a separate XLA kernel that streams the whole (K, W, W) batch
HBM->VPU->HBM, so the factorization is HBM-bound at W x 2 x K x W x W x 8
bytes of traffic per level.

`batched_gj_inverse` instead runs the complete Gauss-Jordan elimination of a
tile of blocks inside one Pallas kernel with the augmented matrices resident
in VMEM: one HBM read + one write per block total, ~W x less traffic.  It
eliminates in f32 (the TPU-native dtype; reference Pardiso analog is the
mixed-precision refinement knob `src/Solvers/PSIOPT.h:146` QPRefSteps) and
returns the pivot sequence, whose signs give the block inertia by Sylvester's
law exactly as the f64 path does (`kkt_block._inv_gj_pivots`).  Callers
recover f64 accuracy with Newton refinement steps on the result
(`kkt_block._inv_newton`).

Unpivoted elimination is safe here for the same reason as the XLA path: the
IPM regularizes the KKT to symmetric quasi-definite form before factorizing
(delta on primal / -gamma on multiplier diagonals).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gj_kernel(d_ref, inv_ref, piv_ref):
    """One grid step: invert a (KB, W, W) tile of blocks in VMEM.

    In-place Gauss-Jordan (no augmented identity, so no lane-dimension
    slicing, which Mosaic cannot lower for unaligned W): after W steps the
    buffer holds the inverse.  Step j with pivot d = M[j,j]:
        row j   <- M[j,:] / d,  entry (j,j) <- 1/d
        row i!=j <- M[i,:] - M[i,j] * row_j,  entry (i,j) <- -M[i,j]/d
    piv_ref: (KB, W) f32 — j-th pivot of each block (diagonal before step j).
    """
    KB, W, _ = d_ref.shape

    lane3 = jax.lax.broadcasted_iota(jnp.int32, (KB, W, W), 2)
    rowi3 = jax.lax.broadcasted_iota(jnp.int32, (KB, W, W), 1)
    rowi2 = jax.lax.broadcasted_iota(jnp.int32, (KB, W), 1)

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    inv_ref[:] = d_ref[:]
    piv_ref[:] = jnp.zeros((KB, W), jnp.float32)

    # int32 loop bounds: under x64 a python-int fori_loop counter is int64,
    # which Mosaic can neither legalize nor convert for the mask compares
    # (jnp.where instead of bool.astype for a similar lowering gap).
    def body(j, carry):
        M = inv_ref[:]
        colmask = lane3 == j
        rowmask = rowi3 == j
        jmask2 = rowi2 == j
        col = jnp.sum(jnp.where(colmask, M, 0.0), axis=2)      # M[:, :, j]
        rowv = jnp.sum(jnp.where(rowmask, M, 0.0), axis=1)     # M[:, j, :]
        d = jnp.sum(jnp.where(jmask2, col, 0.0), axis=1)       # M[:, j, j]
        piv_ref[:] = piv_ref[:] + d[:, None] * jnp.where(jmask2, one, zero)
        dinv = jnp.float32(1.0) / jnp.where(jnp.abs(d) > 1e-30, d, 1.0)
        # pivot row scaled, with the (j,j) entry replaced by 1/d
        pivrow = jnp.where(jmask2, dinv[:, None], rowv * dinv[:, None])
        # column factor, zeroed on the pivot row
        colfac = jnp.where(jmask2, 0.0, col)
        Mz = jnp.where(colmask, 0.0, M)                        # zero column j
        Mnew = Mz - colfac[:, :, None] * pivrow[:, None, :]
        inv_ref[:] = jnp.where(rowmask, pivrow[:, None, :], Mnew)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(W), body, jnp.int32(0))


def _gj_call(D32, interpret=False):
    # Mosaic lowering of the traced kernel nests Python calls deeply enough
    # to exhaust CPython's default 1000-frame recursion limit when invoked
    # under an outer jit trace; headroom is cheap.
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    K, W, _ = D32.shape
    # VMEM budget: aug tile KB*W*2W*4 bytes; keep under ~6 MB.
    KB = max(1, min(K, (6 * 2 ** 20) // max(1, W * 2 * W * 4)))
    KB = int(min(KB, 256))
    Kpad = -(-K // KB) * KB
    if Kpad != K:
        # pad with identity blocks: eliminates cleanly with pivots = 1
        eye = jnp.broadcast_to(jnp.eye(W, dtype=jnp.float32),
                               (Kpad - K, W, W))
        D32 = jnp.concatenate([D32, eye], axis=0)
    # index maps return int32 zeros: python-int literals canonicalize to
    # i64 under x64, which Mosaic's func.return cannot legalize (numpy
    # scalars keep their dtype and are not "captured constants")
    z = np.int32(0)
    inv, piv = pl.pallas_call(
        _gj_kernel,
        grid=(Kpad // KB,),
        in_specs=[pl.BlockSpec((KB, W, W), lambda i: (i, z, z),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((KB, W, W), lambda i: (i, z, z),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((KB, W), lambda i: (i, z),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((Kpad, W, W), jnp.float32),
                   jax.ShapeDtypeStruct((Kpad, W), jnp.float32)),
        interpret=interpret,
    )(D32)
    return inv[:K], piv[:K]


def batched_gj_inverse(D, interpret=None):
    """Batched unpivoted Gauss-Jordan inverse + pivot sequence, f32 Pallas.

    D: (K, W, W) any float dtype.  Returns (Dinv_f32, pivots_f32).
    On non-TPU backends runs the same kernel in interpreter mode (used by the
    CPU test mesh); production CPU code keeps the XLA f64 path instead.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D32 = jnp.asarray(D, jnp.float32)
    return _gj_call(D32, interpret=bool(interpret))


def available():
    """Whether the Pallas path should be used for block inverses."""
    return jax.default_backend() == "tpu"
