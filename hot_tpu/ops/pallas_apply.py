"""Pallas TPU kernel: fused per-particle Hessian-apply contribution.

The hot inner chain of every CG iteration (SURVEY.md §3.3 hot loop #1):

    grad_w = sum_k w_k gw_k^T          (27-node stencil reduction)
    dF     = dt * grad_w @ F
    W      = U^T dF V                  (rotate into diagonal space)
    dP^    = [A diag(W); pair blocks from b+/-]
    dP     = U dP^ V^T
    dPFt   = dP @ F^T
    contrib_k = -V0 * dPFt @ gw_k      (per stencil node)

As XLA ops this chain materializes ~15 intermediates through HBM; here it
is ONE Pallas kernel over particle rows in component-leading
structure-of-arrays layout (C, B1, 128): every per-particle scalar
component is a full (sublane, lane) VPU tile, all 3x3 algebra is unrolled
to vector multiply-adds, nothing touches HBM between the gathered stencil
values and the per-(particle, node) contributions.

The surrounding stencil gather/scatter stay in hot_tpu.ops.transfer
(window/binned forms). Equality with the XLA path is tested in
tests/test_pallas.py (interpret mode on CPU + compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBL = 8  # sublane block per grid step


def _kernel(dt_ref, w_ref, gwn_ref, F_ref, U_ref, V_ref, A_ref, bp_ref, bm_ref,
            V0_ref, out_ref, *, s: int, dim: int):
    """Tensor refs are (C, SUBL, LANES) component-leading tiles; dt in SMEM."""
    d = dim
    dt = dt_ref[0, 0]

    def comp(ref, i):
        return ref[i]  # (SUBL, LANES) tile for scalar component i

    # grad[a][b] = sum_k w[k*d+a] * gwn[k*d+b]
    grad = [[None] * d for _ in range(d)]
    for a in range(d):
        for b in range(d):
            acc = comp(w_ref, 0 * d + a) * comp(gwn_ref, 0 * d + b)
            for k in range(1, s):
                acc = acc + comp(w_ref, k * d + a) * comp(gwn_ref, k * d + b)
            grad[a][b] = acc

    # dF = dt * grad @ F   (F stored row-major: F[a][b] at a*d+b)
    dF = [[None] * d for _ in range(d)]
    for a in range(d):
        for b in range(d):
            acc = grad[a][0] * comp(F_ref, 0 * d + b)
            for c in range(1, d):
                acc = acc + grad[a][c] * comp(F_ref, c * d + b)
            dF[a][b] = dt * acc

    # W = U^T dF V
    UtdF = [[None] * d for _ in range(d)]
    for i in range(d):
        for b in range(d):
            acc = comp(U_ref, 0 * d + i) * dF[0][b]
            for a in range(1, d):
                acc = acc + comp(U_ref, a * d + i) * dF[a][b]
            UtdF[i][b] = acc
    W = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(d):
            acc = UtdF[i][0] * comp(V_ref, 0 * d + j)
            for b in range(1, d):
                acc = acc + UtdF[i][b] * comp(V_ref, b * d + j)
            W[i][j] = acc

    # dP^ : diagonal entries from A @ diag(W); pair entries from b+/-
    dPh = [[None] * d for _ in range(d)]
    for i in range(d):
        acc = comp(A_ref, i * d + 0) * W[0][0]
        for j in range(1, d):
            acc = acc + comp(A_ref, i * d + j) * W[j][j]
        dPh[i][i] = acc
    pairs = [(0, 1)] if d == 2 else [(0, 1), (0, 2), (1, 2)]
    for k, (i, j) in enumerate(pairs):
        b11 = 0.5 * (comp(bp_ref, k) + comp(bm_ref, k))
        b12 = 0.5 * (comp(bm_ref, k) - comp(bp_ref, k))
        dPh[i][j] = b11 * W[i][j] + b12 * W[j][i]
        dPh[j][i] = b12 * W[i][j] + b11 * W[j][i]

    # dP = U dP^ V^T
    UdPh = [[None] * d for _ in range(d)]
    for a in range(d):
        for j in range(d):
            acc = comp(U_ref, a * d + 0) * dPh[0][j]
            for i in range(1, d):
                acc = acc + comp(U_ref, a * d + i) * dPh[i][j]
            UdPh[a][j] = acc
    dP = [[None] * d for _ in range(d)]
    for a in range(d):
        for b in range(d):
            acc = UdPh[a][0] * comp(V_ref, b * d + 0)
            for j in range(1, d):
                acc = acc + UdPh[a][j] * comp(V_ref, b * d + j)
            dP[a][b] = acc

    # dPFt = dP @ F^T : dPFt[a][b] = sum_c dP[a][c] F[b*d+c]
    dPFt = [[None] * d for _ in range(d)]
    for a in range(d):
        for b in range(d):
            acc = dP[a][0] * comp(F_ref, b * d + 0)
            for c in range(1, d):
                acc = acc + dP[a][c] * comp(F_ref, b * d + c)
            dPFt[a][b] = acc

    # contrib[k*d+a] = -V0 * sum_b dPFt[a][b] * gwn[k*d+b]
    negV0 = -comp(V0_ref, 0)
    for k in range(s):
        for a in range(d):
            acc = dPFt[a][0] * comp(gwn_ref, k * d + 0)
            for b in range(1, d):
                acc = acc + dPFt[a][b] * comp(gwn_ref, k * d + b)
            out_ref[k * d + a] = negV0 * acc


def _to_cl(x, n_pad):
    """(n, C) -> (C, n_pad//LANES ... ) component-leading tiles."""
    n, C = x.shape
    x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    return x.T.reshape(C, n_pad // LANES, LANES)


def n_padded(n: int) -> int:
    rows_per_block = SUBL * LANES
    return ((n + rows_per_block - 1) // rows_per_block) * rows_per_block


def fused_contrib_cl(args_cl, dt, *, s: int, dim: int, interpret=False):
    """Kernel core on COMPONENT-LEADING inputs (no layout conversions).

    args_cl: [vi, gwn, F, U, V, A, bp, bm, V0] already in (C, n_pad//LANES,
    LANES) tiles (see _to_cl / params_cl). Returns (s*d, n_pad//LANES,
    LANES) contributions in the same layout. This is the feed the flat
    apply path uses: the caller keeps every HBM materialization 2D-flat
    (the (n, s, d) R3 feed of the original wrapper picks up ~50x tile
    padding — docs/KERNEL_PLAN.md "tiny trailing dims").
    """
    dtype = args_cl[0].dtype
    n_pad = args_cl[0].shape[1] * LANES
    grid = (n_pad // (SUBL * LANES),)

    def spec(C):
        return pl.BlockSpec(
            (C, SUBL, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)
    in_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    in_specs += [spec(a.shape[0]) for a in args_cl]
    return pl.pallas_call(
        functools.partial(_kernel, s=s, dim=dim),
        out_shape=jax.ShapeDtypeStruct((s * dim, n_pad // LANES, LANES), dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec(s * dim),
        interpret=interpret,
    )(dt_arr, *args_cl)


def params_cl(gwn, F, U, V, A, bp, bm, V0, n_pad: int):
    """Per-Newton parameter block in component-leading layout — computed
    once per linearization, reused by every CG apply."""
    n, s, d = gwn.shape
    return [
        _to_cl(gwn.reshape(n, s * d), n_pad),
        _to_cl(F.reshape(n, d * d), n_pad),
        _to_cl(U.reshape(n, d * d), n_pad),
        _to_cl(V.reshape(n, d * d), n_pad),
        _to_cl(A.reshape(n, d * d), n_pad),
        _to_cl(bp, n_pad),
        _to_cl(bm, n_pad),
        _to_cl(V0[:, None], n_pad),
    ]


def fused_contrib(vi, gwn, F, U, V, A, bp, bm, V0, dt, *, interpret=False):
    """Per-(particle, stencil-node) force-differential contributions.

    vi, gwn: (n, s, d); F/U/V/A: (n, d, d); bp/bm: (n, n_pairs); V0: (n,).
    Returns (n, s, d) — identical to the XLA chain in
    objective.elastic_hessian_apply between gather and scatter.
    """
    n, s, d = vi.shape
    n_pad = n_padded(n)
    args = [_to_cl(vi.reshape(n, s * d), n_pad)]
    args += params_cl(gwn, F, U, V, A, bp, bm, V0, n_pad)
    out = fused_contrib_cl(args, dt, s=s, dim=d, interpret=interpret)
    out = out.reshape(s * d, n_pad).T[:n]
    return out.reshape(n, s, d)
