"""Structured SpGEMM: Galerkin triple product A_c = P^T A P on BSR
stencil matrices.

Reference equivalent: the Galerkin coarse-operator construction named in
BASELINE.json:5 ("Galerkin coarsening via SpGEMM to construct HOT's
node-embedding multigrid hierarchy"). HOT's primary construction is
particle-quadrature rediscretization (hot_tpu.solver.multigrid); this
module provides the *algebraic* RAP used as its cross-check and as the
general explicit-matrix path (SURVEY.md §7 hard part 3).

Structure exploited instead of general SpGEMM: the prolongation P is the
node-embedding quadratic B-spline interpolation — every fine node embeds
in exactly 3^dim coarse nodes with weights computed from its coordinates.
With a 5-wide fine operator, R A P has a 7-wide coarse stencil (half = 3):
|2 Jc - 2 Ic| < 3 + 2 + 3 => |Jc - Ic| <= 3 coarse cells. Both products are
gather-weighted scatter-adds over fixed-size windows — no dynamic sparsity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from hot_tpu.ops import bsr as bsr_mod
from hot_tpu.ops import transfer
from hot_tpu.ops.bspline import quadratic_kernel_1d, stencil_offsets


def embedding_weights(coords_f, dtype):
    """Node-embedding interpolation of fine node coords into the coarse grid.

    Fine node at coord c (integer, spacing dx) sits at position c/2 in
    coarse cells. Returns (base (n, dim) int32, w (n, 3^dim)) with
    coarse stencil nodes base + stencil_offsets.
    """
    dim = coords_f.shape[-1]
    xs = coords_f.astype(dtype) * 0.5                 # coarse-cell coordinates
    base = jnp.floor(xs - 0.5).astype(jnp.int32)
    u = xs - base.astype(dtype)
    w_axes = quadratic_kernel_1d(u)                   # (n, dim, 3)
    if dim == 2:
        w = (w_axes[:, 0, :, None] * w_axes[:, 1, None, :]).reshape(-1, 9)
    else:
        w = (
            w_axes[:, 0, :, None, None]
            * w_axes[:, 1, None, :, None]
            * w_axes[:, 2, None, None, :]
        ).reshape(-1, 27)
    return base, w


def rap(A: bsr_mod.BsrMatrix, coarse_res: Tuple[int, ...], coarse_active,
        coarse_capacity: int) -> bsr_mod.BsrMatrix:
    """A_c = P^T A P with node-embedding prolongation. A must be 5-wide."""
    assert A.half == 2, "rap expects a quadrature (5-wide) fine matrix"
    dim = A.dim
    dtype = A.vals.dtype
    Kf = A.K
    n_nodes_f = transfer.n_nodes_of(A.res)
    res_c = jnp.asarray(coarse_res, jnp.int32)

    coords = transfer.unravel(jnp.minimum(A.node_of, n_nodes_f - 1), A.res)
    valid_row = A.node_of < n_nodes_f

    offs_f = bsr_mod._offsets(dim, A.half)            # (Kf, dim)
    emb_offs = stencil_offsets(dim)                   # (3^dim, dim)
    s_emb = emb_offs.shape[0]

    # ---- step 1: W = A P  (fine rows x coarse window of 5^dim) ----------
    # window base for row j: floor(c_j/2 - 0.5) - 1  (coarse coords)
    base_j, w_j = embedding_weights(coords, dtype)    # embeds of row node j
    win_base = base_j - 1
    KW = 5**dim                                       # coarse window per fine row

    # neighbor i = coords + off; its coarse embedding:
    ncoords = coords[:, None, :] + offs_f[None, :, :]          # (R, Kf, dim)
    base_i, w_i = jax.vmap(
        lambda c: embedding_weights(c, dtype), in_axes=1, out_axes=1
    )(ncoords)                                                  # (R, Kf, dim), (R, Kf, 3^dim)

    # window index of each coarse node of i's stencil
    widx_coord = (
        base_i[:, :, None, :] + emb_offs[None, None, :, :] - win_base[:, None, None, :]
    )                                                           # (R, Kf, 3^d, dim)
    in_win = jnp.all((widx_coord >= 0) & (widx_coord < 5), axis=-1)
    widx = jnp.zeros(widx_coord.shape[:-1], jnp.int32)
    for a in range(dim):
        widx = widx * 5 + jnp.clip(widx_coord[..., a], 0, 4)

    present = (A.col_row >= 0)[:, :, None] & in_win & valid_row[:, None, None]
    contrib = (
        A.vals[:, :, None, :, :] * w_i[:, :, :, None, None]
    )                                                           # (R, Kf, 3^d, d, d)
    contrib = jnp.where(present[..., None, None], contrib, 0.0)

    R_rows = A.n_rows
    flat = (jnp.arange(R_rows)[:, None, None] * KW + widx).reshape(-1)
    flat = jnp.where(present.reshape(-1), flat, R_rows * KW)
    W = jnp.zeros((R_rows * KW + 1, dim * dim), dtype)
    W = W.at[flat].add(contrib.reshape(-1, dim * dim))[:-1]
    W = W.reshape(R_rows, KW, dim, dim)

    # ---- step 2: A_c = P^T W  (scatter into 7-wide coarse stencil) ------
    A_c = bsr_mod.structure(coarse_active, coarse_res, coarse_capacity, half=3)
    Kc = A_c.K
    n_nodes_c = transfer.n_nodes_of(coarse_res)

    # coarse row node for each embed entry of j
    strides_c = []
    s = 1
    for r in reversed(coarse_res):
        strides_c.append(s)
        s *= int(r)
    strides_c = jnp.asarray(strides_c[::-1], jnp.int32)

    Jc_coord = base_j[:, None, :] + emb_offs[None, :, :]        # (R, 3^d, dim)
    Jc_ok = jnp.all((Jc_coord >= 0) & (Jc_coord < res_c[None, None, :]), axis=-1)
    Jc_node = jnp.sum(jnp.clip(Jc_coord, 0, res_c - 1) * strides_c[None, None, :], axis=-1)
    Jc_row = jnp.where(Jc_ok, A_c.row_of[Jc_node], -1)          # (R, 3^d)

    # coarse col node for each window entry
    offs_w = bsr_mod._offsets(dim, 2)                           # window offsets [-2,2]
    Ic_coord = (base_j - 1 + 2)[:, None, :] + offs_w[None, :, :]  # = win_base + widx
    # rel offset Ic - Jc in [-3, 3]
    rel = Ic_coord[:, None, :, :] - Jc_coord[:, :, None, :]     # (R, 3^d, KW, dim)
    rel_ok = jnp.all(jnp.abs(rel) <= 3, axis=-1)
    oid = jnp.zeros(rel.shape[:-1], jnp.int32)
    for a in range(dim):
        oid = oid * 7 + jnp.clip(rel[..., a] + 3, 0, 6)

    ok = Jc_ok[:, :, None] & rel_ok & (Jc_row >= 0)[:, :, None] & valid_row[:, None, None]
    flat2 = jnp.where(ok, Jc_row[:, :, None] * Kc + oid, A_c.n_rows * Kc).reshape(-1)
    vals2 = (w_j[:, :, None, None, None] * W[:, None, :, :, :])
    vals2 = jnp.where(ok[..., None, None], vals2, 0.0).reshape(-1, dim * dim)
    out = jnp.zeros((A_c.n_rows * Kc + 1, dim * dim), dtype)
    out = out.at[flat2].add(vals2)[:-1].reshape(A_c.n_rows, Kc, dim, dim)
    out = jnp.where((A_c.col_row >= 0)[:, :, None, None], out, 0.0)
    return A_c._replace(vals=out)
