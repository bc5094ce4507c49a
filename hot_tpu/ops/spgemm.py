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


def rap_half_out(half_in: int) -> int:
    """Output stencil half of P^T A P: ceil(h/2) + 2. Fixed point at 4, so
    recursive Galerkin hierarchies have 5 -> 7 -> 9 -> 9 ... wide levels."""
    return (half_in + 1) // 2 + 2


def rap(A: bsr_mod.BsrMatrix, coarse_res: Tuple[int, ...], coarse_active,
        coarse_capacity: int, mem_budget: int = 1 << 28,
        fine_origin=None, coarse_origin=None,
        coarse_tgrid=None) -> bsr_mod.BsrMatrix:
    """A_c = P^T A P with node-embedding prolongation, any stencil half.

    Chunked over the fine-stencil and embedding axes so no intermediate
    exceeds ~mem_budget bytes (the full (R, Kf, 3^d, d, d) products reach
    several GB at fine levels).

    fine_origin / coarse_origin: optional (dim,) integer GLOBAL coords of
    the local grids' node (0,...,0) — used by the sharded MG, where A is a
    device's partial operator over its extended slab and the embedding
    relation g_coarse = embed(g_fine) holds in GLOBAL coordinates
    (g = local + origin). None = both grids are global (origins zero).

    coarse_tgrid: when given (a grid.sparse.TileGrid at coarse spacing),
    the output structure is TILE-COMPACTED (ops.bsr_tiled.structure_tiled
    at the widened half): coarse row index == compacted coarse node id,
    coarse_active/coarse_capacity are ignored, and entries landing outside
    active coarse tiles are dropped (subspace Galerkin — the restriction
    drops the same rows, so the V-cycle correction stays consistent).
    The fine A works either way (only node_of/coords are consumed).
    """
    dim = A.dim
    h = A.half
    dtype = A.vals.dtype
    Kf = A.K
    dd = dim * dim
    n_nodes_f = transfer.n_nodes_of(A.res)
    res_c = jnp.asarray(coarse_res, jnp.int32)
    f_org = (jnp.zeros((dim,), jnp.int32) if fine_origin is None
             else jnp.asarray(fine_origin, jnp.int32))
    c_org = (jnp.zeros((dim,), jnp.int32) if coarse_origin is None
             else jnp.asarray(coarse_origin, jnp.int32))

    coords = transfer.unravel(jnp.minimum(A.node_of, n_nodes_f - 1), A.res)
    valid_row = A.node_of < n_nodes_f

    offs_f = bsr_mod._offsets(dim, h)                 # (Kf, dim)
    emb_offs = stencil_offsets(dim)                   # (3^dim, dim)
    s_emb = emb_offs.shape[0]

    # ---- step 1: W = A P  (fine rows x coarse window) --------------------
    # base_i of any neighbor lies within ceil(h/2) of base_j per axis
    wm = (h + 1) // 2                                 # window margin
    W1d = 2 * wm + 3
    KW = W1d**dim
    # embeds of row node j: embedding runs in GLOBAL coords, results are
    # shifted back to the local coarse frame
    base_j, w_j = embedding_weights(coords + f_org[None, :], dtype)
    base_j = base_j - c_org[None, :]
    win_base = base_j - wm

    R_rows = A.n_rows
    # chunk Kf so the (R, kfc, 3^d, dd) product stays under budget
    itemsize = jnp.dtype(dtype).itemsize
    kfc = max(1, min(Kf, mem_budget // max(R_rows * s_emb * dd * itemsize, 1)))
    W = jnp.zeros((R_rows * KW + 1, dd), dtype)
    for k0 in range(0, Kf, kfc):
        k1 = min(k0 + kfc, Kf)
        ncoords = coords[:, None, :] + offs_f[None, k0:k1, :]   # (R, kc, dim)
        base_i, w_i = jax.vmap(
            lambda c: embedding_weights(c + f_org[None, :], dtype),
            in_axes=1, out_axes=1,
        )(ncoords)                                              # (R, kc, ...)
        base_i = base_i - c_org[None, None, :]
        widx_coord = (
            base_i[:, :, None, :] + emb_offs[None, None, :, :]
            - win_base[:, None, None, :]
        )                                                       # (R, kc, 3^d, dim)
        in_win = jnp.all((widx_coord >= 0) & (widx_coord < W1d), axis=-1)
        widx = jnp.zeros(widx_coord.shape[:-1], jnp.int32)
        for a in range(dim):
            widx = widx * W1d + jnp.clip(widx_coord[..., a], 0, W1d - 1)
        present = ((A.col_row[:, k0:k1] >= 0)[:, :, None] & in_win
                   & valid_row[:, None, None])
        contrib = (A.vals[:, k0:k1, None, :, :]
                   * w_i[:, :, :, None, None])                  # (R, kc, 3^d, d, d)
        contrib = jnp.where(present[..., None, None], contrib, 0.0)
        flat = (jnp.arange(R_rows)[:, None, None] * KW + widx).reshape(-1)
        flat = jnp.where(present.reshape(-1), flat, R_rows * KW)
        W = W.at[flat].add(contrib.reshape(-1, dd))
    W = W[:-1].reshape(R_rows, KW, dim, dim)

    # ---- step 2: A_c = P^T W (scatter into the coarse stencil) -----------
    h_c = rap_half_out(h)
    Jc_coord = base_j[:, None, :] + emb_offs[None, :, :]        # (R, 3^d, dim)
    Jc_ok = jnp.all((Jc_coord >= 0) & (Jc_coord < res_c[None, None, :]), axis=-1)
    if coarse_tgrid is not None:
        from hot_tpu.grid import sparse as sparse_mod
        from hot_tpu.ops import bsr_tiled

        A_c = bsr_tiled.structure_tiled(coarse_tgrid, half=h_c)
        cid = sparse_mod.compact_node_id(
            coarse_tgrid, jnp.clip(Jc_coord, 0, res_c - 1)
        )
        Jc_row = jnp.where(Jc_ok & (cid < coarse_tgrid.dump), cid, -1)
    else:
        A_c = bsr_mod.structure(coarse_active, coarse_res, coarse_capacity,
                                half=h_c)
        strides_c = []
        s = 1
        for r in reversed(coarse_res):
            strides_c.append(s)
            s *= int(r)
        strides_c = jnp.asarray(strides_c[::-1], jnp.int32)
        Jc_node = jnp.sum(jnp.clip(Jc_coord, 0, res_c - 1)
                          * strides_c[None, None, :], axis=-1)
        Jc_row = jnp.where(Jc_ok, A_c.row_of[Jc_node], -1)      # (R, 3^d)
    Kc = A_c.K

    offs_w = bsr_mod._offsets(dim, wm + 1)                      # window offsets
    out = jnp.zeros((A_c.n_rows * Kc + 1, dd), dtype)
    # chunk the embedding axis of j so (R, KW, dd) stays under budget
    for e0 in range(s_emb):
        Jc_e = Jc_coord[:, e0, :]                               # (R, dim)
        Ic_coord = (win_base + wm + 1)[:, None, :] + offs_w[None, :, :]
        rel = Ic_coord - Jc_e[:, None, :]                       # (R, KW, dim)
        rel_ok = jnp.all(jnp.abs(rel) <= h_c, axis=-1)
        oid = jnp.zeros(rel.shape[:-1], jnp.int32)
        for a in range(dim):
            oid = oid * (2 * h_c + 1) + jnp.clip(rel[..., a] + h_c, 0, 2 * h_c)
        ok = (Jc_ok[:, e0, None] & rel_ok & (Jc_row[:, e0] >= 0)[:, None]
              & valid_row[:, None])
        flat2 = jnp.where(ok, Jc_row[:, e0, None] * Kc + oid,
                          A_c.n_rows * Kc).reshape(-1)
        vals2 = w_j[:, e0, None, None, None] * W
        vals2 = jnp.where(ok[..., None, None], vals2, 0.0).reshape(-1, dd)
        out = out.at[flat2].add(vals2)
    out = out[:-1].reshape(A_c.n_rows, Kc, dim, dim)
    out = jnp.where((A_c.col_row >= 0)[:, :, None, None], out, 0.0)
    return A_c._replace(vals=out)
