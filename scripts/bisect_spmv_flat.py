"""Bisect the round-4 supertile-SpMV regression (VERDICT r4 next #2).

BENCH_r03 recorded 19.6e9 nnz/s (3.49 ms) at 128^3; BENCH_r04 9.4e9
(7.25 ms) after the flat-vals rewrite (d0b6b79). The at-rest storage went
(R, K, d, d) -> (R, K*d*d); bitwise both are row-major identical, so the
regression must be (a) the in-program split reshape changing fusion/layout
decisions, (b) per-call argument relayout, or (c) something else in the
call shape. This script times the candidate forms on the REAL 128^3 system
with the chained-readback protocol and prints one JSON line per variant.

Run (TPU, solo process):  python scripts/bisect_spmv_flat.py [--res 128]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from hot_tpu.grid import sparse as sparse_mod
from hot_tpu.ops import bsr as bsr_mod
from hot_tpu.ops import bsr_tiled


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--ppc", type=int, default=8)
    args = ap.parse_args()

    from hot_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    sysd = bench._build_system(args.res, ppc=args.ppc)
    state, cfg = sysd["state"], sysd["cfg"]
    res, dt = sysd["res"], sysd["dt"]
    dim = cfg.dim

    probe = sparse_mod.build_tile_grid(state.x, cfg.dx, res, capacity=16384)
    t_cap = int(((int(probe.n_active) + 255) // 256 + 1) * 256)
    tgrid = sparse_mod.build_tile_grid(state.x, cfg.dx, res, capacity=t_cap)
    tmat = bsr_tiled.structure_tiled(tgrid)
    tmat = jax.jit(
        lambda m_, b_, st_, F_, cx_, V0_, gm_: bsr_mod.assemble_hessian_modes(
            m_, b_, st_, F_, cx_, V0_, dt, gm_
        )
    )(tmat, sysd["bins"], sysd["st"], state.F, sysd["hess"].ctx, state.V0,
      sysd["gm"])
    nbr = bsr_tiled.tile_neighbors(tgrid)
    jax.block_until_ready(tmat.vals)
    R, KD = tmat.vals.shape
    K = tmat.K
    d = dim
    nnz = int(jax.jit(lambda m_: m_.block_nnz)(tmat)) * d * d
    print(json.dumps({"res": args.res, "rows": R, "nnz": nnz}), flush=True)

    x_rows = bsr_mod.grid_vector_to_rows(tmat, sysd["vg"])

    def record(name, t_s):
        print(json.dumps({
            "variant": name, "ms": round(t_s * 1e3, 4),
            "nnz_per_s": round(nnz / t_s / 1e9, 2),
        }), flush=True)

    # A: current production form — flat vals passed as arg, einsum reduce
    fA = jax.jit(lambda v_, x_: bench._renorm(
        bsr_tiled.spmv_tiled(tmat._replace(vals=v_), tgrid, nbr, x_)))
    y = fA(tmat.vals, x_rows)
    record("A_flat_arg_einsum", bench.best_trial(lambda y: fA(tmat.vals, y), y))

    # (A2 — vals closed over as a jit constant — is infeasible: 400 MB of
    # constants exceeds the remote-compile request buffer, HTTP 413.)

    # B: round-3 form — 5D (R, K, d, d) vals passed as arg, so the einsum
    # reduce reads an ARGUMENT layout instead of an in-program reshape
    vals5 = jax.jit(lambda v: v.reshape(R, K, d, d))(tmat.vals)
    jax.block_until_ready(vals5)

    def spmv_5d(v5, x_):
        T = tgrid.capacity
        tn = tgrid.tile_nodes
        dim = tgrid.dim
        tile = tgrid.tile
        import jax.numpy as jnp
        xt = x_.reshape(T, tn, d)
        xt = jnp.concatenate([xt, jnp.zeros((1, tn, d), x_.dtype)], axis=0)
        xn = xt[nbr]
        from hot_tpu.ops import transfer as tr
        xn = tr.barrier(xn)
        X = bsr_tiled._supercube(xn, tile, dim)
        lo, hi = tile - 2, 2 * tile + 2
        X8 = X[(slice(None),) + (slice(lo, hi),) * dim]
        S = tile + 4
        import numpy as _np
        rng5 = _np.arange(5)
        offs = _np.stack(_np.meshgrid(*([rng5] * dim), indexing="ij"),
                         -1).reshape(-1, dim)
        rngt = _np.arange(tile)
        lidx = _np.stack(_np.meshgrid(*([rngt] * dim), indexing="ij"),
                         -1).reshape(-1, dim)
        strides = _np.array([S ** (dim - 1 - a) for a in range(dim)])
        sup_idx = ((lidx[:, None, :] + offs[None, :, :]) * strides).sum(-1)
        sup_idx = jnp.asarray(sup_idx.reshape(-1), jnp.int32)
        xf = X8.reshape(T, S**dim, d)
        xw = xf[:, sup_idx].reshape(T, tn, K, d)
        y = jnp.sum(v5.reshape(T, tn, K, d, d) * xw[:, :, :, None, :],
                    axis=(2, 4))
        return bench._renorm(y.reshape(T * tn, d))

    fB = jax.jit(spmv_5d)
    y = fB(vals5, x_rows)
    record("B_5d_arg_einsum", bench.best_trial(lambda y: fB(vals5, y), y))

    # C: flat reduce (the MG call-site form) on flat vals
    fC = jax.jit(lambda v_, x_: bench._renorm(bsr_tiled.spmv_tiled(
        tmat._replace(vals=v_), tgrid, nbr, x_, reduce="flat")))
    y = fC(tmat.vals, x_rows)
    record("C_flat_arg_flatreduce", bench.best_trial(lambda y: fC(tmat.vals, y), y))

    # D: transposed-lane Pallas reduce (valsT built once, amortized)
    valsT = jax.jit(lambda m_: bsr_tiled.transpose_vals(m_, dim))(tmat)
    idx2 = jax.jit(lambda: bsr_tiled.build_gather_index(tgrid, nbr))()
    jax.block_until_ready(valsT)
    fD = jax.jit(lambda vT, xT: bench._renorm(
        bsr_tiled.spmv_T(vT, idx2, xT).T).T)
    yT = fD(valsT, x_rows.T)
    record("D_pallas_spmv_T", bench.best_trial(lambda yT: fD(valsT, yT), yT))

    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
