"""On-chip A/B of the matrix-free Hessian-apply formulations.

Target (VERDICT r2 #3 / KERNEL_PLAN): matfree apply <= 2 ms at 64^3
(round-2 record: 12.5 ms binned-XLA). Variants:

  xla      — binned window gather + XLA per-particle chain + binned scatter
             (the round-2 production path)
  fused    — same gathers + the (n, s, d)-fed Pallas kernel (round-1 path)
  cl       — flat windows + component-leading Pallas kernel + flat scatter
             (objective.multiply_cl — no small-trailing-dim HBM buffers)

Chained-readback protocol per docs/KERNEL_PLAN.md (block_until_ready is
not a fence through this tunnel; identical executions are result-cached).

Usage: python scripts/bench_apply_variants.py [--res 64] [--ppc 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from hot_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hot_tpu.ops import transfer
from hot_tpu.scenes import build_scene
from hot_tpu.sim import objective as obj_mod
from hot_tpu.sim.simulation import Simulation


def roundtrip_s():
    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones((8,), jnp.float32)
    float(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x * 1.0))
        best = min(best, time.perf_counter() - t0)
    return best


def best_trial(fn, warm, rt, n_trials=3, reps=10):
    s = fn(warm)
    float(jnp.sum(s))
    best = float("inf")
    for _ in range(n_trials):
        s = warm
        t0 = time.perf_counter()
        for _ in range(reps):
            s = fn(s)
        float(jnp.sum(s))
        best = min(best, (time.perf_counter() - t0 - rt) / reps)
    return max(best, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--ppc", type=int, default=8)
    ap.add_argument("--variants", default="xla,fused,cl")
    ap.add_argument("--pieces", action="store_true",
                    help="time the sub-ops instead of full applies")
    args = ap.parse_args()

    scene = build_scene("twisting_bar_3d", res=args.res, ppc=args.ppc)
    cfg, model = scene["cfg"], scene["model"]
    state = scene["state"]
    dim = cfg.dim
    res = cfg.grid_res[:dim]
    dx = cfg.dx
    n = state.n
    n_nodes = transfer.n_nodes_of(res)
    dt = jnp.asarray(2e-3, state.x.dtype)

    sim = Simulation(cfg, state, model, scene["colliders"])
    caps = sim._plan.bin_caps or (max(1024, n // 4), 16)

    st = jax.jit(lambda x: transfer.particle_stencil(x, dx, res))(state.x)
    bins = jax.jit(
        lambda x: transfer.bin_particles(x, dx, res, caps[0], caps[1])
    )(state.x)
    gm, gmv = jax.jit(
        lambda st, v, C, m: transfer.p2g_mass_momentum(st, v, C, m, n_nodes)
    )(st, state.v, state.C, state.m)
    active = gm > 0
    vg = gmv * jnp.where(active, 1.0 / jnp.maximum(gm, 1e-30), 0.0)[:, None]
    proj = jnp.broadcast_to(jnp.eye(dim, dtype=state.x.dtype),
                            (n_nodes, dim, dim))
    obj = jax.jit(
        lambda st, F, V0, mu, lam, gm, vg, proj: obj_mod.make_objective(
            model, st, F, V0, mu, lam, gm, vg, proj, dt, dx
        )
    )(st, state.F, state.V0, state.mu, state.lam, gm, vg, proj)
    hess = jax.jit(
        lambda o, v, b: obj_mod.build_hessian(
            model, o, v, gather_st=transfer.make_binned_gather(b, res)
        )
    )(obj, vg, bins)
    params = jax.jit(lambda o, c: obj_mod.hessian_params_cl(o, c))(
        obj, hess.ctx
    )
    jax.block_until_ready(hess.F_new)

    def renorm(y):
        return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

    fns = {}
    fns["xla"] = jax.jit(lambda w: renorm(obj_mod.multiply(
        obj, hess, w,
        scatter=transfer.make_binned_scatter(bins, res),
        gather_st=transfer.make_binned_gather(bins, res),
    )))
    fns["fused"] = jax.jit(lambda w: renorm(obj_mod.multiply(
        obj, hess, w,
        scatter=transfer.make_binned_scatter(bins, res),
        gather_st=transfer.make_binned_gather(bins, res),
        fused=True,
    )))
    fns["cl"] = jax.jit(lambda w: renorm(obj_mod.multiply_cl(
        obj, params, w, bins, res,
    )))

    # sparse tile backend: compact node space (no full-grid buffers)
    from hot_tpu.grid import sparse as sparse_mod
    from hot_tpu.ops import bsr_tiled, tile_transfer

    probe = sparse_mod.build_tile_grid(state.x, dx, res, capacity=8192)
    t_cap = int(((int(probe.n_active) + 255) // 256 + 1) * 256)
    tg = sparse_mod.build_tile_grid(state.x, dx, res, capacity=t_cap)
    t_nbr = bsr_tiled.tile_neighbors(tg)
    tbins = tile_transfer.sparse_bins(state.x, dx, tg, caps[0], caps[1])
    st_c = sparse_mod.sparse_stencil(state.x, dx, tg)
    obj_c = jax.jit(
        lambda st, F, V0, mu, lam, gm, vg, proj: obj_mod.make_objective(
            model, st, F, V0, mu, lam, gm, vg, proj, dt, dx,
            scatter=tile_transfer.make_tile_scatter(tbins, tg, t_nbr),
        )
    )(st_c, state.F, state.V0, state.mu, state.lam,
      jnp.zeros((tg.n_cnodes,), state.x.dtype).at[st_c.node_ids.reshape(-1)].add(1.0),
      jnp.zeros((tg.n_cnodes, dim), state.x.dtype),
      jnp.broadcast_to(jnp.eye(dim, dtype=state.x.dtype),
                       (tg.n_cnodes, dim, dim)))
    fns["tile"] = jax.jit(lambda w: renorm(obj_mod.multiply(
        obj_c, hess, w,
        scatter=tile_transfer.make_tile_scatter(tbins, tg, t_nbr),
        gather_st=tile_transfer.make_tile_gather(tbins, tg, t_nbr),
        fused=True,
    )))

    rt = roundtrip_s()
    out = {"res": args.res, "particles": int(n),
           "roundtrip_ms": round(rt * 1e3, 2)}

    if args.pieces:
        from hot_tpu.ops import pallas_apply as pk

        n_pad = pk.n_padded(n)
        s = 3 ** dim

        def renorm_any(y):
            return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

        def to_grid(per_p):
            # (n, dim) particle buffer -> (n_nodes, dim) grid buffer via a
            # STATIC slice write (regular op) so pieces chain on w
            g = jnp.zeros((n_nodes, dim), per_p.dtype)
            return renorm_any(g.at[:n].set(per_p))

        w0 = renorm(vg + 1e-3)
        cells_cap, cap = bins.p_cell.shape
        n_slots = cells_cap * cap

        def windows_r3(w):
            W = transfer._grid_windows(w, res)         # (n_cells, s, c)
            return to_grid(W[:n, :, 0].reshape(n, s)[:, :dim])

        def rowgather_only(w):
            # prebuilt-W row gather cost: gather n random rows of 128 lanes
            Wf = jax.lax.optimization_barrier(
                jnp.broadcast_to(w[:, :1], (n_nodes, s * dim)))
            return to_grid(Wf[bins.cell_of][:, :dim])

        def slot_scatter_only(w):
            vals = jnp.broadcast_to(w[:n, :1], (n, s * dim))
            slots = jnp.zeros((n_slots + 1, s * dim), w.dtype)
            slots = slots.at[bins.slot_of].set(vals, unique_indices=True)[:-1]
            return to_grid(slots[:n, :dim])

        def cells_to_grid_only(w):
            S = jax.lax.optimization_barrier(
                jnp.broadcast_to(w[:cells_cap, :1], (cells_cap, s * dim)))
            out_g = transfer._cells_to_grid(bins, S, res, s, dim)
            return renorm_any(out_g[:, 0].reshape(-1, 1) * jnp.ones((1, dim), w.dtype))

        pieces = {
            "windows_r3": jax.jit(windows_r3),
            "rowgather_only": jax.jit(rowgather_only),
            "slot_scatter_only": jax.jit(slot_scatter_only),
            "cells_to_grid_only": jax.jit(cells_to_grid_only),
            "gather_window": jax.jit(lambda w: to_grid(
                transfer.window_gather(bins, w, res).sum(axis=1))),
            "gather_flat": jax.jit(lambda w: to_grid(
                transfer.window_gather_flat(bins, w, res)
                .reshape(-1, s, dim).sum(axis=1))),
            "to_cl_roundtrip": jax.jit(lambda w: to_grid(
                pk._to_cl(
                    jnp.broadcast_to(w[:n, None, :], (n, s, dim))
                    .reshape(n, s * dim), n_pad)
                .reshape(s * dim, n_pad).T[:n]
                .reshape(n, s, dim).sum(axis=1))),
            "scatter_binned": jax.jit(lambda w: renorm_any(
                transfer.binned_scatter(
                    bins,
                    jnp.broadcast_to(w[:n, None, :], (n, s, dim)), res))),
            "scatter_flat": jax.jit(lambda w: renorm_any(
                transfer.binned_scatter_flat(
                    bins,
                    jnp.broadcast_to(w[:n, None, :], (n, s, dim))
                    .reshape(n, s * dim), res, dim))),
        }
        for name, fn in pieces.items():
            y = fn(w0)
            jax.block_until_ready(y)
            t = best_trial(fn, w0, rt)
            out[name + "_ms"] = round(t * 1e3, 3)
            print(f"[{name}] {t * 1e3:.3f} ms", flush=True)
        # kernel alone chains on its own (C, nb, LANES) buffer
        vi_cl0 = pk._to_cl(jnp.zeros((n, s * dim), w0.dtype) + 1e-3, n_pad)
        kern = jax.jit(lambda vi: renorm_any(pk.fused_contrib_cl(
            [vi] + list(params), dt, s=s, dim=dim)))
        y = kern(vi_cl0)
        jax.block_until_ready(y)
        t = best_trial(kern, vi_cl0, rt)
        out["kernel_only_ms"] = round(t * 1e3, 3)
        print(f"[kernel_only] {t * 1e3:.3f} ms", flush=True)
        print(json.dumps(out))
        return
    w0 = renorm(vg + 1e-3)
    w0_tile = renorm(jnp.ones((tg.n_cnodes, dim), state.x.dtype))
    ref = None
    for name in args.variants.split(","):
        fn = fns[name]
        warm = w0_tile if name == "tile" else w0
        t0 = time.perf_counter()
        y = fn(warm)
        jax.block_until_ready(y)
        compile_s = time.perf_counter() - t0
        t = best_trial(fn, warm, rt)
        out[name + "_ms"] = round(t * 1e3, 3)
        out[name + "_compile_s"] = round(compile_s, 1)
        if name != "tile":
            # cross-check on-chip: same operator up to renorm
            if ref is None:
                ref = fns["xla"](w0)
            err = float(jnp.max(jnp.abs(fn(w0) - ref)))
            out[name + "_vs_xla_maxerr"] = round(err, 8)
            print(f"[{name}] {t * 1e3:.3f} ms (err {err:.2e})", flush=True)
        else:
            print(f"[{name}] {t * 1e3:.3f} ms (compact space, "
                  f"{int(tg.n_active)} tiles)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
