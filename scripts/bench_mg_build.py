"""Decompose the per-Newton assembled-MG build cost on chip.

The round-3 A/B put mg_asm at 2-3 Newton / 3-5 CG per step (vs jacobi's
3/17) but ~2.1 s per hierarchy build — the whole wall-clock gap. This
times the build pieces standalone with the chained-readback protocol and
enough repetitions to retire the post-compile re-opt window:

  assemble_l0   — rank-1-mode assembly of the finest BSR (per Newton)
  rap01/12/23   — parity-static Galerkin RAP per level pair
  diag+lmax     — block diagonals + power iterations (all levels)
  coarse_chol   — agglomerated dense factor
  vcycle        — one assembled V(2,2) cycle (per CG iteration)

Usage: python scripts/bench_mg_build.py [--res 64] [--levels 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from hot_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hot_tpu.ops import transfer
from hot_tpu.scenes import build_scene
from hot_tpu.sim import collision
from hot_tpu.sim import objective as obj_mod
from hot_tpu.sim.simulation import Simulation
from hot_tpu.solver import multigrid as mg_mod
from hot_tpu.utils.config import MultigridConfig


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


def best_chain(fn, warm, rt, n_trials=3, reps=6):
    s = fn(warm)
    float(jnp.sum(jax.tree_util.tree_leaves(s)[0]))
    best = float("inf")
    for _ in range(n_trials):
        s = warm
        t0 = time.perf_counter()
        for _ in range(reps):
            s = fn(s)
        float(jnp.sum(jax.tree_util.tree_leaves(s)[0]))
        best = min(best, (time.perf_counter() - t0 - rt) / reps)
    return max(best, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--levels", type=int, default=4)
    args = ap.parse_args()

    scene = build_scene("twisting_bar_3d", res=args.res, ppc=8)
    cfg, model, state = scene["cfg"], scene["model"], scene["state"]
    dim = cfg.dim
    res = cfg.grid_res[:dim]
    dx = cfg.dx
    dt = jnp.asarray(2e-3, state.x.dtype)
    n_nodes = transfer.n_nodes_of(res)

    import dataclasses

    from hot_tpu.sim import capacity

    mgc = MultigridConfig(levels=args.levels, smoother="chebyshev",
                          coarse_solver="direct", assembled=True)
    sol = dataclasses.replace(cfg.solver, preconditioner="multigrid",
                              multigrid=mgc)
    cfg_mg = dataclasses.replace(cfg, solver=sol)
    plan = capacity.plan_capacities(cfg_mg, state.x)
    mg_tile_caps = plan.mg_tile_caps
    mg_bin_caps = plan.mg_bin_caps
    coarse_cap = plan.mg_coarse_cap
    mgc = dataclasses.replace(mgc, coarse_capacity=coarse_cap)
    print(f"[info] tile_caps={mg_tile_caps} coarse_cap={coarse_cap}",
          file=sys.stderr, flush=True)

    st = jax.jit(lambda x: transfer.particle_stencil(x, dx, res))(state.x)
    gm, gmv = jax.jit(
        lambda st, v, C, m: transfer.p2g_mass_momentum(st, v, C, m, n_nodes)
    )(st, state.v, state.C, state.m)
    active = gm > 0
    vg = gmv * jnp.where(active, 1.0 / jnp.maximum(gm, 1e-30), 0.0)[:, None]
    node_pos = transfer.node_positions(res, dx, state.x.dtype)
    _, _, constrained = collision.grid_boundary_conditions(
        node_pos, 0.0, scene["colliders"], grid_v=vg, boundary_margin=2,
        res=res, dx=dx,
    )
    mgs = jax.jit(
        lambda x, m: mg_mod.build_static(
            x, m, res, dx, args.levels, constrained, state.x.dtype,
            mg_tile_caps=mg_tile_caps, mg_bin_caps=mg_bin_caps,
        ),
        static_argnames=(),
    )(state.x, state.m)
    from hot_tpu.models import constitutive as cm

    ctx = jax.jit(
        lambda F, mu, lam: jax.vmap(
            lambda f, m_, l_: cm.hessian_context(model, f, m_, l_)
        )(F, mu, lam)
    )(state.F, state.mu, state.lam)

    rt = roundtrip_s()
    out = {"res": args.res, "levels": args.levels,
           "roundtrip_ms": round(rt * 1e3, 2)}

    # full build_precond (the per-Newton cost)
    bp = jax.jit(lambda F, c, V0: mg_mod.build_precond(
        mgs, F, c, V0, dt, mgc, dim))
    pre = bp(state.F, ctx, state.V0)
    jax.block_until_ready(pre.diag_inv[0])

    def chain_bp(F):
        p = bp(F, ctx, state.V0)
        return F * (1.0 + 1e-9 * jnp.mean(p.diag_inv[0]))

    t = best_chain(chain_bp, state.F, rt)
    out["build_precond_ms"] = round(t * 1e3, 1)
    print(f"[build_precond] {t * 1e3:.1f} ms", flush=True)

    # assembly of level 0 alone
    lv0 = mgs.levels[0]
    from hot_tpu.ops import bsr as bsr_mod

    asm0 = jax.jit(lambda F, c, V0: bsr_mod.assemble_hessian_modes(
        lv0.mat_sym, lv0.bins, lv0.stencil, F, c, V0, dt, gm))

    m0 = asm0(state.F, ctx, state.V0)
    jax.block_until_ready(m0.vals)

    def chain_asm(F):
        m_ = asm0(F, ctx, state.V0)
        return F * (1.0 + 1e-9 * jnp.mean(m_.vals[0, 0]))

    t = best_chain(chain_asm, state.F, rt)
    out["assemble_l0_ms"] = round(t * 1e3, 1)
    print(f"[assemble_l0] {t * 1e3:.1f} ms", flush=True)

    # RAP chain from the assembled finest
    from hot_tpu.ops import spgemm

    def rap_chain(mat0):
        mats = [mat0]
        for l in range(1, args.levels):
            lv = mgs.levels[l]
            cap = lv.grid_m.shape[0]
            mats.append(spgemm.rap(mats[-1], lv.res,
                                   jnp.ones((cap,), bool), cap))
        return mats

    rap_j = jax.jit(lambda v0: rap_chain(m0._replace(vals=v0))[-1].vals)
    y = rap_j(m0.vals)
    jax.block_until_ready(y)
    t = best_chain(
        lambda v: v * (1.0 + 1e-30 * jnp.mean(rap_j(v))), m0.vals, rt
    )
    out["rap_chain_ms"] = round(t * 1e3, 1)
    print(f"[rap_chain levels 0->{args.levels - 1}] {t * 1e3:.1f} ms",
          flush=True)

    # one V-cycle (per CG iteration)
    vc = jax.jit(lambda r: mg_mod.mg_precondition(
        mgs, pre, state.F, state.V0, dt, mgc, r))
    r0 = jnp.where(active[:, None], vg + 1e-3, 0.0)
    z = vc(r0)
    jax.block_until_ready(z)
    t = best_chain(lambda r: vc(r) * 0.5 + r * 1e-6, r0, rt)
    out["vcycle_ms"] = round(t * 1e3, 2)
    print(f"[vcycle] {t * 1e3:.2f} ms", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
