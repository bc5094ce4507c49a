"""Bisect the MG x Pallas divergence (VERDICT r3 item 5).

Round 3 measured mg_asm pallas-ON at different iteration counts than
pallas-OFF (3 Newton / 5 CG vs 2 / 3) while the production jacobi config
pins pallas on/off to IDENTICAL counts. The jacobi pin means the fused
APPLY chain is exact; the only other pallas-gated op is the fused
LINEARIZE (ops.pallas_linearize), whose output ctx feeds the MG
assembly. This script builds the linearization and the full MG
preconditioner twice at the SAME warmed state — fused_lin on vs off —
and reports the first quantity that differs:

  ctx (U, V, A, b_minus, b_plus), residual  -> linearize divergence
  per-level assembled vals / block diagonals -> assembly divergence
  lmax (power iteration)                     -> spectral-estimate noise

Usage: python scripts/bisect_mg_pallas.py [--res 32] [--levels 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def rel_err(a, b):
    import numpy as np

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = max(float(np.max(np.abs(a))), 1e-30)
    return float(np.max(np.abs(a - b))) / denom


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--warm", type=int, default=6)
    ap.add_argument("--smoke", action="store_true",
                    help="run both legs UNFUSED (structural check on CPU, "
                         "where pallas needs interpret mode; expect zeros)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hot_tpu.ops import transfer
    from hot_tpu.scenes import build_scene
    from hot_tpu.sim import capacity
    from hot_tpu.sim import collision
    from hot_tpu.sim import objective as obj_mod
    from hot_tpu.sim.simulation import Simulation
    from hot_tpu.solver import multigrid as mg_mod
    from hot_tpu.utils.cache import enable_compilation_cache
    from hot_tpu.utils.config import MultigridConfig

    enable_compilation_cache()
    scene = build_scene("twisting_bar_3d", res=args.res, ppc=8)
    cfg = scene["cfg"]
    # warm the state into deformation with a few jacobi steps (dt ramp)
    sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
    for _ in range(args.warm):
        sim.step(2e-3 / 50.0)
    for _ in range(3):
        sim.step(2e-3)
    state = sim.state
    dim = cfg.dim
    res = cfg.grid_res[:dim]
    n_nodes = transfer.n_nodes_of(res)
    dt = jnp.asarray(2e-3, state.x.dtype)

    st = jax.jit(lambda x: transfer.particle_stencil(x, cfg.dx, res))(state.x)
    gm, gmv = jax.jit(
        lambda st, v, C, m: transfer.p2g_mass_momentum(st, v, C, m, n_nodes)
    )(st, state.v, state.C, state.m)
    active = gm > 0
    vg = gmv * jnp.where(active, 1.0 / jnp.maximum(gm, 1e-30), 0.0)[:, None]
    proj = jnp.broadcast_to(jnp.eye(dim, dtype=vg.dtype), (n_nodes, dim, dim))
    obj = jax.jit(
        lambda st, F, V0, mu, lam, gm, vg, proj: obj_mod.make_objective(
            scene["model"], st, F, V0, mu, lam, gm, vg, proj, dt, cfg.dx
        )
    )(st, state.F, state.V0, state.mu, state.lam, gm, vg, proj)

    def linearize(fused: bool):
        r, hess = jax.jit(
            lambda o, v: obj_mod.linearize(scene["model"], o, v, fused=fused)
        )(obj, vg)
        jax.block_until_ready(r)
        return r, hess

    r_on, h_on = linearize(not args.smoke)
    r_off, h_off = linearize(False)

    out = {"res": args.res, "backend": jax.default_backend()}
    out["residual_rel"] = rel_err(r_on, r_off)
    for f in ("U", "V", "A", "b_minus", "b_plus"):
        out[f"ctx_{f}_rel"] = rel_err(getattr(h_on.ctx, f),
                                      getattr(h_off.ctx, f))
    print(json.dumps(out), flush=True)

    # MG preconditioner from each ctx (identical code below this point:
    # any difference traces back to the ctx / linearize divergence above)
    mgc = MultigridConfig(levels=args.levels, smoother="chebyshev",
                          coarse_solver="direct", assembled=True)
    sol = dataclasses.replace(cfg.solver, preconditioner="multigrid",
                              multigrid=mgc)
    cfg_mg = dataclasses.replace(cfg, solver=sol)
    plan = capacity.plan_capacities(cfg_mg, state.x)
    node_pos = transfer.node_positions(res, cfg.dx, state.x.dtype)
    _, _, constrained = collision.grid_boundary_conditions(
        node_pos, 0.0, scene["colliders"], grid_v=vg, boundary_margin=2,
        res=res, dx=cfg.dx,
    )
    mgc_cap = dataclasses.replace(mgc, coarse_capacity=plan.mg_coarse_cap)
    static = jax.jit(
        lambda x, m_, c_: mg_mod.build_static(
            x, m_, res, cfg.dx, mgc.levels, c_, state.x.dtype,
            bin_caps=plan.bin_caps,
            mg_tile_caps=plan.mg_tile_caps,
            mg_bin_caps=plan.mg_bin_caps,
        )
    )(state.x, state.m, constrained)

    def build(ctx):
        pst = jax.jit(
            lambda F_, c_, V0_: mg_mod.build_precond(
                static, F_, c_, V0_, dt, mgc_cap, dim
            )
        )(state.F, ctx, state.V0)
        jax.block_until_ready(pst.lmax[0])
        return pst

    p_on = build(h_on.ctx)
    p_off = build(h_off.ctx)
    for l in range(args.levels):
        row = {"level": l}
        if p_on.mats and p_on.mats[l] is not None:
            row["vals_rel"] = rel_err(p_on.mats[l].vals, p_off.mats[l].vals)
        row["diag_rel"] = rel_err(p_on.diag_inv[l], p_off.diag_inv[l])
        row["lmax_on"] = float(p_on.lmax[l])
        row["lmax_off"] = float(p_off.lmax[l])
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
