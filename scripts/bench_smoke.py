"""Perf-regression smoke guard (VERDICT r4 task 3).

Two silent layout/kernel regressions shipped in two rounds (the 513 ms
V-cycle slip from d separate gathers, round 4; the 2x supertile-SpMV slip
from the flat-vals rewrite, round 4) because nothing timed the hot ops
between a layout commit and the end-of-round snapshot. This script is the
guard: ~60-90 s on chip (after compile cache warm), timing each hot op
standalone with the chained-readback protocol and diffing against the
best-known budget table below. Run it at the TOP of every TPU queue
script; a >20% regression on any row prints REGRESSION on stderr and sets
rc=1 so the queue log flags it before the snapshot.

Rows (64^3 twisting bar, 52k particles, the standing comparison shapes):
  spmv64      supertile BSR(3x3) SpMV, einsum reduce (bench.py's form)
  apply64     matrix-free fused CL apply (the CG hot op)
  build64     full per-Newton MG hierarchy build (levels=4, galerkin)
  vcycle64    one assembled V(2,2) cycle
  cg_iter64   one block-Jacobi PCG iteration on a stressed Newton system
              (per-CG-iteration cost — weak #9: separates kernel speed
              from iteration-regime drift in steps/s records)

Usage:  python scripts/bench_smoke.py [--update-budget] [--out FILE]
Budget: scripts/smoke_budget.json {row: best_known_ms}; --update-budget
rewrites it with min(budget, measured) after a clean run.
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

BUDGET_FILE = os.path.join(REPO, "scripts", "smoke_budget.json")
THRESHOLD = 1.20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update-budget", action="store_true")
    ap.add_argument("--out", default=None,
                    help="append one JSON line per row to this file")
    args = ap.parse_args()

    from hot_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    import bench
    from hot_tpu.grid import sparse as sparse_mod
    from hot_tpu.ops import bsr as bsr_mod
    from hot_tpu.ops import bsr_tiled, transfer
    from hot_tpu.scenes import build_scene, stress_state
    from hot_tpu.sim import capacity, collision
    from hot_tpu.sim import objective as obj_mod
    from hot_tpu.solver import multigrid as mg_mod
    from hot_tpu.utils.config import MultigridConfig

    budget = {}
    if os.path.exists(BUDGET_FILE):
        with open(BUDGET_FILE) as f:
            budget = json.load(f)

    rows = {}
    t_start = time.perf_counter()

    def record(name, t_s):
        ms = t_s * 1e3
        b = budget.get(name)
        flag = bool(b is not None and ms > b * THRESHOLD)
        rows[name] = dict(ms=round(ms, 3), budget_ms=b, regressed=flag)
        line = json.dumps({"smoke": name, **rows[name]})
        print(line, flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")
        if flag:
            print(f"REGRESSION {name}: {ms:.2f} ms vs budget {b:.2f} "
                  f"(x{ms / b:.2f})", file=sys.stderr, flush=True)

    # ---- shared 64^3 stressed system -----------------------------------
    sysd = bench._build_system(64, ppc=8)
    scene, cfg, state = sysd["scene"], sysd["cfg"], sysd["state"]
    res, dt, dtype = sysd["res"], sysd["dt"], sysd["dtype"]
    dim = cfg.dim
    model = scene["model"]
    n_nodes = sysd["n_nodes"]

    # ---- spmv64: supertile einsum (bench.py's exact form) --------------
    probe = sparse_mod.build_tile_grid(state.x, cfg.dx, res, capacity=8192)
    t_cap = int(((int(probe.n_active) + 255) // 256 + 1) * 256)
    tgrid = sparse_mod.build_tile_grid(state.x, cfg.dx, res, capacity=t_cap)
    tmat = bsr_tiled.structure_tiled(tgrid)
    tmat = jax.jit(
        lambda m_, b_, st_, F_, cx_, V0_, gm_: bsr_mod.assemble_hessian_modes(
            m_, b_, st_, F_, cx_, V0_, dt, gm_))(
        tmat, sysd["bins"], sysd["st"], state.F, sysd["hess"].ctx,
        state.V0, sysd["gm"])
    nbr = bsr_tiled.tile_neighbors(tgrid)
    jax.block_until_ready(tmat.vals)
    vals5 = jax.jit(lambda m_: bsr_tiled.vals_supertile_arg(m_, dim))(tmat)
    jax.block_until_ready(vals5)
    fS = jax.jit(lambda v_, x_: bench._renorm(
        bsr_tiled.spmv_tiled(tmat._replace(vals=v_), tgrid, nbr, x_)))
    x_rows = bsr_mod.grid_vector_to_rows(tmat, sysd["vg"])
    y = fS(vals5, x_rows)
    record("spmv64", bench.best_trial(lambda y: fS(vals5, y), y))

    # ---- apply64: matrix-free fused CL apply ---------------------------
    params = jax.jit(lambda o, c: obj_mod.hessian_params_cl(o, c))(
        sysd["obj"], sysd["hess"].ctx)
    fA = jax.jit(lambda w: bench._renorm(obj_mod.multiply_cl(
        sysd["obj"], params, w, sysd["bins"], res)))
    w = fA(sysd["vg"] + 1e-3)
    record("apply64", bench.best_trial(fA, w))

    # ---- build64 + vcycle64: assembled galerkin MG ---------------------
    node_pos = transfer.node_positions(res, cfg.dx, dtype)
    _, _, constrained = collision.grid_boundary_conditions(
        node_pos, 0.0, scene["colliders"], grid_v=sysd["vg"],
        boundary_margin=2, res=res, dx=cfg.dx)
    mgc = MultigridConfig(levels=4, smoother="chebyshev",
                          coarse_solver="direct", assembled=True,
                          coarsening="galerkin")
    sol = dataclasses.replace(cfg.solver, preconditioner="multigrid",
                              multigrid=mgc)
    plan = capacity.plan_capacities(
        dataclasses.replace(cfg, solver=sol), state.x)
    mgc = dataclasses.replace(mgc, coarse_capacity=plan.mg_coarse_cap)
    mgs = jax.jit(lambda x, m: mg_mod.build_static(
        x, m, res, cfg.dx, mgc.levels, constrained, dtype,
        mg_tile_caps=plan.mg_tile_caps, mg_bin_caps=plan.mg_bin_caps))(
        state.x, state.m)
    ctx = sysd["hess"].ctx
    fB = jax.jit(lambda F, c, V0: mg_mod.build_precond(
        mgs, F, c, V0, dt, mgc, dim))
    pre = fB(state.F, ctx, state.V0)
    jax.block_until_ready(pre.diag_inv[0])
    rt = bench.roundtrip_s()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pre = fB(state.F * (1.0 + 1e-7), ctx, state.V0)
        jax.block_until_ready(pre.diag_inv[0])
        best = min(best, time.perf_counter() - t0 - rt)
    record("build64", best)

    fV = jax.jit(lambda r_: bench._renorm(mg_mod.mg_precondition(
        mgs, pre, state.F, state.V0, dt, mgc, r_)))
    r0 = fV(sysd["vg"] + 1e-3)
    record("vcycle64", bench.best_trial(fV, r0))

    # ---- cg_iter64: block-Jacobi PCG iteration, stressed system --------
    sstate = stress_state(state, cfg)
    st2 = jax.jit(lambda x: transfer.particle_stencil(x, cfg.dx, res))(
        sstate.x)
    caps = sysd["caps"]
    bins2 = jax.jit(lambda x: transfer.bin_particles(
        x, cfg.dx, res, caps[0], caps[1]))(sstate.x)
    gm2, gmv2 = jax.jit(lambda st, v, C, m: transfer.p2g_mass_momentum(
        st, v, C, m, n_nodes))(st2, sstate.v, sstate.C, sstate.m)
    act2 = gm2 > 0
    vg2 = gmv2 * jnp.where(act2, 1.0 / jnp.maximum(gm2, 1e-30), 0.0)[:, None]
    proj2, v_bc2, _ = collision.grid_boundary_conditions(
        node_pos, 0.0, scene["colliders"], grid_v=vg2, boundary_margin=2,
        res=res, dx=cfg.dx)
    v02 = collision.apply_bc_to_velocity(vg2, proj2, v_bc2)
    obj2 = jax.jit(lambda: obj_mod.make_objective(
        model, st2, sstate.F, sstate.V0, sstate.mu, sstate.lam, gm2, v02,
        proj2, dt, cfg.dx))()
    (r2, hess2) = jax.jit(lambda o, v: obj_mod.linearize(
        model, o, v, fused=(jax.default_backend() == "tpu"),
        gather_st=transfer.make_binned_gather(bins2, res)))(obj2, v02)
    params2 = jax.jit(lambda o, c: obj_mod.hessian_params_cl(o, c))(
        obj2, hess2.ctx)
    Dinv = jax.jit(lambda: obj_mod.sym_block_inv(obj_mod.elastic_block_diag(
        st2, sstate.F, hess2.ctx, sstate.V0, dt, gm2, act2, dim)))()
    b = obj_mod.project(obj2, -r2)

    def one_iter(c):
        x, rr, z, p, rz = c
        Ap = obj_mod.project(obj2, obj_mod.multiply_cl(
            obj2, params2, p, bins2, res))
        alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
        x = x + alpha * p
        rr = rr - alpha * Ap
        z = obj_mod.project(obj2, jnp.einsum("nij,nj->ni", Dinv, rr))
        rz_new = jnp.vdot(rr, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        return (x, rr, z, p * beta + z, rz_new)

    fI = jax.jit(one_iter)
    z0 = obj_mod.project(obj2, jnp.einsum("nij,nj->ni", Dinv, b))
    carry = (jnp.zeros_like(b), b, z0, z0, jnp.vdot(b, z0))
    record("cg_iter64", bench.best_trial(fI, carry, reps=20))

    total = time.perf_counter() - t_start
    any_reg = any(r["regressed"] for r in rows.values())
    summary = {"smoke": "summary", "total_s": round(total, 1),
               "regressed": any_reg,
               "backend": jax.default_backend()}
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(summary) + "\n")

    if args.update_budget and not any_reg:
        for name, r in rows.items():
            b = budget.get(name)
            budget[name] = round(min(b, r["ms"]) if b else r["ms"], 3)
        with open(BUDGET_FILE, "w") as f:
            json.dump(budget, f, indent=1, sort_keys=True)
        print(f"[smoke] budget updated: {budget}", file=sys.stderr)
    sys.exit(1 if any_reg else 0)


if __name__ == "__main__":
    main()
