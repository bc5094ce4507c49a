"""Bisect the 128^3 MG-PCG NaN (round 5): build the real system + phased
hierarchy, then evaluate every V-cycle ingredient as its own execution
and report the FIRST non-finite quantity.

Usage: python scripts/probe_mg_nan.py [--res 128] [--levels 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--ppc", type=int, default=8)
    ap.add_argument("--from-level", type=int, default=1)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from hot_tpu.ops import transfer
    from hot_tpu.scenes import build_scene, stress_state
    from hot_tpu.sim import capacity, collision
    from hot_tpu.sim import objective as obj_mod
    from hot_tpu.solver import multigrid as mg_mod
    from hot_tpu.utils.cache import enable_compilation_cache
    from hot_tpu.utils.config import MultigridConfig

    enable_compilation_cache()
    scene = build_scene("twisting_bar_3d", res=args.res, ppc=args.ppc)
    cfg = scene["cfg"]
    state = stress_state(scene["state"], cfg)
    model = scene["model"]
    dim = cfg.dim
    res = cfg.grid_res[:dim]
    dx = cfg.dx
    n_nodes = transfer.n_nodes_of(res)
    dt = jnp.asarray(2e-3, state.x.dtype)

    mgc = MultigridConfig(levels=args.levels, smoother="chebyshev",
                          coarse_solver="direct", assembled=True,
                          coarsening="galerkin",
                          assembled_from_level=args.from_level)
    sol = dataclasses.replace(cfg.solver, preconditioner="multigrid",
                              multigrid=mgc)
    plan = capacity.plan_capacities(
        dataclasses.replace(cfg, solver=sol), state.x)
    mgc = dataclasses.replace(mgc, coarse_capacity=plan.mg_coarse_cap)

    st = jax.jit(lambda x: transfer.particle_stencil(x, dx, res))(state.x)
    gm, gmv = jax.jit(lambda st_, v, C, m: transfer.p2g_mass_momentum(
        st_, v, C, m, n_nodes))(st, state.v, state.C, state.m)
    active = gm > 0
    vg = gmv * jnp.where(active, 1.0 / jnp.maximum(gm, 1e-30), 0.0)[:, None]
    node_pos = transfer.node_positions(res, dx, state.x.dtype)
    proj, v_bc, constrained = collision.grid_boundary_conditions(
        node_pos, 0.0, scene["colliders"], grid_v=vg, boundary_margin=2,
        res=res, dx=dx)
    v0 = collision.apply_bc_to_velocity(vg, proj, v_bc)
    obj = jax.jit(lambda st_, F, V0, mu, lam, gm_, v0_, proj_:
                  obj_mod.make_objective(model, st_, F, V0, mu, lam, gm_,
                                         v0_, proj_, dt, dx))(
        st, state.F, state.V0, state.mu, state.lam, gm, v0, proj)
    r, hess = jax.jit(lambda o, v: obj_mod.linearize(
        model, o, v, fused=(jax.default_backend() == "tpu")))(obj, v0)
    ctx = hess.ctx
    b = obj_mod.project(obj, -r)

    mg_static = jax.jit(lambda x, m, c: mg_mod.build_static(
        x, m, res, dx, mgc.levels, c, state.x.dtype,
        bin_caps=plan.bin_caps, mg_tile_caps=plan.mg_tile_caps,
        mg_bin_caps=plan.mg_bin_caps,
        assembled_from=mgc.assembled_from_level,
        mg_composed_caps=plan.mg_composed_caps,
        mg_ncomposed_caps=plan.mg_ncomposed_caps))(
        state.x, state.m, constrained)
    jax.block_until_ready(mg_static.levels[0].grid_m)
    print("[static done]", file=sys.stderr, flush=True)

    pre = mg_mod.build_precond(mg_static, state.F, ctx, state.V0, dt, mgc,
                               dim, exe=lambda f, *a: jax.jit(f)(*a))
    print("[build done]", file=sys.stderr, flush=True)

    def chk(name, x):
        leaves = jax.tree_util.tree_leaves(x)
        fin = all(bool(jnp.all(jnp.isfinite(l))) for l in leaves
                  if jnp.issubdtype(l.dtype, jnp.floating))
        mx = max((float(jnp.abs(l).max()) for l in leaves
                  if jnp.issubdtype(l.dtype, jnp.floating)), default=0.0)
        print(json.dumps({"chk": name, "finite": fin, "absmax": mx}),
              flush=True)
        return fin

    for l in range(args.levels):
        chk(f"lmax[{l}]", pre.lmax[l])
        chk(f"diag_inv[{l}]", pre.diag_inv[l])
        if pre.mats and pre.mats[l] is not None:
            chk(f"mats[{l}].vals", pre.mats[l].vals)
    if pre.coarse_chol is not None:
        chk("coarse_chol", pre.coarse_chol[0]
            if isinstance(pre.coarse_chol, tuple) else pre.coarse_chol)

    # level-0 ingredients on the real rhs
    lv0 = mg_static.levels[0]
    y = jax.jit(lambda w: mg_mod.level_multiply(
        lv0, state.F, ctx, state.V0, dt, w))(b)
    chk("l0_apply(b)", y)
    z = jax.jit(lambda r_: mg_mod._bapply(pre.diag_inv[0], r_))(b)
    chk("Dinv0 b", z)

    # smoother at level 0
    def smooth0(r_):
        mul, proj_ = mg_mod._level_ops_dense(lv0, state.F, ctx, state.V0,
                                             dt)
        return mg_mod.chebyshev_smooth(
            mul, proj_, pre.diag_inv[0], pre.lmax[0], r_,
            jnp.zeros_like(r_), mgc.chebyshev_order, mgc.chebyshev_lo,
            mgc.chebyshev_hi)

    chk("cheb0(b)", jax.jit(smooth0)(b))

    # full V-cycle
    zv = jax.jit(lambda r_: mg_mod.mg_precondition(
        mg_static, pre, state.F, state.V0, dt, mgc, r_))(b)
    chk("v_cycle(b)", zv)


if __name__ == "__main__":
    main()
