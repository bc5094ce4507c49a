"""The north-star 128^3 A/B, deadline-safe: MG-PCG vs block-Jacobi-PCG on
ONE real Newton system, every phase its own execution.

The full-step A/B cannot run at 128^3 on this device: a full-dt mg_asm
step is a ~40-50 s single execution against the ~65 s execution deadline
(probe_exec_deadline), and the post-compile re-opt multiplier pushes it
over — every queue-2/3/manual attempt killed the worker. This script
measures exactly the metric BASELINE.json:2 names ("MG-PCG wall-time per
Newton step") without a monolithic execution:

  1. build the 128^3 twisting-bar Newton system at an IMPACT state
     (scenes.stress_state: radial compression + twist -> real residual);
  2. phase-per-execution: linearize (fused ctx), block-Jacobi diag,
     MG build_static + build_precond (the per-Newton hierarchy build);
  3. solve A dv = -r by PCG with the SAME matrix-free fused apply for
     both preconditioners, CHUNKED: a jitted 5-iteration block per
     execution, host checks convergence between chunks;
  4. report per variant: CG iterations to the inexact-Newton tolerance,
     ms per CG iteration, preconditioner build ms, and
     newton_ms = build + lin + cg * per_iter (the per-Newton wall time).

Usage: python scripts/bench_mg_solve.py [--res 128] [--levels 4]
       [--tol 1e-3] [--chunk 5] [--max-cg 100]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--ppc", type=int, default=8)
    ap.add_argument("--tol", type=float, default=1e-3,
                    help="relative residual tolerance (the production "
                         "inexact-Newton cg_tol)")
    ap.add_argument("--chunk", type=int, default=5)
    ap.add_argument("--max-cg", type=int, default=100)
    ap.add_argument("--dt", type=float, default=2e-3)
    ap.add_argument("--warm-chunks", type=int, default=3,
                    help="throwaway PCG chunk executions before timing "
                         "(retires the post-compile re-opt window)")
    ap.add_argument("--from-level", type=int, default=None,
                    help="multigrid.assembled_from_level (default: 1 when "
                         "res >= 128 — the level-0 explicit BSR is ~8.7 GB "
                         "there; 0 below)")
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
    t_all = time.perf_counter()
    scene = build_scene("twisting_bar_3d", res=args.res, ppc=args.ppc)
    cfg = scene["cfg"]
    state = stress_state(scene["state"], cfg)
    model = scene["model"]
    dim = cfg.dim
    res = cfg.grid_res[:dim]
    dx = cfg.dx
    n_nodes = transfer.n_nodes_of(res)
    dt = jnp.asarray(args.dt, state.x.dtype)
    plan = capacity.plan_capacities(cfg, state.x)
    caps = plan.bin_caps or (max(1024, state.n // 4), 16)

    def _mem():
        # axon plugin has no memory_stats(); account Python-live arrays
        # (excludes XLA temps, includes every resident the GC still holds)
        try:
            tot = sum(a.nbytes for a in jax.live_arrays())
            return f"live={tot / 2**30:.2f}G"
        except Exception:  # noqa: BLE001
            return "mem=?"

    def _top_arrays(k=8):
        arrs = sorted(jax.live_arrays(), key=lambda a: -a.nbytes)[:k]
        for a in arrs:
            print(f"  live {a.nbytes / 2**20:7.1f}M {a.dtype} {a.shape}",
                  file=sys.stderr, flush=True)

    def phase(name, fn, *xs):
        t0 = time.perf_counter()
        out = fn(*xs)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t1 = time.perf_counter()
        print(f"[{name}] {t1 - t0:.2f}s {_mem()}", file=sys.stderr,
              flush=True)
        return out, (t1 - t0) * 1e3

    # ---- system setup (transfers + objective), own executions ----------
    st, _ = phase("stencil", jax.jit(
        lambda x: transfer.particle_stencil(x, dx, res)), state.x)
    bins, _ = phase("bins", jax.jit(
        lambda x: transfer.bin_particles(x, dx, res, caps[0], caps[1])),
        state.x)
    (gm, gmv), _ = phase("p2g", jax.jit(
        lambda st_, v, C, m: transfer.p2g_mass_momentum(st_, v, C, m,
                                                        n_nodes)),
        st, state.v, state.C, state.m)
    active = gm > 0
    vg = gmv * jnp.where(active, 1.0 / jnp.maximum(gm, 1e-30), 0.0)[:, None]
    node_pos = transfer.node_positions(res, dx, state.x.dtype)
    proj, v_bc, constrained = collision.grid_boundary_conditions(
        node_pos, 0.0, scene["colliders"], grid_v=vg, boundary_margin=2,
        res=res, dx=dx)
    v0 = collision.apply_bc_to_velocity(vg, proj, v_bc)
    obj, _ = phase("objective", jax.jit(
        lambda st_, F, V0, mu, lam, gm_, v0_, proj_: obj_mod.make_objective(
            model, st_, F, V0, mu, lam, gm_, v0_, proj_, dt, dx)),
        st, state.F, state.V0, state.mu, state.lam, gm, v0, proj)

    # linearize: residual + SPD-projected Hessian ctx (per-Newton cost)
    (r_hess), lin_ms = phase("linearize", jax.jit(
        lambda o, v: obj_mod.linearize(model, o, v, fused=(jax.default_backend() == "tpu"),
                                       gather_st=transfer.make_binned_gather(
                                           bins, res))), obj, v0)
    r, hess = r_hess
    ctx = hess.ctx
    del hess        # F_new etc. not needed; ctx rides separately
    b = obj_mod.project(obj, -r)
    b_norm = float(jnp.linalg.norm(b))
    print(f"[system] |b|={b_norm:.3e} active={int(jnp.sum(active))}",
          file=sys.stderr, flush=True)

    interp = jax.default_backend() != "tpu"
    out = {"res": args.res, "tol": args.tol, "lin_ms": round(lin_ms, 1),
           "n_particles": int(state.n), "backend": jax.default_backend()}

    # ---- preconditioner variants ---------------------------------------
    # every jit takes its operands as ARGUMENTS: a closure over the big
    # arrays bakes them into the HLO as constants, and the 128^3 program
    # exceeds the compile service's request buffer (HTTP 413)
    def pcg(precond, opers, label):
        """Chunked PCG: `chunk` iterations per execution. precond(op, rr);
        opers = (obj, params, bins, precond-operands pytree)."""
        def k_iters(carry, op):
            obj_, params_, bins_, _pop = op

            def body(c, _):
                x, rr, z, p, rz = c
                Ap = obj_mod.project(obj_, obj_mod.multiply_cl(
                    obj_, params_, p, bins_, res, interpret=interp))
                alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
                x = x + alpha * p
                rr = rr - alpha * Ap
                z = precond(op, rr)
                rz_new = jnp.vdot(rr, z)
                beta = rz_new / jnp.maximum(rz, 1e-30)
                p = z + beta * p
                return (x, rr, z, p, rz_new), None
            return jax.lax.scan(body, carry, None, length=args.chunk)[0]

        k_jit = jax.jit(k_iters)
        z0 = jax.jit(precond)(opers, b)
        print(f"[{label}] |z0|={float(jnp.linalg.norm(z0)):.3e} "
              f"finite={bool(jnp.all(jnp.isfinite(z0)))}",
              file=sys.stderr, flush=True)
        carry = (jnp.zeros_like(b), b, z0, z0, jnp.vdot(b, z0))
        # compile + warm the chunk on a throwaway carry: the first timed
        # executions after compile run 10-100x slow (background re-opt),
        # so season with several data-dependent throwaway chunks
        warm = carry
        for _ in range(args.warm_chunks):
            warm = k_jit(warm, opers)
        jax.block_until_ready(warm[1])
        iters = 0
        chunk_ms = []
        t0 = time.perf_counter()
        while iters < args.max_cg:
            tc = time.perf_counter()
            carry = k_jit(carry, opers)
            rnorm = float(jnp.linalg.norm(carry[1]))   # sync point
            chunk_ms.append((time.perf_counter() - tc) * 1e3)
            iters += args.chunk
            print(f"[{label}] cg={iters} |r|/|b|={rnorm / b_norm:.3e} "
                  f"chunk={chunk_ms[-1]:.0f}ms",
                  file=sys.stderr, flush=True)
            if rnorm <= args.tol * b_norm:
                break
        wall = time.perf_counter() - t0
        return dict(iters=iters, per_ms=wall / iters * 1e3,
                    per_ms_best=min(chunk_ms) / args.chunk,
                    rel=float(jnp.linalg.norm(carry[1]) / b_norm))

    # MG FIRST (the hierarchy is the big resident; jacobi's Dinv is small
    # and runs after the hierarchy is freed). At >=128^3 the finest level
    # stays MATRIX-FREE (assembled_from_level=1, composed exact Galerkin
    # for level 1): the level-0 explicit BSR alone is ~8.7 GB.
    from_level = args.from_level
    if from_level is None:
        from_level = 1 if args.res >= 128 else 0
    mgc = MultigridConfig(levels=args.levels, smoother="chebyshev",
                          coarse_solver="direct", assembled=True,
                          coarsening="galerkin",
                          assembled_from_level=from_level)
    sol = dataclasses.replace(cfg.solver, preconditioner="multigrid",
                              multigrid=mgc)
    cfg_mg = dataclasses.replace(cfg, solver=sol)
    plan_mg = capacity.plan_capacities(cfg_mg, state.x)
    mgc = dataclasses.replace(mgc, coarse_capacity=plan_mg.mg_coarse_cap)
    mg_static, static_ms = phase("mg-static", jax.jit(
        lambda x, m, c: mg_mod.build_static(
            x, m, res, dx, mgc.levels, c, state.x.dtype,
            bin_caps=plan_mg.bin_caps, mg_tile_caps=plan_mg.mg_tile_caps,
            mg_bin_caps=plan_mg.mg_bin_caps,
            assembled_from=mgc.assembled_from_level,
            mg_composed_caps=plan_mg.mg_composed_caps,
            mg_ncomposed_caps=plan_mg.mg_ncomposed_caps)),
        state.x, state.m, constrained)
    # PHASED build: each piece (one level's assembly/RAP, smoother data,
    # coarse factor) its own execution — the fused program's overlapped
    # buffer lifetimes need 12.6 GB of temps at 128^3 (largest single
    # piece: 3.0 GB, probe_mg_build_mem) and runtime-OOM on top of this
    # harness's solve residents; phased, the peak is max(piece)+residents
    _top_arrays()

    class PieceExe:
        """Phased executor that REUSES each piece's compiled executable
        across builds (piece order is deterministic): the i-th run() of
        every build hits the same jitted function, so a rebuild measures
        seasoned-executable steady cost instead of fresh-jit retrace +
        the re-opt window (a fresh-lambda rebuild measured SLOWER than
        the cold build: 109 s vs 35 s)."""

        def __init__(self, verbose=False):
            self.fns = []
            self.i = 0
            self.verbose = verbose

        def reset(self):
            self.i = 0

        def __call__(self, f, *a):
            if self.i >= len(self.fns):
                self.fns.append(jax.jit(f))
            out = self.fns[self.i](*a)
            self.i += 1
            if self.verbose:
                jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
                print(f"  [piece] done {_mem()}", file=sys.stderr,
                      flush=True)
            return out

    pexe = PieceExe(verbose=True)
    pre, build_ms = phase("mg-build",
                          lambda mg_, F, c, V0: mg_mod.build_precond(
                              mg_, F, c, V0, dt, mgc, dim, exe=pexe),
                          mg_static, state.F, ctx, state.V0)
    # WARM rebuilds on the SAME executables: a couple of seasoning passes
    # then the timed one (steady per-Newton build cost)
    pexe.verbose = False
    for k in range(3):
        pexe.reset()
        pre, build_warm_ms = phase(
            f"mg-build-warm{k}",
            lambda mg_, F, c, V0: mg_mod.build_precond(
                mg_, F, c, V0, dt, mgc, dim, exe=pexe),
            mg_static, state.F * (1.0 + 1e-7 * (k + 1)), ctx, state.V0)
    # CL apply params built only now — ~1 GB that must not sit in HBM
    # under the composed level-1 assembly peak
    params, _ = phase("cl-params", jax.jit(
        lambda o, c: obj_mod.hessian_params_cl(o, c)), obj, ctx)

    def mg_pre(op, rr):
        obj_, _, _, (mg_, pre_, F, V0) = op
        return obj_mod.project(obj_, mg_mod.mg_precondition(
            mg_, pre_, F, V0, dt, mgc, rr))

    r_mg = pcg(
        mg_pre, (obj, params, bins, (mg_static, pre, state.F, state.V0)),
        "mg")
    it, per_ms = r_mg["iters"], r_mg["per_ms_best"]
    out["mg"] = dict(cg=it, per_iter_ms=round(per_ms, 2),
                     per_iter_ms_wall=round(r_mg["per_ms"], 2),
                     build_ms=round(build_warm_ms, 1),
                     build_cold_ms=round(build_ms, 1),
                     static_ms=round(static_ms, 1), rel=r_mg["rel"],
                     newton_ms=round(build_warm_ms + lin_ms + it * per_ms,
                                     1))
    print(json.dumps(out), flush=True)
    del mg_static, pre      # free the hierarchy before jacobi

    # block-Jacobi
    Dinv, bj_build_ms = phase("bj-build", jax.jit(
        lambda st_, F, c, V0, gm_, act: obj_mod.sym_block_inv(
            obj_mod.elastic_block_diag(st_, F, c, V0, dt, gm_, act, dim))),
        st, state.F, ctx, state.V0, gm, active)

    def bj_pre(op, rr):
        obj_, _, _, Dinv_ = op
        return obj_mod.project(obj_, jnp.einsum("nij,nj->ni", Dinv_, rr))

    r_bj = pcg(bj_pre, (obj, params, bins, Dinv), "jacobi")
    it, per_ms = r_bj["iters"], r_bj["per_ms_best"]
    out["jacobi"] = dict(cg=it, per_iter_ms=round(per_ms, 2),
                         per_iter_ms_wall=round(r_bj["per_ms"], 2),
                         build_ms=round(bj_build_ms, 1), rel=r_bj["rel"],
                         newton_ms=round(bj_build_ms + lin_ms + it * per_ms, 1))
    out["total_s"] = round(time.perf_counter() - t_all, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
