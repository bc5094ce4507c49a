"""Isolate the MG-on-TPU runtime fault stage by stage.

Round-1/2 observed: the jitted MG-PCG step at 64^3 either faults the
device (UNAVAILABLE) or runs absurdly slowly, while the jacobi step and
every CPU run are fine. This script builds the SAME hierarchy outside the
Newton loop and executes each piece separately (own jit, readback fence,
wall time printed), so the offending stage names itself.

Usage: python scripts/isolate_mg_tpu.py [--res 64] [--levels 4]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from hot_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hot_tpu.models import constitutive as cm
from hot_tpu.ops import transfer
from hot_tpu.scenes import build_scene
from hot_tpu.sim import collision
from hot_tpu.solver import multigrid as mg_mod
from hot_tpu.utils.config import MultigridConfig


def stage(name):
    print(f"[stage] {name} ...", flush=True)
    return time.perf_counter()


def done(t0, extra=""):
    print(f"[stage]   ok in {time.perf_counter() - t0:.2f}s {extra}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--ppc", type=int, default=8)
    ap.add_argument("--assembled", action="store_true")
    args = ap.parse_args()

    scene = build_scene("twisting_bar_3d", res=args.res, ppc=args.ppc)
    cfg, state, model = scene["cfg"], scene["state"], scene["model"]
    dim = cfg.dim
    res = cfg.grid_res[:dim]
    dx = cfg.dx
    dt = jnp.asarray(2e-3, state.x.dtype)
    n_nodes = transfer.n_nodes_of(res)
    mgc = MultigridConfig(levels=args.levels, smoother="chebyshev",
                          coarse_solver="smoother", assembled=args.assembled)

    # host-side caps (mirror Simulation's choosers)
    import numpy as np

    x_np = np.asarray(state.x)
    caps = []
    r_np = np.asarray(res, np.int64)
    d_np = dx
    for _ in range(args.levels):
        base = np.clip(np.floor(x_np / d_np - 0.5).astype(np.int64), 0, r_np - 1)
        strides = np.concatenate([np.cumprod(r_np[::-1])[::-1][1:], [1]])
        cells = (base * strides).sum(axis=1)
        uniq, counts = np.unique(cells, return_counts=True)
        caps.append((int(1.15 * len(uniq) + 16), int(counts.max() + 1)))
        r_np = (r_np + 1) // 2
        d_np *= 2.0
    print(f"[info] per-level bin caps: {caps}", flush=True)

    tile_caps = None
    if args.assembled:
        tile_caps = []
        r_np = np.asarray(res, np.int64)
        d_np = dx
        for _ in range(args.levels):
            tile_res = -(-r_np // 4)
            strides = np.concatenate([np.cumprod(tile_res[::-1])[::-1][1:], [1]])
            base = np.clip(np.floor(x_np / d_np - 0.5).astype(np.int64), 0, r_np - 1)
            tids = []
            for mask in range(2 ** dim):
                sel = np.array([(mask >> a) & 1 for a in range(dim)])
                corner = np.clip(base + 2 * sel[None, :], 0, r_np - 1)
                tids.append(((corner // 4) * strides).sum(axis=1))
            count = len(np.unique(np.concatenate(tids)))
            tile_caps.append(int(1.2 * count + 8))
            r_np = (r_np + 1) // 2
            d_np *= 2.0
        tile_caps = tuple(tile_caps)
        print(f"[info] per-level tile caps: {tile_caps}", flush=True)

    t0 = stage("P2G + objective inputs (jit)")
    with jax.default_matmul_precision("highest"):
        st = jax.jit(lambda x: transfer.particle_stencil(x, dx, res))(state.x)
        gm, gmv = jax.jit(
            lambda st_, v, C, m: transfer.p2g_mass_momentum(st_, v, C, m, n_nodes)
        )(st, state.v, state.C, state.m)
        active = gm > 0
        vg = gmv * jnp.where(active, 1.0 / jnp.maximum(gm, 1e-30), 0.0)[:, None]
        node_pos = transfer.node_positions(res, dx, state.x.dtype)
        _, _, constrained = collision.grid_boundary_conditions(
            node_pos, 0.0, scene["colliders"], grid_v=vg, boundary_margin=2,
            res=res, dx=dx,
        )
        jax.block_until_ready(vg)
    done(t0)

    t0 = stage(f"build_static levels={args.levels} (jit)")
    build = jax.jit(lambda x, m, cons: mg_mod.build_static(
        x, m, res, dx, args.levels, cons, state.x.dtype,
        bin_caps=caps[0], mg_bin_caps=tuple(caps),
        mg_tile_caps=tile_caps,
    ))
    mg = build(state.x, state.m, constrained)
    jax.block_until_ready(mg.levels[-1].grid_m)
    done(t0, f"overflow={bool(mg.overflow) if mg.overflow is not None else None}")

    t0 = stage("hessian ctx (jit)")
    with jax.default_matmul_precision("highest"):
        ctx = jax.jit(jax.vmap(
            lambda f, m_, l_: cm.hessian_context(model, f, m_, l_)
        ))(state.F, state.mu, state.lam)
        jax.block_until_ready(ctx.A)
    done(t0)

    for l in range(args.levels):
        t0 = stage(f"level_multiply level {l} (jit)")
        with jax.default_matmul_precision("highest"):
            f = jax.jit(lambda w, lv=mg.levels[l]: mg_mod.level_multiply(
                lv, state.F, ctx, state.V0, dt, w))
            w = jnp.ones((mg.levels[l].grid_m.shape[0], dim), state.x.dtype)
            y = f(w)
            jax.block_until_ready(y)
            t1 = time.perf_counter()
            y = f(y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))
            jax.block_until_ready(y)
        done(t0, f"(second call {time.perf_counter() - t1:.3f}s)")

    if args.assembled:
        from hot_tpu.ops import bsr as bsr_mod
        from hot_tpu.ops import bsr_tiled

        for l in range(args.levels):
            t0 = stage(f"assemble level {l} (modes) + spmv_tiled (jit)")
            with jax.default_matmul_precision("highest"):
                lv = mg.levels[l]

                def asm_mul(F, V0, w, lv=lv):
                    mat = bsr_mod.assemble_hessian_modes(
                        lv.mat_sym, lv.bins, lv.stencil, F, ctx, V0, dt,
                        lv.grid_m)
                    return bsr_tiled.spmv_tiled(mat, lv.tgrid, lv.nbr, w)

                f = jax.jit(asm_mul)
                w = jnp.ones((lv.mat_sym.n_rows, dim), state.x.dtype)
                y = f(state.F, state.V0, w)
                jax.block_until_ready(y)
                t1 = time.perf_counter()
                y = f(state.F, state.V0,
                      y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))
                jax.block_until_ready(y)
            done(t0, f"(second call {time.perf_counter() - t1:.3f}s)")

    t0 = stage("build_precond (jit) — block diags + power iters, no direct")
    with jax.default_matmul_precision("highest"):
        bp = jax.jit(lambda F, V0: mg_mod.build_precond(
            mg, F, ctx, V0, dt, mgc, dim))
        pre = bp(state.F, state.V0)
        jax.block_until_ready(pre.diag_inv[0])
    done(t0, f"lmax={[float(x) for x in pre.lmax]}")

    t0 = stage("v_cycle coarse=smoother (jit)")
    with jax.default_matmul_precision("highest"):
        vc = jax.jit(lambda b: mg_mod.v_cycle(
            mg, pre, state.F, ctx, state.V0, dt, mgc, b))
        b = jnp.where(mg.levels[0].free[:, None], 1.0, 0.0
                      ).astype(state.x.dtype) * jnp.ones((1, dim), state.x.dtype)
        z = vc(b)
        jax.block_until_ready(z)
        t1 = time.perf_counter()
        z2 = vc(z / jnp.maximum(jnp.max(jnp.abs(z)), 1e-30))
        jax.block_until_ready(z2)
    done(t0, f"(second call {time.perf_counter() - t1:.3f}s)")

    t0 = stage("coarse dense factor (cho_factor) (jit)")
    import dataclasses

    n_act = int(jnp.sum(mg.levels[-1].active))
    ccap = int(1.3 * n_act + 16)
    mgc_d = dataclasses.replace(mgc, coarse_solver="direct",
                                coarse_capacity=ccap)
    with jax.default_matmul_precision("highest"):
        bp_d = jax.jit(lambda F, V0: mg_mod.build_precond(
            mg, F, ctx, V0, dt, mgc_d, dim))
        pre_d = bp_d(state.F, state.V0)
        jax.block_until_ready(pre_d.coarse_chol[0][0])
    done(t0, f"coarse rows={ccap} active={n_act}")

    t0 = stage("v_cycle coarse=direct (jit)")
    with jax.default_matmul_precision("highest"):
        vc_d = jax.jit(lambda b: mg_mod.v_cycle(
            mg, pre_d, state.F, ctx, state.V0, dt, mgc_d, b))
        z = vc_d(b)
        jax.block_until_ready(z)
    done(t0)

    t0 = stage("20 chained v_cycles (timing)")
    with jax.default_matmul_precision("highest"):
        zz = b
        for _ in range(20):
            zz = vc_d(zz / jnp.maximum(jnp.max(jnp.abs(zz)), 1e-30))
        jax.block_until_ready(zz)
    done(t0)

    t0 = stage("newton_solve with MG precond (jit, the step's solver core)")
    from hot_tpu.sim import objective as obj_mod
    from hot_tpu.solver.newton import newton_solve

    def solve_once(x, m, v, C, F, V0, mu, lam, t):
        with jax.default_matmul_precision("highest"):
            st_ = transfer.particle_stencil(x, dx, res)
            # the step's binned transfer machinery (bisect: the standalone
            # solver with plain scatters runs; the full step faults)
            bins_ = transfer.bin_particles(x, dx, res, caps[0][0], caps[0][1])
            sct = transfer.make_binned_scatter(bins_, res)
            gth = transfer.make_binned_gather(bins_, res)
            gm_, gmv_ = transfer.p2g_mass_momentum(st_, v, C, m, n_nodes)
            act = gm_ > 0
            vg_ = gmv_ * jnp.where(act, 1.0 / jnp.maximum(gm_, 1e-30), 0.0)[:, None]
            npos = transfer.node_positions(res, dx, x.dtype)
            proj, v_bc, cons = collision.grid_boundary_conditions(
                npos, t, scene["colliders"], grid_v=vg_, boundary_margin=2,
                res=res, dx=dx)
            v0_ = collision.apply_bc_to_velocity(vg_, proj, v_bc)
            obj = obj_mod.make_objective(model, st_, F, V0, mu, lam, gm_,
                                         v0_, proj, dt, dx, scatter=sct)
            mgh = mg_mod.build_static(
                x, m, res, dx, args.levels, cons, x.dtype,
                bin_caps=caps[0], mg_bin_caps=tuple(caps),
                mg_tile_caps=tile_caps)
            import dataclasses as _dc

            mgcfg = _dc.replace(mgc, coarse_solver="direct",
                                coarse_capacity=ccap)
            lin = lambda vv: obj_mod.linearize(model, obj, vv,
                                               scatter=sct, gather_st=gth)
            result = newton_solve(
                multiply=lambda hp, w: obj_mod.multiply(obj, hp, w,
                                                        scatter=sct,
                                                        gather_st=gth),
                project=lambda r: obj_mod.project(obj, r),
                precondition=lambda ps, r: mg_mod.mg_precondition(
                    mgh, ps, F, V0, dt, mgcfg, r),
                build_preconditioner=lambda hp: mg_mod.build_precond(
                    mgh, F, hp.ctx, V0, dt, mgcfg, dim),
                cn_norm=lambda r: obj_mod.cn_norm(obj, r),
                v0=v0_, max_newton=10, cn_eps=1e-2, cg_tol=1e-3,
                max_cg=200, linearize=lin,
            )
            return result.v, result.iters, result.cg_iters

    f = jax.jit(solve_once)
    vout, it, cg = f(state.x, state.m, state.v, state.C, state.F,
                     state.V0, state.mu, state.lam, jnp.float32(0.0))
    jax.block_until_ready(vout)
    t1 = time.perf_counter()
    vout, it, cg = f(state.x, state.m, state.v * 1.0001, state.C, state.F,
                     state.V0, state.mu, state.lam, jnp.float32(0.0))
    jax.block_until_ready(vout)
    done(t0, f"newton={int(it)} cg={int(cg)} (second call "
             f"{time.perf_counter() - t1:.3f}s)")
    print("[all stages passed]", flush=True)


if __name__ == "__main__":
    main()
