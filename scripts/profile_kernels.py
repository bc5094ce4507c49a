"""Decompose the per-CG-iteration cost on the real device.

Times each piece of the hot path separately (twisting bar, configurable
res): window_gather, binned_scatter, the fused Pallas kernels, the full
matrix-free apply, the fused/XLA linearize, and the SpMV variants. This is
the measurement harness behind docs/KERNEL_PLAN.md — run it after any
kernel change (bench protocol: warm-up trials discarded, inputs varied).

Usage: python scripts/profile_kernels.py [res]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from hot_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hot_tpu.ops import bsr as bsr_mod
from hot_tpu.ops import transfer
from hot_tpu.ops.pallas_apply import fused_contrib
from hot_tpu.ops.pallas_linearize import fused_linearize
from hot_tpu.scenes import build_scene
from hot_tpu.sim import objective as obj_mod
from hot_tpu.sim.simulation import Simulation


def best(fn, state, trials=4, reps=8):
    out = fn(state)
    jax.block_until_ready(out)
    b = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = state
        for _ in range(reps):
            s = fn(s)
        jax.block_until_ready(s)
        b = min(b, (time.perf_counter() - t0) / reps)
    return b


def main():
    res_n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    scene = build_scene("twisting_bar_3d", res=res_n, ppc=8)
    cfg, model = scene["cfg"], scene["model"]
    sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
    for _ in range(3):
        sim.step(2e-3)
    state = sim.state
    dim = cfg.dim
    dt = jnp.asarray(2e-3, state.x.dtype)
    grid_res = cfg.grid_res[:dim]
    n_nodes = transfer.n_nodes_of(grid_res)
    n = state.n
    print(f"res={res_n} particles={n}")

    st = jax.jit(lambda x: transfer.particle_stencil(x, cfg.dx, grid_res))(state.x)
    caps = sim._plan.bin_caps or (max(1024, n // 4), 16)
    bins = jax.jit(
        lambda x: transfer.bin_particles(x, cfg.dx, grid_res, caps[0], caps[1])
    )(state.x)
    gm, gmv = jax.jit(
        lambda st, v, C, m: transfer.p2g_mass_momentum(st, v, C, m, n_nodes)
    )(st, state.v, state.C, state.m)
    active = gm > 0
    vg = gmv * jnp.where(active, 1.0 / jnp.maximum(gm, 1e-30), 0.0)[:, None]
    proj = jnp.broadcast_to(jnp.eye(dim, dtype=vg.dtype), (n_nodes, dim, dim))
    obj = jax.jit(
        lambda st, F, V0, mu, lam, gm, vg, proj: obj_mod.make_objective(
            model, st, F, V0, mu, lam, gm, vg, proj, dt, cfg.dx
        )
    )(st, state.F, state.V0, state.mu, state.lam, gm, vg, proj)
    gather_st = transfer.make_binned_gather(bins, grid_res)
    scatter = transfer.make_binned_scatter(bins, grid_res)
    hess = jax.jit(
        lambda o, v: obj_mod.build_hessian(model, o, v, gather_st=gather_st)
    )(obj, vg)
    jax.block_until_ready(hess.ctx.U)

    # ---- pieces ----------------------------------------------------------
    g_fn = jax.jit(lambda v: transfer.window_gather(bins, v, grid_res))
    t = best(lambda v: v * (1.0 + 1e-12 * g_fn(v)[0, 0, 0]), vg)
    print(f"window_gather            {t*1e3:8.3f} ms")

    vi0 = g_fn(vg)
    sc_fn = jax.jit(lambda c: transfer.binned_scatter(bins, c, grid_res))
    contrib0 = jnp.ones((n, 3**dim, dim), vg.dtype)
    # time scatter alone; data-dependent carry defeats result caching and
    # forces each rep to complete before the next
    t = best(lambda c: c * (1.0 + 1e-12 * sc_fn(c)[0, 0]), contrib0)
    print(f"binned_scatter           {t*1e3:8.3f} ms")

    k_fn = jax.jit(
        lambda vi: fused_contrib(
            vi, st.gwn, obj.F_n, hess.ctx.U, hess.ctx.V, hess.ctx.A,
            hess.ctx.b_plus, hess.ctx.b_minus, obj.V0, dt,
        )
    )
    t = best(lambda vi: k_fn(vi), vi0)
    print(f"pallas fused_contrib     {t*1e3:8.3f} ms")

    lin_fn = jax.jit(
        lambda vi: fused_linearize(
            vi, st.gwn, obj.F_n, obj.mu, obj.lam, obj.V0, dt,
            model_name=model.name,
        )[0]
    )
    t = best(lambda vi: lin_fn(vi), vi0)
    print(f"pallas fused_linearize   {t*1e3:8.3f} ms")

    ap_x = jax.jit(
        lambda w: obj_mod.multiply(obj, hess, w, scatter=scatter,
                                   gather_st=gather_st, fused=False)
    )
    t = best(lambda w: ap_x(w), vg)
    print(f"apply (XLA chain)        {t*1e3:8.3f} ms")

    ap_f = jax.jit(
        lambda w: obj_mod.multiply(obj, hess, w, scatter=scatter,
                                   gather_st=gather_st, fused=True)
    )
    t = best(lambda w: ap_f(w), vg)
    print(f"apply (fused kernel)     {t*1e3:8.3f} ms")

    ln_x = jax.jit(
        lambda v: obj_mod.linearize(model, obj, v, scatter=scatter,
                                    gather_st=gather_st, fused=False)[0]
    )
    t = best(lambda v: ln_x(v), vg)
    print(f"linearize (XLA chain)    {t*1e3:8.3f} ms")

    ln_f = jax.jit(
        lambda v: obj_mod.linearize(model, obj, v, scatter=scatter,
                                    gather_st=gather_st, fused=True)[0]
    )
    t = best(lambda v: ln_f(v), vg)
    print(f"linearize (fused kernel) {t*1e3:8.3f} ms")

    # ---- SpMV variants ----------------------------------------------------
    n_active = int(jnp.sum(active))
    cap_rows = ((n_active + 1023) // 1024 + 1) * 1024
    mat = bsr_mod.structure(active, grid_res, cap_rows)
    mat = jax.jit(
        lambda m_, st_, F_, cx_, V0_, gm_: bsr_mod.assemble_hessian(
            m_, st_, F_, cx_, V0_, dt, gm_
        )
    )(mat, st, state.F, hess.ctx, state.V0, gm)
    jax.block_until_ready(mat.vals)
    block_nnz = int(mat.block_nnz)
    nnz = block_nnz * dim * dim
    x_rows = bsr_mod.grid_vector_to_rows(mat, vg)

    f1 = jax.jit(lambda x: bsr_mod.spmv(mat, x))
    t1 = best(lambda x: f1(x), x_rows)
    print(f"spmv gather              {t1*1e3:8.3f} ms  ({nnz/t1/1e9:.2f}e9 nnz/s)")

    f2 = jax.jit(lambda v: bsr_mod.spmv_windowed(mat, v))
    t2 = best(lambda v: (lambda y: bsr_mod.rows_to_grid_vector(mat, y, n_nodes))(f2(v)), vg)
    print(f"spmv windowed+barrier    {t2*1e3:8.3f} ms  ({nnz/t2/1e9:.2f}e9 nnz/s)")

    print(f"rows={n_active} block_nnz={block_nnz}")


if __name__ == "__main__":
    main()
