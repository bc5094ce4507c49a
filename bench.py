"""Benchmark entry point — prints ONE JSON line for the driver.

Primary metric (round 1): effective HBM bandwidth of the matrix-free
Hessian apply — the operator inside every CG iteration, the hot loop of
the whole solver (SURVEY.md §3.3 marks it the #1 hot spot). vs_baseline is
the fraction of the chip's speed-of-light HBM bandwidth (BASELINE.md's
per-chip target: SpMV/Hessian-apply at SOL). Extra fields carry sim
steps/sec and solver iteration counts for the record.

Once the explicit BSR SpMV lands this switches to true nnz/s (same SOL
normalization), keeping vs_baseline comparable across rounds.
"""

import json
import time

import jax
import jax.numpy as jnp

from hot_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


# per-chip HBM speed-of-light, GB/s (TPU v5e ~819; v5p ~2765)
HBM_SOL_GBPS = {"TPU v5 lite": 819.0, "TPU v5": 2765.0, "TPU v5p": 2765.0}


def hbm_sol() -> float:
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = ""
    for k, v in HBM_SOL_GBPS.items():
        if kind.startswith(k):
            return v
    return 819.0  # conservative default


import os
import sys

VERBOSE = os.environ.get("BENCH_VERBOSE") == "1"


def _mark(msg):
    if VERBOSE:
        print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    from hot_tpu.scenes import build_scene
    from hot_tpu.sim import objective as obj_mod
    from hot_tpu.sim import collision
    from hot_tpu.ops import transfer
    from hot_tpu.sim.simulation import advance_one_step
    import functools

    res = 64
    scene = build_scene("twisting_bar_3d", res=res, ppc=8)
    cfg, state, model = scene["cfg"], scene["state"], scene["model"]
    colliders = scene["colliders"]
    n = state.n
    dim = cfg.dim
    dtype = state.x.dtype
    dt = jnp.asarray(5e-4, dtype)

    # ---- sim steps/sec ----------------------------------------------------
    step = jax.jit(
        functools.partial(
            advance_one_step, cfg=cfg, model=model, colliders=colliders,
            plasticity=scene["plasticity"],
        )
    )
    _mark("compiling step")
    s, stats = step(state, dt, jnp.asarray(0.0, dtype))  # compile + warm
    jax.block_until_ready(s.x)
    # twist the bar for a while so the implicit solver is actually engaged
    _mark("step compiled; twisting bar to a stressed state")
    warm_dt = jnp.asarray(2e-3, dtype)
    cur = s
    t_now = 0.0
    for i in range(40):
        cur, stats = step(cur, warm_dt, jnp.asarray(t_now, dtype))
        t_now += 2e-3
    jax.block_until_ready(cur.x)
    _mark(f"stressed: newton={int(stats.newton_iters)} cg={int(stats.cg_iters)}; timing steps")
    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        cur, stats = step(cur, warm_dt, jnp.asarray(t_now, dtype))
        t_now += 2e-3
    jax.block_until_ready(cur.x)
    t_sim = time.perf_counter() - t0
    steps_per_sec = n_steps / t_sim
    _mark(f"steps timed: {steps_per_sec:.3f}/s; building hessian system")

    # ---- Hessian apply bandwidth -----------------------------------------
    grid_res = cfg.grid_res[:dim]
    n_nodes = transfer.n_nodes_of(grid_res)
    st = transfer.particle_stencil(cur.x, cfg.dx, grid_res)
    grid_m, grid_mv = transfer.p2g_mass_momentum(st, cur.v, cur.C, cur.m, n_nodes)
    active = grid_m > 0
    v_grid = grid_mv * jnp.where(active, 1.0 / jnp.maximum(grid_m, 1e-30), 0.0)[:, None]
    node_pos = transfer.node_positions(grid_res, cfg.dx, dtype)
    proj, v_bc, _ = collision.grid_boundary_conditions(
        node_pos, 0.0, colliders, grid_v=v_grid, boundary_margin=2,
        res=grid_res, dx=cfg.dx,
    )
    obj = obj_mod.make_objective(
        model, st, cur.F, cur.V0, cur.mu, cur.lam, grid_m, v_grid, proj, dt, cfg.dx
    )
    # NOTE: obj/hess are passed as ARGUMENTS — closing over multi-MB arrays
    # embeds them as HLO constants and stalls the TPU compiler for minutes.
    _mark("jit build_hessian")
    hess = jax.jit(
        lambda o, v: obj_mod.build_hessian(model, o, v)
    )(obj, v_grid)
    jax.block_until_ready(hess.F_new)
    _mark("hessian built; compiling apply")

    apply_fn = jax.jit(lambda o, h, w: obj_mod.multiply(o, h, w))
    w = v_grid
    w = apply_fn(obj, hess, w)  # compile
    jax.block_until_ready(w)
    _mark("apply compiled; timing")
    n_apply = 50
    t0 = time.perf_counter()
    for _ in range(n_apply):
        w = apply_fn(obj, hess, w)
    jax.block_until_ready(w)
    t_apply = (time.perf_counter() - t0) / n_apply

    # ---- explicit BSR SpMV nnz/s (the BASELINE.json:2 primary metric) ----
    _mark("assembling BSR")
    from hot_tpu.ops import bsr as bsr_mod

    n_active = int(jnp.sum(active))
    cap = ((n_active + 1023) // 1024 + 1) * 1024
    mat = bsr_mod.structure(active, grid_res, cap)
    mat = jax.jit(
        lambda m_, st_, F_, cx_, V0_, gm_: bsr_mod.assemble_hessian(
            m_, st_, F_, cx_, V0_, dt, gm_
        )
    )(mat, st, cur.F, hess.ctx, cur.V0, grid_m)
    jax.block_until_ready(mat.vals)
    block_nnz = int(mat.block_nnz)
    _mark(f"BSR assembled: rows={n_active} block_nnz={block_nnz}; timing spmv")

    spmv_fn = jax.jit(bsr_mod.spmv)
    x_rows = bsr_mod.grid_vector_to_rows(mat, v_grid)
    y = spmv_fn(mat, x_rows)
    jax.block_until_ready(y)
    n_spmv = 100
    t0 = time.perf_counter()
    for _ in range(n_spmv):
        y = spmv_fn(mat, y)
    jax.block_until_ready(y)
    t_spmv = (time.perf_counter() - t0) / n_spmv
    nnz = block_nnz * dim * dim                     # scalar nonzeros
    nnz_per_s = nnz / t_spmv
    # SpMV traffic model (per scalar nnz): 4B value + (4B col + 12B x)/9
    # amortized per block + y write ~ rows*24B
    spmv_bytes = nnz * 4 + block_nnz * (4 + 12) + n_active * 24
    spmv_gbps = spmv_bytes / t_spmv / 1e9

    # analytic bytes per apply (fp32): see SURVEY.md §6 roofline protocol
    bpe = jnp.dtype(dtype).itemsize
    stencil_n = 3**dim
    bytes_per_particle = (
        stencil_n * dim * bpe        # gather v_i
        + stencil_n * bpe            # node ids (int32)
        + stencil_n * dim * bpe      # gwn
        + dim * dim * bpe            # F_n
        + (2 * dim * dim + dim * dim + 2 * dim) * bpe  # ctx: U,V,A,b+/-
        + bpe                        # V0
        + 2 * stencil_n * dim * bpe  # scatter read-modify-write
    )
    grid_bytes = n_nodes * (dim + dim + 1 + dim * dim) * bpe  # w, out, m, (proj unused here)
    total_bytes = n * bytes_per_particle + grid_bytes
    gbps = total_bytes / t_apply / 1e9
    sol = hbm_sol()

    sol_nnz_per_s = sol * 1e9 / (spmv_bytes / max(nnz, 1))
    print(
        json.dumps(
            {
                "metric": "bsr_spmv_nnz_per_s",
                "value": round(nnz_per_s, 0),
                "unit": "scalar nnz/s (BSR 3x3 SpMV, 3D twisting bar 64^3 Hessian)",
                "vs_baseline": round(nnz_per_s / sol_nnz_per_s, 4),
                "extra": {
                    "device": jax.devices()[0].device_kind,
                    "backend": jax.default_backend(),
                    "particles": int(n),
                    "n_nodes": int(n_nodes),
                    "bsr_rows": int(n_active),
                    "block_nnz": block_nnz,
                    "spmv_ms": round(t_spmv * 1e3, 4),
                    "spmv_gbps": round(spmv_gbps, 2),
                    "steps_per_sec": round(steps_per_sec, 3),
                    "matfree_apply_ms": round(t_apply * 1e3, 3),
                    "matfree_apply_gbps": round(gbps, 2),
                    "hbm_sol_gbps": sol,
                    "last_newton": int(stats.newton_iters),
                    "last_cg": int(stats.cg_iters),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
