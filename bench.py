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
    s, stats = step(state, dt, jnp.asarray(0.0, dtype))  # compile + warm
    jax.block_until_ready(s.x)
    n_steps = 10
    t0 = time.perf_counter()
    t_sim = 0.0
    cur = s
    for i in range(n_steps):
        cur, stats = step(cur, dt, jnp.asarray(i * 5e-4, dtype))
    jax.block_until_ready(cur.x)
    t_sim = time.perf_counter() - t0
    steps_per_sec = n_steps / t_sim

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
    hess = jax.jit(
        lambda v: obj_mod.build_hessian(model, obj, v)
    )(v_grid)
    jax.block_until_ready(hess.F_new)

    apply_fn = jax.jit(lambda w: obj_mod.multiply(obj, hess, w))
    w = v_grid
    w = apply_fn(w)  # compile
    jax.block_until_ready(w)
    n_apply = 50
    t0 = time.perf_counter()
    for _ in range(n_apply):
        w = apply_fn(w)
    jax.block_until_ready(w)
    t_apply = (time.perf_counter() - t0) / n_apply

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

    print(
        json.dumps(
            {
                "metric": "hessian_apply_gbps",
                "value": round(gbps, 2),
                "unit": "GB/s effective (matrix-free Hessian apply, 3D twisting bar 64^3)",
                "vs_baseline": round(gbps / sol, 4),
                "extra": {
                    "device": jax.devices()[0].device_kind,
                    "backend": jax.default_backend(),
                    "particles": int(n),
                    "n_nodes": int(n_nodes),
                    "steps_per_sec": round(steps_per_sec, 3),
                    "apply_ms": round(t_apply * 1e3, 3),
                    "hbm_sol_gbps": sol,
                    "last_newton": int(stats.newton_iters),
                    "last_cg": int(stats.cg_iters),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
