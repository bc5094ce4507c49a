"""Benchmark entry point — prints ONE JSON line for the driver.

Primary metric: effective scalar nnz/s of the BSR(3x3) SpMV on the
twisting-bar Hessian (BASELINE.json:2's first metric), normalized against
the chip's HBM speed-of-light in vs_baseline. Extra fields carry the
matrix-free Hessian-apply time, sim steps/sec, and solver iteration
counts.

Measurement protocol for this device (see docs/KERNEL_PLAN.md):
  * the first timed loop after compilation runs ~100x slow (background
    re-optimization) — run multiple trials, report the best;
  * identical (program, inputs) executions are result-cached by the
    backend — inputs are varied between repetitions;
  * compilation can take minutes; the persistent cache makes reruns fast.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from hot_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

VERBOSE = os.environ.get("BENCH_VERBOSE") == "1"

# per-chip HBM speed-of-light, GB/s (TPU v5e ~819; v5p ~2765)
HBM_SOL_GBPS = {"TPU v5 lite": 819.0, "TPU v5": 2765.0, "TPU v5p": 2765.0}


def _mark(msg):
    if VERBOSE:
        print(f"[bench] {msg}", file=sys.stderr, flush=True)


def hbm_sol() -> float:
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = ""
    for k, v in HBM_SOL_GBPS.items():
        if kind.startswith(k):
            return v
    return 819.0


_ROUNDTRIP = None


def roundtrip_s() -> float:
    """Fixed host->device->host latency of this connection (measured ~4-20 ms
    through the axon tunnel). Subtracted from chained timings."""
    global _ROUNDTRIP
    if _ROUNDTRIP is None:
        f = jax.jit(lambda x: jnp.sum(x))
        x = jnp.ones((8,), jnp.float32)
        float(f(x))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(x * 1.0))
            best = min(best, time.perf_counter() - t0)
        _ROUNDTRIP = best
    return _ROUNDTRIP


def best_trial(fn, warm, n_trials=3, reps=10):
    """Sync-proof timing: chain `reps` data-DEPENDENT executions (the device
    must run them serially), force completion with a scalar readback, then
    subtract the measured round trip. block_until_ready alone is NOT a
    reliable fence through the axon tunnel (measured: returns early), and
    identical (program, input) executions are result-cached — the dependent
    chain defeats both."""
    rt = roundtrip_s()
    state = fn(warm)
    float(jnp.sum(jax.tree_util.tree_leaves(state)[0]))   # settle/warm
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
    import functools

    from hot_tpu.ops import bsr as bsr_mod
    from hot_tpu.ops import transfer
    from hot_tpu.scenes import build_scene
    from hot_tpu.sim import collision
    from hot_tpu.sim import objective as obj_mod
    from hot_tpu.sim.simulation import Simulation

    res_n = 64
    scene = build_scene("twisting_bar_3d", res=res_n, ppc=8)
    cfg, model = scene["cfg"], scene["model"]
    sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
    n = sim.state.n
    dim = cfg.dim
    dtype = sim.state.x.dtype
    dt = 2e-3

    # ---- steps/sec (implicit solver engaged by the twisting clamps) ------
    _mark("compiling + warming step")
    for _ in range(12):
        stats = sim.step(dt)
    _mark(f"warm: newton={int(stats.newton_iters)} cg={int(stats.cg_iters)}")
    t_best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(5):
            stats = sim.step(dt)
        t_best = min(t_best, (time.perf_counter() - t0) / 5)
    steps_per_sec = 1.0 / t_best
    _mark(f"steps/s best {steps_per_sec:.3f}")

    # ---- system at current state -----------------------------------------
    state = sim.state
    grid_res = cfg.grid_res[:dim]
    n_nodes = transfer.n_nodes_of(grid_res)
    dtj = jnp.asarray(dt, dtype)
    st = jax.jit(lambda x: transfer.particle_stencil(x, cfg.dx, grid_res))(state.x)
    caps = sim._choose_bin_caps() or (max(1024, n // 4), 16)
    bins = jax.jit(
        lambda x: transfer.bin_particles(x, cfg.dx, grid_res, caps[0], caps[1])
    )(state.x)
    gm, gmv = jax.jit(
        lambda st, v, C, m: transfer.p2g_mass_momentum(st, v, C, m, n_nodes)
    )(st, state.v, state.C, state.m)
    active = gm > 0
    vg = gmv * jnp.where(active, 1.0 / jnp.maximum(gm, 1e-30), 0.0)[:, None]
    proj = jnp.broadcast_to(jnp.eye(dim, dtype=dtype), (n_nodes, dim, dim))
    obj = jax.jit(
        lambda st, F, V0, mu, lam, gm, vg, proj: obj_mod.make_objective(
            model, st, F, V0, mu, lam, gm, vg, proj, dtj, cfg.dx
        )
    )(st, state.F, state.V0, state.mu, state.lam, gm, vg, proj)
    hess = jax.jit(
        lambda o, v, b: obj_mod.build_hessian(
            model, o, v, gather_st=transfer.make_binned_gather(b, grid_res)
        )
    )(obj, vg, bins)
    jax.block_until_ready(hess.F_new)

    # ---- matrix-free Hessian apply ---------------------------------------
    _mark("timing matrix-free apply")

    def _renorm(y):
        # keep chained timing iterates finite (normalization inside the jit)
        return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

    apply_fn = jax.jit(
        lambda o, h, w, b: _renorm(obj_mod.multiply(
            o, h, w,
            scatter=transfer.make_binned_scatter(b, grid_res),
            gather_st=transfer.make_binned_gather(b, grid_res),
        ))
    )
    w = apply_fn(obj, hess, vg, bins)
    t_apply = best_trial(lambda w: apply_fn(obj, hess, w, bins), w)
    _mark(f"apply best {t_apply * 1e3:.2f} ms")

    # ---- explicit BSR SpMV nnz/s -----------------------------------------
    # Tile-ordered rows + supertile-window SpMV (ops.bsr_tiled): the
    # latency-free formulation. Structural nnz is counted on the compressed
    # node-major structure (so tile padding does not inflate the metric).
    _mark("assembling BSR (tile-ordered)")
    from hot_tpu.grid import sparse as sparse_mod
    from hot_tpu.ops import bsr_tiled

    n_active = int(jnp.sum(active))
    cap_rows = ((n_active + 1023) // 1024 + 1) * 1024
    mat_c = bsr_mod.structure(active, grid_res, cap_rows)
    block_nnz = int(
        jax.jit(lambda m_: m_.block_nnz)(mat_c)
    )

    # pick tile capacity from the particle set (one probe build)
    probe = sparse_mod.build_tile_grid(state.x, cfg.dx, grid_res, capacity=4096)
    t_cap = int(((int(probe.n_active) + 255) // 256 + 1) * 256)
    tgrid = sparse_mod.build_tile_grid(state.x, cfg.dx, grid_res, capacity=t_cap)
    tmat = bsr_tiled.structure_tiled(tgrid)
    tmat = jax.jit(
        lambda m_, st_, F_, cx_, V0_, gm_: bsr_mod.assemble_hessian(
            m_, st_, F_, cx_, V0_, dtj, gm_
        )
    )(tmat, st, state.F, hess.ctx, state.V0, gm)
    nbr = bsr_tiled.tile_neighbors(tgrid)
    jax.block_until_ready(tmat.vals)
    _mark(f"BSR rows={n_active} block_nnz={block_nnz} tiles={int(tgrid.n_active)};"
          " timing tiled spmv")
    spmv_fn = jax.jit(lambda v_, x_: _renorm(bsr_tiled.spmv_tiled(
        tmat._replace(vals=v_), tgrid, nbr, x_)))
    x_rows = bsr_mod.grid_vector_to_rows(tmat, vg)
    y = spmv_fn(tmat.vals, x_rows)
    t_spmv = best_trial(lambda y: spmv_fn(tmat.vals, y), y)
    _mark(f"tiled spmv best {t_spmv * 1e3:.3f} ms")

    nnz = block_nnz * dim * dim
    nnz_per_s = nnz / t_spmv
    bpe = jnp.dtype(dtype).itemsize
    spmv_bytes = nnz * bpe + block_nnz * (4 + dim * bpe) + n_active * 2 * dim * bpe
    spmv_gbps = spmv_bytes / t_spmv / 1e9
    sol = hbm_sol()
    sol_nnz_per_s = sol * 1e9 / (spmv_bytes / max(nnz, 1))

    print(
        json.dumps(
            {
                "metric": "bsr_spmv_nnz_per_s",
                "value": round(nnz_per_s, 0),
                "unit": "scalar nnz/s (BSR 3x3 SpMV, twisting bar 64^3 Hessian)",
                "vs_baseline": round(nnz_per_s / sol_nnz_per_s, 4),
                "extra": {
                    "device": jax.devices()[0].device_kind,
                    "backend": jax.default_backend(),
                    "particles": int(n),
                    "bsr_rows": n_active,
                    "block_nnz": block_nnz,
                    "spmv_ms": round(t_spmv * 1e3, 4),
                    "spmv_gbps": round(spmv_gbps, 2),
                    "matfree_apply_ms": round(t_apply * 1e3, 3),
                    "steps_per_sec": round(steps_per_sec, 3),
                    "hbm_sol_gbps": sol,
                    "last_newton": int(stats.newton_iters),
                    "last_cg": int(stats.cg_iters),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
