"""Benchmark entry point — prints ONE JSON line for the driver.

Round-3 shape (VERDICT r2 #4): the primary metric is the BSR(3x3)
supertile SpMV nnz/s on the CONFIG-2 Hessian — 3D twisting bar at 128^3
(BASELINE.json:8) — normalized against the chip's HBM speed-of-light in
vs_baseline. Extra fields carry the 64^3 production-step throughput, the
matrix-free fused-apply time, and (when the assembled-MG step runs) the
MG-PCG step throughput + wall-time per Newton step (BASELINE.json:2's
second metric).

The cumulative JSON line is re-printed after every phase, so a timeout in
a later phase still leaves a complete record of the earlier ones (the
driver reads the last JSON line).

Measurement protocol for this device (docs/KERNEL_PLAN.md + round 3):
  * the first timed loop after compilation runs ~100x slow (background
    re-optimization) — warm generously, report the best;
  * identical (program, inputs) executions are result-cached — vary
    inputs between repetitions;
  * any single execution beyond ~60 s kills the device worker
    (scripts/probe_exec_deadline.py) — multi-Newton steps are warmed with
    tiny dt (1 Newton per execution, same compiled program) first;
  * block_until_ready is not a reliable fence through the tunnel — every
    timing chains data-dependent executions and ends with a scalar
    readback (best_trial).
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
    """Fixed host->device->host latency of this connection (measured ~4-25
    ms through the axon tunnel). Subtracted from chained timings."""
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
    """Sync-proof timing: chain `reps` data-DEPENDENT executions, force
    completion with a scalar readback, subtract the round trip."""
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


OUT = {
    "metric": "bsr_spmv_nnz_per_s",
    "value": 0.0,
    "unit": "scalar nnz/s (BSR 3x3 supertile SpMV, twisting bar 128^3 Hessian)",
    "vs_baseline": 0.0,
    "extra": {},
}


def emit():
    print(json.dumps(OUT), flush=True)


def _build_system(res_n: int, ppc: int):
    """Scene + stencil + bins + grid state + objective + hessian ctx."""
    import functools

    from hot_tpu.ops import transfer
    from hot_tpu.scenes import build_scene
    from hot_tpu.sim import objective as obj_mod
    from hot_tpu.sim.simulation import Simulation

    scene = build_scene("twisting_bar_3d", res=res_n, ppc=ppc)
    cfg, model = scene["cfg"], scene["model"]
    state = scene["state"]
    dim = cfg.dim
    res = cfg.grid_res[:dim]
    n = state.n
    n_nodes = transfer.n_nodes_of(res)
    dtype = state.x.dtype
    dt = jnp.asarray(2e-3, dtype)

    sim = Simulation.__new__(Simulation)
    sim.cfg = cfg
    sim.state = state
    caps = Simulation._choose_bin_caps(sim) or (max(1024, n // 4), 16)

    st = jax.jit(lambda x: transfer.particle_stencil(x, cfg.dx, res))(state.x)
    bins = jax.jit(
        lambda x: transfer.bin_particles(x, cfg.dx, res, caps[0], caps[1])
    )(state.x)
    gm, gmv = jax.jit(
        lambda st, v, C, m: transfer.p2g_mass_momentum(st, v, C, m, n_nodes)
    )(st, state.v, state.C, state.m)
    active = gm > 0
    vg = gmv * jnp.where(active, 1.0 / jnp.maximum(gm, 1e-30), 0.0)[:, None]
    proj = jnp.broadcast_to(jnp.eye(dim, dtype=dtype), (n_nodes, dim, dim))
    obj = jax.jit(
        lambda st, F, V0, mu, lam, gm, vg, proj: obj_mod.make_objective(
            model, st, F, V0, mu, lam, gm, vg, proj, dt, cfg.dx
        )
    )(st, state.F, state.V0, state.mu, state.lam, gm, vg, proj)
    hess = jax.jit(
        lambda o, v, b: obj_mod.build_hessian(
            model, o, v, gather_st=transfer.make_binned_gather(b, res)
        )
    )(obj, vg, bins)
    jax.block_until_ready(hess.F_new)
    return dict(scene=scene, cfg=cfg, model=model, state=state, st=st,
                bins=bins, gm=gm, active=active, vg=vg, obj=obj, hess=hess,
                res=res, n_nodes=n_nodes, dt=dt, dtype=dtype, caps=caps)


def _renorm(y):
    return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)


def phase_spmv(res_n: int):
    """Config-2 SpMV: supertile BSR(3x3) SpMV on the res^3 bar Hessian."""
    from hot_tpu.grid import sparse as sparse_mod
    from hot_tpu.ops import bsr as bsr_mod
    from hot_tpu.ops import bsr_tiled

    sysd = _build_system(res_n, ppc=8)
    state, cfg = sysd["state"], sysd["cfg"]
    res, dt = sysd["res"], sysd["dt"]
    dim = cfg.dim
    dtype = sysd["dtype"]
    active = sysd["active"]

    n_active = int(jnp.sum(active))
    cap_rows = ((n_active + 1023) // 1024 + 1) * 1024
    mat_c = bsr_mod.structure(active, res, cap_rows)
    block_nnz = int(jax.jit(lambda m_: m_.block_nnz)(mat_c))

    probe = sparse_mod.build_tile_grid(state.x, cfg.dx, res, capacity=16384)
    t_cap = int(((int(probe.n_active) + 255) // 256 + 1) * 256)
    tgrid = sparse_mod.build_tile_grid(state.x, cfg.dx, res, capacity=t_cap)
    tmat = bsr_tiled.structure_tiled(tgrid)
    # scatter-free rank-1-mode assembly (the production assembly): the
    # colliding-scatter assemble_hessian materializes (n, 27, 27, d, d)
    # per-particle blocks — 59 GB at 128^3 / 416k particles
    tmat = jax.jit(
        lambda m_, b_, st_, F_, cx_, V0_, gm_: bsr_mod.assemble_hessian_modes(
            m_, b_, st_, F_, cx_, V0_, dt, gm_
        )
    )(tmat, sysd["bins"], sysd["st"], state.F, sysd["hess"].ctx, state.V0,
      sysd["gm"])
    nbr = bsr_tiled.tile_neighbors(tgrid)
    jax.block_until_ready(tmat.vals)
    _mark(f"{res_n}^3: rows={n_active} block_nnz={block_nnz} "
          f"tiles={int(tgrid.n_active)}")

    spmv_fn = jax.jit(lambda v_, x_: _renorm(bsr_tiled.spmv_tiled(
        tmat._replace(vals=v_), tgrid, nbr, x_)))
    x_rows = bsr_mod.grid_vector_to_rows(tmat, sysd["vg"])
    y = spmv_fn(tmat.vals, x_rows)
    t_spmv = best_trial(lambda y: spmv_fn(tmat.vals, y), y)
    _mark(f"{res_n}^3 spmv best {t_spmv * 1e3:.3f} ms")

    nnz = block_nnz * dim * dim
    bpe = jnp.dtype(dtype).itemsize
    spmv_bytes = nnz * bpe + block_nnz * (4 + dim * bpe) + n_active * 2 * dim * bpe
    sol = hbm_sol()
    return dict(
        nnz_per_s=nnz / t_spmv,
        spmv_ms=t_spmv * 1e3,
        spmv_gbps=spmv_bytes / t_spmv / 1e9,
        sol_nnz_per_s=sol * 1e9 / (spmv_bytes / max(nnz, 1)),
        bsr_rows=n_active,
        block_nnz=block_nnz,
        particles=int(state.n),
    )


def phase_apply(sysd):
    """Matrix-free fused apply (the production CG hot op)."""
    from hot_tpu.sim import objective as obj_mod

    obj, hess, bins, res = sysd["obj"], sysd["hess"], sysd["bins"], sysd["res"]
    params = jax.jit(lambda o, c: obj_mod.hessian_params_cl(o, c))(
        obj, hess.ctx)
    apply_fn = jax.jit(lambda w: _renorm(obj_mod.multiply_cl(
        obj, params, w, bins, res)))
    w = apply_fn(sysd["vg"] + 1e-3)
    return best_trial(apply_fn, w)


def phase_steps(res_n: int, variant: str, steps: int = 5):
    """Production implicit-step throughput with the tiny-dt warm protocol."""
    import dataclasses

    from hot_tpu.scenes import build_scene
    from hot_tpu.sim.simulation import Simulation
    from hot_tpu.utils.config import MultigridConfig

    scene = build_scene("twisting_bar_3d", res=res_n, ppc=8)
    cfg = scene["cfg"]
    sol = cfg.solver
    if variant == "jacobi":
        sol = dataclasses.replace(sol, preconditioner="block_jacobi")
    else:
        mg = MultigridConfig(levels=4, smoother="chebyshev",
                             coarse_solver="direct", assembled=True)
        sol = dataclasses.replace(sol, preconditioner="multigrid",
                                  multigrid=mg, pallas_apply=False,
                                  pallas_linearize=False)
    cfg = dataclasses.replace(cfg, solver=sol)
    sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
    dt = 2e-3
    for _ in range(12):
        stats = sim.step(dt / 200.0)      # deadline-safe warm (same program)
    for _ in range(9):
        stats = sim.step(dt)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            stats = sim.step(dt)
        best = min(best, (time.perf_counter() - t0) / steps)
    return dict(
        steps_per_sec=1.0 / best,
        step_ms=best * 1e3,
        newton=int(stats.newton_iters),
        cg=int(stats.cg_iters),
    )


def main():
    ex = OUT["extra"]
    ex["device"] = jax.devices()[0].device_kind
    ex["backend"] = jax.default_backend()
    ex["hbm_sol_gbps"] = hbm_sol()

    # ---- primary: config-2 SpMV at 128^3 (fallback 64^3) -----------------
    spmv_res = int(os.environ.get("BENCH_SPMV_RES", "128"))
    try:
        _mark(f"phase spmv {spmv_res}^3")
        r = phase_spmv(spmv_res)
        ex["spmv_res"] = spmv_res
    except Exception as e:  # noqa: BLE001
        _mark(f"{spmv_res}^3 spmv failed ({type(e).__name__}); retry 64^3")
        ex["spmv_128_error"] = f"{type(e).__name__}: {str(e)[:160]}"
        import gc

        gc.collect()
        jax.clear_caches()       # free the failed attempt's device buffers
        r = phase_spmv(64)
        ex["spmv_res"] = 64
        OUT["unit"] = OUT["unit"].replace("128^3", "64^3")
    OUT["value"] = round(r["nnz_per_s"], 0)
    OUT["vs_baseline"] = round(r["nnz_per_s"] / r["sol_nnz_per_s"], 4)
    ex["spmv_ms"] = round(r["spmv_ms"], 4)
    ex["spmv_gbps"] = round(r["spmv_gbps"], 2)
    ex["bsr_rows"] = r["bsr_rows"]
    ex["block_nnz"] = r["block_nnz"]
    ex["particles"] = r["particles"]
    emit()

    # ---- matrix-free fused apply at 64^3 ---------------------------------
    try:
        _mark("phase apply 64^3")
        sysd = _build_system(64, ppc=8)
        ex["matfree_apply_ms"] = round(phase_apply(sysd) * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        ex["apply_error"] = f"{type(e).__name__}: {str(e)[:160]}"
    emit()

    # ---- production jacobi step throughput at 64^3 -----------------------
    try:
        _mark("phase steps jacobi 64^3")
        r = phase_steps(64, "jacobi")
        ex["steps_per_sec"] = round(r["steps_per_sec"], 3)
        ex["last_newton"] = r["newton"]
        ex["last_cg"] = r["cg"]
    except Exception as e:  # noqa: BLE001
        ex["steps_error"] = f"{type(e).__name__}: {str(e)[:160]}"
    emit()

    # ---- MG-PCG step metrics (BASELINE.json:2 second metric) -------------
    if os.environ.get("BENCH_SKIP_MG") != "1":
        try:
            _mark("phase steps mg_asm 64^3")
            r = phase_steps(64, "mg_asm")
            ex["mg_steps_per_sec"] = round(r["steps_per_sec"], 3)
            ex["mg_step_ms"] = round(r["step_ms"], 1)
            ex["mg_newton"] = r["newton"]
            ex["mg_cg"] = r["cg"]
            ex["mgpcg_ms_per_newton"] = round(
                r["step_ms"] / max(r["newton"], 1), 1)
        except Exception as e:  # noqa: BLE001
            ex["mg_error"] = f"{type(e).__name__}: {str(e)[:160]}"
    emit()


if __name__ == "__main__":
    main()
