"""Benchmark entry point — prints ONE JSON line for the driver.

Round-3 shape (VERDICT r2 #4): the primary metric is the BSR(3x3)
supertile SpMV nnz/s on the CONFIG-2 Hessian — 3D twisting bar at 128^3
(BASELINE.json:8) — normalized against the chip's HBM speed-of-light in
vs_baseline. Extra fields carry the 64^3 production-step throughput, the
matrix-free fused-apply time, and (when the assembled-MG step runs) the
MG-PCG step throughput + wall-time per Newton step (BASELINE.json:2's
second metric).

Round-4 shape (VERDICT r3 #4): every phase runs in its OWN subprocess.
Round 3's in-process phase chain left the 128^3 SpMV system resident in
HBM while the 64^3 step phase timed — the driver-recorded steps/s sat at
0.44 while the isolated-protocol record was 0.767. A fresh process per
phase gives each measurement a clean device, and matches the protocol the
records were set under (scripts/bench_mg_ab.py). The parent process never
imports jax (any python process here claims the TPU at startup).

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
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
VERBOSE = os.environ.get("BENCH_VERBOSE") == "1"

# per-chip HBM speed-of-light, GB/s (TPU v5e ~819; v5p ~2765)
HBM_SOL_GBPS = {"TPU v5 lite": 819.0, "TPU v5": 2765.0, "TPU v5p": 2765.0}


def _mark(msg):
    if VERBOSE:
        print(f"[bench] {msg}", file=sys.stderr, flush=True)


def hbm_sol() -> float:
    import jax

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
    import jax
    import jax.numpy as jnp

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
    import jax
    import jax.numpy as jnp

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


def _build_system(res_n: int, ppc: int):
    """Scene + stencil + bins + grid state + objective + hessian ctx."""
    import jax
    import jax.numpy as jnp

    from hot_tpu.ops import transfer
    from hot_tpu.scenes import build_scene
    from hot_tpu.sim import capacity
    from hot_tpu.sim import objective as obj_mod

    scene = build_scene("twisting_bar_3d", res=res_n, ppc=ppc)
    cfg, model = scene["cfg"], scene["model"]
    state = scene["state"]
    dim = cfg.dim
    res = cfg.grid_res[:dim]
    n = state.n
    n_nodes = transfer.n_nodes_of(res)
    dtype = state.x.dtype
    dt = jnp.asarray(2e-3, dtype)

    caps = capacity.plan_capacities(cfg, state.x).bin_caps \
        or (max(1024, n // 4), 16)

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
    import jax
    import jax.numpy as jnp

    return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)


def _phase_spmv_at(res_n: int):
    """Config-2 SpMV: supertile BSR(3x3) SpMV on the res^3 bar Hessian."""
    import jax
    import jax.numpy as jnp

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

    # supertile-arg form: one (R, K*dd) -> (R, K, d, d) copy per assembly
    # (amortized over the CG applies this SpMV models); the flat-arg
    # in-program split reshape costs 2x — see bsr_tiled.vals_supertile_arg
    vals5 = jax.jit(lambda m_: bsr_tiled.vals_supertile_arg(m_, dim))(tmat)
    jax.block_until_ready(vals5)
    spmv_fn = jax.jit(lambda v_, x_: _renorm(bsr_tiled.spmv_tiled(
        tmat._replace(vals=v_), tgrid, nbr, x_)))
    x_rows = bsr_mod.grid_vector_to_rows(tmat, sysd["vg"])
    y = spmv_fn(vals5, x_rows)
    t_spmv = best_trial(lambda y: spmv_fn(vals5, y), y)
    _mark(f"{res_n}^3 spmv best {t_spmv * 1e3:.3f} ms")

    nnz = block_nnz * dim * dim
    bpe = jnp.dtype(dtype).itemsize
    spmv_bytes = nnz * bpe + block_nnz * (4 + dim * bpe) + n_active * 2 * dim * bpe
    sol = hbm_sol()
    return dict(
        value=round(nnz / t_spmv, 0),
        vs_baseline=round((nnz / t_spmv) / (sol * 1e9 / (spmv_bytes / max(nnz, 1))), 4),
        spmv_res=res_n,
        spmv_ms=round(t_spmv * 1e3, 4),
        spmv_gbps=round(spmv_bytes / t_spmv / 1e9, 2),
        bsr_rows=n_active,
        block_nnz=block_nnz,
        particles=int(state.n),
    )


def phase_spmv():
    import jax

    out = dict(device=jax.devices()[0].device_kind,
               backend=jax.default_backend(),
               hbm_sol_gbps=hbm_sol())
    spmv_res = int(os.environ.get("BENCH_SPMV_RES", "128"))
    try:
        out.update(_phase_spmv_at(spmv_res))
    except Exception as e:  # noqa: BLE001
        _mark(f"{spmv_res}^3 spmv failed ({type(e).__name__}); retry 64^3")
        out["spmv_128_error"] = f"{type(e).__name__}: {str(e)[:160]}"
        import gc

        gc.collect()
        jax.clear_caches()       # free the failed attempt's device buffers
        out.update(_phase_spmv_at(64))
    return out


def phase_apply():
    """Matrix-free fused apply (the production CG hot op)."""
    import jax

    from hot_tpu.sim import objective as obj_mod

    sysd = _build_system(64, ppc=8)
    obj, hess, bins, res = sysd["obj"], sysd["hess"], sysd["bins"], sysd["res"]
    params = jax.jit(lambda o, c: obj_mod.hessian_params_cl(o, c))(
        obj, hess.ctx)
    apply_fn = jax.jit(lambda w: _renorm(obj_mod.multiply_cl(
        obj, params, w, bins, res)))
    w = apply_fn(sysd["vg"] + 1e-3)
    return dict(matfree_apply_ms=round(best_trial(apply_fn, w) * 1e3, 3))


def _steps_at(res_n: int, variant: str, steps: int = 5):
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
        # max_newton=3 bounds one execution under the ~60 s device
        # deadline (MG converges in 2-3; see bench_mg_ab.solver_for)
        sol = dataclasses.replace(sol, preconditioner="multigrid",
                                  multigrid=mg, pallas_apply=False,
                                  pallas_linearize=False, max_newton=3)
        if variant == "mg_asm_lag":
            sol = dataclasses.replace(sol, precond_refresh="step")
    cfg = dataclasses.replace(cfg, solver=sol)
    sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
    # pregrow: no bin_regrow recompile mid-protocol (the regrown executable
    # re-enters the re-opt window and the timed loops run young)
    from hot_tpu.sim import capacity

    sim._rebuild_step(capacity.plan_capacities(cfg, sim.state.x, grow=1.3))
    dt = 2e-3
    for _ in range(12):
        stats = sim.step(dt / 200.0)      # deadline-safe warm (same program)
    # graded dt ramp: full-dt multi-Newton steps inside the re-opt window
    # cross the ~60 s execution deadline in the device's slow state
    for _ in range(5):
        stats = sim.step(dt / 20.0)
    for _ in range(3):
        stats = sim.step(dt / 4.0)
    for _ in range(3):
        stats = sim.step(dt / 2.0)
    for _ in range(9):
        stats = sim.step(dt)
    best, last = float("inf"), 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            stats = sim.step(dt)
        last = (time.perf_counter() - t0) / steps
        best = min(best, last)
    return dict(
        steps_per_sec=round(1.0 / best, 3),
        steps_per_sec_last=round(1.0 / last, 3),
        step_ms=round(best * 1e3, 1),
        newton=int(stats.newton_iters),
        cg=int(stats.cg_iters),
        retries=sim.retry_count,
    )


def phase_steps():
    r = _steps_at(64, "jacobi")
    return dict(steps_per_sec=r["steps_per_sec"],
                steps_per_sec_last=r["steps_per_sec_last"],
                last_newton=r["newton"], last_cg=r["cg"],
                step_retries=r["retries"])


def phase_mg():
    r = _steps_at(64, "mg_asm")
    return dict(mg_steps_per_sec=r["steps_per_sec"],
                mg_step_ms=r["step_ms"],
                mg_newton=r["newton"], mg_cg=r["cg"],
                mgpcg_ms_per_newton=round(
                    r["step_ms"] / max(r["newton"], 1), 1))


def _mg128_extras(r: dict) -> dict:
    """Flatten a bench_mg_solve JSON record into mg128_* extras — the
    north-star A/B (BASELINE.json:2/9): MG-PCG vs block-Jacobi-PCG
    per-Newton wall time at 128^3."""
    out = {}
    for side in ("mg", "jacobi"):
        if side in r:
            out[f"mg128_{side}_cg"] = r[side]["cg"]
            out[f"mg128_{side}_per_iter_ms"] = r[side]["per_iter_ms"]
            out[f"mg128_{side}_newton_ms"] = r[side]["newton_ms"]
            out[f"mg128_{side}_build_ms"] = r[side]["build_ms"]
    return out


# mg128 is dispatched by main() straight to scripts/bench_mg_solve.py
# (any python child here claims the TPU at interpreter start, so the
# usual bench.py --phase middle process would deadlock the harness)
PHASES = {
    "spmv": (phase_spmv, 2400),
    "apply": (phase_apply, 1200),
    "steps": (phase_steps, 1800),
    "mg": (phase_mg, 2400),
    "mg128": (None, 4800),
}


def main():
    """Jax-free orchestrator: one subprocess per phase (clean device)."""
    out = {
        "metric": "bsr_spmv_nnz_per_s",
        "value": 0.0,
        "unit": "scalar nnz/s (BSR 3x3 supertile SpMV, twisting bar 128^3 "
                "Hessian)",
        "vs_baseline": 0.0,
        "extra": {},
    }
    phases = os.environ.get(
        "BENCH_PHASES", "spmv,apply,steps,mg,mg128").split(",")
    if os.environ.get("BENCH_SKIP_MG") == "1" and "mg" in phases:
        phases.remove("mg")
    for name in phases:
        fn, tmo = PHASES[name]
        _mark(f"phase {name} (subprocess)")
        if name == "mg128":
            cmd = [sys.executable,
                   os.path.join(REPO, "scripts", "bench_mg_solve.py"),
                   "--res", "128"]
        else:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--phase", name]
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=tmo, cwd=REPO)
            lines = [l for l in p.stdout.strip().splitlines()
                     if l.startswith("{")]
            if p.returncode != 0 or not lines:
                tail = p.stderr.strip().splitlines()[-4:]
                out["extra"][f"{name}_error"] = f"rc={p.returncode} {tail}"
            else:
                r = json.loads(lines[-1])
                if name == "mg128":
                    r = _mg128_extras(r)
                out["value"] = r.pop("value", out["value"])
                out["vs_baseline"] = r.pop("vs_baseline", out["vs_baseline"])
                if r.get("spmv_res") == 64:
                    out["unit"] = out["unit"].replace("128^3", "64^3")
                out["extra"].update(r)
        except subprocess.TimeoutExpired:
            out["extra"][f"{name}_error"] = f"timeout {tmo}s"
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--phase":
        from hot_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        print(json.dumps(PHASES[sys.argv[2]][0]()), flush=True)
    else:
        main()
