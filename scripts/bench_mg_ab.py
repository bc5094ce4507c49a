"""TPU A/B: steps/s of the implicit twisting-bar step across preconditioners.

Variants:
  jacobi     — block-Jacobi PCG (the round-1 default)
  mg         — matrix-free node-embedding MG-PCG (quadrature applies per level)
  mg_asm     — assembled MG-PCG (per-level tile-row BSR built once per Newton
               iteration; smoothers/residuals via ops.bsr_tiled.spmv_tiled)

Each variant runs in its OWN subprocess (round-1 observed a reproducible
device fault compiling the matrix-free MG step at 64^3 — isolate it).

Usage:
  python scripts/bench_mg_ab.py               # run all variants, summary table
  python scripts/bench_mg_ab.py --one mg      # single variant, one JSON line
  python scripts/bench_mg_ab.py --res 64 --steps 5
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

VARIANTS = ("jacobi", "jacobi_exp", "mg", "mg_asm", "mg_asm_exp", "mg_asm1")


def solver_for(variant: str, base, levels: int = 4, coarse: str = "direct",
               pallas_apply=None, max_newton: int = 5, max_cg: int = 60):
    from hot_tpu.utils.config import MultigridConfig

    if pallas_apply is not None:
        # --no-pallas disables BOTH fused kernels (apply + linearize)
        base = dataclasses.replace(base, pallas_apply=pallas_apply,
                                   pallas_linearize=pallas_apply)
    exp = variant.endswith("_exp")    # explicit outer BSR (supertile SpMV)
    if variant.startswith("jacobi"):
        return dataclasses.replace(base, preconditioner="block_jacobi",
                                   matrix_free=not exp)
    # levels=4 at 64^3 keeps the coarsest at 8^3 (1536 DoF): the dense
    # coarse factor is (n_nodes*d)^2 over ALL coarsest nodes, so levels=3
    # (16^3 -> 604 MB factor) OOMs the step's Newton carry on a v5e.
    # mg_asm1: matrix-free finest + EXACT composed-stencil Galerkin from
    # level 1 (ops.composed) — skips the finest-level assembly, measured
    # at HALF the per-Newton hierarchy build (BASELINE.md assemble_l0).
    mg = MultigridConfig(
        levels=levels,
        smoother="chebyshev",
        coarse_solver=coarse,
        assembled=variant.startswith("mg_asm"),
        assembled_from_level=1 if variant == "mg_asm1" else 0,
    )
    # max_newton bounds ONE execution's wall time: at ~3-4 s per Newton
    # iteration (per-Newton build + CG), a 10-Newton execution inside the
    # post-compile re-opt window crosses the ~60 s device deadline — the
    # queue-2/3 mg leg kills (isolate_mg_step with max_newton=2 survives
    # and measures). MG converges in 2-3; 6 is headroom, not a cap in
    # practice.
    # max_cg=60 also bounds the execution: if the (lagged) V-cycle stops
    # contracting at some trajectory point, CG runs to its cap — at ~0.1 s
    # per preconditioned iteration, 3 Newton x 200 CG is a ~60 s execution
    # (the deadline). A capped run REPORTS the blowup in its cg field
    # instead of killing the device.
    return dataclasses.replace(base, preconditioner="multigrid", multigrid=mg,
                               matrix_free=not exp, max_newton=max_newton,
                               max_cg=max_cg)


def run_one(variant: str, res: int, steps: int, dt: float,
            levels: int = 4, coarse: str = "direct",
            pallas_apply=None, transfer=None, refresh: str = None,
            warm_full: int = 9, pregrow: float = 0.0,
            max_newton: int = 5, max_cg: int = 60,
            rap_refresh: str = None, rap_max_half: int = None) -> dict:
    import jax
    import jax.numpy as jnp

    from hot_tpu.scenes import build_scene
    from hot_tpu.sim.simulation import Simulation
    from hot_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    scene = build_scene("twisting_bar_3d", res=res, ppc=8)
    cfg = scene["cfg"]
    cfg = dataclasses.replace(
        cfg, solver=solver_for(variant, cfg.solver, levels, coarse,
                               pallas_apply, max_newton, max_cg))
    if refresh:
        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, precond_refresh=refresh)
        )
    if rap_refresh or rap_max_half:
        # round-5 build levers: lagged RAP chain / near-Galerkin stencil cap
        mgc = cfg.solver.multigrid
        if rap_refresh:
            mgc = dataclasses.replace(mgc, rap_refresh=rap_refresh)
        if rap_max_half:
            mgc = dataclasses.replace(mgc, rap_max_half=rap_max_half)
        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, multigrid=mgc))
    if transfer:
        cfg = dataclasses.replace(cfg, transfer_impl=transfer)
    sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
    if pregrow:
        # pre-size every capacity with headroom so no bin_regrow (and its
        # recompile + fresh re-opt window) fires mid-protocol — the A/B
        # runs regrow once at the first full-dt step otherwise, and the
        # timed loops then run a young executable (0.44-vs-0.77 bimodality
        # diagnostics, round 4)
        from hot_tpu.sim import capacity

        sim._rebuild_step(capacity.plan_capacities(cfg, sim.state.x,
                                                   grow=pregrow))

    # TINY-dt warm-up (round-3 protocol): this environment kills any single
    # execution beyond ~60 s (scripts/probe_exec_deadline.py), and the
    # first executions after compile run 10-100x slow (background re-opt).
    # A multi-Newton MG step inside the re-opt window crosses the deadline
    # and faults the device — the two-round "mg_asm device fault". Tiny dt
    # converges in 1 Newton (same compiled program; dt is a traced arg), so
    # each warm execution stays far under the deadline; full-dt steps then
    # run warm.
    dt_warm = dt / 200.0

    def ramp(n_tiny=12):
        """Season the CURRENT executable with short executions: tiny dt
        (1 Newton) then a graded dt ramp. The post-compile re-opt window
        makes executions 10-20x slow; a full-dt multi-Newton step inside
        it crosses the ~60-70 s execution deadline (re-probed round 4:
        64 s OK / 70 s kill) and the device worker dies."""
        st = None
        for _ in range(n_tiny):
            st = sim.step(dt_warm)
        for f in (20.0, 20.0, 20.0, 4.0, 4.0, 2.0, 2.0):
            st = sim.step(dt / f)
        return st

    def n_events():
        # only recompile events (bin_regrow) need re-seasoning; dt_retry
        # re-runs the SAME executable
        return sum(1 for r in sim.metrics.records
                   if r.get("event") == "bin_regrow")

    t_compile0 = time.perf_counter()
    stats = sim.step(dt_warm)
    compile_s = time.perf_counter() - t_compile0
    stats = ramp()
    # full-dt warm with regrow guard: a bin_regrow RECOMPILES (new caps =
    # new executable) and the very next full-dt step would run young —
    # re-season after every event before continuing (the queue-2/3 mg
    # legs died exactly there)
    clean = 0
    ev0 = n_events()
    while clean < warm_full:
        stats = sim.step(dt)
        ev1 = n_events()
        if ev1 != ev0:
            ev0 = ev1
            clean = 0
            stats = ramp(8)
        else:
            clean += 1
    newton = int(stats.newton_iters)
    cg = int(stats.cg_iters)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            stats = sim.step(dt)
        best = min(best, (time.perf_counter() - t0) / steps)
    events = [r["event"] for r in sim.metrics.records if r.get("event")]
    return dict(
        variant=variant,
        res=res,
        steps_per_sec=round(1.0 / best, 4),
        step_ms=round(best * 1e3, 2),
        # per-CG wall cost of the timed steps (weak #9: separates kernel
        # speed from iteration-regime drift — steps/s alone conflates them)
        ms_per_cg=round(best * 1e3 / max(int(stats.cg_iters), 1), 2),
        rap_refresh=rap_refresh, rap_max_half=rap_max_half,
        newton=newton,
        cg=cg,
        last_newton=int(stats.newton_iters),
        last_cg=int(stats.cg_iters),
        compile_s=round(compile_s, 1),
        warm_full=warm_full,
        pregrow=pregrow,
        backend=jax.default_backend(),
        n_particles=int(sim.state.n),
        retries=sim.retry_count,
        events=events[-6:],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", choices=VARIANTS)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--dt", type=float, default=2e-3)
    ap.add_argument("--timeout", type=float, default=1500.0)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--coarse", default="direct")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--transfer", default=None)
    ap.add_argument("--refresh", default=None, choices=["newton", "step"])
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--warm-full", type=int, default=9,
                    help="full-dt warm steps before the timed trials")
    ap.add_argument("--pregrow", type=float, default=0.0,
                    help="pre-size capacities with this grow factor "
                         "(suppresses mid-protocol bin_regrow recompiles)")
    ap.add_argument("--max-newton", type=int, default=5,
                    help="mg variants: Newton cap bounding one execution "
                         "under the ~60-70 s device deadline")
    ap.add_argument("--max-cg", type=int, default=60,
                    help="mg variants: CG cap (same deadline bound; at "
                         "128^3 a CG iteration is ~0.3-0.5 s, use ~25)")
    ap.add_argument("--rap-refresh", default=None,
                    choices=["newton", "lagged"],
                    help="mg variants: Galerkin-RAP refresh cadence "
                         "(MultigridConfig.rap_refresh)")
    ap.add_argument("--rap-max-half", type=int, default=None,
                    help="mg variants: near-Galerkin stencil cap "
                         "(MultigridConfig.rap_max_half)")
    args = ap.parse_args()

    if args.one:
        print(json.dumps(run_one(args.one, args.res, args.steps, args.dt,
                                 args.levels, args.coarse,
                                 False if args.no_pallas else None,
                                 args.transfer, args.refresh,
                                 args.warm_full, args.pregrow,
                                 args.max_newton, args.max_cg,
                                 args.rap_refresh, args.rap_max_half)),
              flush=True)
        return

    results = []
    for v in args.variants.split(","):
        cmd = [sys.executable, os.path.abspath(__file__), "--one", v,
               "--res", str(args.res), "--steps", str(args.steps),
               "--dt", str(args.dt), "--levels", str(args.levels),
               "--warm-full", str(args.warm_full),
               "--pregrow", str(args.pregrow),
               "--coarse", args.coarse] + (["--no-pallas"] if args.no_pallas else []) + (
                  ["--transfer", args.transfer] if args.transfer else []) + (
                  ["--refresh", args.refresh] if args.refresh else []) + (
                  ["--rap-refresh", args.rap_refresh]
                  if args.rap_refresh else []) + (
                  ["--rap-max-half", str(args.rap_max_half)]
                  if args.rap_max_half else [])
        print(f"[ab] running {v} ...", file=sys.stderr, flush=True)
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=args.timeout, cwd=REPO, env=env)
        except subprocess.TimeoutExpired:
            results.append(dict(variant=v, error="timeout"))
            continue
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if out.returncode != 0 or not line:
            results.append(dict(variant=v, error=f"rc={out.returncode}",
                                tail=out.stderr.strip().splitlines()[-8:]))
        else:
            results.append(json.loads(line[-1]))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
