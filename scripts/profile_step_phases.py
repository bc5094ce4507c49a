"""Step-phase decomposition on the real device, by config differencing.

Times the full implicit step against reduced variants whose differences
isolate phases (each in its own subprocess, chained-execution protocol):

  explicit     — P2G + BC + explicit grid update + G2P (no Newton): the
                 transfer + bookkeeping floor of every step
  newton0      — Newton disabled by cn_eps=inf (one CN check): adds one
                 linearize + preconditioner build over `explicit`
  jacobi       — the full block-Jacobi PCG step (the production config)
  jacobi_nopc  — preconditioner "jacobi" (mass): removes the block-diag
                 build/inverse from every Newton iteration

step_ms(jacobi) - step_ms(explicit) ~= Newton cost; per-CG cost comes from
(jacobi - newton0) / cg_iters; block-diag cost from (jacobi - jacobi_nopc)
after iteration-count normalization (printed raw — interpret by hand).

Usage: python scripts/profile_step_phases.py [--res 64] [--steps 5]
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

VARIANTS = ("explicit", "newton0", "jacobi_nopc", "jacobi")


def cfg_for(variant: str, cfg):
    sol = cfg.solver
    if variant == "explicit":
        sol = dataclasses.replace(sol, integrator="explicit")
    elif variant == "newton0":
        sol = dataclasses.replace(sol, preconditioner="block_jacobi",
                                  max_newton=1, max_cg=1)
    elif variant == "jacobi_nopc":
        sol = dataclasses.replace(sol, preconditioner="jacobi")
    else:
        sol = dataclasses.replace(sol, preconditioner="block_jacobi")
    return dataclasses.replace(cfg, solver=sol)


def run_one(variant: str, res: int, steps: int, dt: float) -> dict:
    import jax

    from hot_tpu.scenes import build_scene
    from hot_tpu.sim.simulation import Simulation
    from hot_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    scene = build_scene("twisting_bar_3d", res=res, ppc=8)
    cfg = cfg_for(variant, scene["cfg"])
    sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
    t0 = time.perf_counter()
    stats = sim.step(dt)
    compile_s = time.perf_counter() - t0
    for _ in range(9):
        stats = sim.step(dt)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            stats = sim.step(dt)
        best = min(best, (time.perf_counter() - t0) / steps)
    return dict(
        variant=variant, res=res, step_ms=round(best * 1e3, 2),
        newton=int(stats.newton_iters), cg=int(stats.cg_iters),
        compile_s=round(compile_s, 1), backend=jax.default_backend(),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", choices=VARIANTS)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--dt", type=float, default=2e-3)
    ap.add_argument("--timeout", type=float, default=1200.0)
    args = ap.parse_args()
    if args.one:
        print(json.dumps(run_one(args.one, args.res, args.steps, args.dt)),
              flush=True)
        return
    results = []
    for v in VARIANTS:
        cmd = [sys.executable, os.path.abspath(__file__), "--one", v,
               "--res", str(args.res), "--steps", str(args.steps),
               "--dt", str(args.dt)]
        print(f"[phase] running {v} ...", file=sys.stderr, flush=True)
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
                                tail=out.stderr.strip().splitlines()[-6:]))
        else:
            results.append(json.loads(line[-1]))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
