"""Config-5-class single-chip run: >=256^3 sparse grid, 2M+ particles
(VERDICT r1 #4's composition: sparse backend x tile-binned transfers x
assembled Galerkin MG).

Memory shape at 256^3 (docs/KERNEL_PLAN.md "TPU layout hazard" rules):
  * finest level stays MATRIX-FREE (its explicit BSR is ~8.7 GB);
    multigrid.assembled_from_level=1 assembles levels 1+ only — level 1
    quadrature-built, deeper levels Galerkin RAP from it;
  * level 1 stays tile-COMPACT (sparse_dense_switch default), the
    dense tail (64^3 down) reuses the dense machinery + direct coarse.

Variants (each in its own subprocess):
  jacobi — block-Jacobi PCG, matrix-free binned (the single-chip default)
  mg     — matrix-free finest + assembled Galerkin MG-PCG

Usage: python scripts/bench_sparse_large.py [--res 256] [--ppc 8] [--steps 3]
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

VARIANTS = ("jacobi", "mg")


def run_one(variant: str, res: int, ppc: int, steps: int, dt: float,
            levels: int) -> dict:
    import jax
    import jax.numpy as jnp

    from hot_tpu.scenes import build_scene
    from hot_tpu.sim.simulation import Simulation
    from hot_tpu.utils.cache import enable_compilation_cache
    from hot_tpu.utils.config import config_from_overrides

    enable_compilation_cache()
    scene = build_scene("twisting_bar_3d", res=res, ppc=ppc)
    over = {
        "grid_backend": "sparse",
        "tile_capacity": 0,  # filled below from the particle layout
        "transfer_impl": "binned",
        # diagnostics-only SVD sweep costs ~2 GB/M particles in padded
        # scatter buffers (cfg.compute_energy docstring)
        "compute_energy": False,
    }
    if variant == "mg":
        over.update({
            "solver.preconditioner": "multigrid",
            "solver.multigrid.levels": levels,
            "solver.multigrid.assembled": True,
            "solver.multigrid.assembled_from_level": 1,
            "solver.multigrid.coarse_solver": "direct",
        })
    else:
        over["solver.preconditioner"] = "block_jacobi"
    cfg = config_from_overrides(scene["cfg"], over)

    # host-side tile-capacity probe (same activation rule as the grid)
    import numpy as np

    x = np.asarray(scene["state"].x)
    t_count = Simulation._tile_count(
        x, np.asarray(cfg.grid_res[:3]), cfg.dx, 3
    )
    cfg = dataclasses.replace(cfg, tile_capacity=int(1.3 * t_count + 64))

    sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
    # tiny-dt warm-up (round-3 protocol): 1-Newton executions stay under
    # the ~60 s device deadline while the post-compile re-opt retires
    t0 = time.perf_counter()
    stats = sim.step(dt / 200.0)
    compile_s = time.perf_counter() - t0
    for _ in range(7):
        stats = sim.step(dt / 200.0)
    for _ in range(2):
        stats = sim.step(dt)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            stats = sim.step(dt)
        best = min(best, (time.perf_counter() - t0) / steps)
    try:
        mem = jax.devices()[0].memory_stats() or {}
        peak_gb = round(mem.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:  # noqa: BLE001
        peak_gb = None
    return dict(
        variant=variant, res=res,
        n_particles=int(sim.state.n),
        active_tiles=int(stats.active_tiles),
        active_nodes=int(stats.active_nodes),
        steps_per_sec=round(1.0 / best, 4),
        step_s=round(best, 2),
        newton=int(stats.newton_iters),
        cg=int(stats.cg_iters),
        converged=bool(stats.converged),
        retries=sim.retry_count,
        peak_hbm_gb=peak_gb,
        compile_s=round(compile_s, 1),
        backend=jax.default_backend(),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", choices=VARIANTS)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--ppc", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--dt", type=float, default=1e-3)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--timeout", type=float, default=3600.0)
    args = ap.parse_args()
    if args.one:
        print(json.dumps(run_one(args.one, args.res, args.ppc, args.steps,
                                 args.dt, args.levels)), flush=True)
        return
    results = []
    for v in VARIANTS:
        cmd = [sys.executable, os.path.abspath(__file__), "--one", v,
               "--res", str(args.res), "--ppc", str(args.ppc),
               "--steps", str(args.steps), "--dt", str(args.dt),
               "--levels", str(args.levels)]
        print(f"[large] running {v} ...", file=sys.stderr, flush=True)
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
