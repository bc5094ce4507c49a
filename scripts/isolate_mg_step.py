"""Bisect the mg_asm FULL-STEP device fault by stripping step pieces.

The standalone MG newton core (binned transfers, assembled levels, direct
coarse) runs on the device; the full advance_one_step faults. This script
jits the REAL advance_one_step with the mg_asm config, optionally in
reduced forms, to find the faulting piece.

Usage: python scripts/isolate_mg_step.py [--mode full|sim]
  full — jit advance_one_step directly with host-chosen caps
  sim  — drive through Simulation (identical to bench_mg_ab)
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from hot_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hot_tpu.scenes import build_scene
from hot_tpu.utils.config import MultigridConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--mode", default="full")
    ap.add_argument("--max-newton", type=int, default=10)
    ap.add_argument("--max-cg", type=int, default=200)
    ap.add_argument("--coarse", default="direct")
    ap.add_argument("--coarsening", default="galerkin")
    args = ap.parse_args()

    scene = build_scene("twisting_bar_3d", res=args.res, ppc=8)
    cfg, state = scene["cfg"], scene["state"]
    mg = MultigridConfig(levels=args.levels, smoother="chebyshev",
                         coarse_solver=args.coarse, assembled=True,
                         coarsening=args.coarsening)
    sol = dataclasses.replace(cfg.solver, preconditioner="multigrid",
                              multigrid=mg, pallas_apply=False,
                              pallas_linearize=False,
                              max_newton=args.max_newton, max_cg=args.max_cg)
    cfg = dataclasses.replace(cfg, solver=sol)
    dt = jnp.asarray(2e-3, state.x.dtype)

    if args.mode == "sim":
        from hot_tpu.sim.simulation import Simulation

        sim = Simulation(cfg, state, scene["model"], scene["colliders"])
        t0 = time.perf_counter()
        stats = sim.step(float(dt))
        print(f"[step 1] ok in {time.perf_counter() - t0:.1f}s "
              f"newton={int(stats.newton_iters)} cg={int(stats.cg_iters)}",
              flush=True)
        for i in range(4):
            t0 = time.perf_counter()
            stats = sim.step(float(dt))
            ev = [r for r in sim.metrics.records if r.get("event")]
            print(f"[step {i + 2}] {time.perf_counter() - t0:.2f}s "
                  f"newton={int(stats.newton_iters)} cg={int(stats.cg_iters)} "
                  f"events={[e['event'] for e in ev]}",
                  flush=True)
        return

    import functools

    from hot_tpu.sim.simulation import Simulation, advance_one_step

    # host-side caps exactly as Simulation chooses them
    from hot_tpu.sim import capacity

    plan = capacity.plan_capacities(cfg, state.x)
    bin_caps = plan.bin_caps
    mg_tile_caps = plan.mg_tile_caps
    mg_coarse_cap = plan.mg_coarse_cap
    mg_bin_caps = plan.mg_bin_caps
    print(f"[info] bin_caps={bin_caps} tile_caps={mg_tile_caps} "
          f"ccap={mg_coarse_cap} mg_bin_caps={mg_bin_caps}", flush=True)

    step = jax.jit(functools.partial(
        advance_one_step, cfg=cfg, model=scene["model"],
        colliders=scene["colliders"], plasticity=None, bin_caps=bin_caps,
        mg_tile_caps=mg_tile_caps, mg_coarse_cap=mg_coarse_cap,
        mg_bin_caps=mg_bin_caps,
    ))
    t0 = time.perf_counter()
    new_state, stats = step(state, dt, jnp.float32(0.0))
    jax.block_until_ready(new_state.x)
    print(f"[full step] ok in {time.perf_counter() - t0:.1f}s "
          f"newton={int(stats.newton_iters)} cg={int(stats.cg_iters)}",
          flush=True)
    for i in range(4):
        t0 = time.perf_counter()
        new_state, stats = step(new_state, dt, jnp.float32((i + 1) * 2e-3))
        jax.block_until_ready(new_state.x)
        print(f"[full step {i + 2}] {time.perf_counter() - t0:.2f}s "
              f"newton={int(stats.newton_iters)} cg={int(stats.cg_iters)}",
              flush=True)


if __name__ == "__main__":
    main()
