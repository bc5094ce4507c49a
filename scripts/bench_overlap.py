"""Halo-overlap A/B: sharded-step steps/s with overlap_halo on vs off.

Part of the >=70% scaling-efficiency protocol (BASELINE.json:5,
hot_tpu/parallel/distributed.py): run at each device count. On the
CPU-simulated mesh the numbers are NOT indicative (no ICI); the run
validates the protocol + program. On a real slice, overlap should win
once ICI/DCN latency is a visible fraction of the CG iteration.

Usage:
  python scripts/bench_overlap.py --devices 8        # CPU-simulated mesh
  python scripts/bench_overlap.py --devices 4 --tpu  # real slice
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if os.environ.get("HOT_OVERLAP_CHILD") is None:
        # subprocess + retry wrapper: the CPU in-process collective
        # rendezvous can abort the process (parallel.mesh.loop_mesh_width)
        import subprocess

        for attempt in range(3):
            env = dict(os.environ, HOT_OVERLAP_CHILD="1")
            pr = subprocess.run([sys.executable, os.path.abspath(__file__)]
                                + sys.argv[1:], env=env)
            if pr.returncode == 0:
                return
            print(f"[overlap] attempt {attempt} rc={pr.returncode}",
                  file=sys.stderr, flush=True)
        sys.exit(1)
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dt", type=float, default=1e-3)
    ap.add_argument("--tpu", action="store_true",
                    help="use real devices (default: CPU-simulated mesh)")
    ap.add_argument("--out", default=None,
                    help="write one JSON row per variant (jsonl)")
    args = ap.parse_args()

    if not args.tpu:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from hot_tpu.parallel.distributed import initialize, mesh_from_config
    from hot_tpu.parallel.sharded_step import make_sharded_step
    from hot_tpu.scenes import build_scene, stress_state
    from hot_tpu.utils.config import MeshConfig

    initialize()
    mesh = mesh_from_config(MeshConfig(axes=("x",), shape=(args.devices,)))

    scene = build_scene("twisting_bar_3d", res=args.res, ppc=4)
    results = []
    for ov in (False, True):
        cfg = dataclasses.replace(
            scene["cfg"],
            solver=dataclasses.replace(scene["cfg"].solver, overlap_halo=ov),
        )
        step = make_sharded_step(
            mesh, cfg, scene["model"], scene["colliders"],
            n_max=scene["state"].n,
        )
        # stressed initial state (VERDICT r3 weak #2: the rest-state
        # overlap record ran cg=0 — the halo-overlap code never executed
        # in the run whose purpose was to measure it)
        state = stress_state(scene["state"], cfg)
        t = 0.0
        # compile + warm
        state, stats = step(state, jnp.float32(args.dt), jnp.float32(t))
        jax.block_until_ready(state.x)
        t += args.dt
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, stats = step(state, jnp.float32(args.dt), jnp.float32(t))
            t += args.dt
        jax.block_until_ready(state.x)
        dt_step = (time.perf_counter() - t0) / args.steps
        assert int(stats.cg_iters) >= 1, (
            "overlap protocol ran no CG — stressed state failed to "
            "produce a real solve")
        results.append(dict(
            overlap=ov, devices=args.devices, res=args.res,
            steps_per_sec=round(1.0 / dt_step, 4),
            step_ms=round(dt_step * 1e3, 2),
            cg=int(stats.cg_iters), newton=int(stats.newton_iters),
            backend=jax.default_backend(),
        ))
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps(results, indent=2), file=sys.stderr)
    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
