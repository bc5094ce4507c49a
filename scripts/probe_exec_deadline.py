"""Minimal reproducer probe: does THIS device/tunnel kill long single
executions?

Round-2/3 observation: the assembled-MG step (mg_asm) compiles and its
FIRST step executes, but any step with >= 3 Newton iterations faults the
device (UNAVAILABLE) — duration-correlated, reproduced with Pallas off,
solo process, and now ALSO with the scatter-free RAP (round 3), killing
the colliding-scatter hypothesis. This script times single XLA executions
of increasing wall-clock duration (a fori_loop of matmuls — no scatters,
no Pallas, no MG code) to find the per-execution deadline, if any.

Usage: python scripts/probe_exec_deadline.py [--max 300]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def make_burn(n_iters: int):
    @jax.jit
    def burn(x):
        def body(_, x):
            return jnp.tanh(x @ x) * 0.999 + 1e-3

        return jax.lax.fori_loop(0, n_iters, body, x)

    return burn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max", type=float, default=300.0,
                    help="give up beyond this many seconds per execution")
    ap.add_argument("--size", type=int, default=4096)
    args = ap.parse_args()

    x = jnp.ones((args.size, args.size), jnp.float32) * 1e-3

    # calibrate: time 200 iterations
    f = make_burn(200)
    y = f(x)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    y = f(x * 1.000001)
    float(jnp.sum(y))
    per_iter = (time.perf_counter() - t0) / 200
    print(f"calibration: {per_iter * 1e3:.3f} ms/iter", flush=True)

    target = 2.0
    while target <= args.max:
        n = max(int(target / per_iter), 1)
        f = make_burn(n)
        t0 = time.perf_counter()
        try:
            y = f(x * (1.0 + target * 1e-7))
            s = float(jnp.sum(y))
            el = time.perf_counter() - t0
            print(f"exec ~{target:.0f}s ({n} iters): OK in {el:.1f}s "
                  f"(sum={s:.3e})", flush=True)
        except Exception as e:  # noqa: BLE001
            el = time.perf_counter() - t0
            print(f"exec ~{target:.0f}s ({n} iters): FAILED after {el:.1f}s "
                  f"— {type(e).__name__}: {str(e)[:200]}", flush=True)
            sys.exit(1)
        target *= 2.0


if __name__ == "__main__":
    main()
