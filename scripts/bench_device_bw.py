"""Calibrate this device: copy bandwidth vs size — with forced host readback.

The axon tunnel's block_until_ready can return before execution completes,
and identical (program, input) executions are result-cached (see
docs/KERNEL_PLAN.md). Protocol here: vary inputs per rep from a
precomputed pool, reduce output to a scalar ON DEVICE, and fetch that
scalar to host — the fetch cannot complete before the work does.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)


def timeit(name, f, xs, bytes_moved, reps=6):
    # warm
    s = f(xs[0])
    float(s)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(reps):
            s = f(xs[i % len(xs)])
        v = float(s)          # host readback forces completion
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:24s} {best*1e3:9.3f} ms  ({bytes_moved/best/1e9:8.2f} GB/s)",
          flush=True)


rng = np.random.default_rng(0)
for mb in [8, 64, 256]:
    n = mb * 1024 * 1024 // 4
    xs = [jnp.asarray(rng.standard_normal((n,)), jnp.float32) for _ in range(6)]
    # copy + checksum: read n, write n, read n (checksum) -> ~3n bytes
    f = jax.jit(lambda x: jnp.sum(x * 1.0000001))
    timeit(f"scale+sum {mb:4d} MB", f, xs, 2 * n * 4)

# matmul with readback
for sz in [2048, 4096]:
    a_list = [jnp.asarray(rng.standard_normal((sz, sz)), jnp.bfloat16) for _ in range(6)]
    mm = jax.jit(lambda x: jnp.sum((x @ x).astype(jnp.float32)))
    s = mm(a_list[0]); float(s)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(6):
            s = mm(a_list[i % 6])
        float(s)
        best = min(best, (time.perf_counter() - t0) / 6)
    print(f"matmul {sz}^3 bf16        {best*1e3:9.3f} ms  ({2*sz**3/best/1e12:6.2f} TFLOP/s)",
          flush=True)
