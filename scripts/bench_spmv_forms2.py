"""Bisect the tile-SpMV cost on the REAL device with a sync-proof protocol.

Measured on this machine: block_until_ready through the axon tunnel can
return before execution completes, and a host->device->host round trip
costs ~3.6 ms regardless of payload. Protocol: chain N data-DEPENDENT
executions (device must run them serially), force completion with a
scalar readback, subtract the measured round-trip, divide by N.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

T, tile, d = 384, 4, 3
tn = tile**3
K = 125
S = tile + 4

rng = np.random.default_rng(0)
vals = jnp.asarray(rng.standard_normal((T, tn, K, d, d)), jnp.float32)
x0 = jnp.asarray(rng.standard_normal((T * tn, d)), jnp.float32)

lidx = np.stack(np.meshgrid(*([np.arange(4)] * 3), indexing="ij"), -1).reshape(-1, 3)
offs = np.stack(np.meshgrid(*([np.arange(5)] * 3), indexing="ij"), -1).reshape(-1, 3)
sup_idx = ((lidx[:, None, :] + offs[None, :, :]) * np.array([S * S, S, 1])).sum(-1)
sup_idx_j = jnp.asarray(sup_idx.reshape(-1), jnp.int32)

# fake supertile assembly: just embed rows into (T, S^3, d) by static pad
# (here we time CONTRACTION forms only; x8 derived from x to keep the chain
# data-dependent)


def to_x8(x):
    xt = x.reshape(T, tile, tile, tile, d)
    pad = ((0, 0), (2, 2), (2, 2), (2, 2), (0, 0))
    return jnp.pad(xt, pad)


def norm(y):
    # renormalize so the chain neither explodes nor vanishes
    return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)


def gather_einsum(x):
    x8 = to_x8(x)
    xf = x8.reshape(T, S**3, d)
    xw = xf[:, sup_idx_j].reshape(T, tn, K, d)
    y = jnp.einsum("tnkij,tnkj->tni", vals, xw)
    return norm(y.reshape(T * tn, d))


def loop_einsum(x):
    x8 = to_x8(x)
    y = jnp.zeros((T, tn, d), jnp.float32)
    for k in range(K):
        a, b, c = (int(o) for o in offs[k])
        win = x8[:, a:a + tile, b:b + tile, c:c + tile].reshape(T, tn, d)
        y = y + jnp.einsum("tnij,tnj->tni", vals[:, :, k], win)
    return norm(y.reshape(T * tn, d))


def elemwise_reduce(x):
    x8 = to_x8(x)
    xf = x8.reshape(T, S**3, d)
    xw = xf[:, sup_idx_j].reshape(T, tn, K, d)
    y = jnp.sum(vals * xw[:, :, :, None, :], axis=(2, 4))
    return norm(y.reshape(T * tn, d))


def patches_einsum(x):
    x8 = to_x8(x)
    lhs = x8.transpose(0, 4, 1, 2, 3)
    p = jax.lax.conv_general_dilated_patches(
        lhs, filter_shape=(5, 5, 5), window_strides=(1, 1, 1), padding="VALID",
    )
    p = p.reshape(T, d, K, tn).transpose(0, 3, 2, 1)
    y = jnp.einsum("tnkij,tnkj->tni", vals, p)
    return norm(y.reshape(T * tn, d))


def roundtrip():
    f = jax.jit(lambda x: jnp.sum(x))
    float(f(x0))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x0 * 1.0))
        best = min(best, time.perf_counter() - t0)
    return best


RT = roundtrip()
print(f"roundtrip {RT*1e3:.3f} ms", flush=True)


def timeit(name, fn, reps=20):
    f = jax.jit(fn)
    s = f(x0)
    float(jnp.sum(s))                      # compile + settle
    best = float("inf")
    for _ in range(3):
        s = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            s = f(s)
        float(jnp.sum(s))
        dt = (time.perf_counter() - t0 - RT) / reps
        best = min(best, dt)
    print(f"{name:18s} {best * 1e3:8.3f} ms", flush=True)
    return np.asarray(s)


y0 = timeit("loop_einsum", loop_einsum)
y1 = timeit("gather_einsum", gather_einsum)
y2 = timeit("elemwise_reduce", elemwise_reduce)
y3 = timeit("patches_einsum", patches_einsum)
for nm, y in [("gather", y1), ("elemwise", y2), ("patches", y3)]:
    print(f"  {nm} rel err vs loop: {np.abs(y - y0).max() / np.abs(y0).max():.2e}")
