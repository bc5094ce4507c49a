"""Micro-benchmark: tile-BSR SpMV formulations on the real TPU.

Compares window-extraction strategies for the supertile SpMV
(ops.bsr_tiled) — the per-op overhead on this device (~0.5-1 ms/op)
dominates any formulation with O(K) separate HLO ops, so the contest is
between single-op window extractions.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time
import numpy as np
import jax
import jax.numpy as jnp

from hot_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

T, tile, d = 384, 4, 3
tn = tile**3
K = 125
S = tile + 4  # supertile edge

rng = np.random.default_rng(0)
vals = jnp.asarray(rng.standard_normal((T, tn, K, d, d)), jnp.float32)
x8 = jnp.asarray(rng.standard_normal((T, S, S, S, d)), jnp.float32)

offs = np.stack(np.meshgrid(*([np.arange(5)] * 3), indexing="ij"), -1).reshape(-1, 3)


def loop_einsum(vals, x8):
    y = jnp.zeros((T, tn, d), jnp.float32)
    for k in range(K):
        a, b, c = (int(o) for o in offs[k])
        win = x8[:, a:a + tile, b:b + tile, c:c + tile].reshape(T, tn, d)
        y = y + jnp.einsum("tnij,tnj->tni", vals[:, :, k], win)
    return y


# static index map: window element (l, k) -> supertile flat index
lidx = np.stack(np.meshgrid(*([np.arange(4)] * 3), indexing="ij"), -1).reshape(-1, 3)
sup_idx = ((lidx[:, None, :] + offs[None, :, :]) * np.array([S * S, S, 1])).sum(-1)
sup_idx_j = jnp.asarray(sup_idx.reshape(-1), jnp.int32)  # (tn*K,)


def gather_einsum(vals, x8):
    xf = x8.reshape(T, S**3, d)
    xw = xf[:, sup_idx_j]                     # ONE static-index gather
    xw = xw.reshape(T, tn, K, d)
    return jnp.einsum("tnkij,tnkj->tni", vals, xw)


def patches_einsum(vals, x8):
    # lhs NCDHW
    lhs = x8.transpose(0, 4, 1, 2, 3)
    p = jax.lax.conv_general_dilated_patches(
        lhs, filter_shape=(5, 5, 5), window_strides=(1, 1, 1), padding="VALID",
    )  # (T, d*125, 4, 4, 4), channels ordered (C, *filter positions)
    p = p.reshape(T, d, K, tn).transpose(0, 3, 2, 1)   # (T, tn, K, d)
    return jnp.einsum("tnkij,tnkj->tni", vals, p)


def onehot_matmul(vals, x8):
    # window extraction as an MXU matmul with a one-hot selection matrix
    sel = jnp.zeros((S**3, tn * K), jnp.float32).at[sup_idx_j, jnp.arange(tn * K)].set(1.0)
    xf = x8.reshape(T, S**3, d)
    xw = jnp.einsum("tud,uk->tkd", xf, sel).reshape(T, tn, K, d)
    return jnp.einsum("tnkij,tnkj->tni", vals, xw)


def timeit(name, fn):
    f = jax.jit(fn)
    y = f(vals, x8)
    jax.block_until_ready(y)
    best = float("inf")
    state = x8
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            y = f(vals, state)
            state = state * 0.999  # vary input to defeat result cache
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{name:18s} {best * 1e3:8.3f} ms")
    return np.asarray(y)


y0 = timeit("loop_einsum", loop_einsum)
y1 = timeit("gather_einsum", gather_einsum)
y2 = timeit("patches_einsum", patches_einsum)
y3 = timeit("onehot_matmul", onehot_matmul)
for nm, y in [("gather", y1), ("patches", y2), ("onehot", y3)]:
    err = np.abs(y - y0).max() / (np.abs(y0).max() + 1e-30)
    print(f"  {nm} rel err vs loop: {err:.2e}")
