"""TPU A/B: supertile SpMV vs transposed-lane Pallas SpMV (chained protocol)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hot_tpu.grid import sparse as sparse_mod
from hot_tpu.ops import bsr as bsr_mod
from hot_tpu.ops import bsr_tiled, transfer
from hot_tpu.ops import transfer as tr
from hot_tpu.scenes import build_scene
from hot_tpu.sim import objective as obj_mod

res_n = int(os.environ.get("RES", "64"))
scene = build_scene("twisting_bar_3d", res=res_n, ppc=8)
cfg, state, model = scene["cfg"], scene["state"], scene["model"]
res = cfg.grid_res[:3]
n_nodes = transfer.n_nodes_of(res)
dt = jnp.float32(2e-3)
st = jax.jit(lambda x: transfer.particle_stencil(x, cfg.dx, res))(state.x)
gm, _ = jax.jit(lambda st, v, C, m: transfer.p2g_mass_momentum(st, v, C, m, n_nodes))(
    st, state.v, state.C, state.m)
obj = jax.jit(lambda: obj_mod.make_objective(
    model, st, state.F, state.V0, state.mu, state.lam, gm,
    jnp.zeros((n_nodes, 3), jnp.float32),
    jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n_nodes, 3, 3)), dt, cfg.dx))()
hess = jax.jit(lambda: obj_mod.build_hessian(model, obj, jnp.zeros((n_nodes, 3), jnp.float32)))()

probe = sparse_mod.build_tile_grid(state.x, cfg.dx, res, capacity=4096)
t_cap = int(((int(probe.n_active) + 255) // 256 + 1) * 256)
tgrid = sparse_mod.build_tile_grid(state.x, cfg.dx, res, capacity=t_cap)
tmat = bsr_tiled.structure_tiled(tgrid)
tmat = jax.jit(lambda m_: bsr_mod.assemble_hessian(m_, st, state.F, hess.ctx, state.V0, dt, gm))(tmat)
nbr = bsr_tiled.tile_neighbors(tgrid)
block_nnz = int(jax.jit(lambda m_: m_.block_nnz)(tmat))
R = tgrid.capacity * tgrid.tile_nodes
print(f"tiles={int(tgrid.n_active)}/{t_cap} R={R} block_nnz={block_nnz}", flush=True)

valsT = jax.jit(lambda m_: bsr_tiled.transpose_vals(m_, 3))(tmat)
idx2 = jax.jit(lambda n_: bsr_tiled.build_gather_index(tgrid, n_))(nbr)
jax.block_until_ready((valsT, idx2))

def roundtrip():
    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones((8,), jnp.float32)
    float(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x * 1.0))
        best = min(best, time.perf_counter() - t0)
    return best

RT = roundtrip()
print(f"roundtrip {RT*1e3:.2f} ms", flush=True)

def norm(y):
    return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

def timeit(name, fn, warm, reps=20, trials=3):
    s = fn(warm)
    float(jnp.sum(s))
    best = float("inf")
    for _ in range(trials):
        s = warm
        t0 = time.perf_counter()
        for _ in range(reps):
            s = fn(s)
        float(jnp.sum(s))
        best = min(best, (time.perf_counter() - t0 - RT) / reps)
    nnz = block_nnz * 9
    print(f"{name:24s} {best*1e3:8.3f} ms  {nnz/best/1e9:7.2f}e9 nnz/s", flush=True)
    return best

x_rows = jnp.asarray(np.random.default_rng(0).standard_normal((R, 3)), jnp.float32)

f_tiled = jax.jit(lambda y: norm(bsr_tiled.spmv_tiled(tmat, tgrid, nbr, y)))
timeit("supertile (landed)", f_tiled, x_rows)

for chunk in (1024, 2048, 4096, 8192):
    f_T = jax.jit(lambda y, c=chunk: norm(bsr_tiled.spmv_T(valsT, idx2, y, chunk=c)))
    timeit(f"transposed pallas c={chunk}", f_T, x_rows.T)

# equality check on TPU
y_a = np.asarray(f_tiled(x_rows))
y_b = np.asarray(f_T(x_rows.T)).T
print("rel err:", np.abs(y_a - y_b).max() / max(np.abs(y_a).max(), 1e-30), flush=True)
