"""Slot-path hot-op decomposition with the sync-proof timing protocol.

Times grid->grid composites (chainable, data-dependent) for the implicit
solve's inner loop on the twisting bar: the slot-major multiply (XLA and
Pallas-fused), the legacy binned particle-order multiply, and the
linearize. Subtracts the measured host round trip.

Usage: python scripts/profile_slot_path.py [res]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from hot_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hot_tpu.ops import transfer
from hot_tpu.scenes import build_scene
from hot_tpu.sim import objective as obj_mod
from hot_tpu.sim.simulation import Simulation


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


def chain_time(name, fn, x0, rt, reps=12, trials=3):
    f = jax.jit(fn)
    s = f(x0)
    float(jnp.sum(s))
    best = float("inf")
    for _ in range(trials):
        s = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            s = f(s)
        float(jnp.sum(s))
        best = min(best, (time.perf_counter() - t0 - rt) / reps)
    print(f"{name:34s} {best * 1e3:9.3f} ms", flush=True)
    return best


def main():
    res_n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    scene = build_scene("twisting_bar_3d", res=res_n, ppc=8)
    cfg, model = scene["cfg"], scene["model"]
    sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
    for _ in range(3):
        sim.step(2e-3)
    state = sim.state
    dim = cfg.dim
    dtype = state.x.dtype
    dt = jnp.asarray(2e-3, dtype)
    res = cfg.grid_res[:dim]
    n_nodes = transfer.n_nodes_of(res)
    n = state.n
    caps = sim._plan.bin_caps or (max(1024, n // 4), 16)
    print(f"res={res_n} particles={n} caps={caps} slots={caps[0]*caps[1]}",
          flush=True)
    rt = roundtrip()
    print(f"roundtrip {rt*1e3:.2f} ms", flush=True)

    st = jax.jit(lambda x: transfer.particle_stencil(x, cfg.dx, res))(state.x)
    bins = jax.jit(
        lambda x: transfer.bin_particles(x, cfg.dx, res, caps[0], caps[1])
    )(state.x)

    # slot arrays (as the step builds them)
    eye_d = jnp.eye(dim, dtype=dtype)

    @jax.jit
    def build_slots(state, st):
        (F_s, V0_s, mu_s, lam_s, wn_s, gwn_s, rel_s), valid = transfer.slot_order(
            bins, [state.F, state.V0[:, None], state.mu[:, None],
                   state.lam[:, None], st.wn, st.gwn, st.rel]
        )
        F_s = jnp.where(valid[:, None, None], F_s, eye_d[None])
        return F_s, V0_s[:, 0], mu_s[:, 0], lam_s[:, 0], wn_s, gwn_s, rel_s

    F_s, V0_s, mu_s, lam_s, wn_s, gwn_s, rel_s = build_slots(state, st)
    sol_st = transfer.Stencil(node_ids=jnp.zeros(wn_s.shape, jnp.int32),
                              wn=wn_s, gwn=gwn_s, rel=rel_s)
    slot_scatter = transfer.make_slot_scatter(bins, res)
    slot_gather = transfer.make_slot_gather(bins, res)
    binned_scatter = transfer.make_binned_scatter(bins, res)
    binned_gather = transfer.make_binned_gather(bins, res)

    gm = slot_scatter(sol_st, wn_s * 1.0, n_nodes)
    active = gm > 0
    vg0 = jnp.asarray(np.random.default_rng(0).standard_normal((n_nodes, dim)),
                      dtype)

    def renorm(y):
        return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

    with jax.default_matmul_precision("highest"):
        # linearization contexts
        obj_slot = obj_mod.make_objective(
            model, sol_st, F_s, V0_s, mu_s, lam_s, gm, vg0 * 0,
            jnp.broadcast_to(eye_d, (n_nodes, dim, dim)), dt, cfg.dx,
            scatter=slot_scatter,
        )
        obj_part = obj_mod.make_objective(
            model, st, state.F, state.V0, state.mu, state.lam, gm, vg0 * 0,
            jnp.broadcast_to(eye_d, (n_nodes, dim, dim)), dt, cfg.dx,
            scatter=binned_scatter,
        )
        hess_slot = jax.jit(lambda v: obj_mod.build_hessian(
            model, obj_slot, v, gather_st=slot_gather))(vg0)
        hess_part = jax.jit(lambda v: obj_mod.build_hessian(
            model, obj_part, v, gather_st=binned_gather))(vg0)
        float(jnp.sum(hess_slot.ctx.U)); float(jnp.sum(hess_part.ctx.U))

        # transfer round trips
        chain_time("slot gather+scatter roundtrip",
                   lambda v: renorm(slot_scatter(
                       sol_st, slot_gather(sol_st, v), n_nodes)), vg0, rt)
        chain_time("binned gather+scatter roundtrip",
                   lambda v: renorm(binned_scatter(
                       st, binned_gather(st, v), n_nodes)), vg0, rt)

        # full multiplies
        for nm, fused in [("xla", False), ("pallas", True)]:
            chain_time(f"multiply slot {nm}",
                       lambda v, fused=fused: renorm(obj_mod.multiply(
                           obj_slot, hess_slot, v, scatter=slot_scatter,
                           gather_st=slot_gather, fused=fused)), vg0, rt)
        for nm, fused in [("xla", False), ("pallas", True)]:
            chain_time(f"multiply binned {nm}",
                       lambda v, fused=fused: renorm(obj_mod.multiply(
                           obj_part, hess_part, v, scatter=binned_scatter,
                           gather_st=binned_gather, fused=fused)), vg0, rt)

        # linearize (per Newton iteration)
        for nm, fused in [("xla", False), ("pallas", True)]:
            chain_time(f"linearize slot {nm}",
                       lambda v, fused=fused: renorm(obj_mod.linearize(
                           model, obj_slot, v, scatter=slot_scatter,
                           gather_st=slot_gather, fused=fused)[0]), vg0, rt)

        # block-diag preconditioner build (per Newton iteration)
        chain_time("block_diag slot (per newton)",
                   lambda v: renorm(jnp.sum(obj_mod.elastic_block_diag(
                       sol_st, F_s, hess_slot.ctx, V0_s, dt, gm, active, dim,
                       scatter=slot_scatter), axis=-1) + v[:, :dim]), vg0, rt)


if __name__ == "__main__":
    main()
