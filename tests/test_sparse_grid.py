"""Sparse tile-grid tests: activation correctness, compacted-id transfer
equivalence with the dense backend, end-to-end trajectory equality
(SURVEY.md §7 stage-2 acceptance style).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hot_tpu.grid import sparse as sp
from hot_tpu.ops import transfer
from hot_tpu.scenes import build_scene
from hot_tpu.sim import Simulation
from hot_tpu.utils.config import config_from_overrides


def test_activation_covers_all_stencil_tiles(rng):
    res = (64, 64)
    dx = 1.0 / 64
    x = jnp.asarray(rng.uniform(3 * dx, 60 * dx, (200, 2)))
    g = sp.build_tile_grid(x, dx, res, capacity=256)
    assert not bool(g.overflow)
    # every stencil node of every particle must land in an active tile
    st = sp.sparse_stencil(x, dx, g)
    assert bool(jnp.all(st.node_ids < g.dump)), "stencil node hit the dump slot"


def test_sparse_dense_p2g_equal(rng):
    res = (48, 48)
    dx = 1.0 / 48
    n = 300
    x = jnp.asarray(rng.uniform(3 * dx, 44 * dx, (n, 2)))
    v = jnp.asarray(rng.standard_normal((n, 2)))
    C = jnp.asarray(rng.standard_normal((n, 2, 2)))
    m = jnp.asarray(rng.uniform(0.5, 2.0, (n,)))

    std = transfer.particle_stencil(x, dx, res)
    gm_d, gmv_d = transfer.p2g_mass_momentum(std, v, C, m, transfer.n_nodes_of(res))

    g = sp.build_tile_grid(x, dx, res, capacity=256)
    sts = sp.sparse_stencil(x, dx, g)
    gm_s, gmv_s = transfer.p2g_mass_momentum(sts, v, C, m, g.n_cnodes)
    gm_sd = sp.compact_to_dense(g, gm_s[:, None])[:, 0]
    gmv_sd = sp.compact_to_dense(g, gmv_s)

    np.testing.assert_allclose(gm_sd, gm_d, atol=1e-12)
    np.testing.assert_allclose(gmv_sd, gmv_d, atol=1e-12)


def test_overflow_flag(rng):
    res = (64, 64)
    dx = 1.0 / 64
    x = jnp.asarray(rng.uniform(3 * dx, 60 * dx, (500, 2)))
    g = sp.build_tile_grid(x, dx, res, capacity=4)
    assert bool(g.overflow)


def test_sparse_backend_matches_dense_trajectory():
    """Full sim: sparse and dense backends produce identical (f64) paths,
    with both Jacobi and multigrid preconditioners."""
    for precon in ("jacobi", "multigrid"):
        states = {}
        cg = {}
        for backend in ("dense", "sparse"):
            scene = build_scene("block_drop_2d", res=32, dtype=jnp.float64)
            cfg = config_from_overrides(
                scene["cfg"],
                {
                    "grid_backend": backend,
                    "tile_capacity": 128,
                    "solver.preconditioner": precon,
                    "solver.multigrid.levels": 2,
                },
            )
            sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
            for _ in range(70):
                sim.step(4e-3)
            states[backend] = np.asarray(sim.state.x)
            cg[backend] = sum(r["cg_iters"] for r in sim.metrics.records)
            assert all(r["converged"] for r in sim.metrics.records)
        np.testing.assert_allclose(
            states["sparse"], states["dense"], atol=1e-10,
            err_msg=f"preconditioner={precon}, cg={cg}",
        )


def test_sparse_3d_runs():
    scene = build_scene("twisting_bar_3d", res=32, ppc=4)
    cfg = config_from_overrides(
        scene["cfg"], {"grid_backend": "sparse", "tile_capacity": 512}
    )
    sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
    for _ in range(3):
        stats = sim.step(1e-3)
    assert bool(jnp.all(jnp.isfinite(sim.state.x)))
    assert int(stats.active_tiles) > 0


def test_tile_binned_scatter_gather_match(rng):
    """Tile-local binned transfers (ops.tile_transfer) == plain compacted
    scatter_sum/gather for both 2D and 3D random particle sets."""
    from hot_tpu.ops import bsr_tiled, tile_transfer

    for dim, res_n, n in ((2, 32, 400), (3, 16, 300)):
        res = (res_n,) * dim
        dx = 1.0 / res_n
        lo, hi = 2.5 * dx, (res_n - 3.5) * dx
        x = jnp.asarray(rng.uniform(lo, hi, size=(n, dim)))
        tg = sp.build_tile_grid(x, dx, res, capacity=256)
        assert not bool(tg.overflow)
        st = sp.sparse_stencil(x, dx, tg)
        nbr = bsr_tiled.tile_neighbors(tg)
        bins = tile_transfer.sparse_bins(x, dx, tg, cells_cap=512, cap=32)
        assert not bool(bins.overflow)

        s = st.wn.shape[1]
        vals = jnp.asarray(rng.standard_normal((n, s, 3)))
        want = transfer.scatter_sum(st.node_ids, vals, tg.n_cnodes)
        got = tile_transfer.tile_binned_scatter(bins, tg, nbr, vals)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)

        g = jnp.asarray(rng.standard_normal((tg.n_cnodes, 2)))
        g = g.at[tg.dump].set(0.0)  # dump row is zero by construction
        want_g = transfer.gather(g, st.node_ids)
        got_g = tile_transfer.tile_window_gather(bins, tg, nbr, g)
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                                   atol=0)


def test_sparse_tile_binned_matches_scatter_trajectory():
    """Sparse backend with transfer_impl='binned' (ops.tile_transfer) ==
    sparse scatter path == dense path: identical f64 trajectories and
    iteration counts through impact (the config-5 composition of
    VERDICT r1 #4)."""
    states = {}
    iters = {}
    for impl in ("scatter", "binned"):
        scene = build_scene("block_drop_2d", res=32, dtype=jnp.float64)
        cfg = config_from_overrides(
            scene["cfg"],
            {
                "grid_backend": "sparse",
                "tile_capacity": 128,
                "transfer_impl": impl,
            },
        )
        sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
        for _ in range(70):
            sim.step(4e-3)
        states[impl] = np.asarray(sim.state.x)
        iters[impl] = (
            sum(r["newton_iters"] for r in sim.metrics.records),
            sum(r["cg_iters"] for r in sim.metrics.records),
        )
        assert all(r["converged"] for r in sim.metrics.records)
    assert iters["binned"][0] == iters["scatter"][0]
    assert abs(iters["binned"][1] - iters["scatter"][1]) <= 2
    np.testing.assert_allclose(states["binned"], states["scatter"], atol=1e-9)


def test_sparse_tile_binned_3d_runs():
    scene = build_scene("twisting_bar_3d", res=32, ppc=4)
    cfg = config_from_overrides(
        scene["cfg"],
        {"grid_backend": "sparse", "tile_capacity": 512,
         "transfer_impl": "binned"},
    )
    sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
    for _ in range(3):
        stats = sim.step(1e-3)
    assert bool(jnp.all(jnp.isfinite(sim.state.x)))
    assert int(stats.active_tiles) > 0
