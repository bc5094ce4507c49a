"""BSR(ELL) assembly/SpMV tests (SURVEY.md §4.3): explicit operator equals
the matrix-free one, symmetry, scipy cross-check, SpMM consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hot_tpu.ops import bsr, transfer
from hot_tpu.scenes import build_scene
from hot_tpu.sim import collision
from hot_tpu.sim import objective as obj_mod


def _setup(res=24, E=1e6, dt=3e-3, dim=2):
    scene = build_scene("block_drop_2d", res=res, E=E, dtype=jnp.float64)
    cfg = scene["cfg"]
    state = scene["state"]
    # deform so K != 0
    rng = np.random.default_rng(3)
    state = state.replace(
        F=state.F + 0.05 * jnp.asarray(rng.standard_normal(state.F.shape))
    )
    grid_res = cfg.grid_res[:dim]
    dx = cfg.dx
    n_nodes = transfer.n_nodes_of(grid_res)
    st = transfer.particle_stencil(state.x, dx, grid_res)
    gm, _ = transfer.p2g_mass_momentum(st, state.v, state.C, state.m, n_nodes)
    active = gm > 0
    obj = obj_mod.make_objective(
        scene["model"], st, state.F, state.V0, state.mu, state.lam, gm,
        jnp.zeros((n_nodes, dim)),
        jnp.broadcast_to(jnp.eye(dim), (n_nodes, dim, dim)), dt, dx,
    )
    hess = obj_mod.build_hessian(scene["model"], obj, jnp.zeros((n_nodes, dim)))
    mat = bsr.structure(active, grid_res, capacity=int(np.asarray(active).sum()) + 8)
    mat = bsr.assemble_hessian(mat, st, state.F, hess.ctx, state.V0, dt, gm)
    return mat, obj, hess, state, gm, active, n_nodes


def test_bsr_matches_matrix_free(rng):
    mat, obj, hess, state, gm, active, n_nodes = _setup()
    v = jnp.asarray(rng.standard_normal((n_nodes, 2)))
    # matrix-free result (identity on inactive nodes; compare on active only)
    y_mf = obj_mod.multiply(obj, hess, v)
    x_rows = bsr.grid_vector_to_rows(mat, v)
    y_rows = bsr.spmv(mat, x_rows)
    y_bsr = bsr.rows_to_grid_vector(mat, y_rows, n_nodes)
    mask = np.asarray(active)
    np.testing.assert_allclose(
        np.asarray(y_bsr)[mask], np.asarray(y_mf)[mask], rtol=1e-9, atol=1e-9
    )


def test_bsr_symmetry():
    mat, *_ = _setup()
    A = bsr.to_scipy(mat)
    np.testing.assert_allclose(A, A.T, atol=1e-9)
    # SPD (projected Hessian + positive masses)
    w = np.linalg.eigvalsh(A)
    assert w.min() > -1e-8


def test_spmv_windowed_matches(rng):
    mat, obj, hess, state, gm, active, n_nodes = _setup()
    x_grid = jnp.asarray(rng.standard_normal((n_nodes, 2)))
    x_rows = bsr.grid_vector_to_rows(mat, x_grid)
    want = bsr.spmv(mat, x_rows)
    got = bsr.spmv_windowed(mat, x_grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_bsr_spmm_consistent(rng):
    mat, obj, hess, state, gm, active, n_nodes = _setup()
    m = 4
    X = jnp.asarray(rng.standard_normal((mat.n_rows, 2, m)))
    Y = bsr.spmm(mat, X)
    for j in range(m):
        yj = bsr.spmv(mat, X[:, :, j])
        np.testing.assert_allclose(Y[:, :, j], yj, rtol=1e-12)


def test_bsr_matches_dense_reference():
    """ELL-assembled matrix equals the golden dense assembly of
    tests/reference_mpm.py restricted to active rows."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from reference_mpm import advance_one_step_ref  # noqa: F401  (import check)
    mat, obj, hess, state, gm, active, n_nodes = _setup()
    A_ell = bsr.to_scipy(mat)
    # dense reference via matrix-free applies on unit vectors (independent path)
    nr = mat.n_rows
    d = 2
    A_mf = np.zeros((nr * d, nr * d))
    for r in range(min(nr, 40)):  # sample rows (full loop too slow)
        for a in range(d):
            e_rows = jnp.zeros((nr, d)).at[r, a].set(1.0)
            e_grid = bsr.rows_to_grid_vector(mat, e_rows, n_nodes)
            y = obj_mod.multiply(obj, hess, e_grid)
            y_rows = bsr.grid_vector_to_rows(mat, y)
            A_mf[:, r * d + a] = np.asarray(y_rows).reshape(-1)
    cols = slice(0, min(mat.n_rows, 40) * d)
    np.testing.assert_allclose(A_ell[:, cols], A_mf[:, cols], atol=1e-8)


def test_block_diag_matches_objective():
    mat, obj, hess, state, gm, active, n_nodes = _setup()
    D_bsr = bsr.block_diag(mat)
    D_obj = obj_mod.elastic_block_diag(
        obj.stencil, obj.F_n, hess.ctx, obj.V0, obj.dt, gm, active, 2
    )
    D_obj_rows = D_obj[np.minimum(np.asarray(mat.node_of), n_nodes - 1)]
    valid = np.asarray(mat.node_of) < n_nodes
    np.testing.assert_allclose(
        np.asarray(D_bsr)[valid], np.asarray(D_obj_rows)[valid], rtol=1e-9, atol=1e-9
    )

def test_spmv_tiled_matches(rng):
    """Tile-ordered rows + supertile-window SpMV == compressed-row SpMV."""
    from hot_tpu.grid import sparse as sparse_mod
    from hot_tpu.ops import bsr_tiled

    mat, obj, hess, state, gm, active, n_nodes = _setup()
    res = mat.res
    dx = obj.stencil.rel.shape  # unused; dx comes from scene
    # tile grid over the same particles
    from hot_tpu.scenes import build_scene

    scene = build_scene("block_drop_2d", res=24, E=1e6, dtype=jnp.float64)
    cfg = scene["cfg"]
    tgrid = sparse_mod.build_tile_grid(state.x, cfg.dx, res, capacity=64)
    tmat = bsr_tiled.structure_tiled(tgrid)
    st = transfer.particle_stencil(state.x, cfg.dx, res)
    dt = 3e-3
    tmat = bsr.assemble_hessian(tmat, st, state.F, hess.ctx, state.V0, dt, gm)
    nbr = bsr_tiled.tile_neighbors(tgrid)

    x_grid = jnp.asarray(rng.standard_normal((n_nodes, 2)))
    want = bsr.rows_to_grid_vector(mat, bsr.spmv(mat, bsr.grid_vector_to_rows(mat, x_grid)), n_nodes)
    x_rows = bsr.grid_vector_to_rows(tmat, x_grid)
    y_rows = bsr_tiled.spmv_tiled(tmat, tgrid, nbr, x_rows)
    got = bsr.rows_to_grid_vector(tmat, y_rows, n_nodes)
    mask = np.asarray(active)
    np.testing.assert_allclose(
        np.asarray(got)[mask], np.asarray(want)[mask], rtol=1e-9, atol=1e-9
    )


def test_spmv_tiled_matches_3d(rng):
    """3D supertile windows (12^3 -> 8^3) against the compressed-row SpMV."""
    from hot_tpu.grid import sparse as sparse_mod
    from hot_tpu.ops import bsr_tiled
    from hot_tpu.scenes import build_scene

    scene = build_scene("twisting_bar_3d", res=16, ppc=4, dtype=jnp.float64)
    cfg, state, model = scene["cfg"], scene["state"], scene["model"]
    rng3 = np.random.default_rng(7)
    state = state.replace(
        F=state.F + 0.03 * jnp.asarray(rng3.standard_normal(state.F.shape))
    )
    res = cfg.grid_res[:3]
    n_nodes = transfer.n_nodes_of(res)
    st = transfer.particle_stencil(state.x, cfg.dx, res)
    gm, _ = transfer.p2g_mass_momentum(st, state.v, state.C, state.m, n_nodes)
    active = gm > 0
    obj = obj_mod.make_objective(
        model, st, state.F, state.V0, state.mu, state.lam, gm,
        jnp.zeros((n_nodes, 3)),
        jnp.broadcast_to(jnp.eye(3), (n_nodes, 3, 3)), 2e-3, cfg.dx,
    )
    hess = obj_mod.build_hessian(model, obj, jnp.zeros((n_nodes, 3)))

    mat = bsr.structure(active, res, capacity=int(np.asarray(active).sum()) + 8)
    mat = bsr.assemble_hessian(mat, st, state.F, hess.ctx, state.V0, 2e-3, gm)

    tgrid = sparse_mod.build_tile_grid(state.x, cfg.dx, res, capacity=64)
    tmat = bsr_tiled.structure_tiled(tgrid)
    tmat = bsr.assemble_hessian(tmat, st, state.F, hess.ctx, state.V0, 2e-3, gm)
    nbr = bsr_tiled.tile_neighbors(tgrid)

    x_grid = jnp.asarray(rng.standard_normal((n_nodes, 3)))
    want = bsr.rows_to_grid_vector(
        mat, bsr.spmv(mat, bsr.grid_vector_to_rows(mat, x_grid)), n_nodes
    )
    y_rows = bsr_tiled.spmv_tiled(tmat, tgrid, nbr, bsr.grid_vector_to_rows(tmat, x_grid))
    got = bsr.rows_to_grid_vector(tmat, y_rows, n_nodes)
    mask = np.asarray(active)
    np.testing.assert_allclose(
        np.asarray(got)[mask], np.asarray(want)[mask], rtol=1e-9, atol=1e-9
    )


def test_spmv_transposed_pallas_matches(rng):
    """Transposed-lane Pallas SpMV (spmv_T) == supertile SpMV, 2D and 3D.

    Runs the kernel in interpret mode on CPU (the sanitizer of SURVEY.md
    §5.2); on TPU the same code path compiles via Mosaic.
    """
    from hot_tpu.grid import sparse as sparse_mod
    from hot_tpu.ops import bsr_tiled
    from hot_tpu.scenes import build_scene

    for scene_name, res_n, dim in [("block_drop_2d", 24, 2),
                                   ("twisting_bar_3d", 16, 3)]:
        scene = build_scene(scene_name, res=res_n,
                            **({"E": 1e6} if dim == 2 else {"ppc": 4}),
                            dtype=jnp.float64)
        cfg, state, model = scene["cfg"], scene["state"], scene["model"]
        res = cfg.grid_res[:dim]
        n_nodes = transfer.n_nodes_of(res)
        st = transfer.particle_stencil(state.x, cfg.dx, res)
        gm, _ = transfer.p2g_mass_momentum(st, state.v, state.C, state.m, n_nodes)
        obj = obj_mod.make_objective(
            model, st, state.F, state.V0, state.mu, state.lam, gm,
            jnp.zeros((n_nodes, dim)),
            jnp.broadcast_to(jnp.eye(dim), (n_nodes, dim, dim)), 2e-3, cfg.dx,
        )
        hess = obj_mod.build_hessian(model, obj, jnp.zeros((n_nodes, dim)))

        tgrid = sparse_mod.build_tile_grid(state.x, cfg.dx, res, capacity=64)
        tmat = bsr_tiled.structure_tiled(tgrid)
        tmat = bsr.assemble_hessian(tmat, st, state.F, hess.ctx, state.V0, 2e-3, gm)
        nbr = bsr_tiled.tile_neighbors(tgrid)

        x_rows = jnp.asarray(
            rng.standard_normal((tgrid.capacity * tgrid.tile_nodes, dim))
        )
        want = bsr_tiled.spmv_tiled(tmat, tgrid, nbr, x_rows)
        got = bsr_tiled.spmv_tiled_pallas(tmat, tgrid, nbr, x_rows)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-9,
            err_msg=scene_name,
        )


def test_assemble_hessian_binned_matches(rng):
    """Scatter-free binned assembly == per-particle scatter assembly
    (same quadrature; the binned path exists because XLA:TPU serializes
    colliding scatter-adds — docs/KERNEL_PLAN.md)."""
    import jax.numpy as jnp

    from hot_tpu.grid import sparse as sparse_mod
    from hot_tpu.ops import bsr as bsr_mod
    from hot_tpu.ops import bsr_tiled, transfer
    from hot_tpu.scenes import build_scene
    from hot_tpu.sim import objective as obj_mod

    scene = build_scene("twisting_bar_3d", res=16, ppc=4, dtype=jnp.float64)
    cfg, state, model = scene["cfg"], scene["state"], scene["model"]
    res = cfg.grid_res[:3]
    n_nodes = transfer.n_nodes_of(res)
    dt = jnp.asarray(2e-3, state.x.dtype)
    st = transfer.particle_stencil(state.x, cfg.dx, res)
    gm, _ = transfer.p2g_mass_momentum(st, state.v, state.C, state.m, n_nodes)
    obj = obj_mod.make_objective(
        model, st, state.F, state.V0, state.mu, state.lam, gm,
        jnp.zeros((n_nodes, 3), state.x.dtype),
        jnp.broadcast_to(jnp.eye(3, dtype=state.x.dtype), (n_nodes, 3, 3)),
        dt, cfg.dx,
    )
    hess = obj_mod.build_hessian(model, obj, jnp.zeros((n_nodes, 3), state.x.dtype))
    tg = sparse_mod.build_tile_grid(state.x, cfg.dx, res, capacity=128)
    mat0 = bsr_tiled.structure_tiled(tg)
    m_ref = bsr_mod.assemble_hessian(mat0, st, state.F, hess.ctx, state.V0, dt, gm)
    bins = transfer.bin_particles(state.x, cfg.dx, res, 4096, 32)
    assert not bool(bins.overflow)
    m_bin = bsr_mod.assemble_hessian_binned(
        mat0, bins, st, state.F, hess.ctx, state.V0, dt, gm
    )
    import numpy as np

    scale = float(jnp.abs(m_ref.vals).max())
    np.testing.assert_allclose(np.asarray(m_bin.vals), np.asarray(m_ref.vals),
                               rtol=0, atol=1e-9 * scale)

    # rank-1 mode-factorized assembly (B = Z^T lam Z per cell): the
    # TPU-shaped formulation with no (d,d,d,d) intermediates — must build
    # the identical operator
    m_modes = bsr_mod.assemble_hessian_modes(
        mat0, bins, st, state.F, hess.ctx, state.V0, dt, gm
    )
    np.testing.assert_allclose(np.asarray(m_modes.vals), np.asarray(m_ref.vals),
                               rtol=0, atol=1e-9 * scale)


def test_assemble_hessian_modes_matches_2d(rng):
    """Mode-factorized assembly in 2D (4 modes: 2 diag + 1 pair x 2)."""
    import jax.numpy as jnp
    import numpy as np

    from hot_tpu.ops import bsr as bsr_mod
    from hot_tpu.ops import transfer
    from hot_tpu.scenes import build_scene
    from hot_tpu.sim import objective as obj_mod

    scene = build_scene("block_drop_2d", res=24, dtype=jnp.float64)
    cfg, state, model = scene["cfg"], scene["state"], scene["model"]
    res = cfg.grid_res[:2]
    n_nodes = transfer.n_nodes_of(res)
    dt = jnp.asarray(4e-3, state.x.dtype)
    st = transfer.particle_stencil(state.x, cfg.dx, res)
    gm, _ = transfer.p2g_mass_momentum(st, state.v, state.C, state.m, n_nodes)
    obj = obj_mod.make_objective(
        model, st, state.F, state.V0, state.mu, state.lam, gm,
        jnp.zeros((n_nodes, 2), state.x.dtype),
        jnp.broadcast_to(jnp.eye(2, dtype=state.x.dtype), (n_nodes, 2, 2)),
        dt, cfg.dx,
    )
    # a deformed linearization point so shear modes are exercised
    v_lin = 0.5 * jnp.sin(
        jnp.arange(n_nodes * 2, dtype=state.x.dtype)
    ).reshape(n_nodes, 2)
    hess = obj_mod.build_hessian(model, obj, v_lin)
    active = gm > 0
    mat0 = bsr_mod.structure(active, res, capacity=int(jnp.sum(active)) + 8)
    m_ref = bsr_mod.assemble_hessian(mat0, st, state.F, hess.ctx, state.V0, dt, gm)
    bins = transfer.bin_particles(state.x, cfg.dx, res, 2048, 16)
    assert not bool(bins.overflow)
    m_modes = bsr_mod.assemble_hessian_modes(
        mat0, bins, st, state.F, hess.ctx, state.V0, dt, gm
    )
    scale = float(jnp.abs(m_ref.vals).max())
    np.testing.assert_allclose(np.asarray(m_modes.vals), np.asarray(m_ref.vals),
                               rtol=0, atol=1e-9 * scale)


def test_explicit_bsr_step_matches_matrix_free():
    """matrix_free=False end-to-end (HOT's --matfree off): the explicit-BSR
    step takes the matrix-free step's trajectory through impact, with both
    the scatter and the binned (scatter-free) assembly paths."""
    import dataclasses

    import jax.numpy as jnp

    from hot_tpu.scenes import build_scene
    from hot_tpu.sim import Simulation

    def run(matrix_free, impl):
        scene = build_scene("block_drop_2d", res=32, E=1e6, dtype=jnp.float64)
        sol = dataclasses.replace(scene["cfg"].solver, matrix_free=matrix_free)
        cfg = dataclasses.replace(scene["cfg"], solver=sol, transfer_impl=impl)
        sim = Simulation(cfg, scene["state"], scene["model"], scene["colliders"])
        counts = []
        for _ in range(40):
            s = sim.step(6e-3)
            counts.append((int(s.newton_iters), int(s.cg_iters)))
        return np.asarray(sim.state.x), counts

    x_mf, c_mf = run(True, "scatter")
    for impl in ("scatter", "binned"):
        x_b, c_b = run(False, impl)
        n_b = sum(n for n, _ in c_b)
        n_mf = sum(n for n, _ in c_mf)
        assert abs(n_b - n_mf) <= max(1, 0.2 * n_mf), (impl, c_b, c_mf)
        np.testing.assert_allclose(x_b, x_mf, rtol=0, atol=0.5 / 32, err_msg=impl)
