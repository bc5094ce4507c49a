"""Pallas kernel equality tests (interpret mode on the CPU harness; the
same kernel compiles on TPU — SURVEY.md §5.2: interpret=True is the
'sanitizer' for hand-written kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hot_tpu.models import constitutive as cm
from hot_tpu.ops import transfer
from hot_tpu.ops.pallas_apply import fused_contrib
from hot_tpu.scenes import build_scene


@pytest.mark.parametrize("dim", [2, 3])
def test_tile_svd_matches_svd(rng, dim):
    """The kernel's unrolled tile-SVD == ops.svd (same algorithm), tested
    as plain jnp on component arrays (no interpreter overhead)."""
    from hot_tpu.ops.pallas_linearize import _svd_tiles
    from hot_tpu.ops.svd import svd

    n = 500
    F = jnp.asarray(rng.standard_normal((n, dim, dim)), jnp.float32)
    Ftiles = [[F[:, i, j] for j in range(dim)] for i in range(dim)]
    U_t, s_t, V_t = _svd_tiles(Ftiles, dim, 6, jnp.float32)
    U, s, V = jax.vmap(svd)(F)
    U_k = jnp.stack([jnp.stack(r, -1) for r in U_t], -2)
    V_k = jnp.stack([jnp.stack(r, -1) for r in V_t], -2)
    s_k = jnp.stack(s_t, -1)
    # singular values must match exactly (same conventions)...
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s), atol=2e-5)
    # ...while U/V may differ by paired column signs (different Jacobi
    # rotation convention) — check reconstruction + proper orthogonality.
    rec = jnp.einsum("nij,nj,nkj->nik", U_k, s_k, V_k)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(F), atol=5e-5)
    eye = np.eye(dim)
    np.testing.assert_allclose(
        np.asarray(U_k @ jnp.swapaxes(U_k, 1, 2)) - eye, 0.0, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(U_k)), 1.0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(V_k)), 1.0, atol=2e-4)


@pytest.mark.parametrize("model_name", ["fixed_corotated", "stvk_hencky"])
@pytest.mark.parametrize("dim", [2, 3])
def test_tile_model_derivs(rng, dim, model_name):
    """Analytic componentwise psi_hat derivatives == autodiff."""
    from hot_tpu.models.constitutive import MODEL_REGISTRY
    from hot_tpu.ops.pallas_linearize import _MODEL_DERIVS

    model = MODEL_REGISTRY[model_name]
    n = 200
    sig = jnp.asarray(rng.uniform(0.5, 1.8, (n, dim)), jnp.float32)
    mu = jnp.full((n,), 3846.15, jnp.float32)
    lam = jnp.full((n,), 5769.23, jnp.float32)
    g_t, A_t, bm_t = _MODEL_DERIVS[model_name](
        [sig[:, i] for i in range(dim)], mu, lam, dim
    )
    g_k = jnp.stack(g_t, -1)
    A_k = jnp.stack([jnp.stack(r, -1) for r in A_t], -2)
    bm_k = jnp.stack(bm_t, -1)
    g_ref = jax.vmap(jax.grad(model.psi_hat))(sig, mu, lam)
    A_ref = jax.vmap(jax.jacfwd(jax.grad(model.psi_hat)))(sig, mu, lam)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(A_k), np.asarray(A_ref),
                               rtol=2e-3, atol=5e-1)
    # stable pair quotients == the constitutive path's bm_hat
    bm_ref = jax.vmap(
        lambda s_, g_, m_, l_: model.bm_hat(s_, g_, m_, l_)
    )(sig, g_ref, mu, lam)
    np.testing.assert_allclose(np.asarray(bm_k), np.asarray(bm_ref),
                               rtol=2e-3, atol=5e-1)


def test_fused_linearize_interpret_small(rng):
    """End-to-end kernel glue in interpret mode (small n, 2D)."""
    from hot_tpu.models.constitutive import MODEL_REGISTRY
    from hot_tpu.ops.pallas_linearize import fused_linearize

    model = MODEL_REGISTRY["fixed_corotated"]
    n, dim, s = 48, 2, 9
    dt = jnp.float32(2e-3)
    F = (jnp.eye(dim)[None] + 0.2 * jnp.asarray(
        rng.standard_normal((n, dim, dim))
    )).astype(jnp.float32)
    mu = jnp.full((n,), 3846.15, jnp.float32)
    lam = jnp.full((n,), 5769.23, jnp.float32)
    V0 = jnp.full((n,), 1e-4, jnp.float32)
    vi = jnp.asarray(rng.standard_normal((n, s, dim)) * 0.3, jnp.float32)
    gwn = jnp.asarray(rng.standard_normal((n, s, dim)), jnp.float32)

    grad_w = jnp.einsum("pki,pkj->pij", vi, gwn)
    F_new = (jnp.eye(dim)[None] + dt * grad_w) @ F
    P, ctx = jax.vmap(
        lambda f, m_, l_: cm.stress_and_hessian(model, f, m_, l_)
    )(F_new, mu, lam)
    PFt = P @ jnp.swapaxes(F, -1, -2)
    want = -jnp.einsum("p,pij,pkj->pki", V0, PFt, gwn)

    contrib, U, V, A, bp, bm = fused_linearize(
        vi, gwn, F, mu, lam, V0, dt, model_name="fixed_corotated",
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(contrib), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    # U/V may differ from the XLA SVD by paired column signs; compare the
    # sign-invariant quantities (A in sigma-space, pair eigenvalues).
    np.testing.assert_allclose(np.asarray(A), np.asarray(ctx.A),
                               rtol=2e-3, atol=2e-1)
    np.testing.assert_allclose(np.asarray(bp), np.asarray(ctx.b_plus),
                               rtol=2e-3, atol=2e-2)


@pytest.mark.parametrize("dim", [2, 3])
def test_fused_contrib_matches_xla_chain(rng, dim):
    if dim == 3:
        scene = build_scene("twisting_bar_3d", res=16, ppc=2)
    else:
        scene = build_scene("block_drop_2d", res=24)
    state = scene["state"]
    model = scene["model"]
    n = state.n
    s = 3**dim
    dt = 2e-3
    F = (state.F + 0.1 * jnp.asarray(
        rng.standard_normal(state.F.shape), state.F.dtype)).astype(jnp.float32)
    ctx = jax.vmap(
        lambda f, m_, l_: cm.hessian_context(model, f, m_, l_)
    )(F, state.mu, state.lam)
    vi = jnp.asarray(rng.standard_normal((n, s, dim)), jnp.float32)
    gwn = jnp.asarray(rng.standard_normal((n, s, dim)), jnp.float32)

    # XLA reference chain (the body of elastic_hessian_apply)
    grad_w = jnp.einsum("pki,pkj->pij", vi, gwn)
    dF = dt * (grad_w @ F)
    dP = jax.vmap(cm.apply_hessian)(ctx, dF)
    dPFt = dP @ jnp.swapaxes(F, -1, -2)
    want = -jnp.einsum("p,pij,pkj->pki", state.V0, dPFt, gwn)

    got = fused_contrib(
        vi, gwn, F, ctx.U, ctx.V, ctx.A, ctx.b_plus, ctx.b_minus, state.V0,
        jnp.float32(dt), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dim", [2, 3])
def test_multiply_cl_matches_xla_multiply(rng, dim):
    """The flat/component-leading apply path (objective.multiply_cl:
    flat windows -> CL fused kernel -> flat binned scatter) equals the
    plain XLA matrix-free multiply."""
    from hot_tpu.ops import transfer
    from hot_tpu.sim import objective as obj_mod

    if dim == 3:
        scene = build_scene("twisting_bar_3d", res=16, ppc=2)
    else:
        scene = build_scene("block_drop_2d", res=24)
    state = scene["state"]
    model = scene["model"]
    cfg = scene["cfg"]
    res = cfg.grid_res[:dim]
    dx = cfg.dx
    dt = jnp.float32(2e-3)
    n = state.n
    n_nodes = transfer.n_nodes_of(res)
    x = jnp.asarray(state.x, jnp.float32)
    st = transfer.particle_stencil(x, dx, res)
    gm, gmv = transfer.p2g_mass_momentum(
        st, jnp.asarray(state.v, jnp.float32),
        jnp.asarray(state.C, jnp.float32), jnp.asarray(state.m, jnp.float32),
        n_nodes)
    active = gm > 0
    vg = gmv * jnp.where(active, 1.0 / jnp.maximum(gm, 1e-30), 0.0)[:, None]
    proj = jnp.broadcast_to(jnp.eye(dim, dtype=jnp.float32),
                            (n_nodes, dim, dim))
    obj = obj_mod.make_objective(
        model, st, jnp.asarray(state.F, jnp.float32),
        jnp.asarray(state.V0, jnp.float32), jnp.asarray(state.mu, jnp.float32),
        jnp.asarray(state.lam, jnp.float32), gm, vg, proj, dt, dx)
    hess = obj_mod.build_hessian(model, obj, vg)
    w = jnp.asarray(rng.standard_normal((n_nodes, dim)), jnp.float32)

    want = obj_mod.multiply(obj, hess, w)

    bins = transfer.bin_particles(x, dx, res, max(64, n), 16)
    assert not bool(bins.overflow)
    params = obj_mod.hessian_params_cl(obj, hess.ctx)
    got = obj_mod.multiply_cl(obj, params, w, bins, res, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
