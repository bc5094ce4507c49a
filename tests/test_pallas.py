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
