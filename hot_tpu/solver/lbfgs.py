"""L-BFGS minimizer over the incremental potential — HOT's LBFGS-H baseline.

Reference equivalent: Lib/Ziran/Math/Nonlinear/LBFGS.h (components #12/#38)
— the paper's quasi-Newton comparison solver ("LBFGS-H" uses an inner
preconditioner as the initial Hessian H0). Two-loop recursion with a fixed
history ring buffer, Armijo backtracking, all in lax control flow so the
whole minimization is one XLA program.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class LbfgsResult(NamedTuple):
    v: jax.Array
    iters: jax.Array
    grad_norm: jax.Array
    converged: jax.Array


def lbfgs_solve(
    *,
    energy: Callable,          # v -> scalar
    gradient: Callable,        # v -> grad (projected)
    project: Callable,         # r -> projected r
    precondition: Callable = None,  # H0 application (z = H0^-1... inverse-Hessian init)
    cn_norm: Callable = None,
    v0=None,
    history: int = 8,
    max_iters: int = 100,
    cn_eps: float = 1e-2,
    ls_max_backtracks: int = 10,
) -> LbfgsResult:
    precondition = precondition or (lambda r: r)
    cn_norm = cn_norm or (lambda r: jnp.linalg.norm(r))

    n_shape = v0.shape
    dtype = v0.dtype
    m = history

    g0 = gradient(v0)

    def two_loop(g, S, Y, rho, count):
        """Standard two-loop recursion over the ring buffer."""
        q = g
        alphas = jnp.zeros((m,), dtype)

        def bwd(i, carry):
            q, alphas = carry
            idx = (count - 1 - i) % m
            valid = i < jnp.minimum(count, m)
            a = rho[idx] * jnp.sum(S[idx] * q)
            a = jnp.where(valid, a, 0.0)
            q = q - a * Y[idx]
            alphas = alphas.at[idx].set(a)
            return (q, alphas)

        q, alphas = jax.lax.fori_loop(0, m, bwd, (q, alphas))
        z = precondition(q)

        def fwd(i, z):
            idx = (count - jnp.minimum(count, m) + i) % m
            valid = i < jnp.minimum(count, m)
            b = rho[idx] * jnp.sum(Y[idx] * z)
            upd = (alphas[idx] - b) * S[idx]
            return z + jnp.where(valid, 1.0, 0.0) * upd

        z = jax.lax.fori_loop(0, m, fwd, z)
        return z

    def cond(carry):
        v, g, S, Y, rho, count, k, _ = carry
        return jnp.logical_and(k < max_iters, cn_norm(g) > cn_eps)

    def body(carry):
        v, g, S, Y, rho, count, k, _ = carry
        d = -two_loop(g, S, Y, rho, count)
        d = project(d)
        # Armijo backtracking
        E0 = energy(v)
        slope = jnp.sum(g * d)
        # fall back to steepest descent if not a descent direction
        d = jnp.where(slope < 0, d, -project(precondition(g)))
        slope = jnp.minimum(slope, jnp.sum(g * d))

        def ls_cond(c):
            alpha, j = c
            ok = energy(v + alpha * d) <= E0 + 1e-4 * alpha * slope
            return jnp.logical_and(jnp.logical_not(ok), j < ls_max_backtracks)

        alpha, _ = jax.lax.while_loop(
            ls_cond, lambda c: (0.5 * c[0], c[1] + 1),
            (jnp.ones((), dtype), jnp.zeros((), jnp.int32)),
        )
        v_new = v + alpha * d
        g_new = gradient(v_new)
        s = v_new - v
        y = g_new - g
        sy = jnp.sum(s * y)
        idx = count % m
        keep = sy > 1e-12  # curvature condition
        S = jnp.where(keep, S.at[idx].set(s), S)
        Y = jnp.where(keep, Y.at[idx].set(y), Y)
        rho = jnp.where(keep, rho.at[idx].set(1.0 / jnp.where(sy > 0, sy, 1.0)), rho)
        count = count + jnp.where(keep, 1, 0)
        return (v_new, g_new, S, Y, rho, count, k + 1, cn_norm(g_new))

    S0 = jnp.zeros((m,) + n_shape, dtype)
    Y0 = jnp.zeros((m,) + n_shape, dtype)
    rho0 = jnp.zeros((m,), dtype)
    v, g, _, _, _, _, k, gn = jax.lax.while_loop(
        cond, body,
        (v0, g0, S0, Y0, rho0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
         cn_norm(g0)),
    )
    return LbfgsResult(v=v, iters=k, grad_norm=gn, converged=gn <= cn_eps)
