"""Matrix-free preconditioned CG / CR(MINRES) over an abstract operator.

Reference equivalent: Lib/Ziran/Math/Linear/{ConjugateGradient,Minres}.h
(component #10): templated Krylov over an objective exposing multiply /
precondition / project. Here the "objective" is three closures over
arrays/pytrees; the loop is a jit-compiled `lax.while_loop` so an entire
Newton step (including all CG iterations) stays on-device as one XLA
program. Inner products are full reductions — under shard_map they lower
to psum over the device mesh (SURVEY.md §5.8).

`project` enforces Dirichlet/collision constraints: it must be an
orthogonal projector (P^2 = P) applied to residuals and directions; the
operator is expected to act as identity on the projected-out subspace.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array          # iterations executed
    residual: jax.Array       # final |r|_2
    residual0: jax.Array      # initial |r|_2
    converged: jax.Array


def _dot(a, b, axis_name=None):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    local = sum(jnp.sum(x * y) for x, y in zip(leaves_a, leaves_b))
    if axis_name is not None:
        # inside shard_map: global inner product = psum of local partials
        local = jax.lax.psum(local, axis_name)
    return local


def _identity(x):
    return x


def cg_solve(
    multiply: Callable,
    b,
    x0=None,
    *,
    precondition: Optional[Callable] = None,
    project: Optional[Callable] = None,
    tol: float = 1e-3,
    abs_tol: float = 0.0,
    max_iters: int = 200,
    axis_name: Optional[str] = None,
) -> CGResult:
    """Solve A x = b with preconditioned projected CG.

    Termination: |r|_2 <= max(tol * |r0|_2, abs_tol). All control flow is
    lax.while_loop — jit/shard_map compatible. Under shard_map pass
    `axis_name` so inner products psum across the mesh (SURVEY.md §5.8).
    """
    precondition = precondition or _identity
    project = project or _identity

    def dot(a, b_):
        return _dot(a, b_, axis_name)

    if x0 is None:
        x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
    r0 = project(_sub(b, multiply(x0)))
    z0 = project(precondition(r0))
    rz0 = dot(r0, z0)
    rnorm0 = jnp.sqrt(dot(r0, r0))
    threshold = jnp.maximum(tol * rnorm0, abs_tol)

    def cond(carry):
        _, _, _, _, k, rnorm = carry
        return jnp.logical_and(k < max_iters, rnorm > threshold)

    def body(carry):
        x, r, p, rz, k, _ = carry
        Ap = project(multiply(p))
        pAp = dot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, Ap, r)
        z = project(precondition(r))
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = _axpy(beta, p, z)
        return (x, r, p, rz_new, k + 1, jnp.sqrt(dot(r, r)))

    x, r, _, _, k, rnorm = jax.lax.while_loop(
        cond, body, (x0, r0, z0, rz0, jnp.zeros((), jnp.int32), rnorm0)
    )
    return CGResult(x=x, iters=k, residual=rnorm, residual0=rnorm0, converged=rnorm <= threshold)


def minres_solve(
    multiply: Callable,
    b,
    x0=None,
    *,
    precondition: Optional[Callable] = None,
    project: Optional[Callable] = None,
    tol: float = 1e-3,
    abs_tol: float = 0.0,
    max_iters: int = 200,
    axis_name: Optional[str] = None,
) -> CGResult:
    """Conjugate-Residual iteration (MINRES-equivalent for symmetric A).

    Reference: Lib/Ziran/Math/Linear/Minres.h — HOT's baseline for solves
    without SPD projection. CR minimizes |A x - b|_2 over the Krylov space
    and tolerates mildly indefinite symmetric operators. `precondition`
    must be SPD; it is applied symmetrically via z = M^-1 r.
    """
    precondition = precondition or _identity
    project = project or _identity

    def dot(a, b_):
        return _dot(a, b_, axis_name)

    if x0 is None:
        x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
    r0 = project(_sub(b, multiply(x0)))
    z0 = project(precondition(r0))
    Az0 = project(multiply(z0))
    rnorm0 = jnp.sqrt(dot(r0, r0))
    threshold = jnp.maximum(tol * rnorm0, abs_tol)

    def cond(carry):
        _, _, _, _, _, _, k, rnorm = carry
        return jnp.logical_and(k < max_iters, rnorm > threshold)

    def body(carry):
        x, r, z, Az, p, Ap, k, _ = carry
        zAz = dot(z, Az)  # actually r·Az with z = M^-1 r; kept name for CR
        ApAp = dot(Ap, Ap)
        alpha = jnp.where(jnp.abs(ApAp) > 0, zAz / jnp.where(ApAp == 0, 1.0, ApAp), 0.0)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, Ap, r)
        z_new = project(precondition(r))
        Az_new = project(multiply(z_new))
        zAz_new = dot(z_new, Az_new)
        beta = zAz_new / jnp.where(zAz == 0, 1.0, zAz)
        p = _axpy(beta, p, z_new)
        Ap = _axpy(beta, Ap, Az_new)
        return (x, r, z_new, Az_new, p, Ap, k + 1, jnp.sqrt(dot(r, r)))

    x, r, _, _, _, _, k, rnorm = jax.lax.while_loop(
        cond, body, (x0, r0, z0, Az0, z0, Az0, jnp.zeros((), jnp.int32), rnorm0)
    )
    return CGResult(x=x, iters=k, residual=rnorm, residual0=rnorm0, converged=rnorm <= threshold)


def _axpy(a, x, y):
    """y + a * x over pytrees."""
    return jax.tree_util.tree_map(lambda xi, yi: yi + a * xi, x, y)


def _sub(a, b):
    return jax.tree_util.tree_map(lambda x, y: x - y, a, b)
