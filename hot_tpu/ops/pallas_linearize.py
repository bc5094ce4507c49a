"""Pallas TPU kernel: fused per-particle Newton linearization.

The per-Newton-iteration chain (reference: FBasedMpmForceHelper::
updateState + SvdBasedIsotropicHelper, components #27/#20):

    grad_v -> F_new = (I + dt grad_v) F
    SVD(F_new) = U S V^T            (Jacobi eigh of F^T F + Givens QR)
    g = dpsi_hat/dsigma, A = d2psi_hat/dsigma2   (analytic per model)
    SPD projection of A (3x3 eigh + clamp) and the pair eigenvalues b+/-
    P = U diag(g) V^T; residual contributions -V0 (P F^T) gw_k

measured at 49 ms as the XLA chain (hundreds of small kernels); here it is
ONE Pallas kernel in the same component-leading SoA layout as
ops.pallas_apply — every per-particle scalar is a (sublane, lane) VPU
tile, the SVD's 18 Jacobi rotations + 3 Givens QR steps are unrolled
3x3-matrix algebra on tiles.

Outputs: per-node residual contributions + the diagonal-space Hessian
context (U, V, A_projected, b+/-) consumed by ops.pallas_apply /
models.apply_hessian in the CG loop. Equality vs
models.stress_and_hessian is tested in interpret mode and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBL = 8

# ---------------------------------------------------------------------------
# tile-matrix helpers: matrices as 3x3 (or 2x2) lists of (SUBL, LANES) tiles
# ---------------------------------------------------------------------------


def _eye(d, like):
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return [[one if i == j else zero for j in range(d)] for i in range(d)]


def _matmul(A, B):
    d = len(A)
    return [
        [sum(A[i][k] * B[k][j] for k in range(d)) for j in range(d)]
        for i in range(d)
    ]


def _transpose(A):
    d = len(A)
    return [[A[j][i] for j in range(d)] for i in range(d)]


def _load_mat(ref, d):
    return [[ref[i * d + j] for j in range(d)] for i in range(d)]


def _jacobi_cs(app, aqq, apq, dtype):
    """Algebraic Jacobi rotation (no atan2 — Mosaic TPU has no lowering):
    tau = (aqq - app)/(2 apq); t = sign(tau)/(|tau| + sqrt(1 + tau^2));
    c = 1/sqrt(1+t^2), s = t c. Exactly annihilates the off-diagonal,
    |theta| <= pi/4."""
    tiny = jnp.asarray(1e-20 if dtype == jnp.float32 else 1e-30, dtype)
    small = jnp.abs(apq) < tiny
    apq_s = jnp.where(small, jnp.ones_like(apq), apq)
    # for G = [[c, -s], [s, c]] applied as G^T S G (G&VL use the transpose)
    tau = (app - aqq) / (2.0 * apq_s)
    sign_tau = jnp.where(tau >= 0, 1.0, -1.0).astype(dtype)
    t = sign_tau / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    c = jax.lax.rsqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(small, jnp.ones_like(c), c)
    s = jnp.where(small, jnp.zeros_like(s), s)
    return c, s


def _rsqrt_exact(x):
    """Mosaic's rsqrt is a low-precision approximation that destroys the
    orthogonality of accumulated rotations (measured 27% residual error);
    one Newton refinement restores ~fp32 accuracy."""
    y = jax.lax.rsqrt(x)
    return y * (1.5 - 0.5 * x * y * y)


def _div_exact(a, b):
    """a / b via refined reciprocal (Mosaic division can be approximate)."""
    r = 1.0 / b
    r = r * (2.0 - b * r)
    return a * r


def _sqrt_exact(x):
    return x * _rsqrt_exact(jnp.maximum(x, 1e-30))


def _givens_cs(a, b, dtype):
    tiny = jnp.asarray(1e-30, dtype)
    r2 = a * a + b * b
    small = r2 < tiny
    inv = jnp.where(small, jnp.zeros_like(r2),
                    _rsqrt_exact(jnp.where(small, jnp.ones_like(r2), r2)))
    c = jnp.where(small, jnp.ones_like(a), a * inv)
    s = jnp.where(small, jnp.zeros_like(b), b * inv)
    return c, s


def _rot_mat(d, p, q, c, s, like):
    """G with G[p,p]=c, G[p,q]=-s, G[q,p]=s, G[q,q]=c (proper rotation)."""
    G = _eye(d, like)
    G[p][p] = c
    G[q][q] = c
    G[p][q] = -s
    G[q][p] = s
    return G


def _eigh_tiles(S, d, sweeps, dtype):
    """Symmetric eigendecomposition on tile-matrices: S = Q diag(w) Q^T.
    Returns (w list, Q tile-matrix), eigenvalues descending, det(Q)=+1."""
    V = _eye(d, S[0][0])
    pairs = [(0, 1)] if d == 2 else [(0, 1), (0, 2), (1, 2)]
    n_sweeps = 1 if d == 2 else sweeps
    for _ in range(n_sweeps):
        for (p, q) in pairs:
            c, s = _jacobi_cs(S[p][p], S[q][q], S[p][q], dtype)
            G = _rot_mat(d, p, q, c, s, S[0][0])
            S = _matmul(_transpose(G), _matmul(S, G))
            V = _matmul(V, G)
    w = [S[i][i] for i in range(d)]

    # descending sort via compare-swap network; track det parity
    def col_swap(V, w, parity, i, j):
        swap = w[i] < w[j]
        wi = jnp.where(swap, w[j], w[i])
        wj = jnp.where(swap, w[i], w[j])
        w = list(w)
        w[i], w[j] = wi, wj
        V = [row[:] for row in V]
        for r in range(d):
            vi = jnp.where(swap, V[r][j], V[r][i])
            vj = jnp.where(swap, V[r][i], V[r][j])
            V[r][i], V[r][j] = vi, vj
        parity = jnp.where(swap, -parity, parity)
        return V, w, parity

    parity = jnp.ones_like(w[0])
    if d == 2:
        V, w, parity = col_swap(V, w, parity, 0, 1)
    else:
        V, w, parity = col_swap(V, w, parity, 0, 1)
        V, w, parity = col_swap(V, w, parity, 0, 2)
        V, w, parity = col_swap(V, w, parity, 1, 2)
    for r in range(d):
        V[r][d - 1] = V[r][d - 1] * parity
    return w, V


def _svd_tiles(F, d, sweeps, dtype):
    """SVD on tile-matrices with the ImplicitQRSVD conventions."""
    Ft = _transpose(F)
    S = _matmul(Ft, F)
    _, V = _eigh_tiles(S, d, sweeps, dtype)
    B = _matmul(F, V)
    # Givens QR: zero B[i][j] below the diagonal
    U = _eye(d, F[0][0])
    R = B
    pairs = [(1, 0)] if d == 2 else [(1, 0), (2, 0), (2, 1)]
    for (i, j) in pairs:
        c, s = _givens_cs(R[j][j], R[i][j], dtype)
        # row rotation [c s; -s c] on rows (j, i)
        G = _eye(d, F[0][0])
        G[j][j] = c
        G[j][i] = s
        G[i][j] = -s
        G[i][i] = c
        R = _matmul(G, R)
        U = _matmul(U, _transpose(G))
    sigma = [R[i][i] for i in range(d)]
    signs = [jnp.where(sg >= 0, 1.0, -1.0).astype(dtype) for sg in sigma]
    total = signs[0]
    for sg in signs[1:]:
        total = total * sg
    col_signs = signs[:-1] + [signs[-1] * total]
    for i in range(d):
        for r in range(d):
            U[r][i] = U[r][i] * col_signs[i]
        sigma[i] = sigma[i] * col_signs[i]
    return U, sigma, V


# ---------------------------------------------------------------------------
# analytic psi_hat derivatives per model (componentwise)
# ---------------------------------------------------------------------------


def _derivs_fixed_corotated(sig, mu, lam, d):
    """Returns (g, A, bm): gradient, sigma-Hessian, and the EXACT pair
    difference quotients bm[(i,j)] = (g_i - g_j)/(s_i - s_j), which cancel
    algebraically to 2 mu - lam (J - 1) s_k — no 0/0 at repeated sigmas
    (mirrors models.constitutive.FixedCorotated.bm_hat)."""
    if d == 2:
        J = sig[0] * sig[1]
        Jp = [sig[1], sig[0]]
        d2J = {(0, 1): jnp.ones_like(sig[0])}
        bm = [2.0 * mu - lam * (J - 1.0)]
    else:
        J = sig[0] * sig[1] * sig[2]
        Jp = [sig[1] * sig[2], sig[0] * sig[2], sig[0] * sig[1]]
        d2J = {(0, 1): sig[2], (0, 2): sig[1], (1, 2): sig[0]}
        bm = [
            2.0 * mu - lam * (J - 1.0) * sig[2],
            2.0 * mu - lam * (J - 1.0) * sig[1],
            2.0 * mu - lam * (J - 1.0) * sig[0],
        ]
    g = [2.0 * mu * (sig[i] - 1.0) + lam * (J - 1.0) * Jp[i] for i in range(d)]
    A = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(d):
            a = lam * Jp[i] * Jp[j]
            if i == j:
                a = a + 2.0 * mu
            else:
                key = (min(i, j), max(i, j))
                a = a + lam * (J - 1.0) * d2J[key]
            A[i][j] = a
    return g, A, bm


def _derivs_stvk_hencky(sig, mu, lam, d):
    """Returns (g, A, bm) with the stable log-difference-quotient bm
    (mirrors models.constitutive.StvkHencky.bm_hat):
      L = (log s_i - log s_j)/(s_i - s_j) = 2 atanh(z)/(s_i + s_j)
      bm = (2 mu (s_j L - log s_j) - lam tr)/(s_i s_j)
    atanh(z)/z via log for general z, series for small z (log is the only
    transcendental — Mosaic-lowerable)."""
    s = [jnp.maximum(jnp.abs(x), 1e-6) for x in sig]
    eps = [jnp.log(x) for x in s]
    tr = sum(eps)
    g = [(2.0 * mu * eps[i] + lam * tr) / s[i] for i in range(d)]
    A = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(d):
            if i == j:
                # d/ds_i [(2 mu eps_i + lam tr)/s_i]
                A[i][j] = (2.0 * mu + lam) / (s[i] * s[i]) - g[i] / s[i]
            else:
                A[i][j] = lam / (s[i] * s[j])
    pairs = [(0, 1)] if d == 2 else [(0, 1), (0, 2), (1, 2)]
    bm = []
    for (i, j) in pairs:
        si, sj = s[i], s[j]
        z = (si - sj) / (si + sj)
        small = jnp.abs(z) < 1e-4
        z_safe = jnp.where(small, jnp.ones_like(z), z)
        atz = jnp.where(
            small,
            1.0 + z * z / 3.0,
            jnp.log((1.0 + z_safe) / (1.0 - z_safe)) / (2.0 * z_safe),
        )
        L = 2.0 / (si + sj) * atz
        closed = (2.0 * mu * (sj * L - eps[j]) - lam * tr) / (si * sj)
        # hybrid (mirrors constitutive._hybrid_bm): direct quotient when the
        # raw sigmas are well separated (correct through the energy clamp
        # near inversion), closed form at near-degeneracy, 0 if both clamped
        delta = sig[i] - sig[j]
        scale = jnp.abs(sig[i]) + jnp.abs(sig[j]) + 1.0
        well_sep = jnp.abs(delta) > 1e-3 * scale
        delta_safe = jnp.where(well_sep, delta, jnp.ones_like(delta))
        direct = (g[i] - g[j]) / delta_safe
        smooth = jnp.minimum(sig[i], sig[j]) > 2e-6
        bm.append(
            jnp.where(well_sep, direct,
                      jnp.where(smooth, closed, jnp.zeros_like(closed)))
        )
    return g, A, bm


_MODEL_DERIVS = {
    "fixed_corotated": _derivs_fixed_corotated,
    "stvk_hencky": _derivs_stvk_hencky,
}


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _kernel(dt_ref, vi_ref, gwn_ref, F_ref, mu_ref, lam_ref, V0_ref,
            out_contrib, out_U, out_V, out_A, out_bp, out_bm,
            *, s: int, d: int, model_name: str, sweeps: int, project: bool):
    dtype = F_ref[0].dtype
    dt = dt_ref[0, 0]

    # grad[a][b] = sum_k vi[k*d+a] * gwn[k*d+b]
    grad = [
        [sum(vi_ref[k * d + a] * gwn_ref[k * d + b] for k in range(s))
         for b in range(d)]
        for a in range(d)
    ]
    F_n = _load_mat(F_ref, d)
    # F_new = (I + dt grad) @ F_n
    IdtG = _eye(d, grad[0][0])
    for a in range(d):
        for b in range(d):
            IdtG[a][b] = IdtG[a][b] + dt * grad[a][b]
    F_new = _matmul(IdtG, F_n)

    U, sig, V = _svd_tiles(F_new, d, sweeps, dtype)

    mu = mu_ref[0]
    lam = lam_ref[0]
    g, A, bm = _MODEL_DERIVS[model_name](sig, mu, lam, d)

    eps_div = jnp.asarray(1e-6 if dtype == jnp.float32 else 1e-10, dtype)

    def safe_div(num, den):
        mag = jnp.maximum(jnp.abs(den), eps_div)
        return num * jnp.where(den >= 0, 1.0, -1.0).astype(dtype) / mag

    pairs = [(0, 1)] if d == 2 else [(0, 1), (0, 2), (1, 2)]
    bp = [safe_div(g[i] + g[j], sig[i] + sig[j]) for (i, j) in pairs]

    if project:
        # SPD-clamp A via its own eigendecomposition (symmetrize first)
        Asym = [[0.5 * (A[i][j] + A[j][i]) for j in range(d)] for i in range(d)]
        wA, QA = _eigh_tiles(Asym, d, sweeps, dtype)
        wA = [jnp.maximum(w, 0.0) for w in wA]
        WQ = [[QA[i][j] * wA[j] for j in range(d)] for i in range(d)]
        A = _matmul(WQ, _transpose(QA))
        bp = [jnp.maximum(b, 0.0) for b in bp]
        bm = [jnp.maximum(b, 0.0) for b in bm]

    # P = U diag(g) V^T ; PFt = P @ F_n^T
    Ug = [[U[i][j] * g[j] for j in range(d)] for i in range(d)]
    P = _matmul(Ug, _transpose(V))
    PFt = _matmul(P, _transpose(F_n))

    negV0 = -V0_ref[0]
    for k in range(s):
        for a in range(d):
            acc = PFt[a][0] * gwn_ref[k * d + 0]
            for b in range(1, d):
                acc = acc + PFt[a][b] * gwn_ref[k * d + b]
            out_contrib[k * d + a] = (negV0 * acc).astype(dtype)

    for i in range(d):
        for j in range(d):
            out_U[i * d + j] = U[i][j].astype(dtype)
            out_V[i * d + j] = V[i][j].astype(dtype)
            out_A[i * d + j] = A[i][j].astype(dtype)
    for k in range(len(pairs)):
        out_bp[k] = bp[k].astype(dtype)
        out_bm[k] = bm[k].astype(dtype)


def _to_cl(x, n_pad):
    n, C = x.shape
    x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    return x.T.reshape(C, n_pad // LANES, LANES)


def _from_cl(x, n, trailing):
    C = x.shape[0]
    return x.reshape(C, -1).T[:n].reshape((n,) + trailing)


def fused_linearize(vi, gwn, F, mu, lam, V0, dt, *, model_name: str,
                    project: bool = True, sweeps: int = 6, interpret=False):
    """Per-particle linearization: returns (contrib (n,s,d), U, V, A, bp, bm).

    contrib are the residual force contributions per stencil node; the rest
    is the diagonal-space Hessian context (models.HessianContext fields).
    """
    n, s, d = vi.shape
    dtype = vi.dtype
    n_pairs = 1 if d == 2 else 3
    rows_per_block = SUBL * LANES
    n_pad = ((n + rows_per_block - 1) // rows_per_block) * rows_per_block
    grid = (n_pad // rows_per_block,)

    args = [
        _to_cl(vi.reshape(n, s * d), n_pad),
        _to_cl(gwn.reshape(n, s * d), n_pad),
        _to_cl(F.reshape(n, d * d), n_pad),
        _to_cl(mu[:, None], n_pad),
        _to_cl(lam[:, None], n_pad),
        _to_cl(V0[:, None], n_pad),
    ]

    def spec(C):
        return pl.BlockSpec(
            (C, SUBL, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)
    in_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    in_specs += [spec(a.shape[0]) for a in args]
    nb = n_pad // LANES
    out_shapes = [
        jax.ShapeDtypeStruct((s * d, nb, LANES), dtype),   # contrib
        jax.ShapeDtypeStruct((d * d, nb, LANES), dtype),   # U
        jax.ShapeDtypeStruct((d * d, nb, LANES), dtype),   # V
        jax.ShapeDtypeStruct((d * d, nb, LANES), dtype),   # A
        jax.ShapeDtypeStruct((n_pairs, nb, LANES), dtype),  # bp
        jax.ShapeDtypeStruct((n_pairs, nb, LANES), dtype),  # bm
    ]
    outs = pl.pallas_call(
        functools.partial(_kernel, s=s, d=d, model_name=model_name,
                          sweeps=sweeps, project=project),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=[spec(sh.shape[0]) for sh in out_shapes],
        interpret=interpret,
    )(dt_arr, *args)
    contrib, U, V, A, bp, bm = outs
    return (
        _from_cl(contrib, n, (s, d)),
        _from_cl(U, n, (d, d)),
        _from_cl(V, n, (d, d)),
        _from_cl(A, n, (d, d)),
        _from_cl(bp, n, (n_pairs,)),
        _from_cl(bm, n, (n_pairs,)),
    )
