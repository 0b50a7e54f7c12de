"""Parallel (associative-scan) celerite GP likelihood.

The sequential solver in solver.py has O(N) depth; on TPUs depth is the
enemy. This module evaluates the same GP log-likelihood with O(log N)
depth via ``jax.lax.associative_scan``:

1. Every celerite SHO-family term is an exact Gauss-Markov (state-space)
   process: a complex pair (a, b, c, d) with b = a*c/d (true for all
   SHO-derived terms: SHOTerm, RotationTerm, BrownianTerm) has the 2-state
   realization

       A(dt) = exp(-c dt) [[cos(d dt), sin(d dt)], [-sin, cos]]
       Pinf  = [[a, b], [b, a(1 + 2 c^2/d^2)]]        (Lyapunov-consistent)
       H     = [1, 0]

   and a real term (a, c) the 1-state realization A = exp(-c dt),
   Pinf = a, H = 1. Stationarity gives the exact discrete process noise
   Q_k = Pinf - A_k Pinf A_k^T, so the Kalman innendecomposition of the
   likelihood equals the dense GP likelihood identically.

2. The Kalman filter itself is parallelized with the associative filtering
   elements of Sarkka & Garcia-Fernandez (2021, "Temporal Parallelization
   of Bayesian Smoothers"): per-step 5-tuples (A, b, C, eta, J) composed
   with an associative operator, evaluated by lax.associative_scan. The
   predictive means/variances needed for the log-likelihood come
   elementwise from the (shifted) filtered results.

This is the "ring-attention analog" for this domain (SURVEY §5.7): the
binary operator is associative, so the factorization also decomposes
across chips with one carry exchange per boundary.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["ssm_matrices", "log_likelihood_pscan"]


def ssm_matrices(term, t):
    """Exact discrete SSM (A_k [N,R,R], Pinf [R,R], H [R]) for a celerite
    SHO-family term on the (sorted) time grid t."""
    ar, cr, ac, bc, cc, dc = term.coefficients()
    t = jnp.asarray(t)
    n = t.shape[0]
    dt = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.diff(t)])
    blocks_a = []
    blocks_p = []
    h_entries = []
    jr = int(ar.shape[0])
    jc = int(ac.shape[0])
    for j in range(jr):
        e = jnp.exp(-cr[j] * dt)  # [N]
        blocks_a.append(e[:, None, None])
        blocks_p.append(jnp.asarray(ar[j])[None, None])
        h_entries.append(1.0)
    for j in range(jc):
        e = jnp.exp(-cc[j] * dt)
        cosd = jnp.cos(dc[j] * dt)
        sind = jnp.sin(dc[j] * dt)
        rot = jnp.stack(
            [
                jnp.stack([cosd, sind], -1),
                jnp.stack([-sind, cosd], -1),
            ],
            -2,
        )  # [N, 2, 2]
        blocks_a.append(e[:, None, None] * rot)
        # masked (zero-amplitude) slots carry dc == 0; keep them inert
        d_safe = jnp.where(jnp.abs(dc[j]) < 1e-30, 1.0, dc[j])
        p22 = ac[j] * (1.0 + 2.0 * cc[j] ** 2 / d_safe**2)
        pinf_j = jnp.stack(
            [
                jnp.stack([ac[j], bc[j]]),
                jnp.stack([bc[j], p22]),
            ]
        )
        blocks_p.append(pinf_j)
        h_entries.extend([1.0, 0.0])
    r = jr + 2 * jc
    A = jnp.zeros((n, r, r), t.dtype)
    Pinf = jnp.zeros((r, r), t.dtype)
    pos = 0
    for blk_a, blk_p in zip(blocks_a, blocks_p):
        w = blk_p.shape[-1]
        A = A.at[:, pos : pos + w, pos : pos + w].set(
            blk_a if blk_a.ndim == 3 else blk_a[:, None, None]
        )
        Pinf = Pinf.at[pos : pos + w, pos : pos + w].set(blk_p)
        pos += w
    H = jnp.asarray(h_entries, t.dtype)
    return A, Pinf, H


@partial(jax.jit, static_argnames=())
def _pkf_loglik(A, Pinf, H, diag, y):
    """Parallel-Kalman GP log-likelihood.

    A [N,R,R] transitions (A[0] unused), Pinf [R,R], H [R], diag [N]
    observation noise variances, y [N] residuals.
    """
    n, r, _ = A.shape
    eye = jnp.eye(r, dtype=A.dtype)

    # discrete process noise: Q_k = Pinf - A_k Pinf A_k^T; first step uses
    # the stationary prior (A_0 := 0, Q_0 := Pinf)
    Q = Pinf[None] - A @ Pinf[None] @ jnp.swapaxes(A, 1, 2)
    A = A.at[0].set(jnp.zeros((r, r), A.dtype))
    Q = Q.at[0].set(Pinf)

    # Sarkka & Garcia-Fernandez filtering elements
    HQH = jnp.einsum("i,nij,j->n", H, Q, H) + diag  # S_k = H Q H^T + R
    K = (Q @ H) / HQH[:, None]  # [N, R]
    ImKH = eye[None] - K[:, :, None] * H[None, None, :]
    A_el = ImKH @ A
    b_el = K * y[:, None]
    C_el = ImKH @ Q
    HA = jnp.einsum("i,nij->nj", H, A)  # [N, R]
    eta_el = HA * (y / HQH)[:, None]
    J_el = HA[:, :, None] * HA[:, None, :] / HQH[:, None, None]

    def combine(ei, ej):
        Ai, bi, Ci, etai, Ji = ei
        Aj, bj, Cj, etaj, Jj = ej
        m1 = jnp.linalg.solve(
            jnp.swapaxes(eye[None] + Ci @ Jj, -1, -2),
            jnp.swapaxes(Aj, -1, -2),
        )
        m1t = jnp.swapaxes(m1, -1, -2)  # = Aj (I + Ci Jj)^{-1}
        A_n = m1t @ Ai
        b_n = jnp.einsum("nij,nj->ni", m1t, bi + jnp.einsum("nij,nj->ni", Ci, etaj)) + bj
        C_n = m1t @ Ci @ jnp.swapaxes(Aj, -1, -2) + Cj
        m2 = jnp.linalg.solve(
            eye[None] + Jj @ Ci,
            (etaj - jnp.einsum("nij,nj->ni", Jj, bi))[..., None],
        )[..., 0]
        eta_n = jnp.einsum("nji,nj->ni", Ai, m2) + etai
        m3 = jnp.linalg.solve(eye[None] + Jj @ Ci, Jj @ Ai)
        J_n = jnp.einsum("nji,njk->nik", Ai, m3) + Ji
        return (A_n, b_n, C_n, eta_n, J_n)

    elems = (A_el, b_el, C_el, eta_el, J_el)
    A_c, b_c, C_c, _, _ = jax.lax.associative_scan(combine, elems)
    m_filt = b_c  # [N, R] filtered means (prior mean zero)
    P_filt = C_c  # [N, R, R]

    # predictive innovations: step 0 from the prior, step k from k-1
    m_pred = jnp.einsum("nij,nj->ni", A[1:], m_filt[:-1])
    P_pred = A[1:] @ P_filt[:-1] @ jnp.swapaxes(A[1:], 1, 2) + Q[1:]
    mu = jnp.concatenate([jnp.zeros((1,), y.dtype), m_pred @ H])
    s = jnp.concatenate(
        [
            (H @ Pinf @ H)[None] + diag[:1],
            jnp.einsum("i,nij,j->n", H, P_pred, H) + diag[1:],
        ]
    )
    resid = y - mu
    return -0.5 * jnp.sum(resid**2 / s + jnp.log(2 * jnp.pi * s))


def log_likelihood_pscan(term, t, diag, resid):
    """GP log-likelihood via the O(log N)-depth parallel Kalman filter.

    Matches solver.log_likelihood (and the dense Cholesky) for all
    SHO-family terms; preferred on TPU for long series and low-latency
    single evaluations.
    """
    A, Pinf, H = ssm_matrices(term, jnp.asarray(t))
    return _pkf_loglik(A, Pinf, H, jnp.asarray(diag), jnp.asarray(resid))
