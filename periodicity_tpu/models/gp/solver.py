"""Celerite semiseparable GP solver (O(N) factor/solve/logdet) in pure JAX.

TPU-native replacement for celerite2's C++ core (reference gp.py:363-402
drives celerite2.GaussianProcess.compute/log_likelihood). The kernel matrix

    K = diag(A) + tril(U W^T) + triu(W U^T)    (semiseparable, rank R)

is Cholesky-factored by the celerite recursion (Foreman-Mackey et al. 2017,
eq. 46) expressed as a ``lax.scan``; solves are the matching forward/backward
scans. Everything is differentiable with ``jax.grad`` (replacing both
celerite2's hand-written gradients and the dead Theano backend, reference
gp.py:541-637) and vmaps over batches of hyperparameters — the MCMC hot path
evaluates all walkers' likelihoods in one batched scan.

The predictive mean/variance use dense cross-covariances (an [M, N] matmul
on the MXU) — exact, and faster on TPU than a translated O(N+M) serial
celerite predict for the M, N this library targets.
"""

import jax
import jax.numpy as jnp

__all__ = ["celerite_matrices", "celerite_factor", "celerite_solve",
           "log_likelihood", "GaussianProcess"]


def celerite_matrices(term, t, diag):
    """Build (A, U, V, P) for sorted times t [N] and extra diagonal diag.

    A [N], U [N, R], V [N, R], P [N-1, R] with R = n_real + 2 n_complex.
    """
    ar, cr, ac, bc, cc, dc = term.coefficients()
    t = jnp.asarray(t)
    n = t.shape[0]
    dt = jnp.diff(t)
    t0 = t[0]
    tc = t - t0  # center for trig accuracy
    cols_u, cols_v, cols_p = [], [], []
    for j in range(ar.shape[0]):
        cols_u.append(jnp.full(n, ar[j]))
        cols_v.append(jnp.ones(n, t.dtype))
        cols_p.append(jnp.exp(-cr[j] * dt))
    for j in range(ac.shape[0]):
        arg = dc[j] * tc
        cos, sin = jnp.cos(arg), jnp.sin(arg)
        cols_u.append(ac[j] * cos + bc[j] * sin)
        cols_u.append(ac[j] * sin - bc[j] * cos)
        cols_v.append(cos)
        cols_v.append(sin)
        e = jnp.exp(-cc[j] * dt)
        cols_p.append(e)
        cols_p.append(e)
    U = jnp.stack(cols_u, axis=1)
    V = jnp.stack(cols_v, axis=1)
    P = jnp.stack(cols_p, axis=1)
    A = jnp.asarray(diag) + term.k0()
    return A, U, V, P


def celerite_factor(A, U, V, P):
    """Cholesky-like factorization K = L diag(D) L^T, L = I + tril(U W^T).

    Returns (D [N], W [N, R]). Sequential lax.scan over samples; each step
    is O(R^2) (R ~ 2-4), so vmapping over walkers/batches keeps the VPU fed.
    """
    n, r = U.shape
    D0 = A[0]
    W0 = V[0] / D0
    S0 = jnp.zeros((r, r), U.dtype)

    def step(carry, inp):
        S, D_prev, W_prev = carry
        a, u, v, p = inp
        S = (p[:, None] * p[None, :]) * (S + D_prev * jnp.outer(W_prev, W_prev))
        Su = S @ u
        D = a - u @ Su
        W = (v - Su) / D
        return (S, D, W), (D, W)

    (_, _, _), (D_rest, W_rest) = jax.lax.scan(
        step, (S0, D0, W0), (A[1:], U[1:], V[1:], P), unroll=8
    )
    D = jnp.concatenate([D0[None], D_rest])
    W = jnp.concatenate([W0[None], W_rest])
    return D, W


def celerite_solve(U, P, D, W, y):
    """Solve K x = y given the factorization; y may be [N] or [N, K]."""
    squeeze = y.ndim == 1
    if squeeze:
        y = y[:, None]
    n, r = U.shape
    k = y.shape[1]

    # forward: z = L^{-1} y (z_{n-1} carried explicitly)
    def fwd_step(carry, inp):
        f, z_prev = carry
        u, w_prev, p, y_n = inp
        f = p[:, None] * (f + jnp.outer(w_prev, z_prev))
        z = y_n - u @ f
        return (f, z), z

    z0 = y[0]
    f0 = jnp.zeros((r, k), U.dtype)
    (_, _), z_rest = jax.lax.scan(
        fwd_step, (f0, z0), (U[1:], W[:-1], P, y[1:]), unroll=8
    )
    z = jnp.concatenate([z0[None], z_rest])
    zd = z / D[:, None]

    # backward: x = L^{-T} zd
    def bwd_step(carry, inp):
        g, x_next = carry
        u_next, w, p, zd_n = inp
        g = p[:, None] * (g + jnp.outer(u_next, x_next))
        x = zd_n - w @ g
        return (g, x), x

    xN = zd[-1]
    g0 = jnp.zeros((r, k), U.dtype)
    (_, _), x_rest = jax.lax.scan(
        bwd_step, (g0, xN),
        (U[1:][::-1], W[:-1][::-1], P[::-1], zd[:-1][::-1]),
        unroll=8,
    )
    x = jnp.concatenate([xN[None], x_rest])[::-1]
    if squeeze:
        return x[:, 0]
    return x


def log_likelihood(term, t, diag, resid):
    """Marginal GP log-likelihood of residuals (y - mean).

    Single fused pass: with K = L D L^T and z = L^{-1} y, the quadratic
    form is y^T K^{-1} y = sum z_n^2 / D_n, so the factorization and the
    forward solve run in ONE lax.scan and no backward substitution is
    needed — a third of the sequential depth of factor+solve+resolve.
    """
    A, U, V, P = celerite_matrices(term, t, diag)
    resid = jnp.asarray(resid)
    n, r = U.shape
    D0 = A[0]
    W0 = V[0] / D0
    S0 = jnp.zeros((r, r), U.dtype)
    z0 = resid[0]
    f0 = jnp.zeros((r,), U.dtype)

    def step(carry, inp):
        S, D_prev, W_prev, f, z_prev = carry
        a, u, v, p, y_n = inp
        S = (p[:, None] * p[None, :]) * (S + D_prev * jnp.outer(W_prev, W_prev))
        Su = S @ u
        D = a - u @ Su
        W = (v - Su) / D
        f = p * (f + W_prev * z_prev)
        z = y_n - u @ f
        return (S, D, W, f, z), (D, z)

    _, (D_rest, z_rest) = jax.lax.scan(
        step, (S0, D0, W0, f0, z0),
        (A[1:], U[1:], V[1:], P, resid[1:]),
        unroll=8,
    )
    D = jnp.concatenate([D0[None], D_rest])
    z = jnp.concatenate([z0[None], z_rest])
    return -0.5 * (
        jnp.sum(z * z / D) + jnp.sum(jnp.log(D)) + n * jnp.log(2 * jnp.pi)
    )


class GaussianProcess:
    """celerite2-like convenience wrapper (reference gp.py:363-396 surface).

    Holds (term, t, diag, mean); exposes compute/log_likelihood/predict/
    dot_tril-free API used by the modelers. All heavy math is jitted
    functional code above; this object is a thin eager shell.
    """

    def __init__(self, kernel, mean=0.0):
        self.kernel = kernel
        self.mean = mean
        self._t = None
        self._diag = None

    def compute(self, t, diag=None, yerr=None, quiet=True):
        t = jnp.asarray(t)
        if diag is None:
            diag = jnp.square(jnp.asarray(yerr)) if yerr is not None else jnp.zeros_like(t)
        self._t = t
        self._diag = jnp.broadcast_to(jnp.asarray(diag), t.shape)
        return self

    def log_likelihood(self, y):
        resid = jnp.asarray(y) - self.mean
        return log_likelihood(self.kernel, self._t, self._diag, resid)

    def _solve(self, rhs):
        A, U, V, P = celerite_matrices(self.kernel, self._t, self._diag)
        D, W = celerite_factor(A, U, V, P)
        return celerite_solve(U, P, D, W, rhs)

    def predict(self, y, t=None, return_var=False):
        """Conditional mean (and variance) at times t; dense MXU
        cross-covariance (exact). The semiseparable factorization is
        computed ONCE and reused for both solves (one stacked RHS)."""
        resid = jnp.asarray(y) - self.mean
        if t is None:
            t = self._t
        t = jnp.asarray(t)
        Kstar = self.kernel.get_value(t[:, None] - self._t[None, :])  # [M, N]
        if not return_var:
            return self.mean + Kstar @ self._solve(resid)
        A, U, V, P = celerite_matrices(self.kernel, self._t, self._diag)
        D, W = celerite_factor(A, U, V, P)
        rhs = jnp.concatenate([resid[:, None], Kstar.T], axis=1)
        sol = celerite_solve(U, P, D, W, rhs)
        alpha, KinvKs = sol[:, 0], sol[:, 1:]
        mu = self.mean + Kstar @ alpha
        var = self.kernel.k0() - jnp.sum(Kstar * KinvKs.T, axis=1)
        return mu, var

    def dense_cov(self):
        """Dense K (validation / small-N paths)."""
        t = self._t
        K = self.kernel.get_value(t[:, None] - t[None, :])
        return K + jnp.diag(self._diag)
