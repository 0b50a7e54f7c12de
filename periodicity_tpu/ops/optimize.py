"""Optimization kernels (scipy.optimize-free).

- ``nelder_mead``: simplex minimizer matching scipy.optimize.minimize
  (method="Nelder-Mead") defaults; used by the ACF-quality
  exponential-cosine fit, where the REFERENCE's bare minimize() defaults
  to BFGS (reference core.py:846-849) — a different method that agrees on
  the tested data (the seeded SpottedStar parity tests pass) but can in
  principle land in a different basin on multimodal objectives. Eager
  numpy: the objective is tiny and the fit is 2-parameter.
- ``levenberg_marquardt``: damped least-squares with jax.jacfwd jacobians,
  backing TSeries.curvefit / FSeries.curvefit (reference core.py:572-576
  scipy.optimize.curve_fit).
- ``lbfgs_box``: jit-compiled L-BFGS (optax) minimization under box
  constraints via a sigmoid reparameterization; backs the GP hypercube
  optimizer (reference gp.py:404-415 scipy L-BFGS-B).
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["nelder_mead", "levenberg_marquardt", "lbfgs_box"]


def nelder_mead(fun, x0, args=(), maxiter=None, xatol=1e-4, fatol=1e-4):
    """Nelder-Mead simplex, scipy-default parameters (adaptive=False)."""
    x0 = np.asarray(x0, float)
    n = x0.size
    if maxiter is None:
        maxiter = n * 200
    rho, chi, psi, sigma = 1.0, 2.0, 0.5, 0.5
    nonzdelt, zdelt = 0.05, 0.00025
    sim = np.empty((n + 1, n))
    sim[0] = x0
    for k in range(n):
        y = x0.copy()
        y[k] = y[k] * (1 + nonzdelt) if y[k] != 0 else zdelt
        sim[k + 1] = y
    fsim = np.array([fun(s, *args) for s in sim])
    order = np.argsort(fsim, kind="stable")
    sim, fsim = sim[order], fsim[order]
    it = 1
    while it < maxiter:
        if (
            np.max(np.abs(sim[1:] - sim[0])) <= xatol
            and np.max(np.abs(fsim[0] - fsim[1:])) <= fatol
        ):
            break
        xbar = sim[:-1].mean(axis=0)
        xr = (1 + rho) * xbar - rho * sim[-1]
        fxr = fun(xr, *args)
        doshrink = False
        if fxr < fsim[0]:
            xe = (1 + rho * chi) * xbar - rho * chi * sim[-1]
            fxe = fun(xe, *args)
            if fxe < fxr:
                sim[-1], fsim[-1] = xe, fxe
            else:
                sim[-1], fsim[-1] = xr, fxr
        elif fxr < fsim[-2]:
            sim[-1], fsim[-1] = xr, fxr
        else:
            if fxr < fsim[-1]:
                xc = (1 + psi * rho) * xbar - psi * rho * sim[-1]
                fxc = fun(xc, *args)
                if fxc <= fxr:
                    sim[-1], fsim[-1] = xc, fxc
                else:
                    doshrink = True
            else:
                xcc = (1 - psi) * xbar + psi * sim[-1]
                fxcc = fun(xcc, *args)
                if fxcc < fsim[-1]:
                    sim[-1], fsim[-1] = xcc, fxcc
                else:
                    doshrink = True
            if doshrink:
                for j in range(1, n + 1):
                    sim[j] = sim[0] + sigma * (sim[j] - sim[0])
                    fsim[j] = fun(sim[j], *args)
        order = np.argsort(fsim, kind="stable")
        sim, fsim = sim[order], fsim[order]
        it += 1
    return sim[0], fsim[0]


def levenberg_marquardt(residual_fn, p0, n_iter=50, lam0=1e-3):
    """Damped least squares: minimize ||residual_fn(p)||^2.

    Returns (p_opt, covariance) like curve_fit. Jacobians via jax.jacfwd;
    fixed iteration count keeps it jittable.
    """
    p0 = jnp.asarray(p0, jnp.result_type(float))

    def step(carry, _):
        p, lam = carry
        r = residual_fn(p)
        J = jax.jacfwd(residual_fn)(p)
        g = J.T @ r
        H = J.T @ J
        d = jnp.diag(jnp.diag(H))
        dp = jnp.linalg.solve(H + lam * d + 1e-12 * jnp.eye(p.size), -g)
        p_new = p + dp
        better = jnp.sum(residual_fn(p_new) ** 2) < jnp.sum(r**2)
        p = jnp.where(better, p_new, p)
        lam = jnp.where(better, lam * 0.5, lam * 2.0)
        return (p, lam), None

    (p, _), _ = jax.lax.scan(step, (p0, jnp.asarray(lam0)), None, length=n_iter)
    r = residual_fn(p)
    J = jax.jacfwd(residual_fn)(p)
    dof = max(r.shape[0] - p.shape[0], 1)
    s2 = jnp.sum(r**2) / dof
    cov = s2 * jnp.linalg.inv(J.T @ J + 1e-12 * jnp.eye(p.size))
    return p, cov


def lbfgs_box(fun, x0, lower, upper, max_steps=200, tol=1e-9):
    """L-BFGS minimization of fun(x) subject to lower < x < upper.

    Box constraints are enforced with a scaled-sigmoid change of variables
    (always strictly interior, like the reference's hypercube bounds
    gp.py:409). Runs fully on-device via optax.lbfgs + lax.while_loop.
    Returns (x_opt, f_opt).
    """
    import optax

    lower = jnp.asarray(lower)
    upper = jnp.asarray(upper)
    x0 = jnp.asarray(x0)
    # inverse sigmoid init
    frac = jnp.clip((x0 - lower) / (upper - lower), 1e-6, 1 - 1e-6)
    v0 = jnp.log(frac / (1 - frac))

    def to_x(v):
        return lower + (upper - lower) * jax.nn.sigmoid(v)

    def obj(v):
        return fun(to_x(v))

    opt = optax.lbfgs()
    vg = jax.value_and_grad(obj)

    def cond(carry):
        v, state, k, gnorm = carry
        return (k < max_steps) & (gnorm > tol)

    def body(carry):
        v, state, k, _ = carry
        val, grad = vg(v)
        updates, state = opt.update(
            grad, state, v, value=val, grad=grad, value_fn=obj
        )
        v = optax.apply_updates(v, updates)
        return v, state, k + 1, jnp.linalg.norm(grad)

    state0 = opt.init(v0)
    v, _, _, _ = jax.lax.while_loop(
        cond, body, (v0, state0, jnp.asarray(0), jnp.asarray(jnp.inf, v0.dtype))
    )
    return to_x(v), fun(to_x(v))
