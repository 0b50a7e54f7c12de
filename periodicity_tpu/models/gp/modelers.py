"""GP period-inference modelers.

TPU-native redesign of the reference's gp module modelers
(reference gp.py:156-538):

- CeleriteModeler / BrownianGP / HarmonicGP: unit-hypercube
  parameterization (prior_transform with ndtri-based gaussian PPFs), the
  celerite scan solver for O(N) likelihoods, exact jax gradients for the
  hypercube L-BFGS (the reference finite-differences through C++,
  gp.py:404-415), and the on-device ensemble MCMC.
- GeorgeModeler / QuasiPeriodicGP: dense-kernel GP (Const x ExpSquared x
  ExpSine2) via batched Cholesky on the MXU — replacing george's HODLR
  solver (gp.py:186-201); at N ~ 1e3-1e4 a TPU dense factorization is
  faster than a translated hierarchical solver.

All likelihoods/posteriors are pure jitted functions of the parameter
vector; modeler objects are thin eager shells holding data and config.
"""

import types

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri

from ...core import TSeries
from ...ops.optimize import lbfgs_box
from ...utils.logging import log_event
from . import mcmc as _mcmc
from .nuts import run_nuts
from .pscan import (log_likelihood_blocked, log_likelihood_chunked,
                    log_likelihood_pscan, log_likelihood_sharded)
from .solver import GaussianProcess, log_likelihood
from .terms import BrownianTerm, RotationTerm

__all__ = [
    "CeleriteModeler",
    "BrownianGP",
    "HarmonicGP",
    "GeorgeModeler",
    "QuasiPeriodicGP",
]


def _norm_ppf(u, mu, sd):
    return mu + sd * ndtri(u)


def _norm_logpdf(x, mu, sd):
    z = (x - mu) / sd
    return -0.5 * z * z - jnp.log(sd) - 0.5 * jnp.log(2 * jnp.pi)


def _nuts_run_and_record(modeler, log_prob_fn, x0, k_run, n_steps, n_warmup,
                         max_depth, target_accept, burn,
                         chain_transform=None):
    """Shared NUTS bookkeeping for both modeler families: run the sampler,
    stash chain/acceptance/diagnostics/sampler shim on the modeler, emit
    the done event, and return (flat post-burn samples, autocorr time)."""
    out = run_nuts(log_prob_fn, x0, k_run, int(n_steps),
                   n_warmup=int(n_warmup), max_depth=max_depth,
                   target_accept=target_accept)
    chain = out["chain"]
    if chain_transform is not None:
        chain = chain_transform(chain)
    modeler.chain = np.asarray(chain)
    modeler.acceptance = float(jnp.mean(out["accept_prob"]))
    modeler.nuts_diagnostics = {
        "divergences": np.asarray(out["divergences"]),
        "step_size": np.asarray(out["step_size"]),
        "inv_mass": np.asarray(out["inv_mass"]),
        "tree_depth": np.asarray(out["tree_depth"]),
        "n_leapfrog": np.asarray(out["n_leapfrog"]),
        "n_leapfrog_warmup": np.asarray(out["n_leapfrog_warmup"]),
    }
    samples = modeler.chain[burn:].reshape(-1, modeler.ndim)
    tau = _mcmc.autocorr_time(modeler.chain[burn:])
    modeler.nuts_diagnostics["ess"] = _mcmc.ess(modeler.chain[burn:], tau=tau)
    try:
        modeler.nuts_diagnostics["rhat"] = _mcmc.rhat(modeler.chain[burn:])
    except ValueError:  # fewer than 4 post-burn steps
        modeler.nuts_diagnostics["rhat"] = np.full(modeler.ndim, np.nan)
    log_event("gp_nuts_done", modeler=type(modeler).__name__,
              acceptance=modeler.acceptance,
              divergences=int(np.sum(modeler.nuts_diagnostics["divergences"])),
              min_ess=float(np.min(modeler.nuts_diagnostics["ess"])),
              max_rhat=float(np.nanmax(modeler.nuts_diagnostics["rhat"])))
    modeler.sampler = types.SimpleNamespace(
        chain=modeler.chain, acceptance=modeler.acceptance
    )
    return samples, tau


class CeleriteModeler:
    """Hypercube-parameterized celerite GP modeler
    (reference gp.py:340-484). Subclasses define ndim, _kernel(params) and
    prior_transform(u) with u in (0, 100)^ndim."""

    def __init__(self, signal, err, init_period=None, period_ppf=None,
                 solver="scan", mesh=None, mesh_axis="seq"):
        if not isinstance(signal, TSeries):
            signal = TSeries(values=signal)
        self.solver = solver
        if solver == "sharded":
            if mesh is None:
                raise ValueError(
                    "solver='sharded' needs a jax.sharding.Mesh via mesh="
                )
            if signal.size % mesh.shape[mesh_axis]:
                raise ValueError(
                    f"series length {signal.size} must be divisible by "
                    f"mesh axis {mesh_axis!r} size {mesh.shape[mesh_axis]}"
                )
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.signal = signal
        self.err = jnp.asarray(err)
        self.t = signal.time
        self.y = signal.values
        self.sigma = float(np.std(np.asarray(self.y)))
        self.jitter = float(np.min(np.asarray(err))) ** 2
        self.mean = float(np.mean(np.asarray(self.y)))
        if init_period is None:
            init_period = float(np.sqrt(signal.size) * float(signal.median_dt))
        self.init_period = init_period
        self.sigma_period = 0.5 * np.log(signal.size)
        if period_ppf is None:
            lp = np.log(init_period)
            sp = self.sigma_period

            def period_ppf(u):
                return jnp.exp(_norm_ppf(u, lp, sp))

        self.period_ppf = period_ppf
        init_params = self.prior_transform(jnp.full(self.ndim, 50.0))
        params = dict(init_params)
        mean = params.pop("mean")
        jitter = params.pop("jitter")
        self.gp = GaussianProcess(self._kernel(**params), mean=mean)
        self.gp.compute(self.t, diag=self.err**2 + jitter)
        self._nll_jit = jax.jit(self._nll_u)
        self._lp_jit = jax.jit(self._log_prob_u)

    # -- pure functions of the hypercube vector ------------------------------
    def _log_prob_x(self, x):
        """Unconstrained-space log posterior for gradient-based sampling:
        x in R^ndim, u = 100*sigmoid(x), plus the log-Jacobian of the
        transform (so the density over x matches the hypercube posterior)."""
        u = 100.0 * jax.nn.sigmoid(x)
        u = jnp.clip(u, 0.0101, 99.9899)
        ll = -self._nll_u(u)
        ll = jnp.where(jnp.isfinite(ll), ll, -jnp.inf)
        log_jac = jnp.sum(
            jnp.log(100.0) + jax.nn.log_sigmoid(x) + jax.nn.log_sigmoid(-x)
        )
        return ll + log_jac

    def _build(self, u):
        params = dict(self.prior_transform(u))
        mean = params.pop("mean")
        jitter = params.pop("jitter")
        kernel = self._kernel(**params)
        return kernel, mean, jitter

    def _nll_u(self, u):
        kernel, mean, jitter = self._build(u)
        if self.solver == "pscan":
            ll_fn = log_likelihood_pscan
        elif self.solver == "blocked":
            ll_fn = log_likelihood_blocked
        elif self.solver == "chunked":
            # bounded-compile long-series path: the compiled program is
            # one chunk of HLO regardless of N (pscan.log_likelihood_chunked)
            ll_fn = log_likelihood_chunked
        elif self.solver == "sharded":
            # sequence-parallel: time axis sharded over self.mesh, one
            # all_gather of per-chip Kalman block summaries per evaluation
            def ll_fn(kernel, t, diag, resid):
                return log_likelihood_sharded(
                    kernel, t, diag, resid, self.mesh, axis=self.mesh_axis
                )
        else:
            ll_fn = log_likelihood
        ll = ll_fn(kernel, self.t, self.err**2 + jitter, self.y - mean)
        return -ll

    def _log_prob_u(self, u):
        inside = jnp.all((u > 0.01) & (u < 99.99))
        u_c = jnp.clip(u, 0.0101, 99.9899)
        ll = -self._nll_u(u_c)
        ll = jnp.where(jnp.isfinite(ll), ll, -jnp.inf)
        return jnp.where(inside, ll, -jnp.inf)

    # -- reference API surface ------------------------------------------------
    def prior_transform(self, u):
        raise NotImplementedError("subclasses must implement this method")

    def set_params(self, params, gp):
        params = dict(params)
        gp.mean = params.pop("mean")
        jitter = params.pop("jitter")
        gp.kernel = self._kernel(**params)
        gp.compute(self.t, diag=self.err**2 + jitter, quiet=True)
        return gp

    def get_psd(self, frequency, gp):
        return gp.kernel.get_psd(2 * jnp.pi * jnp.asarray(frequency))

    def get_prediction(self, time, gp):
        mu, var = gp.predict(self.y, t=jnp.asarray(time), return_var=True)
        return mu, jnp.sqrt(var)

    def get_kernel(self, tau, gp):
        return gp.kernel.get_value(jnp.asarray(tau))

    def loocv(self, gp):
        """Log leave-one-out CV (reference gp.py:387-396); O(N^2) solves on
        the factorized kernel."""
        n = self.signal.size
        r = jnp.asarray(self.y) - gp.mean
        q = gp._solve(r)
        c = jnp.diagonal(gp._solve(jnp.eye(n)))
        return -0.5 * (
            jnp.sum(q**2 / c) - jnp.sum(jnp.log(c)) + n * jnp.log(2 * jnp.pi)
        )

    def nll(self, u, gp=None):
        return float(self._nll_jit(jnp.asarray(u)))

    def minimize(self, gp=None, u0=None, **kwargs):
        """Exact-gradient L-BFGS in the unit hypercube
        (reference gp.py:404-415)."""
        if u0 is None:
            u0 = jnp.full(self.ndim, 50.0)
        log_event("gp_minimize", modeler=type(self).__name__,
                  n=self.signal.size, ndim=self.ndim, solver=self.solver)
        x, fval = lbfgs_box(
            self._nll_jit, jnp.asarray(u0),
            lower=jnp.full(self.ndim, 0.01),
            upper=jnp.full(self.ndim, 99.99),
            **kwargs,
        )
        log_event("gp_minimize_done", modeler=type(self).__name__,
                  fun=float(fval))
        soln = types.SimpleNamespace(x=np.asarray(x), fun=float(fval))
        opt_params = self.prior_transform(x)
        opt_gp = self.set_params(dict(opt_params), self.gp)
        return soln, opt_gp

    def log_prob(self, u, gp=None, psd_at=None):
        ll = float(self._lp_jit(jnp.asarray(u)))
        if psd_at is None:
            return ll
        kernel, _, _ = self._build(jnp.clip(jnp.asarray(u), 0.0101, 99.9899))
        return ll, kernel.get_psd(2 * jnp.pi * jnp.asarray(psd_at))

    def mcmc(
        self,
        n_walkers=50,
        n_steps=1000,
        burn=0,
        use_prior=False,
        psd_at=None,
        random_seed=None,
        checkpoint_path=None,
        checkpoint_every=100,
    ):
        """Posterior sampling with the on-device ensemble sampler
        (reference gp.py:428-484 drives emcee; here: vmapped stretch moves
        under one lax.scan).

        With ``checkpoint_path``, the run saves resumable state every
        ``checkpoint_every`` steps and continues from an existing
        checkpoint after an interruption (SURVEY §5.4).

        Returns (trace dict, tau) like the reference; also sets self.chain,
        self.acceptance, and self.psds when psd_at is given.

        Divergence: ``use_prior=True`` initializes walkers uniformly over
        the FULL hypercube (0, 100)^ndim — i.e. actually from the prior —
        where the reference draws from (0, 1)^ndim (gp.py:467, which
        concentrates every walker in one corner; that looks like an
        upstream bug, so it is not reproduced).
        """
        log_event("gp_mcmc", modeler=type(self).__name__,
                  n=self.signal.size, n_walkers=n_walkers, n_steps=n_steps,
                  solver=self.solver, checkpointed=checkpoint_path is not None)
        key = jax.random.PRNGKey(0 if random_seed is None else random_seed)
        k_init, k_run = jax.random.split(key)
        if use_prior:
            u0 = jax.random.uniform(k_init, (n_walkers, self.ndim)) * 100.0
            u0 = jnp.clip(u0, 0.02, 99.98)
        else:
            soln, _ = self.minimize(self.gp)
            u0 = jnp.asarray(soln.x)[None, :] + 1e-3 * jax.random.normal(
                k_init, (n_walkers, self.ndim)
            )
        if checkpoint_path is not None:
            chain, lps, acc = _mcmc.run_ensemble_checkpointed(
                self._lp_jit, u0, k_run, int(n_steps),
                checkpoint_path=checkpoint_path,
                checkpoint_every=checkpoint_every,
            )
        else:
            chain, lps, acc = _mcmc.run_ensemble(
                self._lp_jit, u0, k_run, int(n_steps)
            )
        self.chain = np.asarray(chain)
        self.acceptance = float(acc)
        log_event("gp_mcmc_done", modeler=type(self).__name__,
                  acceptance=self.acceptance)
        samples = self.chain[burn:].reshape(-1, self.ndim)
        tau = _mcmc.autocorr_time(self.chain[burn:])
        trace = self.prior_transform(jnp.asarray(samples.T))
        trace = {k: np.asarray(v) for k, v in dict(trace).items()}
        if psd_at is not None:
            omega = 2 * jnp.pi * jnp.asarray(psd_at)

            def one_psd(u):
                kernel, _, _ = self._build(u)
                return kernel.get_psd(omega)

            self.psds = np.asarray(
                jax.lax.map(one_psd, jnp.asarray(samples), batch_size=64)
            )
        self.sampler = types.SimpleNamespace(chain=self.chain, acceptance=self.acceptance)
        return trace, tau

    def nuts(self, n_chains=4, n_steps=1000, n_warmup=500, burn=0,
             max_depth=8, target_accept=0.8, psd_at=None, random_seed=None):
        """Gradient-based posterior sampling with the on-device NUTS
        sampler: exact jax gradients through the celerite solver, in the
        logit-unconstrained image of the unit hypercube.

        This fills the role of the reference's dead ``celerite2.theano``
        backend (gp.py:541-637 — advertised in README.md:31 but fully
        commented out): gradient-based MCMC over the same posterior the
        ensemble sampler targets. Chains are initialized around the MLE
        and adapt step size + diagonal mass independently.

        Returns (trace dict, tau) like :meth:`mcmc`; also sets
        ``self.chain`` (hypercube coordinates), ``self.acceptance`` and
        ``self.nuts_diagnostics`` (divergence counts, step sizes, mass).
        """
        log_event("gp_nuts", modeler=type(self).__name__,
                  n=self.signal.size, n_chains=n_chains, n_steps=n_steps,
                  n_warmup=n_warmup, solver=self.solver)
        key = jax.random.PRNGKey(0 if random_seed is None else random_seed)
        k_init, k_run = jax.random.split(key)
        soln, _ = self.minimize(self.gp)
        frac = jnp.clip(jnp.asarray(soln.x) / 100.0, 1e-4, 1 - 1e-4)
        x_mle = jnp.log(frac / (1 - frac))
        x0 = x_mle[None, :] + 0.1 * jax.random.normal(
            k_init, (n_chains, self.ndim)
        )
        samples, tau = _nuts_run_and_record(
            self, self._log_prob_x, x0, k_run, n_steps, n_warmup,
            max_depth, target_accept, burn,
            chain_transform=lambda c: 100.0 * jax.nn.sigmoid(c),
        )
        trace = self.prior_transform(jnp.asarray(samples.T))
        trace = {k: np.asarray(v) for k, v in dict(trace).items()}
        if psd_at is not None:
            omega = 2 * jnp.pi * jnp.asarray(psd_at)

            def one_psd(u):
                kernel, _, _ = self._build(u)
                return kernel.get_psd(omega)

            self.psds = np.asarray(
                jax.lax.map(one_psd, jnp.asarray(samples), batch_size=64)
            )
        return trace, tau


class BrownianGP(CeleriteModeler):
    """SHO + overdamped-background kernel modeler (reference gp.py:500-517)."""

    def __init__(self, signal, err, init_period=None, period_ppf=None,
                 solver="scan", **kw):
        self.ndim = 6
        super().__init__(signal, err, init_period, period_ppf, solver, **kw)

    def _kernel(self, sigma, tau, period, mix):
        return BrownianTerm(sigma, tau, period, mix)

    def prior_transform(self, u):
        u = jnp.asarray(u) / 100
        # reference coordinate order (gp.py:508-512): u[3] -> period,
        # u[2] -> the log-uniform tau multiplier
        period = self.period_ppf(u[3])
        return {
            "mean": _norm_ppf(u[0], self.mean, self.sigma),
            "sigma": jnp.exp(_norm_ppf(u[1], np.log(self.sigma), 2.0)),
            "tau": period * 10 ** u[2],
            "period": period,
            "mix": u[4] * 0.5,
            "jitter": jnp.exp(_norm_ppf(u[5], np.log(self.jitter), 2.0)),
        }


class HarmonicGP(CeleriteModeler):
    """RotationTerm kernel modeler (reference gp.py:520-538)."""

    def __init__(self, signal, err, init_period=None, period_ppf=None,
                 solver="scan", **kw):
        self.ndim = 7
        super().__init__(signal, err, init_period, period_ppf, solver, **kw)

    def _kernel(self, sigma, period, Q0, dQ, f):
        return RotationTerm(sigma=sigma, period=period, Q0=Q0, dQ=dQ, f=f)

    def prior_transform(self, u):
        u = jnp.asarray(u) / 100
        period = self.period_ppf(u[2])
        return {
            "mean": _norm_ppf(u[0], self.mean, self.sigma),
            "sigma": jnp.exp(_norm_ppf(u[1], np.log(self.sigma), 2.0)),
            "period": period,
            "Q0": jnp.exp(_norm_ppf(u[3], 1.0, 5.0)),
            "dQ": jnp.exp(_norm_ppf(u[4], 2.0, 5.0)),
            "f": u[5],
            "jitter": jnp.exp(_norm_ppf(u[6], np.log(self.jitter), 2.0)),
        }


class GeorgeModeler:
    """Dense quasi-periodic GP modeler (reference gp.py:156-293).

    Parameter vector follows george's ordering for the
    Const*ExpSquared*ExpSine2 kernel: [mean, log_jitter, log_sigma2,
    log_tau2, gamma, log_period]. The dense kernel + Cholesky runs on the
    MXU; gradients are exact via jax.
    """

    def __init__(
        self,
        signal,
        err,
        init_period=None,
        period_prior=None,
        bounds=None,
        constraints=None,
    ):
        if not isinstance(signal, TSeries):
            signal = TSeries(values=signal)
        self.signal = signal
        self.err = jnp.asarray(err)
        self.t = signal.time
        self.y = signal.values
        self.sigma = float(np.std(np.asarray(self.y)))
        self.jitter = float(np.min(np.asarray(err))) ** 2
        self.mean = float(np.mean(np.asarray(self.y)))
        if init_period is None:
            init_period = float(np.sqrt(signal.size) * float(signal.median_dt))
        self.init_period = init_period
        if period_prior is None:
            sd_p = 0.2 * np.log(signal.size)
            lp0 = np.log(init_period)

            def period_prior(period):
                return _norm_logpdf(jnp.log(period), lp0, sd_p)

        self.period_prior = period_prior
        self.bounds = bounds
        self.constraints = constraints
        self.theta0 = jnp.asarray(self._init_theta())
        self.ndim = self.theta0.shape[0]
        self._nll_jit = jax.jit(self._nll_theta)
        self._lp_jit = jax.jit(self._log_prob_theta)

    def _init_theta(self):
        raise NotImplementedError("subclasses must implement this method")

    def _kernel_value(self, theta, dt):
        raise NotImplementedError("subclasses must implement this method")

    def _nll_theta(self, theta):
        t = jnp.asarray(self.t)
        dt = t[:, None] - t[None, :]
        K = self._kernel_value(theta, dt)
        K = K + jnp.diag(self.err**2 + jnp.exp(theta[1]))
        r = jnp.asarray(self.y) - theta[0]
        L = jnp.linalg.cholesky(K)
        alpha = jax.scipy.linalg.cho_solve((L, True), r)
        n = r.shape[0]
        ll = -0.5 * (
            r @ alpha + 2 * jnp.sum(jnp.log(jnp.diagonal(L))) + n * jnp.log(2 * jnp.pi)
        )
        return jnp.where(jnp.isfinite(ll), -ll, 1e25)

    def log_prior(self, theta):
        raise NotImplementedError("subclasses must implement this method")

    def _log_prob_theta(self, theta):
        lp = self.log_prior(theta)
        ll = -self._nll_theta(theta)
        total = lp + ll
        return jnp.where(jnp.isfinite(total), total, -jnp.inf)

    def nll(self, theta, gp=None):
        return float(self._nll_jit(jnp.asarray(theta)))

    def grad_nll(self, theta, gp=None):
        return np.asarray(jax.grad(self._nll_theta)(jnp.asarray(theta)))

    def minimize(self, gp=None, grad=True, **kwargs):
        lower = jnp.asarray([b[0] for b in self.bounds])
        upper = jnp.asarray([b[1] for b in self.bounds])

        fun = self._nll_jit
        if self.constraints is not None:
            cons = self.constraints

            def fun(theta, _base=self._nll_jit):
                penalty = jnp.where(
                    cons["fun"](theta) < 0, 1e6 * cons["fun"](theta) ** 2, 0.0
                )
                return _base(theta) + penalty

        log_event("gp_minimize", modeler=type(self).__name__,
                  n=self.signal.size, ndim=self.ndim)
        x, fval = lbfgs_box(fun, self.theta0, lower=lower, upper=upper, **kwargs)
        soln = types.SimpleNamespace(x=np.asarray(x), fun=float(self._nll_jit(x)))
        log_event("gp_minimize_done", modeler=type(self).__name__,
                  fun=soln.fun)
        return soln, self

    def log_prob(self, theta, gp=None):
        return float(self._lp_jit(jnp.asarray(theta)))

    def predict(self, theta, t_new, return_var=True):
        """Conditional prediction at new times under hyperparameters theta."""
        theta = jnp.asarray(theta)
        t = jnp.asarray(self.t)
        t_new = jnp.asarray(t_new)
        K = self._kernel_value(theta, t[:, None] - t[None, :])
        K = K + jnp.diag(self.err**2 + jnp.exp(theta[1]))
        Ks = self._kernel_value(theta, t_new[:, None] - t[None, :])
        r = jnp.asarray(self.y) - theta[0]
        L = jnp.linalg.cholesky(K)
        alpha = jax.scipy.linalg.cho_solve((L, True), r)
        mu = theta[0] + Ks @ alpha
        if not return_var:
            return mu
        v = jax.scipy.linalg.cho_solve((L, True), Ks.T)
        var = self._kernel_value(theta, jnp.zeros(1))[0] - jnp.sum(Ks * v.T, axis=1)
        return mu, jnp.sqrt(var)

    def set_params(self, theta, gp=None):
        """Apply a hyperparameter vector (reference gp.py:208-211 sets
        the vector on a george GP object and recomputes; this modeler is
        stateless, so the vector becomes the default theta used by
        get_prediction/get_kernel and the modeler itself plays the gp
        role in the return value)."""
        theta = jnp.asarray(theta)
        if theta.shape != (self.ndim,):
            # the reference's set_parameter_vector raises immediately on
            # length mismatch; match that instead of failing later
            raise ValueError(
                f"theta has shape {theta.shape}, expected ({self.ndim},)"
            )
        self.theta0 = theta
        return self

    def get_prediction(self, time, theta=None):
        """Conditional mean and sd at new times (reference gp.py:213-216).
        ``theta`` may be a hyperparameter vector, None (use the stored
        default), or — matching the reference's ``gp`` positional call
        pattern via :meth:`set_params` — another modeler instance."""
        if theta is None:
            theta = self.theta0
        elif isinstance(theta, GeorgeModeler):
            theta = theta.theta0
        mu, sd = self.predict(theta, time, return_var=True)
        return mu, sd

    def get_kernel(self, tau, theta=None):
        """Kernel values at lags tau (reference gp.py:218-219); accepts
        the same theta/None/modeler argument as :meth:`get_prediction`."""
        if theta is None:
            theta = self.theta0
        elif isinstance(theta, GeorgeModeler):
            theta = theta.theta0
        return self._kernel_value(jnp.asarray(theta), jnp.asarray(tau))

    def mcmc(self, n_walkers=50, n_steps=1000, burn=0, random_seed=None,
             checkpoint_path=None, checkpoint_every=100):
        """On-device ensemble sampling (reference gp.py:257-293 drives
        emcee). With ``checkpoint_path``, resumable state is saved every
        ``checkpoint_every`` steps and an interrupted run continues from
        the existing checkpoint (SURVEY §5.4), mirroring
        CeleriteModeler.mcmc."""
        log_event("gp_mcmc", modeler=type(self).__name__,
                  n=self.signal.size, n_walkers=n_walkers, n_steps=n_steps,
                  checkpointed=checkpoint_path is not None)
        key = jax.random.PRNGKey(0 if random_seed is None else random_seed)
        k_init, k_run = jax.random.split(key)
        soln, _ = self.minimize()
        x0 = jnp.asarray(soln.x)[None, :] + 1e-3 * jax.random.normal(
            k_init, (n_walkers, self.ndim)
        )
        if checkpoint_path is not None:
            chain, lps, acc = _mcmc.run_ensemble_checkpointed(
                self._lp_jit, x0, k_run, int(n_steps),
                checkpoint_path=checkpoint_path,
                checkpoint_every=checkpoint_every,
            )
        else:
            chain, lps, acc = _mcmc.run_ensemble(
                self._lp_jit, x0, k_run, int(n_steps)
            )
        self.chain = np.asarray(chain)
        self.acceptance = float(acc)
        log_event("gp_mcmc_done", modeler=type(self).__name__,
                  acceptance=self.acceptance)
        samples = self.chain[burn:].reshape(-1, self.ndim)
        tau = _mcmc.autocorr_time(self.chain[burn:])
        self.sampler = types.SimpleNamespace(chain=self.chain, acceptance=self.acceptance)
        return samples.T, tau

    def nuts(self, n_chains=4, n_steps=1000, n_warmup=500, burn=0,
             max_depth=8, target_accept=0.8, random_seed=None):
        """Gradient-based posterior sampling (NUTS) in parameter space,
        with exact jax gradients through the dense-Cholesky likelihood.
        Counterpart of :meth:`CeleriteModeler.nuts`; the QP posterior's
        hard tau/period constraint shows up as divergences at the
        boundary, which the sampler rejects. Returns (samples.T, tau)
        like :meth:`mcmc`."""
        log_event("gp_nuts", modeler=type(self).__name__,
                  n=self.signal.size, n_chains=n_chains, n_steps=n_steps,
                  n_warmup=n_warmup)
        key = jax.random.PRNGKey(0 if random_seed is None else random_seed)
        k_init, k_run = jax.random.split(key)
        soln, _ = self.minimize()
        x0 = jnp.asarray(soln.x)[None, :] + 1e-3 * jax.random.normal(
            k_init, (n_chains, self.ndim)
        )
        samples, tau = _nuts_run_and_record(
            self, self._log_prob_theta, x0, k_run, n_steps, n_warmup,
            max_depth, target_accept, burn,
        )
        return samples.T, tau


class QuasiPeriodicGP(GeorgeModeler):
    """Const x ExpSquared x ExpSine2 kernel (reference gp.py:296-337)."""

    def _init_theta(self):
        return np.array(
            [
                self.mean,
                np.log(self.jitter),
                np.log(np.var(np.asarray(self.y))),
                np.log(10.0),
                4.5,
                0.0,
            ]
        )

    def __init__(self, signal, err, init_period=None, period_prior=None,
                 bounds=None, constraints=None):
        super().__init__(signal, err, init_period, period_prior, bounds, constraints)
        if self.bounds is None:
            pmin = 2 * float(self.signal.median_dt)
            pmax = 0.5 * float(self.signal.baseline)
            self.bounds = [
                (self.mean - self.sigma, self.mean + self.sigma),
                (np.log(self.jitter) - 5, np.log(self.jitter) + 5),
                (2 * np.log(self.sigma) - 10, 2 * np.log(self.sigma) + 10),
                (2 * np.log(pmin), 2 * np.log(10 * pmax)),
                (1.0, 20.0),
                (np.log(pmin), np.log(pmax)),
            ]
        if self.constraints is None:
            # guarantee tau > period (reference gp.py:322-324)
            self.constraints = {"type": "ineq", "fun": lambda x: 0.5 * x[3] - x[5]}

    def _kernel_value(self, theta, dt):
        _, _, log_sigma2, log_tau2, gamma, log_period = (
            theta[0], theta[1], theta[2], theta[3], theta[4], theta[5],
        )
        return jnp.exp(
            log_sigma2
            - 0.5 * dt**2 / jnp.exp(log_tau2)
            - gamma * jnp.sin(jnp.pi * jnp.abs(dt) / jnp.exp(log_period)) ** 2
        )

    def log_prior(self, theta):
        mean, log_jitter, log_sigma2, log_tau2, gamma, log_period = (
            theta[0], theta[1], theta[2], theta[3], theta[4], theta[5],
        )
        tau = jnp.exp(log_tau2 / 2)
        period = jnp.exp(log_period)
        lp = _norm_logpdf(mean, self.mean, self.sigma)
        lp += _norm_logpdf(log_jitter, np.log(self.jitter), 2.0)
        lp += _norm_logpdf(log_sigma2, 2 * np.log(self.sigma), 4.0)
        lp += 1 / np.log(100)
        ratio = tau / period
        lp += jnp.where((ratio > 1) & (ratio < 10), 0.0, -jnp.inf)
        lp += _norm_logpdf(jnp.log(gamma), 1.5, 1.5)
        lp += self.period_prior(period)
        return lp
