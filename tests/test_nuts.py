"""NUTS sampler tests: exact-target moment recovery, mass adaptation,
correlated targets, and gradient-based GP period inference (the role of
the reference's dead celerite2.theano backend, gp.py:541-637)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from periodicity_tpu.core import TSeries
from periodicity_tpu.gp import BrownianGP, QuasiPeriodicGP, run_nuts


def test_nuts_std_normal_moments():
    def logp(x):
        return -0.5 * jnp.sum(x**2)

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 3))
    out = run_nuts(logp, x0, key, 1000, n_warmup=500)
    s = np.asarray(out["chain"]).reshape(-1, 3)
    assert s.shape == (4000, 3)
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.1)
    np.testing.assert_allclose(s.var(0), 1.0, rtol=0.15)
    acc = np.asarray(out["accept_prob"])
    assert np.all((acc > 0.6) & (acc <= 1.0))
    assert np.all(np.asarray(out["divergences"]) == 0)


def test_nuts_mass_adaptation_anisotropic():
    """Scales spanning 4 orders of magnitude in variance: warmup must
    learn the diagonal metric for the sampler to mix at all."""
    sd = jnp.asarray([0.01, 1.0, 100.0])

    def logp(x):
        return -0.5 * jnp.sum((x / sd) ** 2)

    key = jax.random.PRNGKey(1)
    x0 = 0.1 * sd * jax.random.normal(key, (4, 3))
    out = run_nuts(logp, x0, key, 1500, n_warmup=800)
    s = np.asarray(out["chain"]).reshape(-1, 3)
    np.testing.assert_allclose(s.std(0), np.asarray(sd), rtol=0.2)
    # the adapted inverse mass should track the target variance per dim
    inv_mass = np.asarray(out["inv_mass"])
    ratio = inv_mass / np.asarray(sd) ** 2
    assert np.all((ratio > 0.2) & (ratio < 5.0))


def test_nuts_correlated_gaussian():
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(x):
        return -0.5 * x @ prec @ x

    key = jax.random.PRNGKey(2)
    x0 = jax.random.normal(key, (4, 2))
    out = run_nuts(logp, x0, key, 2000, n_warmup=500)
    s = np.asarray(out["chain"]).reshape(-1, 2)
    emp = np.cov(s.T)
    np.testing.assert_allclose(emp, cov, atol=0.12)
    assert np.all(np.asarray(out["divergences"]) == 0)


def test_nuts_deterministic_given_seed():
    def logp(x):
        return -0.5 * jnp.sum(x**2)

    key = jax.random.PRNGKey(3)
    x0 = jnp.zeros((2, 2))
    a = run_nuts(logp, x0, key, 50, n_warmup=100)
    b = run_nuts(logp, x0, key, 50, n_warmup=100)
    np.testing.assert_array_equal(np.asarray(a["chain"]), np.asarray(b["chain"]))


@pytest.fixture(scope="module")
def synthetic_rotator():
    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(0, 60, 300))
    period = 9.0
    y = (
        np.sin(2 * np.pi * t / period)
        + 0.3 * np.sin(4 * np.pi * t / period + 0.5)
        + 0.1 * rng.standard_normal(t.size)
    )
    dy = np.full_like(t, 0.1)
    return TSeries(t, y), dy, period


def test_browniangp_nuts_period(synthetic_rotator):
    """Gradient-based posterior sampling recovers the rotation period
    through jax.grad of the celerite scan solver."""
    sig, dy, period = synthetic_rotator
    model = BrownianGP(sig, err=dy, init_period=8.0)
    trace, tau = model.nuts(
        n_chains=2, n_steps=300, n_warmup=300, burn=50, max_depth=6,
        random_seed=42,
    )
    assert trace["period"].shape == (2 * (300 - 50),)
    med = float(np.median(trace["period"]))
    assert abs(med - period) / period < 0.15
    assert 0.5 < model.acceptance <= 1.0
    assert set(model.nuts_diagnostics) >= {
        "divergences", "step_size", "inv_mass", "tree_depth",
    }
    assert np.all(np.isfinite(tau))


def test_qpgp_nuts_smoke(synthetic_rotator):
    """GeorgeModeler.nuts() path: dense-Cholesky gradients, hard prior
    constraints as divergences. Smoke-level assertions only — the QP
    posterior is multimodal in period (near-harmonic local optima), so
    period recovery is not asserted here (BrownianGP covers that)."""
    sig, dy, _ = synthetic_rotator
    sub = TSeries(np.asarray(sig.time)[::3], np.asarray(sig.values)[::3])
    model = QuasiPeriodicGP(sub, err=np.asarray(dy)[::3], init_period=4.0)
    samples, tau = model.nuts(
        n_chains=2, n_steps=100, n_warmup=150, burn=25, max_depth=5,
        random_seed=0,
    )
    assert samples.shape == (model.ndim, 2 * 75)
    assert np.all(np.isfinite(samples))
    assert 0.3 < model.acceptance <= 1.0
    # samples respect the hard tau > period constraint (log_prior -inf
    # outside; NUTS must never accept an out-of-support point)
    tau_s = np.exp(samples[3] / 2)
    period_s = np.exp(samples[5])
    ratio = tau_s / period_s
    assert np.all((ratio > 1.0) & (ratio < 10.0))


def test_nuts_agrees_with_ensemble_mcmc(synthetic_rotator):
    """Cross-validation of the two samplers on the SAME posterior
    (BrownianGP): posterior quantiles from the gradient-based NUTS chains
    and the ensemble stretch-move chains must agree within Monte-Carlo
    error — the cheapest end-to-end check against a subtle sampler bias
    (either a wrong NUTS tree criterion or a wrong ensemble move would
    show up as a shifted or mis-scaled posterior)."""
    sig, dy, period = synthetic_rotator
    model_ens = BrownianGP(sig, err=dy, init_period=8.0)
    trace_ens, _ = model_ens.mcmc(
        n_walkers=30, n_steps=500, burn=200, random_seed=1,
    )
    model_nuts = BrownianGP(sig, err=dy, init_period=8.0)
    trace_nuts, _ = model_nuts.nuts(
        n_chains=2, n_steps=400, n_warmup=300, burn=100, max_depth=6,
        random_seed=2,
    )
    p_ens = np.asarray(trace_ens["period"])
    p_nuts = np.asarray(trace_nuts["period"])
    q_ens = np.quantile(p_ens, [0.16, 0.5, 0.84])
    q_nuts = np.quantile(p_nuts, [0.16, 0.5, 0.84])
    scale = max(q_ens[2] - q_ens[0], 1e-3)  # posterior width
    # medians within half a posterior sigma of each other, both near truth
    assert abs(q_ens[1] - q_nuts[1]) < 0.5 * scale
    assert abs(q_nuts[1] - period) / period < 0.15
    # the 16/84 quantiles (posterior shape) agree to within the width
    assert abs(q_ens[0] - q_nuts[0]) < 0.75 * scale
    assert abs(q_ens[2] - q_nuts[2]) < 0.75 * scale


def test_nuts_diagnostics_ess_rhat(synthetic_rotator):
    """nuts_diagnostics carries ESS and split-R-hat per dimension, and
    healthy chains on a well-identified posterior pass both gates."""
    sig, dy, _ = synthetic_rotator
    model = BrownianGP(sig, err=dy, init_period=8.0)
    model.nuts(n_chains=2, n_steps=300, n_warmup=300, burn=50,
               max_depth=6, random_seed=42)
    d = model.nuts_diagnostics
    assert d["ess"].shape == (model.ndim,)
    assert d["rhat"].shape == (model.ndim,)
    assert np.all(d["ess"] > 20)
    assert np.all(d["rhat"] < 1.2)


def test_ess_rhat_estimators_iid():
    """On iid draws ESS ~ the raw draw count and split-R-hat ~ 1."""
    from periodicity_tpu.gp import ess, rhat

    rng = np.random.default_rng(0)
    chain = rng.standard_normal((2000, 4, 3))
    e = ess(chain)
    r = rhat(chain)
    assert e.shape == (3,) and r.shape == (3,)
    assert np.all(e > 0.5 * 8000) and np.all(e < 2.0 * 8000)
    np.testing.assert_allclose(r, 1.0, atol=0.01)
