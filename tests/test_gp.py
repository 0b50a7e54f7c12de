"""GP tests: solver-vs-dense parity, reference SpottedStar thresholds
(MLE NLL, MCMC median periods, gaussian-prior shape)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from periodicity_tpu.core import TSeries
from periodicity_tpu.data import SpottedStar
from periodicity_tpu.gp import (
    BrownianGP,
    BrownianTerm,
    GaussianProcess,
    HarmonicGP,
    QuasiPeriodicGP,
    RotationTerm,
    SHOTerm,
    make_gaussian_prior,
    make_ppf,
)


@pytest.fixture(scope="module")
def spotted():
    t, y, dy = SpottedStar()
    return TSeries(t, y), dy


def test_celerite_solver_matches_dense_cholesky():
    rng = np.random.default_rng(0)
    n = 257
    t = np.sort(rng.uniform(0, 50, n))
    y = rng.standard_normal(n)
    diag = 0.05 + 0.1 * rng.random(n)
    for term in [
        SHOTerm(S0=1.3, w0=2.1, Q=3.0),
        SHOTerm(S0=0.7, w0=1.1, Q=0.01),
        RotationTerm(sigma=1.2, period=7.0, Q0=2.0, dQ=1.0, f=0.4),
        BrownianTerm(1.1, 20.0, 9.0, 0.3),
        SHOTerm(S0=1.0, w0=1.0, Q=4.0) + SHOTerm(S0=0.5, w0=0.3, Q=0.2),
    ]:
        gp = GaussianProcess(term).compute(t, diag=diag)
        K = np.asarray(gp.dense_cov())
        _, logdet = np.linalg.slogdet(K)
        ll_ref = -0.5 * (y @ np.linalg.solve(K, y) + logdet + n * np.log(2 * np.pi))
        np.testing.assert_allclose(float(gp.log_likelihood(y)), ll_ref, rtol=1e-9)


def test_solver_gradients_match_finite_differences():
    rng = np.random.default_rng(1)
    n = 100
    t = np.sort(rng.uniform(0, 20, n))
    y = rng.standard_normal(n)
    from periodicity_tpu.gp import log_likelihood

    def f(lw0):
        return log_likelihood(
            SHOTerm(S0=1.0, w0=jnp.exp(lw0), Q=3.0), t, jnp.full(n, 0.1), y
        )

    g = float(jax.grad(f)(jnp.asarray(0.3)))
    eps = 1e-6
    fd = (float(f(0.3 + eps)) - float(f(0.3 - eps))) / (2 * eps)
    assert g == pytest.approx(fd, rel=1e-5)


def test_sho_psd_and_kernel_value():
    term = SHOTerm(S0=2.0, w0=1.5, Q=3.0)
    w = np.linspace(0.01, 5, 50)
    psd = np.asarray(term.get_psd(w))
    ref = np.sqrt(2 / np.pi) * 2.0 * 1.5**4 / ((w**2 - 1.5**2) ** 2 + 1.5**2 * w**2 / 9.0)
    np.testing.assert_allclose(psd, ref, rtol=1e-12)
    # k(tau) from coefficients == closed-form underdamped SHO covariance
    tau = np.linspace(0, 10, 30)
    eta = np.sqrt(1 - 1 / (4 * 3.0**2))
    ref_k = (
        2.0 * 1.5 * 3.0
        * np.exp(-1.5 * tau / (2 * 3.0))
        * (np.cos(eta * 1.5 * tau) + np.sin(eta * 1.5 * tau) / (2 * eta * 3.0))
    )
    np.testing.assert_allclose(np.asarray(term.get_value(tau)), ref_k, rtol=1e-10)


def test_make_gaussian_prior_spotted_lc(spotted):
    """Reference tests/test_gp.py:8-21 (exact bin + peak count)."""
    sig, dy = spotted
    log_periods = np.linspace(-3, 5, 1000)
    prior = make_gaussian_prior(sig)
    prior_prob = prior(log_periods)
    assert prior_prob.argmax() == 671
    peaks = [
        i
        for i in range(1, len(log_periods) - 1)
        if prior_prob[i - 1] < prior_prob[i] and prior_prob[i + 1] < prior_prob[i]
    ]
    assert len(peaks) == 7


def test_make_ppf_roundtrip():
    x = np.linspace(-5, 5, 1001)
    pdf = np.exp(-0.5 * x**2)
    ppf = make_ppf(x, pdf)
    assert ppf(0.5) == pytest.approx(0.0, abs=0.02)
    assert ppf(0.8413) == pytest.approx(1.0, abs=0.05)


def test_browniangp_spotted_lc_minimize(spotted):
    """Reference tests/test_gp.py:24-31 threshold."""
    sig, dy = spotted
    model = BrownianGP(sig, err=dy)
    soln, _ = model.minimize(model.gp)
    assert soln.fun < -12890
    assert np.all(np.logical_and(soln.x <= 99.99, soln.x >= 0.01))


def test_harmonicgp_spotted_lc_minimize(spotted):
    """Reference tests/test_gp.py:33-40 threshold."""
    sig, dy = spotted
    model = HarmonicGP(sig, err=dy)
    soln, _ = model.minimize(model.gp)
    assert soln.fun < -13180
    assert np.all(np.logical_and(soln.x <= 99.99, soln.x >= 0.01))


def test_browniangp_spotted_lc_mcmc(spotted):
    """Reference tests/test_gp.py:42-49 statistical outcome."""
    sig, dy = spotted
    model = BrownianGP(sig, err=dy)
    trace, tau = model.mcmc(n_walkers=16, n_steps=1000, burn=200, random_seed=42)
    assert trace["period"].shape == (16 * (1000 - 200),)
    assert np.round(np.median(trace["period"]), 0) == 10.0


def test_harmonicgp_spotted_lc_mcmc(spotted):
    """Reference tests/test_gp.py:51-58 statistical outcome."""
    sig, dy = spotted
    model = HarmonicGP(sig, err=dy)
    trace, tau = model.mcmc(n_walkers=16, n_steps=1000, burn=200, random_seed=42)
    assert trace["period"].shape == (16 * (1000 - 200),)
    assert np.round(np.median(trace["period"]), 0) == 11.0


def test_qpgp_dense_gp_likelihood_and_prior():
    rng = np.random.default_rng(42)
    n = 120
    t = np.linspace(0, 10, n)
    y = np.sin(np.pi * t) + 0.1 * rng.standard_normal(n)
    yerr = np.full(n, 0.1)
    model = QuasiPeriodicGP(TSeries(t, y), yerr)
    nll0 = model.nll(model.theta0)
    assert np.isfinite(nll0)
    lp = model.log_prob(np.asarray(model.theta0))
    assert np.isfinite(lp) or lp == -np.inf
    soln, _ = model.minimize()
    assert soln.fun <= nll0
    mu, sd = model.predict(soln.x, t[:10])
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.asarray(sd) >= 0)


def test_pscan_likelihood_matches_sequential_solver():
    """Parallel associative-scan Kalman likelihood == sequential celerite
    scan == dense Cholesky, for all SHO-family terms."""
    from periodicity_tpu.gp import log_likelihood
    from periodicity_tpu.models.gp.pscan import log_likelihood_pscan

    rng = np.random.default_rng(7)
    n = 400
    t = np.sort(rng.uniform(0, 80, n))
    y = rng.standard_normal(n)
    diag = 0.05 + 0.1 * rng.random(n)
    for term in [
        SHOTerm(S0=1.3, w0=2.1, Q=3.0),
        SHOTerm(S0=0.7, w0=1.1, Q=0.01),
        RotationTerm(sigma=1.2, period=7.0, Q0=2.0, dQ=1.0, f=0.4),
        BrownianTerm(1.1, 20.0, 9.0, 0.3),
    ]:
        a = float(log_likelihood(term, t, diag, y))
        b = float(log_likelihood_pscan(term, t, diag, y))
        assert a == pytest.approx(b, rel=1e-10)


def test_pscan_modeler_path(spotted):
    """BrownianGP with solver='pscan' gives the same NLL surface."""
    sig, dy = spotted
    m_scan = BrownianGP(sig, err=dy, solver="scan")
    m_pscan = BrownianGP(sig, err=dy, solver="pscan")
    u = np.full(6, 50.0)
    assert m_scan.nll(u) == pytest.approx(m_pscan.nll(u), rel=1e-8)


def test_chunked_modeler_path(spotted):
    """BrownianGP with solver='chunked' gives the same NLL surface."""
    sig, dy = spotted
    m_scan = BrownianGP(sig, err=dy, solver="scan")
    m_chunked = BrownianGP(sig, err=dy, solver="chunked")
    u = np.full(6, 50.0)
    assert m_scan.nll(u) == pytest.approx(m_chunked.nll(u), rel=1e-8)


def test_celerite_scan_float32_characterized():
    """Characterize the celerite scan in float32 (the TPU-native dtype)
    against float64: the log-likelihood agrees within the rtol=1e-6-scale
    budget of the BASELINE north star across series lengths, and gradients
    stay finite (documented in docs/performance.md)."""
    import jax

    from periodicity_tpu.models.gp.solver import log_likelihood
    from periodicity_tpu.models.gp.terms import RotationTerm

    rng = np.random.default_rng(11)
    for n in (512, 2048, 8192):
        t = np.sort(rng.uniform(0, 100, n))
        y = np.sin(2 * np.pi * t / 11.0) + 0.1 * rng.standard_normal(n)
        y = y - y.mean()
        diag = np.full(n, 0.01)

        def nll(params, t, diag, y):
            term = RotationTerm(
                sigma=params[0], period=params[1], Q0=params[2],
                dQ=params[3], f=params[4],
            )
            return log_likelihood(term, t, diag, y)

        p64 = jnp.asarray([1.0, 11.0, 2.0, 1.0, 0.3])
        ll64 = float(nll(p64, jnp.asarray(t), jnp.asarray(diag), jnp.asarray(y)))
        args32 = [jnp.asarray(a, jnp.float32) for a in (t, diag, y)]
        p32 = jnp.asarray(p64, jnp.float32)
        ll32 = float(nll(p32, *args32))
        assert abs(ll32 - ll64) / abs(ll64) < 1e-5, (n, ll32, ll64)
        g32 = jax.grad(nll)(p32, *args32)
        assert np.isfinite(np.asarray(g32)).all()


def test_blocked_likelihood_matches_scan():
    """The two-level blocked Kalman composition equals the sequential scan
    solver for SHO-family terms at every block count."""
    from periodicity_tpu.models.gp.pscan import log_likelihood_blocked
    from periodicity_tpu.models.gp.solver import log_likelihood
    from periodicity_tpu.models.gp.terms import BrownianTerm, RotationTerm

    rng = np.random.default_rng(12)
    n = 777  # deliberately not a multiple of any block count
    t = np.sort(rng.uniform(0, 60, n))
    y = np.sin(2 * np.pi * t / 9.0) + 0.1 * rng.standard_normal(n)
    y = y - y.mean()
    diag = np.full(n, 0.02)
    for term in (
        RotationTerm(sigma=1.0, period=9.0, Q0=2.0, dQ=1.0, f=0.3),
        BrownianTerm(0.01, 20.0, 10.0, 0.3),
    ):
        want = float(log_likelihood(term, t, diag, y))
        for nb in (1, 3, 16, 128):
            got = float(log_likelihood_blocked(term, t, diag, y, n_blocks=nb))
            assert got == pytest.approx(want, rel=1e-10), (nb, got, want)


def test_chunked_likelihood_matches_scan():
    """The bounded-compile chunked solver (lax.scan over fixed-size chunks
    with a composed-element carry) equals the sequential scan solver for
    SHO-family terms at every chunk/inner-block geometry, including
    non-dividing chunk sizes (identity-element padding)."""
    from periodicity_tpu.models.gp.pscan import log_likelihood_chunked
    from periodicity_tpu.models.gp.solver import log_likelihood
    from periodicity_tpu.models.gp.terms import BrownianTerm, RotationTerm

    rng = np.random.default_rng(13)
    n = 1003  # prime-ish: exercises the identity-padding path
    t = np.sort(rng.uniform(0, 60, n))
    y = np.sin(2 * np.pi * t / 9.0) + 0.1 * rng.standard_normal(n)
    y = y - y.mean()
    diag = np.full(n, 0.02)
    # one geometry per term (each geometry is a fresh ~40 s XLA-CPU
    # compile; the cross product adds minutes of suite time for no
    # coverage — all four geometries were validated once at 1e-15)
    cases = (
        (RotationTerm(sigma=1.0, period=9.0, Q0=2.0, dQ=1.0, f=0.3), 256, 64),
        (BrownianTerm(0.01, 20.0, 10.0, 0.3), 100, 7),
    )
    for term, chunk, inner in cases:
        want = float(log_likelihood(term, t, diag, y))
        got = float(
            log_likelihood_chunked(term, t, diag, y, chunk=chunk, inner_blocks=inner)
        )
        assert got == pytest.approx(want, rel=1e-10), (chunk, inner, got, want)


def test_chunked_likelihood_grad_and_vmap():
    """jax.grad through the chunked solver matches grad through the
    sequential scan (MCMC/NUTS depend on this), and the solver vmaps over
    term hyperparameters (walker batching)."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.models.gp.pscan import log_likelihood_chunked
    from periodicity_tpu.models.gp.solver import log_likelihood
    from periodicity_tpu.models.gp.terms import BrownianTerm

    rng = np.random.default_rng(14)
    n = 800
    t = np.sort(rng.uniform(0, 100, n))
    y = np.sin(2 * np.pi * t / 20.0) + 0.05 * rng.standard_normal(n)
    y = y - y.mean()
    diag = np.full(n, 0.01)

    def f_seq(p):
        return log_likelihood(BrownianTerm(p[0], p[1], p[2], p[3]), t, diag, y)

    def f_chk(p):
        return log_likelihood_chunked(
            BrownianTerm(p[0], p[1], p[2], p[3]), t, diag, y, chunk=256, inner_blocks=64
        )

    p = jnp.asarray([0.01, 20.0, 10.0, 0.3])
    g_seq = jax.grad(f_seq)(p)
    g_chk = jax.grad(f_chk)(p)
    np.testing.assert_allclose(np.asarray(g_chk), np.asarray(g_seq), rtol=1e-6)

    pv = jnp.stack([p, p * 1.1, p * 0.9])
    lls = jax.vmap(f_chk)(pv)
    want = np.asarray([float(f_seq(pi)) for pi in pv])
    np.testing.assert_allclose(np.asarray(lls), want, rtol=1e-8)


def test_solve_small_matches_linalg_solve():
    """The unrolled partial-pivot small solve used by the Kalman element
    composition matches jnp.linalg.solve on well-conditioned batches,
    including the I + J C shape it actually sees (J, C PSD)."""
    import jax.numpy as jnp

    from periodicity_tpu.models.gp.pscan import _solve_small

    rng = np.random.default_rng(7)
    for r, k, batch in ((2, 5, 64), (4, 9, 32), (8, 17, 16)):
        A = rng.standard_normal((batch, r, r))
        C = A @ np.swapaxes(A, -1, -2)  # PSD
        Bm = rng.standard_normal((batch, r, r))
        J = Bm @ np.swapaxes(Bm, -1, -2)  # PSD
        M = np.eye(r) + J @ C
        rhs = rng.standard_normal((batch, r, k))
        want = np.linalg.solve(M, rhs)
        got = np.asarray(_solve_small(jnp.asarray(M), jnp.asarray(rhs)))
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
