"""Multi-term (harmonic) GLS tests: K=1 reduction to floating-mean GLS,
fast-vs-direct parity, harmonic-signal recovery, estimator surface."""

import numpy as np
import pytest

from periodicity_tpu.core import TSeries
from periodicity_tpu.spectral import GLS, gls_power, gls_power_multiterm


@pytest.fixture(scope="module")
def harmonic_signal():
    rng = np.random.default_rng(0)
    n = 300
    t = np.sort(rng.uniform(0, 30, n))
    period = 3.7
    y = (
        np.sin(2 * np.pi * t / period)
        + 0.5 * np.sin(4 * np.pi * t / period + 0.3)
        + 0.25 * np.sin(6 * np.pi * t / period + 1.0)
        + 0.1 * rng.standard_normal(n)
    )
    err = np.full(n, 0.1)
    return t, y, err, period


def test_multiterm_k1_reduces_to_gls(harmonic_signal):
    t, y, err, _ = harmonic_signal
    df, fmin, nf = 1 / 150.0, 1 / 300.0, 800
    p_gls = np.asarray(gls_power(t, y, err, df, fmin, nf, method="direct"))
    p_k1 = np.asarray(
        gls_power_multiterm(t, y, err, df, fmin, nf, 1, method="direct")
    )
    np.testing.assert_allclose(p_k1, p_gls, atol=1e-9)


def test_multiterm_fast_matches_direct(harmonic_signal):
    t, y, err, _ = harmonic_signal
    df, fmin, nf = 1 / 150.0, 1 / 300.0, 800
    for k in (2, 3):
        pf = np.asarray(
            gls_power_multiterm(t, y, err, df, fmin, nf, k, method="fast")
        )
        pd = np.asarray(
            gls_power_multiterm(t, y, err, df, fmin, nf, k, method="direct")
        )
        np.testing.assert_allclose(pf, pd, atol=5e-6)


def test_multiterm_concentrates_harmonic_power(harmonic_signal):
    t, y, err, period = harmonic_signal
    df, fmin, nf = 1 / 150.0, 1 / 300.0, 800
    freqs = fmin + df * np.arange(nf)
    p1 = np.asarray(gls_power_multiterm(t, y, err, df, fmin, nf, 1))
    p3 = np.asarray(gls_power_multiterm(t, y, err, df, fmin, nf, 3))
    i0 = np.argmin(np.abs(freqs - 1 / period))
    # both peak at the fundamental, but the harmonic model captures the
    # full signal variance there
    assert abs(freqs[p3.argmax()] - 1 / period) < 2 * df
    assert p3[i0] > p1[i0] + 0.1
    assert p3[i0] > 0.9


def test_multiterm_estimator_surface(harmonic_signal):
    t, y, err, period = harmonic_signal
    sig = TSeries(t, y)
    gls = GLS(nterms=3)
    fs = gls(sig, err=err)
    assert abs(float(fs.period_at_highest_peak) - period) / period < 0.05
    # refine() drives the multiterm direct path
    refined = gls.refine(n_peaks=1)
    assert abs(1.0 / gls.refined_fbest - period) / period < 0.02
    # model() fits the K harmonics: residual well under the single-term fit
    tf = np.linspace(t.min(), t.max(), 500)
    model3 = gls.model(tf, 1.0 / period)
    gls1 = GLS(nterms=1)
    gls1(sig, err=err)
    model1 = gls1.model(tf, 1.0 / period)
    truth = (
        np.sin(2 * np.pi * tf / period)
        + 0.5 * np.sin(4 * np.pi * tf / period + 0.3)
        + 0.25 * np.sin(6 * np.pi * tf / period + 1.0)
    )
    r3 = np.mean((np.asarray(model3.values) - truth) ** 2)
    r1 = np.mean((np.asarray(model1.values) - truth) ** 2)
    assert r3 < 0.25 * r1
    assert r3 < 0.01
    # copy() carries nterms
    assert gls.copy().nterms == 3


def test_multiterm_fit_mean_false(harmonic_signal):
    t, y, err, _ = harmonic_signal
    df, fmin, nf = 1 / 150.0, 1 / 300.0, 400
    pf = np.asarray(
        gls_power_multiterm(t, y, err, df, fmin, nf, 2, fit_mean=False,
                            method="fast")
    )
    pd = np.asarray(
        gls_power_multiterm(t, y, err, df, fmin, nf, 2, fit_mean=False,
                            method="direct")
    )
    np.testing.assert_allclose(pf, pd, atol=5e-6)
    assert np.all((pf > -1e-9) & (pf < 1 + 1e-9))


def test_multiterm_psd_normalization(harmonic_signal):
    t, y, err, _ = harmonic_signal
    df, fmin, nf = 1 / 150.0, 1 / 300.0, 400
    p_std = np.asarray(gls_power_multiterm(t, y, err, df, fmin, nf, 2))
    p_psd = np.asarray(
        gls_power_multiterm(t, y, err, df, fmin, nf, 2, psd=True)
    )
    w = err**-2.0
    wn = w / w.sum()
    yc = y - np.dot(wn, y)
    yy = np.dot(wn, yc**2)
    np.testing.assert_allclose(p_psd, p_std * yy * 0.5 * w.sum(), rtol=1e-10)


def test_multiterm_bootstrap_fap(harmonic_signal):
    """bootstrap() with nterms>1 resamples the harmonic statistic itself
    (the 2K+1-column null sits higher than the single-sinusoid one), and
    the analytic Baluev bound refuses multiterm powers."""
    t, y, err, _ = harmonic_signal
    gls = GLS(nterms=2)
    fs = gls(TSeries(t, y), err=err)
    reps = gls.bootstrap(12, random_seed=0)
    assert reps.shape == (12,)
    assert np.all(np.isfinite(reps)) and np.all(reps >= 0)
    peak = float(np.max(np.asarray(fs.values)))
    # a 3-harmonic signal at SNR 10 should beat (essentially) every
    # incoherent resample; bound rather than exact-zero so a PRNG-stream
    # or resampling-kernel change cannot make this intermittent
    assert gls.fap(peak) <= 1.0 / 12.0
    assert float(gls.fal(0.5)) <= peak
    with pytest.raises(NotImplementedError):
        gls.fap(peak, method="baluev")
    with pytest.raises(NotImplementedError):
        gls.fal(0.01, method="baluev")


def test_multiterm_bootstrap_null_sits_higher():
    """On pure noise the nterms=2 max-power null distribution must
    stochastically dominate the nterms=1 one (more fit columns soak up
    more variance) — confirms the replicates really run the harmonic
    statistic rather than falling through to the single-term kernel."""
    rng = np.random.default_rng(11)
    t = np.sort(rng.uniform(0, 20, 120))
    y = rng.standard_normal(120)
    err = np.ones(120)
    reps = {}
    for k in (1, 2):
        gls = GLS(nterms=k, fmax=3.0)
        gls(TSeries(t, y), err=err)
        reps[k] = gls.bootstrap(24, random_seed=5)
    # same seed + same grid -> identical resample indices per replicate,
    # and the nterms=1 model is nested in nterms=2, so dominance holds
    # PAIRWISE (deterministically, not just in expectation)
    assert np.all(reps[2] >= reps[1] - 1e-9)
    assert np.mean(reps[2]) > np.mean(reps[1])
