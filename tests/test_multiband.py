"""Multiband GLS tests: single-band reduction to floating-mean GLS,
fast-vs-direct parity, phase-cancellation recovery where naive
concatenation fails, estimator surface (dict and array inputs)."""

import numpy as np
import pytest

from periodicity_tpu.core import TSeries
from periodicity_tpu.spectral import (
    MultibandGLS,
    gls_power,
    gls_power_multiband,
)

PERIOD = 2.3


@pytest.fixture(scope="module")
def multiband_signal():
    """Three bands sharing one period, phases 120 degrees apart (so the
    concatenated signal cancels at the true frequency), different
    amplitudes and large per-band offsets."""
    rng = np.random.default_rng(7)
    ts, ys, es, bs = [], [], [], []
    amps = [1.0, 0.7, 1.3]
    offsets = [0.0, 5.0, -4.0]
    for s in range(3):
        n = 180
        t = np.sort(rng.uniform(0, 40, n))
        phase = 2 * np.pi * s / 3
        y = (offsets[s]
             + amps[s] * np.sin(2 * np.pi * t / PERIOD + phase)
             + 0.05 * rng.standard_normal(n))
        ts.append(t)
        ys.append(y)
        es.append(np.full(n, 0.05))
        bs.append(np.full(n, s, dtype=np.int32))
    t = np.concatenate(ts)
    order = np.argsort(t, kind="stable")
    return (t[order], np.concatenate(ys)[order], np.concatenate(es)[order],
            np.concatenate(bs)[order])


def test_single_band_reduces_to_gls():
    rng = np.random.default_rng(1)
    n = 200
    t = np.sort(rng.uniform(0, 25, n))
    y = np.sin(2 * np.pi * t / PERIOD) + 0.1 * rng.standard_normal(n)
    err = np.full(n, 0.1)
    bands = np.zeros(n, dtype=np.int32)
    df, fmin, nf = 1 / 125.0, 1 / 250.0, 600
    p_ref = np.asarray(gls_power(t, y, err, df, fmin, nf, method="direct"))
    # base harmonic + band offset == floating-mean single-term GLS
    p_mb = np.asarray(gls_power_multiband(
        t, y, err, bands, 1, df, fmin, nf,
        nterms_base=1, nterms_band=0, method="direct",
    ))
    np.testing.assert_allclose(p_mb, p_ref, atol=2e-5)


def test_multiband_fast_matches_direct(multiband_signal):
    t, y, err, bands = multiband_signal
    df, fmin, nf = 1 / 200.0, 1 / 400.0, 700
    for kb, ks in ((1, 0), (1, 1), (0, 1), (2, 1)):
        pf = np.asarray(gls_power_multiband(
            t, y, err, bands, 3, df, fmin, nf,
            nterms_base=kb, nterms_band=ks, method="fast",
        ))
        pd = np.asarray(gls_power_multiband(
            t, y, err, bands, 3, df, fmin, nf,
            nterms_base=kb, nterms_band=ks, method="direct",
        ))
        np.testing.assert_allclose(pf, pd, atol=5e-6)


def test_multiband_recovers_where_concatenation_cancels(multiband_signal):
    t, y, err, bands = multiband_signal
    df, fmin, nf = 1 / 200.0, 1 / 400.0, 700
    freqs = fmin + df * np.arange(nf)
    i0 = int(np.argmin(np.abs(freqs - 1 / PERIOD)))
    p_mb = np.asarray(gls_power_multiband(
        t, y, err, bands, 3, df, fmin, nf,
        nterms_base=1, nterms_band=1,
    ))
    assert abs(freqs[p_mb.argmax()] - 1 / PERIOD) < 2 * df
    assert p_mb[i0] > 0.8
    # naive concatenated single-band GLS: the 120-degree phases cancel
    p_cat = np.asarray(gls_power(t, y, err, df, fmin, nf, method="direct"))
    assert p_cat[i0] < 0.3
    assert p_mb[i0] > p_cat[i0] + 0.5


def test_multiband_estimator_dict_input(multiband_signal):
    t, y, err, bands = multiband_signal
    signals = {}
    errs = {}
    for name, s in (("g", 0), ("r", 1), ("i", 2)):
        m = bands == s
        signals[name] = TSeries(t[m], y[m])
        errs[name] = err[m]
    mb = MultibandGLS(fmax=2.0)
    fs = mb(signals, err=errs)
    assert mb.band_names == ["g", "r", "i"]
    p_best = float(fs.period_at_highest_peak)
    assert abs(p_best - PERIOD) / PERIOD < 0.05


def test_multiband_estimator_array_input(multiband_signal):
    t, y, err, bands = multiband_signal
    mb = MultibandGLS(fmax=2.0)
    fs = mb(TSeries(t, y), err=err, bands=bands)
    assert abs(float(fs.period_at_highest_peak) - PERIOD) / PERIOD < 0.05
    # identical result via the dict path
    signals = {s: TSeries(t[bands == s], y[bands == s]) for s in range(3)}
    errs = {s: err[bands == s] for s in range(3)}
    fs2 = MultibandGLS(fmax=2.0)(signals, err=errs)
    np.testing.assert_allclose(
        np.asarray(fs.values), np.asarray(fs2.values), rtol=1e-10
    )


def test_multiband_rejects_all_zero_terms():
    with pytest.raises(ValueError):
        gls_power_multiband(
            np.arange(8.0), np.ones(8), np.ones(8),
            np.zeros(8, np.int32), 1, 0.01, 0.005, 16,
            nterms_base=0, nterms_band=0,
        )


def test_multiband_err_shape_validated(multiband_signal):
    t, y, err, bands = multiband_signal
    signals = {s: TSeries(t[bands == s], y[bands == s]) for s in range(3)}
    errs = {s: err[bands == s] for s in range(3)}
    errs[1] = errs[1][:-3]  # wrong length for band 1
    with pytest.raises(ValueError, match="err\\[1\\]"):
        MultibandGLS(fmax=2.0)(signals, err=errs)


def test_multiband_err_as_tseries_sorts_with_signal(multiband_signal):
    """Per the alignment contract: errors passed as TSeries over the same
    (unsorted) times sort identically to the signal, matching the result
    of pre-sorted raw arrays."""
    t, y, err, bands = multiband_signal
    rng = np.random.default_rng(3)
    signals, errs_ts, errs_sorted = {}, {}, {}
    for s in range(3):
        tb, yb, eb = t[bands == s], y[bands == s], err[bands == s]
        perm = rng.permutation(tb.size)
        signals[s] = TSeries(tb[perm], yb[perm])      # sorts by time
        errs_ts[s] = TSeries(tb[perm], eb[perm])      # sorts the same way
        errs_sorted[s] = eb                            # already time-sorted
    fs_ts = MultibandGLS(fmax=2.0)(signals, err=errs_ts)
    fs_raw = MultibandGLS(fmax=2.0)(signals, err=errs_sorted)
    np.testing.assert_allclose(
        np.asarray(fs_ts.values), np.asarray(fs_raw.values), rtol=1e-12
    )


def test_multiband_bootstrap_fap_fal(multiband_signal):
    """The detected multiband peak beats the within-band resampled null
    (mirrors the single-band bootstrap surface at test_multiterm.py)."""
    t, y, err, bands = multiband_signal
    mb = MultibandGLS(fmax=2.0)
    fs = mb(TSeries(t, y), err=err, bands=bands)
    peak = float(np.max(np.asarray(fs.values)))
    reps = mb.bootstrap(12, random_seed=0)
    assert reps.shape == (12,)
    # null replicates of a strong coherent signal sit well below the peak
    assert mb.fap(peak) <= 1 / 12
    # FAL is a decreasing function of FAP and brackets the replicates
    assert mb.fal(0.01) >= mb.fal(0.5)
    assert reps.min() <= mb.fal(0.5) <= reps.max()
    # a tiny power is never significant
    assert mb.fap(1e-6) == 1.0


def test_multiband_model_recovers_band_curves(multiband_signal):
    """model(tf, f0, band) reproduces each band's offset + sinusoid."""
    t, y, err, bands = multiband_signal
    mb = MultibandGLS(fmax=2.0)
    mb(TSeries(t, y), err=err, bands=bands)
    f0 = 1 / PERIOD
    tf = np.linspace(5.0, 35.0, 400)
    amps = [1.0, 0.7, 1.3]
    offsets = [0.0, 5.0, -4.0]
    for s in range(3):
        pred = np.asarray(mb.model(tf, f0, s).values)
        truth = offsets[s] + amps[s] * np.sin(
            2 * np.pi * tf / PERIOD + 2 * np.pi * s / 3
        )
        # noise sigma is 0.05; the fit should land within a few sigma
        assert np.max(np.abs(pred - truth)) < 0.1


def test_multiband_model_band_names(multiband_signal):
    t, y, err, bands = multiband_signal
    signals = {name: TSeries(t[bands == s], y[bands == s])
               for name, s in (("g", 0), ("r", 1), ("i", 2))}
    errs = {name: err[bands == s]
            for name, s in (("g", 0), ("r", 1), ("i", 2))}
    mb = MultibandGLS(fmax=2.0)
    mb(signals, err=errs)
    tf = np.linspace(10.0, 20.0, 50)
    by_name = np.asarray(mb.model(tf, 1 / PERIOD, "r").values)
    by_index = np.asarray(mb.model(tf, 1 / PERIOD, 1).values)
    np.testing.assert_allclose(by_name, by_index, rtol=1e-12)
    with pytest.raises(ValueError, match="unknown band"):
        mb.model(tf, 1 / PERIOD, 7)


def test_multiband_refine_lands_exact_peak(multiband_signal):
    """A deliberately coarse scan localizes the peak to within its grid;
    refine() lands the exact direct solution well inside one coarse cell."""
    t, y, err, bands = multiband_signal
    mb = MultibandGLS(fmax=2.0, n=1)  # coarse: df = 1/baseline
    mb(TSeries(t, y), err=err, bands=bands)
    freq = mb.frequency
    df = freq[1] - freq[0]
    refined = mb.refine(n_peaks=1, zoom=16)
    f_true = 1 / PERIOD
    coarse_best = freq[int(np.argmax(np.asarray(mb.periodogram.values)))]
    assert abs(coarse_best - f_true) < df
    assert abs(mb.refined_fbest - f_true) < abs(coarse_best - f_true) + 1e-12
    assert abs(mb.refined_fbest - f_true) < df / 4
    # the refined grid is sorted and scores at least the coarse peak
    rf = np.asarray(refined.values)
    assert rf.max() >= np.asarray(mb.periodogram.values).max() - 1e-6
