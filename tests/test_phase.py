"""Phase-folding estimator tests.

The reference ships an empty tests/test_phase.py; this coverage follows the
survey's recommendation: period-recovery on synthetic signals plus a numpy
reimplementation of the PDM/StringLength statistics as a golden oracle.
"""

import numpy as np
import pytest

from periodicity_tpu.core import TSeries
from periodicity_tpu.phase import AoV, PDM, StringLength, pdm_scan, string_length_scan


def _sine(n=400, period=7.3, noise=0.1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 100, n))
    y = np.sin(2 * np.pi * t / period) + noise * rng.standard_normal(n)
    return t, y


def _pdm_theta_numpy(t, x, period, nb=5, nc=2):
    """Straight implementation of Stellingwerf (1978) eq. 2-3."""
    m0 = nb * nc
    phi = (t / period) % 1
    sigma = np.var(x, ddof=1)
    num = 0.0
    den = 0
    good = 0
    for k in range(m0):
        mask = (phi >= k / m0) & (phi < (k + nc) / m0)
        mask |= phi < (k - (m0 - nc)) / m0
        mk = x[mask]
        if mk.size > 1:
            num += (mk.size - 1) * np.var(mk, ddof=1)
            den += mk.size
            good += 1
    return (num / (den - good)) / sigma


def _stringlength_numpy(t, m, period):
    phi = (t / period) % 1
    order = np.argsort(phi, kind="stable")
    phi, m = phi[order], m[order]
    return np.hypot(np.roll(m, -1) - m, np.roll(phi, -1) - phi).sum()


def test_pdm_matches_numpy_oracle():
    t, y = _sine()
    periods = np.array([3.0, 5.0, 7.3, 11.0])
    got = np.asarray(pdm_scan(t, y, periods))
    ref = [_pdm_theta_numpy(t, y, p) for p in periods]
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_stringlength_matches_numpy_oracle():
    t, y = _sine()
    m = (y - y.max()) / (2 * (y.max() - y.min())) + 0.25
    periods = np.array([3.0, 5.0, 7.3, 11.0])
    got = np.asarray(string_length_scan(t, m, periods))
    ref = [_stringlength_numpy(t, m, p) for p in periods]
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_pdm_finds_period():
    t, y = _sine()
    # p_max below 2x the true period: plain PDM responds at subharmonics too
    # (that is what do_subharmonic is for)
    pdm = PDM(p_min=2.0, p_max=12.0, n_periods=2000)
    theta = pdm(TSeries(t, y))
    best = float(np.asarray(theta.period)[np.argmin(np.asarray(theta.values))])
    assert best == pytest.approx(7.3, abs=0.1)


def test_pdm_subharmonic_averaging_runs():
    t, y = _sine(noise=0.05)
    pdm = PDM(p_min=2.0, p_max=30.0, n_periods=500, do_subharmonic=True)
    theta = pdm(TSeries(t, y))
    assert np.all(np.isfinite(np.asarray(theta.values)))


def test_stringlength_finds_period():
    t, y = _sine()
    sl = StringLength(n_periods=3000)
    ell = sl(TSeries(t, y))
    # highest peak of 1/length ~ best period; reference returns raw lengths
    best = float(np.asarray(ell.period)[np.argmin(np.asarray(ell.values))])
    assert best == pytest.approx(7.3, abs=0.2)


def test_aov_finds_period():
    t, y = _sine()
    aov = AoV(p_min=2.0, p_max=20.0, n_periods=2000)
    f = aov(TSeries(t, y))
    best = float(np.asarray(f.period)[np.argmax(np.asarray(f.values))])
    assert best == pytest.approx(7.3, abs=0.1)


def test_conditional_entropy_finds_period():
    from periodicity_tpu.phase import ConditionalEntropy

    t, y = _sine(n=800, noise=0.05)
    ce = ConditionalEntropy(p_min=2.0, p_max=12.0, n_periods=2000)
    h = ce(TSeries(t, y))
    best = float(np.asarray(h.period)[np.argmin(np.asarray(h.values))])
    assert best == pytest.approx(7.3, abs=0.1)


def test_gregory_loredo_finds_period_in_event_times():
    from periodicity_tpu.phase import GregoryLoredo

    rng = np.random.default_rng(9)
    # inhomogeneous Poisson events concentrated at phase 0.3 of a 5.0 period
    base = np.sort(rng.uniform(0, 500, 3000))
    keep = rng.random(3000) < 0.15 + 0.8 * np.exp(
        -0.5 * ((((base / 5.0) % 1) - 0.3) / 0.08) ** 2
    )
    events = base[keep]
    gl = GregoryLoredo(p_min=2.0, p_max=10.0, n_periods=4000)
    lo = gl(events)
    best = float(np.asarray(lo.period)[np.argmax(np.asarray(lo.values))])
    assert best == pytest.approx(5.0, abs=0.02)


def test_pdm_and_string_length_batch_match_scan():
    """Batched phase scorers == per-series scans (SURVEY §2.2 batch axis)."""
    from periodicity_tpu.phase import (
        pdm_batch,
        pdm_scan,
        string_length_batch,
        string_length_scan,
    )

    rng = np.random.default_rng(0)
    n, b = 400, 3
    t = np.sort(rng.uniform(0, 60, n))
    ys = np.stack([np.sin(2 * np.pi * t / p) + 0.1 * rng.standard_normal(n)
                   for p in (4.0, 6.5, 9.0)])
    periods = np.linspace(2.0, 12.0, 200)
    thetas = np.asarray(pdm_batch(t, ys, periods))
    assert thetas.shape == (b, 200)
    for i in range(b):
        np.testing.assert_allclose(
            thetas[i], np.asarray(pdm_scan(t, ys[i], periods)), rtol=1e-10
        )
    ms = (ys - ys.max(axis=1, keepdims=True)) / (
        2 * (ys.max(axis=1, keepdims=True) - ys.min(axis=1, keepdims=True))
    ) + 0.25
    ells = np.asarray(string_length_batch(t, ms, periods))
    for i in range(b):
        np.testing.assert_allclose(
            ells[i], np.asarray(string_length_scan(t, ms[i], periods)),
            rtol=1e-10,
        )


def test_string_length_fast_exact_top_peak():
    """The fast (binned + rescoring) path lands the SAME exact minimum as
    the full exact scan, with the exact value there (VERDICT r2 item 7)."""
    from periodicity_tpu.phase import (
        string_length_scan, string_length_scan_fast,
    )

    for seed, period, noise in (
        (0, 7.7, 0.2), (1, 3.3, 0.2), (2, 13.0, 0.2), (3, 7.7, 0.5),
    ):
        rng = np.random.default_rng(seed)
        n = 2000
        t = np.sort(rng.uniform(0, 200.0, n))
        y = np.sin(2 * np.pi * t / period) + noise * rng.standard_normal(n)
        m = (y - y.max()) / (2 * (y.max() - y.min())) + 0.25
        periods = np.linspace(0.5, 100.0, 20000)
        exact = np.asarray(string_length_scan(t, m, periods, batch_size=512))
        fast = np.asarray(
            string_length_scan_fast(t, m, periods, batch_size=512)
        )
        i_ex, i_fa = int(exact.argmin()), int(fast.argmin())
        assert i_ex == i_fa, (seed, i_ex, i_fa)
        assert fast[i_fa] == pytest.approx(exact[i_ex], rel=1e-6)


def test_string_length_estimator_fast_default():
    t, y = _sine()
    sl = StringLength(n_periods=3000)
    assert sl.method == "fast"
    ell = sl(TSeries(t, y))
    best = float(np.asarray(ell.period)[np.argmin(np.asarray(ell.values))])
    assert best == pytest.approx(7.3, abs=0.2)
    # exact mode agrees on the best period
    ell_e = StringLength(n_periods=3000, method="exact")(TSeries(t, y))
    best_e = float(
        np.asarray(ell_e.period)[np.argmin(np.asarray(ell_e.values))]
    )
    assert best == pytest.approx(best_e, abs=1e-9)


def _bls_sr2_numpy(t, y, w, period, widths, nbins):
    """Brute-force KZM02 weighted signal residue over the same phase bins
    (phase origin t[0], matching bls_scan's epoch-safe fold)."""
    yc = y - np.sum(w * y)
    phi = ((t - t[0]) / period) % 1.0
    b = np.clip((phi * nbins).astype(np.int64), 0, nbins - 1)
    r_bin = np.bincount(b, weights=w, minlength=nbins)
    s_bin = np.bincount(b, weights=w * yc, minlength=nbins)
    best = -np.inf
    for wd in widths:
        for i in range(nbins):
            idx = (np.arange(i, i + wd)) % nbins
            r = r_bin[idx].sum()
            s = s_bin[idx].sum()
            if 1e-12 < r < 1 - 1e-12:
                best = max(best, s * s / (r * (1 - r) + 1e-12))
    return best


def _transit(n=800, period=5.17, q=0.05, depth=0.02, noise=0.0, seed=3):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 60.0, n))
    phi = (t / period) % 1.0
    y = np.where(phi < q, -depth, 0.0) + noise * rng.standard_normal(n)
    return t, y


def test_bls_scan_matches_numpy_oracle():
    from periodicity_tpu.phase import bls_scan

    t, y = _transit(n=300, noise=0.01)
    rng = np.random.default_rng(7)
    err = 0.01 * (1 + rng.uniform(size=t.size))
    inv = 1.0 / err**2
    w = inv / inv.sum()
    periods = np.linspace(2.0, 9.0, 40)
    widths, nbins = (3, 13, 26), 128
    power, _, _, _ = bls_scan(t, y, w, periods, widths=widths, nbins=nbins)
    power = np.asarray(power)
    for j in (0, 9, 21, 39):
        ref = _bls_sr2_numpy(t, y, w, periods[j], widths, nbins)
        assert power[j] == pytest.approx(ref, rel=1e-6), j


def test_bls_recovers_transit():
    from periodicity_tpu.phase import BLS

    period, depth, q = 5.17, 0.02, 0.05
    t, y = _transit(period=period, q=q, depth=depth, noise=0.003)
    bls = BLS(durations=(0.02, 0.05, 0.1), nbins=256, p_min=2.0, p_max=20.0,
              n_periods=4000)
    pg = bls(TSeries(t, y), err=np.full(t.size, 0.003))
    assert bls.best_period == pytest.approx(period, rel=0.01)
    assert bls.best_depth == pytest.approx(depth, rel=0.15)
    assert bls.best_duration == pytest.approx(q * period, rel=0.3)
    # epoch: the injected transit covers phase [0, q) -> mid-phase q/2
    phase_mid = (bls.best_transit_time / bls.best_period) % 1.0
    assert phase_mid == pytest.approx(q / 2, abs=0.02)
    assert bls.best_snr > 20.0
    # periodogram surface: FSeries with per-period attrs
    assert pg.values.shape == (4000,)
    for key in ("depth", "duration", "transit_time"):
        assert np.asarray(pg.attrs[key]).shape == (4000,)


def test_bls_no_err_default_weights():
    from periodicity_tpu.phase import BLS

    t, y = _transit(noise=0.004, seed=11)
    bls = BLS(p_min=2.0, p_max=20.0, n_periods=3000)
    bls(TSeries(t, y))
    assert bls.best_period == pytest.approx(5.17, rel=0.01)


def test_bls_batch_matches_per_series():
    from periodicity_tpu.phase import bls_batch, bls_scan

    rng = np.random.default_rng(5)
    t = np.sort(rng.uniform(0, 60.0, 400))
    ys, ws = [], []
    for b, period in enumerate((4.1, 6.9, 9.3)):
        phi = (t / period) % 1.0
        ys.append(np.where(phi < 0.05, -0.02, 0.0)
                  + 0.005 * rng.standard_normal(t.size))
        err = 0.005 * (1 + rng.uniform(size=t.size))
        inv = 1.0 / err**2
        ws.append(inv / inv.sum())
    ys, ws = np.stack(ys), np.stack(ws)
    periods = np.linspace(2.0, 12.0, 300)
    widths, nbins = (3, 13), 128
    batched = bls_batch(t, ys, ws, periods, widths=widths, nbins=nbins)
    for b in range(3):
        single = bls_scan(t, ys[b], ws[b], periods, widths=widths,
                          nbins=nbins)
        for bt, st in zip(batched, single):
            np.testing.assert_allclose(
                np.asarray(bt[b]), np.asarray(st), rtol=1e-12
            )


def test_bls_attrs_aligned_with_periodogram_order():
    """FSeries sorts by ascending frequency (reversing the ascending-period
    scan order); the per-period attrs must ride the same permutation so
    attrs[i] describes values[i]."""
    from periodicity_tpu.phase import BLS

    period, depth, q = 5.17, 0.02, 0.05
    t, y = _transit(period=period, q=q, depth=depth, noise=0.003)
    bls = BLS(durations=(0.02, 0.05, 0.1), nbins=256, p_min=2.0, p_max=20.0,
              n_periods=4000)
    pg = bls(TSeries(t, y), err=np.full(t.size, 0.003))
    i = int(np.argmax(np.asarray(pg.values)))
    assert float(np.asarray(pg.period)[i]) == pytest.approx(
        bls.best_period, rel=1e-12
    )
    assert float(np.asarray(pg.attrs["depth"])[i]) == pytest.approx(
        bls.best_depth, rel=1e-12
    )
    assert float(np.asarray(pg.attrs["duration"])[i]) == pytest.approx(
        bls.best_duration, rel=1e-12
    )
    assert float(np.asarray(pg.attrs["transit_time"])[i]) == pytest.approx(
        bls.best_transit_time, rel=1e-12
    )


def test_bls_transit_time_wraps_into_period_range():
    """A transit centered at phase 0 (box straddling the fold boundary)
    must still report an epoch in [0, P)."""
    from periodicity_tpu.phase import BLS

    period, depth, q = 5.17, 0.02, 0.05
    rng = np.random.default_rng(5)
    t = np.sort(rng.uniform(0, 60.0, 800))
    phi = (t / period) % 1.0
    in_tr = (phi < q / 2) | (phi > 1.0 - q / 2)
    y = np.where(in_tr, -depth, 0.0) + 0.003 * rng.standard_normal(800)
    bls = BLS(durations=(0.02, 0.05, 0.1), nbins=256, p_min=2.0, p_max=20.0,
              n_periods=4000)
    pg = bls(TSeries(t, y), err=np.full(t.size, 0.003))
    assert bls.best_period == pytest.approx(period, rel=0.01)
    assert 0.0 <= bls.best_transit_time < bls.best_period
    tt = np.asarray(pg.attrs["transit_time"])
    periods_sorted = np.asarray(pg.period)
    assert np.all(tt >= 0.0) and np.all(tt < periods_sorted)
    # mid-transit phase ~0 (mod 1): distance to the nearest integer phase
    phase_mid = (bls.best_transit_time / bls.best_period) % 1.0
    assert min(phase_mid, 1.0 - phase_mid) < 0.02


def test_bls_pallas_binner_matches_scatter():
    """The one-hot MXU fold (ops/pallas_bls, interpret mode on CPU)
    reproduces the scatter path's BLS statistics — same powers up to the
    documented one-ulp binning divergence (frac(t*f) vs (t/p)%1), same
    recovered peak."""
    import jax

    from periodicity_tpu.ops import pallas_bls
    from periodicity_tpu.phase import bls_scan

    rng = np.random.default_rng(0)
    n = 500
    t = np.sort(rng.uniform(0, 100.0, n)).astype(np.float32)
    phi = (t / 7.7) % 1.0
    y = (np.where(phi < 0.05, -0.02, 0.0)
         + 0.003 * rng.standard_normal(n)).astype(np.float32)
    w = np.full(n, 1.0 / n, np.float32)
    periods = np.linspace(2.0, 20.0, 320).astype(np.float32)
    widths = (3, 6, 13)

    p_sc, d_sc, di_sc, bi_sc = bls_scan(t, y, w, periods, widths=widths)
    # route the pallas path through the interpreter (no TPU on CI)
    orig = pallas_bls.fold_bins_onehot

    def interp_fold(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pallas_bls.fold_bins_onehot = interp_fold
    try:
        jax.clear_caches()  # bls_scan is jitted; drop the cached trace
        p_pl, d_pl, di_pl, bi_pl = bls_scan(t, y, w, periods,
                                            widths=widths, binner="pallas")
    finally:
        pallas_bls.fold_bins_onehot = orig
        jax.clear_caches()
    p_sc, p_pl = np.asarray(p_sc), np.asarray(p_pl)
    # identical peak period and power; per-period powers agree except
    # where a boundary sample hops one bin
    assert int(np.argmax(p_sc)) == int(np.argmax(p_pl))
    np.testing.assert_allclose(p_pl.max(), p_sc.max(), rtol=1e-4)
    agree = np.isclose(p_pl, p_sc, rtol=1e-3, atol=1e-9)
    assert agree.mean() > 0.95


def test_aov_ce_pallas_binner_matches_scatter():
    """AoV and conditional entropy through the generalized one-hot fold
    (interpret mode) match the scatter paths up to the documented one-ulp
    binning divergence — identical best periods, near-identical curves."""
    import jax

    from periodicity_tpu.ops import pallas_bls
    from periodicity_tpu.phase import aov_scan, conditional_entropy_scan

    rng = np.random.default_rng(1)
    n = 400
    t = np.sort(rng.uniform(0, 100.0, n))
    y = np.sin(2 * np.pi * t / 7.7) + 0.2 * rng.standard_normal(n)
    periods = np.linspace(2.0, 20.0, 256)

    orig = pallas_bls.fold_onehot

    def interp_fold(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    a_sc = np.asarray(aov_scan(t, y, periods, nb=9))
    h_sc = np.asarray(conditional_entropy_scan(t, y, periods,
                                               n_phi=10, n_mag=5))
    pallas_bls.fold_onehot = interp_fold
    try:
        jax.clear_caches()
        a_pl = np.asarray(aov_scan(t, y, periods, nb=9, binner="pallas"))
        h_pl = np.asarray(conditional_entropy_scan(
            t, y, periods, n_phi=10, n_mag=5, binner="pallas"))
    finally:
        pallas_bls.fold_onehot = orig
        jax.clear_caches()
    assert int(np.argmax(a_sc)) == int(np.argmax(a_pl))
    assert int(np.argmin(h_sc)) == int(np.argmin(h_pl))
    assert np.isclose(a_pl, a_sc, rtol=1e-3).mean() > 0.95
    assert np.isclose(h_pl, h_sc, rtol=1e-3, atol=1e-6).mean() > 0.95
