"""GLS tests: reference grid-spec/peak-recovery invariants plus exactness
checks of the fast path against the direct (fp-exact) path."""

import numpy as np
import pytest

from periodicity_tpu.core import TSeries
from periodicity_tpu.spectral import GLS


def test_gls_default_frequency_grid():
    t0 = 2.5
    ts = 0.1
    fs = 1 / ts
    f0 = 1 / t0
    time = np.arange(0, t0 + ts, ts)
    signal = TSeries(time)
    gls = GLS(n=1)
    ls = gls(signal)
    freq = np.asarray(ls.frequency)
    assert sorted(freq) == list(freq)
    assert freq[0] == pytest.approx(f0 / 2)
    assert np.round(freq[-1], 6) == fs / 2
    assert np.max(np.abs(np.diff(freq) - f0)) < 1e-10


def test_can_find_periods():
    sine = TSeries(values=np.sin((np.arange(100) / 100) * 20 * np.pi))
    gls = GLS()
    ls = gls(sine)
    assert float(ls.period_at_highest_peak) == 10.0


def test_fast_matches_direct():
    rng = np.random.default_rng(0)
    n = 300
    t = np.sort(rng.uniform(0, 40, n))
    y = np.sin(2 * np.pi * t / 3.3) + 0.3 * rng.standard_normal(n)
    err = 0.1 + 0.2 * rng.random(n)
    sig = TSeries(t, y)
    p_fast = np.asarray(GLS(method="fast")(sig, err=err).values)
    p_direct = np.asarray(GLS(method="direct")(sig, err=err).values)
    # extirpolation approximation error stays small and peaks agree
    assert np.max(np.abs(p_fast - p_direct)) < 2e-3
    assert np.argmax(p_fast) == np.argmax(p_direct)


def test_direct_matches_naive_gls():
    """Direct path against a from-scratch Zechmeister-Kurster evaluation."""
    rng = np.random.default_rng(1)
    n = 120
    t = np.sort(rng.uniform(0, 25, n))
    y = np.cos(2 * np.pi * t / 4.0) + 0.2 * rng.standard_normal(n)
    err = np.full(n, 0.3)
    sig = TSeries(t, y)
    ls = GLS(method="direct")(sig, err=err)
    freq = np.asarray(ls.frequency)
    # naive weighted GLS with floating mean, per Zechmeister & Kurster (2009)
    w = err**-2.0
    w = w / w.sum()
    yc = y - np.dot(w, y)
    powers = []
    for f in freq:
        omega = 2 * np.pi * f
        # solve weighted LSQ for a sin + b cos + c
        X = np.vstack([np.sin(omega * t), np.cos(omega * t), np.ones_like(t)])
        W = np.diag(w)
        theta = np.linalg.solve(X @ W @ X.T, X @ W @ yc)
        chi2_0 = np.dot(w, yc**2)
        chi2 = np.dot(w, (yc - theta @ X) ** 2)
        powers.append((chi2_0 - chi2) / chi2_0)
    np.testing.assert_allclose(np.asarray(ls.values), powers, rtol=1e-6, atol=1e-9)


def test_window_and_model():
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0, 30, 200))
    y = np.sin(2 * np.pi * t / 5.0)
    sig = TSeries(t, y)
    gls = GLS()
    ls = gls(sig)
    win = gls.window()
    assert win.size == ls.size
    f0 = 1 / 5.0
    fit = gls.model(t, f0)
    assert np.corrcoef(np.asarray(fit.values), y)[0, 1] > 0.99


def test_bootstrap_fap():
    rng = np.random.default_rng(3)
    t = np.arange(100.0)
    y = rng.standard_normal(100)
    gls = GLS()
    ls = gls(TSeries(t, y))
    reps = gls.bootstrap(16, random_seed=0)
    assert reps.shape == (16,)
    assert np.all(np.isfinite(reps))
    # max power of pure noise should not be wildly above the null
    assert gls.fap(float(ls.amax())) >= 0.0
    assert gls.fal(0.5) > 0.0


def test_bglst_recovers_period_with_trend():
    """BGLST stays on target in the presence of a secular linear trend."""
    from periodicity_tpu.spectral import BGLST

    rng = np.random.default_rng(5)
    t = np.sort(rng.uniform(0, 60, 400))
    y = np.sin(2 * np.pi * t / 6.1) + 0.05 * t + 0.2 * rng.standard_normal(400)
    sig = TSeries(t, y)
    bg = BGLST()(sig, err=np.full(400, 0.2))
    f = np.asarray(bg.frequency)
    best = 1.0 / f[int(np.argmax(np.asarray(bg.values)))]
    assert best == pytest.approx(6.1, abs=0.1)


def test_gls_power_batch_matches_loop():
    from periodicity_tpu.spectral import gls_power, gls_power_batch

    rng = np.random.default_rng(6)
    n, b = 200, 5
    t = np.sort(rng.uniform(0, 30, n))
    ys = np.stack([np.sin(2 * np.pi * t / p) for p in [3.0, 4.5, 6.0, 7.5, 9.0]])
    errs = np.full((b, n), 0.2)
    df, fmin, nf = 0.005, 0.0025, 1024
    batch = np.asarray(gls_power_batch(t, ys, errs, df, fmin, nf))
    for i in range(b):
        single = np.asarray(gls_power(t, ys[i], errs[i], df, fmin, nf))
        np.testing.assert_allclose(batch[i], single, rtol=1e-10)


def test_fast_path_f32_accuracy_characterized():
    """Characterize the float32 fast path against float64: peak location is
    grid-exact and power error stays within the extirpolation budget
    (documented in docs/getting_started.md)."""
    rng = np.random.default_rng(7)
    n = 2000
    t = np.sort(rng.uniform(0, 300, n))
    y = np.sin(2 * np.pi * t / 9.3) + 0.3 * rng.standard_normal(n)
    err = np.full(n, 0.3)
    from periodicity_tpu.spectral import gls_power

    df, fmin, nf = 1e-4, 5e-5, 8192
    p64 = np.asarray(gls_power(t, y, err, df, fmin, nf))
    p32 = np.asarray(
        gls_power(
            t.astype(np.float32), y.astype(np.float32), err.astype(np.float32),
            np.float32(df), np.float32(fmin), nf,
        )
    )
    assert np.argmax(p32) == np.argmax(p64)
    assert np.max(np.abs(p32 - p64)) < 5e-3


def test_trig_sum_batch_matches_single():
    from periodicity_tpu.ops.trig_sum import trig_sum, trig_sum_batch

    rng = np.random.default_rng(3)
    n, b, nf = 500, 5, 256
    t = np.sort(rng.uniform(0, 40, n))
    ws = rng.standard_normal((b, n))
    df, fmin = 0.01, 0.005
    S, C = trig_sum_batch(t, ws, df, nf, fmin)
    for i in range(b):
        Si, Ci = trig_sum(t, ws[i], df, nf, fmin)
        np.testing.assert_allclose(np.asarray(S[i]), np.asarray(Si), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(C[i]), np.asarray(Ci), rtol=1e-9, atol=1e-12)


def test_gls_power_batch_odd_batch_and_chunking():
    """Batch sizes that don't divide the chunk exercise the padding path."""
    from periodicity_tpu.spectral import gls_power, gls_power_batch

    rng = np.random.default_rng(4)
    n, b = 400, 5
    t = np.sort(rng.uniform(0, 50, n))
    ys = np.stack([np.sin(2 * np.pi * t / p) + 0.1 * rng.standard_normal(n)
                   for p in (3.0, 5.0, 7.0, 9.0, 11.0)])
    errs = np.full((b, n), 0.1)
    df, fmin, nf = 0.005, 0.0025, 512
    batch = np.asarray(gls_power_batch(t, ys, errs, df, fmin, nf,
                                       batch_size=2))
    for i in range(b):
        single = np.asarray(gls_power(t, ys[i], errs[i], df, fmin, nf))
        np.testing.assert_allclose(batch[i], single, rtol=1e-8, atol=1e-10)


def test_trig_sum_pair_matches_separate_sums():
    """Conjugate-symmetry pairing (fmin = q*df/2) reproduces two separate
    trig sums within the extirpolation budget."""
    from periodicity_tpu.ops.trig_sum import trig_sum, trig_sum_pair

    rng = np.random.default_rng(5)
    n, nf = 1500, 2048
    t = np.sort(rng.uniform(0, 200, n))
    w1 = rng.standard_normal(n) / n
    w2 = rng.uniform(0.5, 1.5, n) / n
    df = 1e-3
    for q in (1, 2):
        fmin = q * df / 2
        S1, C1 = trig_sum(t, w1, df, nf, fmin)
        S2, C2 = trig_sum(t, w2, df, nf, fmin)
        P1s, P1c, P2s, P2c = trig_sum_pair(t, w1, w2, df, nf, fmin, q=q)
        scale = float(np.max(np.abs(np.asarray(C2))))
        for got, want in [(P1s, S1), (P1c, C1), (P2s, S2), (P2c, C2)]:
            assert np.max(np.abs(np.asarray(got) - np.asarray(want))) < 1e-5 * max(scale, 1e-3)


def test_gls_power_pair_q_matches_unpaired():
    from periodicity_tpu.spectral import gls_power

    rng = np.random.default_rng(6)
    n = 1200
    t = np.sort(rng.uniform(0, 150, n))
    y = np.sin(2 * np.pi * t / 9.0) + 0.2 * rng.standard_normal(n)
    err = np.full(n, 0.2)
    df = 1e-3
    fmin = df / 2
    nf = 4096
    p0 = np.asarray(gls_power(t, y, err, df, fmin, nf))
    p1 = np.asarray(gls_power(t, y, err, df, fmin, nf, pair_q=1))
    assert np.argmax(p0) == np.argmax(p1)
    np.testing.assert_allclose(p1, p0, atol=5e-5 * p0.max())


def test_gls_power_batch_pair_q_matches_unpaired():
    from periodicity_tpu.spectral import gls_power_batch

    rng = np.random.default_rng(8)
    n, b = 600, 3
    t = np.sort(rng.uniform(0, 80, n))
    ys = np.stack([np.sin(2 * np.pi * t / p) + 0.1 * rng.standard_normal(n)
                   for p in (4.0, 6.5, 9.0)])
    errs = np.full((b, n), 0.1)
    df = 1e-3
    fmin = df / 2
    nf = 2048
    p0 = np.asarray(gls_power_batch(t, ys, errs, df, fmin, nf))
    p1 = np.asarray(gls_power_batch(t, ys, errs, df, fmin, nf, pair_q=1))
    np.testing.assert_allclose(p1, p0, atol=5e-5 * p0.max())


def test_gls_refine_lands_exact_peak():
    """refine(): fast f32-style scan -> exact direct zoom recovers the
    true frequency ~zoom x more precisely than the fast grid."""
    rng = np.random.default_rng(2)
    n = 1500
    t = np.sort(rng.uniform(0, 80.0, n))
    f_true = 1.0 / 7.31
    y = np.sin(2 * np.pi * f_true * t) + 0.2 * rng.standard_normal(n)
    err = np.full(n, 0.2)

    gls = GLS()
    fs = gls(TSeries(t, y), err=err)
    df = gls.frequency[1] - gls.frequency[0]
    coarse_err = abs(1.0 / float(fs.period_at_highest_peak) - f_true)

    refined = gls.refine(n_peaks=2, zoom=32)
    fine_err = abs(gls.refined_fbest - f_true)
    assert fine_err <= coarse_err + 1e-12
    assert fine_err < df / 4
    # refined segment powers exceed-or-match the fast peak (exact method)
    assert float(np.max(np.asarray(refined.values))) > 0.5


def test_gls_pallas_gridder_matches_scatter():
    """The one-hot MXU gridding kernel (interpret mode on CPU) produces
    the same periodogram as the XLA scatter path."""
    from periodicity_tpu.spectral import gls_power

    rng = np.random.default_rng(5)
    n, nf = 3000, 8192
    t = np.sort(rng.uniform(0, 100.0, n)).astype(np.float32)
    y = (np.sin(2 * np.pi * t / 7.7) + 0.3 * rng.standard_normal(n)).astype(
        np.float32
    )
    err = np.full(n, 0.3, np.float32)
    df = np.float32(0.5 / 100.0)
    fmin = np.float32(df / 2)
    ref = np.asarray(gls_power(t, y, err, df, fmin, nf, pair_q=1))
    got = np.asarray(
        gls_power(t, y, err, df, fmin, nf, pair_q=1, gridder="pallas")
    )
    # identical math up to the split-bf16 MXU accumulation (~1.6e-5 rel)
    assert np.max(np.abs(got - ref)) < 5e-4
    assert np.argmax(got) == np.argmax(ref)


def test_gls_refine_respects_fit_mean():
    """refine() reuses the fit_mean the periodogram was computed with."""
    rng = np.random.default_rng(9)
    n = 800
    t = np.sort(rng.uniform(0, 60.0, n))
    y = np.sin(2 * np.pi * t / 6.2)
    err = np.full(n, 0.3)
    gls = GLS()
    gls(TSeries(t, y), err=err, fit_mean=False)
    refined = gls.refine(zoom=16)
    # the refined zoom of the no-mean model tracks the no-mean direct power
    from periodicity_tpu.spectral import gls_power

    f = np.asarray(refined.frequency)
    direct = np.asarray(
        gls_power(t, y, err, f[1] - f[0], f[0], f.size,
                  fit_mean=False, method="direct")
    )
    np.testing.assert_allclose(
        np.asarray(refined.values), direct, rtol=1e-6, atol=1e-12
    )


def test_gls_high_order_taps_accuracy():
    """taps=8 extirpolation cuts the float64 fast-path error ~30x vs the
    4-tap reference order (both against the exact direct method)."""
    from periodicity_tpu.spectral import gls_power

    rng = np.random.default_rng(0)
    n, nf = 2000, 8192
    t = np.sort(rng.uniform(0, 100.0, n))
    y = np.sin(2 * np.pi * t / 7.7) + 0.3 * rng.standard_normal(n)
    err = np.full(n, 0.3)
    df, fmin = 0.5 / 100.0, 0.5 / 200.0
    exact = np.asarray(gls_power(t, y, err, df, fmin, nf, method="direct"))
    err4 = np.max(np.abs(
        np.asarray(gls_power(t, y, err, df, fmin, nf, pair_q=1)) - exact))
    err8 = np.max(np.abs(
        np.asarray(gls_power(t, y, err, df, fmin, nf, pair_q=1, taps=8))
        - exact))
    assert err8 < err4 / 10
    assert err8 < 1e-5
    # the pallas gridder handles higher orders too (interpret mode)
    err8p = np.max(np.abs(
        np.asarray(gls_power(t, y, err, df, fmin, nf, pair_q=1, taps=8,
                             gridder="pallas")) - exact))
    assert err8p < 1e-5


def test_trig_sum_batch_taps8_matches_single():
    """taps= propagates through the batched row-scatter kernels
    (trig_sum_batch / trig_sum_batch_pair) with per-row parity against the
    single-series kernel at the same order."""
    from periodicity_tpu.ops.trig_sum import (
        trig_sum, trig_sum_batch, trig_sum_batch_pair, trig_sum_pair,
    )

    rng = np.random.default_rng(3)
    n, b, nf = 500, 3, 256
    t = np.sort(rng.uniform(0, 40, n))
    ws = rng.standard_normal((b, n))
    w2 = np.abs(rng.standard_normal((b, n))) + 0.1
    df, fmin = 0.01, 0.005
    S, C = trig_sum_batch(t, ws, df, nf, fmin, taps=8)
    for i in range(b):
        Si, Ci = trig_sum(t, ws[i], df, nf, fmin, taps=8)
        np.testing.assert_allclose(np.asarray(S[i]), np.asarray(Si),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(C[i]), np.asarray(Ci),
                                   rtol=1e-9, atol=1e-12)
    S1, C1, S2, C2 = trig_sum_batch_pair(t, ws, w2, df, nf, fmin, q=1,
                                         taps=8)
    for i in range(b):
        s1, c1, s2, c2 = trig_sum_pair(t, ws[i], w2[i], df, nf, fmin, q=1,
                                       taps=8)
        for got, want in ((S1[i], s1), (C1[i], c1), (S2[i], s2), (C2[i], c2)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-9, atol=1e-12)


def test_gls_power_batch_taps_kwarg():
    """gls_power_batch(taps=8) matches per-series gls_power(taps=8)."""
    from periodicity_tpu.spectral import gls_power, gls_power_batch

    rng = np.random.default_rng(4)
    n, b = 400, 3
    t = np.sort(rng.uniform(0, 50, n))
    ys = np.stack([np.sin(2 * np.pi * t / p) + 0.1 * rng.standard_normal(n)
                   for p in (3.0, 5.0, 7.0)])
    errs = np.full((b, n), 0.1)
    df, fmin, nf = 0.005, 0.0025, 512
    batch = np.asarray(gls_power_batch(t, ys, errs, df, fmin, nf, taps=8))
    for i in range(b):
        single = np.asarray(gls_power(t, ys[i], errs[i], df, fmin, nf,
                                      taps=8))
        np.testing.assert_allclose(batch[i], single, rtol=1e-8, atol=1e-10)


def test_bglst_fast_matches_direct():
    """The Press-Rybicki BGLST assembly matches the exact direct
    evaluation to ~1e-8 on the default-style grid (VERDICT r2 item 9)."""
    from periodicity_tpu.spectral import bglst_log_ml, bglst_log_ml_fast

    rng = np.random.default_rng(5)
    n, nf = 600, 2000
    t = np.sort(rng.uniform(0, 80, n))
    y = np.sin(2 * np.pi * t / 7.0) + 0.02 * t + 0.3 * rng.standard_normal(n)
    w = np.full(n, 0.3) ** -2.0
    df = 1.0 / 5 / (t[-1] - t[0])
    fmin = df / 2
    direct = np.asarray(bglst_log_ml(t, y, w, df, fmin, nf))
    fast = np.asarray(bglst_log_ml_fast(t, y, w, df, fmin, nf))
    assert np.argmax(direct) == np.argmax(fast)
    np.testing.assert_allclose(fast, direct, atol=5e-8)


def test_bglst_near_singular_design_stays_finite():
    """A nearly collinear [cos, sin, t, 1] design (very small n, trial
    frequencies far below 1/baseline so cos~1 and sin~t) must yield
    finite log-ML, not a NaN from a non-positive Cholesky pivot — the
    unrolled SPD solve carries the same tiny ridge as the multiterm/
    multiband Gram solves (ADVICE r4)."""
    from periodicity_tpu.spectral import bglst_log_ml, bglst_log_ml_fast

    rng = np.random.default_rng(7)
    n = 6  # tiny n: the 4-column design is barely overdetermined
    t = np.sort(rng.uniform(0, 10.0, n))
    y = 0.1 * t + 0.01 * rng.standard_normal(n)
    w = np.full(n, 25.0)
    df, fmin, nf = 1e-5, 1e-7, 64  # f*baseline ~ 1e-4: cos ~ 1, sin ~ t
    direct = np.asarray(bglst_log_ml(t, y, w, df, fmin, nf))
    fast = np.asarray(bglst_log_ml_fast(t, y, w, df, fmin, nf))
    assert np.isfinite(direct).all()
    assert np.isfinite(fast).all()


def test_bglst_estimator_fast_default():
    """BGLST() runs the fast path by default and stays trend-robust."""
    from periodicity_tpu.spectral import BGLST

    rng = np.random.default_rng(6)
    t = np.sort(rng.uniform(0, 60, 400))
    y = np.sin(2 * np.pi * t / 6.0) + 0.05 * t + 0.2 * rng.standard_normal(400)
    sig = TSeries(t, y)
    bg = BGLST()
    assert bg.method == "fast"
    fs = bg(sig, err=np.full(400, 0.2))
    best = float(fs.period_at_highest_peak)
    assert abs(best - 6.0) < 0.15


def test_baluev_fap_calibration_against_bootstrap():
    """Baluev (2008) analytic FAP tracks the bootstrap null on pure noise.

    The analytic form is an upper bound that is tight in the detection
    regime; at bootstrap-quantile power levels the two must agree within
    a small factor (not orders of magnitude)."""
    rng = np.random.default_rng(7)
    t = np.arange(100.0)
    y = rng.standard_normal(100)
    gls = GLS()
    gls(TSeries(t, y))
    reps = gls.bootstrap(400, random_seed=1)
    for q in (0.5, 0.9):
        z = float(np.quantile(reps, q))
        boot = 1.0 - q
        analytic = float(gls.fap(z, method="baluev"))
        assert 0.3 * boot < analytic < 4.0 * boot


def test_baluev_fap_properties_and_inverse():
    from periodicity_tpu.spectral import fal_baluev, fap_baluev

    rng = np.random.default_rng(8)
    t = np.sort(rng.uniform(0, 50, 200))
    err = np.full(200, 0.3)
    z = np.linspace(0.01, 0.6, 12)
    f = fap_baluev(t, err, z, fmax=5.0)
    assert np.all((f >= 0) & (f <= 1))
    assert np.all(np.diff(f) < 0)  # monotone decreasing in power
    for target in (0.01, 0.1, 0.5):
        zt = fal_baluev(t, err, target, fmax=5.0)
        assert fap_baluev(t, err, zt, fmax=5.0) == pytest.approx(
            target, rel=1e-6
        )
    # psd normalization: same structure, unbounded power axis
    zp = np.linspace(1.0, 20.0, 10)
    fp = fap_baluev(t, err, zp, fmax=5.0, psd=True)
    assert np.all(np.diff(fp) < 0)
    zt = fal_baluev(t, err, 0.01, fmax=5.0, psd=True)
    assert fap_baluev(t, err, zt, fmax=5.0, psd=True) == pytest.approx(
        0.01, rel=1e-6
    )


def test_gls_fap_fal_method_roundtrip():
    """GLS.fap/fal with method='baluev' invert each other on the
    estimator surface (no bootstrap needed)."""
    rng = np.random.default_rng(9)
    t = np.sort(rng.uniform(0, 30, 150))
    y = rng.standard_normal(150)
    gls = GLS()
    gls(TSeries(t, y), err=np.full(150, 1.0))
    z = gls.fal(0.05, method="baluev")
    assert gls.fap(z, method="baluev") == pytest.approx(0.05, rel=1e-6)
    with pytest.raises(ValueError):
        gls.fap(0.1, method="nope")


def test_gls_power_nfft_override():
    """Smaller extirpolation grids trade bounded accuracy for FFT cost;
    the override must stay close to the default-grid fast path."""
    from periodicity_tpu.models.spectral import gls_power
    from periodicity_tpu.ops.trig_sum import grid_size

    rng = np.random.default_rng(11)
    n, nf = 2000, 10000
    t = np.sort(rng.uniform(0, 100, n))
    y = np.sin(2 * np.pi * t / 7.7) + 0.3 * rng.standard_normal(n)
    e = np.full(n, 0.3)
    df = 1 / (5 * 100.0)
    fmin = df / 2
    p0 = np.asarray(gls_power(t, y, e, df, fmin, nf, pair_q=1))
    half = grid_size(nf, 5) // 2
    p1 = np.asarray(gls_power(t, y, e, df, fmin, nf, pair_q=1, nfft=half))
    p2 = np.asarray(
        gls_power(t, y, e, df, fmin, nf, pair_q=1, nfft=half, taps=8)
    )
    scale = p0.max()
    assert np.max(np.abs(p1 - p0)) / scale < 2e-3
    assert np.max(np.abs(p2 - p0)) / scale < 3e-4
    assert np.argmax(p1) == np.argmax(p0)
    assert np.argmax(p2) == np.argmax(p0)


def test_baluev_fap_fit_mean_dispatch():
    """fit_mean=False has different degrees of freedom (Nh=N, Nk=N-2);
    the estimator surface must dispatch on the model it actually scanned."""
    from periodicity_tpu.spectral import fap_baluev

    rng = np.random.default_rng(12)
    t = np.sort(rng.uniform(0, 30, 40))
    err = np.full(40, 1.0)
    f_mean = float(fap_baluev(t, err, 0.35, fmax=3.0, fit_mean=True))
    f_nomean = float(fap_baluev(t, err, 0.35, fmax=3.0, fit_mean=False))
    assert f_mean != f_nomean  # different null distributions
    # estimator surface: a fit_mean=False scan uses the matching dof
    y = rng.standard_normal(40)
    gls = GLS()
    gls(TSeries(t, y), err=err, fit_mean=False)
    zmax = float(np.asarray(gls.periodogram.values).max())
    expected = float(fap_baluev(t, err, zmax,
                                fmax=float(gls.frequency[-1]),
                                fit_mean=False))
    assert float(gls.fap(zmax, method="baluev")) == pytest.approx(expected)
    z = gls.fal(0.1, method="baluev")
    assert gls.fap(z, method="baluev") == pytest.approx(0.1, rel=1e-6)
