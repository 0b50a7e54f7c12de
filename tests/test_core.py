"""Core container tests, mirroring the reference's tests/test_core.py and
extending with scipy golden-value parity checks."""

import numpy as np
import pytest

from periodicity_tpu.core import TSeries


def test_time_array_is_always_sorted():
    sig = TSeries([3, 2, 1], [3, 5, 7])
    assert all(np.asarray(sig.time) == [1, 2, 3])
    assert all(np.asarray(sig.values) == [7, 5, 3])


def test_input_arrays_with_different_sizes():
    with pytest.raises(ValueError):
        _ = TSeries([1, 2], [1, 2, 3])


def test_dt_of_nonuniform_samples():
    sig = TSeries([1, 3, 4], [1, 1, 1])
    assert float(sig.median_dt) == 1.5
    with pytest.raises(AttributeError):
        _ = sig.dt


def test_baseline():
    assert float(TSeries(np.arange(10)).baseline) == 9


def test_nonuniform_slice_of_uniform_signal():
    sig = TSeries(np.arange(10))
    assert float(sig.dt) == 1.0
    sig_slice = sig[[2, 5, 6]]
    with pytest.raises(AttributeError):
        _ = sig_slice.dt


def test_get_constant_envelope():
    t = np.linspace(0, 100, 1001)
    sig = TSeries(t, np.sin(t))
    upper1, lower1 = sig.get_envelope()
    assert float(np.abs(upper1 - 1).amax()) < 2e-3
    assert float(np.abs(lower1 + 1).amax()) < 2e-3
    upper2, lower2 = sig.get_envelope(pad_width=2)
    assert float(np.abs(upper2 - 1).amax()) < 2e-3
    assert float(np.abs(lower2 + 1).amax()) < 2e-3
    upper3, lower3 = sig.get_envelope(pad_width=10)
    assert np.allclose(np.asarray(upper2.values), np.asarray(upper3.values))
    assert np.allclose(np.asarray(lower2.values), np.asarray(lower3.values))


def test_teo_of_sine_wave():
    t = np.linspace(0, 100, 100_001)
    sig = TSeries(t, np.sin(t))
    teo = sig.TEO
    assert np.allclose(np.asarray(teo[:-2].values), 1.0)


def test_acf_of_sine_matches_lag_zero_normalization():
    t = np.arange(512) * 0.1
    sig = TSeries(t, np.sin(2 * np.pi * t / 3.0))
    r = sig.acf()
    assert float(r.values[0]) == pytest.approx(1.0)
    # ACF of a periodic signal peaks near the period
    peaks = r.find_peaks()
    assert float(np.asarray(peaks.time)[0]) == pytest.approx(3.0, abs=0.2)


def test_butterworth_matches_scipy():
    from scipy import signal as ssig

    rng = np.random.default_rng(0)
    t = np.arange(400) * 0.5
    x = rng.standard_normal(400)
    sig = TSeries(t, x)
    got = np.asarray(sig.butterworth(fmin=0.05, fmax=0.3).values)
    sos = ssig.butter(5, [0.05 / 1.0, 0.3 / 1.0], btype="bandpass", output="sos")
    ref = ssig.sosfiltfilt(sos, x)
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)


def test_fold_and_arithmetic():
    sig = TSeries(np.arange(10.0), np.arange(10.0))
    folded = sig.fold(4.0)
    assert np.all((np.asarray(folded.time) >= 0) & (np.asarray(folded.time) < 1))
    doubled = sig * 2 + 1
    assert np.allclose(np.asarray(doubled.values), np.arange(10.0) * 2 + 1)
    assert float(np.mean(sig)) == pytest.approx(4.5)
    assert float(np.std(sig)) == pytest.approx(np.std(np.arange(10.0)))


def test_max_returns_single_element_series():
    sig = TSeries([0.0, 1.0, 2.0], [5.0, 9.0, 3.0])
    m = sig.max()
    assert m.size == 1
    assert float(m.values[0]) == 9.0
    scaled = (sig - sig.max()) / (2 * (sig.max() - sig.min())) + 0.25
    assert float(scaled.amax()) == pytest.approx(0.25)
    assert float(scaled.amin()) == pytest.approx(-0.25)


def test_gradient_matches_numpy():
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 10, 100))
    x = np.sin(t)
    got = np.asarray(TSeries(t, x).derivative.values)
    ref = np.gradient(x, t)
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_smooth_matches_scipy():
    from scipy import ndimage

    rng = np.random.default_rng(2)
    x = rng.standard_normal(300)
    sig = TSeries(np.arange(300.0), x)
    np.testing.assert_allclose(
        np.asarray(sig.smooth(3.0).values), ndimage.gaussian_filter(x, 3.0), rtol=1e-10
    )
    # boxcar with even width: reference's half-weight edge taps
    w = np.ones(5) / 4
    w[0] /= 2
    w[-1] /= 2
    np.testing.assert_allclose(
        np.asarray(sig.smooth(4, kernel="boxcar").values),
        ndimage.convolve(x, w, mode="mirror"),
        rtol=1e-10,
    )


def test_interpolate_na_linear_and_fills():
    t = np.arange(10.0)
    v = np.array([0, 1, np.nan, 3, 4, np.nan, np.nan, 7, 8, 9], float)
    sig = TSeries(t, v)
    lin = np.asarray(sig.interpolate_na().values)
    np.testing.assert_allclose(lin, np.arange(10.0))
    bf = np.asarray(sig.interpolate_na("bfill").values)
    assert bf[2] == 3 and bf[5] == 7 and bf[6] == 7
    ff = np.asarray(sig.interpolate_na("ffill").values)
    assert ff[2] == 1 and ff[5] == 4 and ff[6] == 4


def test_split_and_join():
    t = np.array([0.0, 1, 2, 10, 11, 12])
    sig = TSeries(t, np.arange(6.0))
    parts = sig.split()
    assert len(parts) == 2
    assert parts[0].size == 3
    rejoined = parts[0].join(parts[1])
    np.testing.assert_allclose(np.asarray(rejoined.time), t)


def test_butterworth_float32_narrow_band_stable():
    """An IIR recursion is not float32-safe: narrow bands put poles within
    ~1e-3 of the unit circle where single-precision feedback amplifies
    rounding into O(1) garbage. sosfiltfilt must route f32 inputs through
    the host float64 recursion, so the filtered output matches the f64
    oracle to f32 resolution even at extreme band edges."""
    from scipy import signal as ssig

    rng = np.random.default_rng(3)
    n = 2048
    t = np.arange(n) * 0.02
    x = rng.standard_normal(n)
    nyq = 0.5 / 0.02
    lo, hi = (1 / 32) / nyq, (1 / 0.06) / nyq  # the ACF-quality band
    hi = min(hi, 0.99)
    sig32 = TSeries(t.astype(np.float32), x.astype(np.float32))
    got = np.asarray(sig32.butterworth(fmin=1 / 32, fmax=1 / 0.06).values)
    sos = ssig.butter(5, [lo, hi], btype="bandpass", output="sos")
    ref = ssig.sosfiltfilt(sos, x)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, ref, atol=5e-4 * np.abs(ref).max())


def test_gaussian_prior_f32_matches_f64():
    """The SpottedStar prior parity point (argmax bin 671) must hold in
    float32 too — it regressed once via f32 IIR instability in the
    ACF-quality band-pass."""
    import jax

    from periodicity_tpu.data import SpottedStar
    from periodicity_tpu.gp import make_gaussian_prior

    x64_was = jax.config.read("jax_enable_x64")
    try:
        jax.config.update("jax_enable_x64", False)
        t, y, _ = SpottedStar()
        sig = TSeries(t, y)
        grid = np.linspace(-3, 5, 1000)
        prior = make_gaussian_prior(sig)(grid)
        assert int(np.argmax(prior)) == 671
    finally:
        jax.config.update("jax_enable_x64", x64_was)
