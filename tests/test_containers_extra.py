"""Extended container coverage: FSeries ranking/FWHM, TFSeries indexing and
reductions, TSeries fill/pad/fold paths, utils subsystems."""

import os

import numpy as np
import pytest

from periodicity_tpu.core import FSeries, TFSeries, TSeries


def test_fseries_period_coordinate_and_ranking():
    f = np.linspace(0.1, 2.0, 400)
    power = np.exp(-0.5 * ((f - 0.5) / 0.02) ** 2) + 0.5 * np.exp(
        -0.5 * ((f - 1.25) / 0.02) ** 2
    )
    fs = FSeries(f, power)
    assert float(fs.period_at_highest_peak) == pytest.approx(2.0, abs=0.05)
    assert float(fs.period_at_highest_prominence) == pytest.approx(2.0, abs=0.05)
    ranked = np.asarray(fs.psort_by_peak())
    assert ranked[0] == pytest.approx(2.0, abs=0.05)
    assert ranked[1] == pytest.approx(0.8, abs=0.05)
    lo, hi = fs.periods_at_half_max()
    assert lo < 2.0 < hi


def test_fseries_fwhm_interval_width():
    f = np.linspace(0.01, 1.0, 1000)
    sd = 0.01
    power = np.exp(-0.5 * ((f - 0.5) / sd) ** 2)
    fs = FSeries(f, power)
    lo, hi = fs.periods_at_half_max()
    # FWHM in frequency = 2.355 sd -> convert to period interval around 2
    f_lo, f_hi = 0.5 - 1.1774 * sd, 0.5 + 1.1774 * sd
    assert lo == pytest.approx(1 / f_hi, rel=0.02)
    assert hi == pytest.approx(1 / f_lo, rel=0.02)


def test_fseries_ifft_roundtrip():
    t = np.arange(64.0)
    sig = TSeries(t, np.sin(2 * np.pi * t / 8))
    back = sig.fft().ifft()
    np.testing.assert_allclose(
        np.asarray(back.values), np.asarray(sig.values), atol=1e-10
    )


def test_fseries_downsample_frequency_and_period():
    f = np.linspace(0.1, 1.0, 300)
    fs = FSeries(f, np.ones(300))
    d1 = fs.downsample(df=0.1)
    assert d1.size <= 10
    d2 = fs.downsample(dp=1.0)
    assert d2.size >= 2
    with pytest.raises(ValueError):
        fs.downsample()
    with pytest.raises(ValueError):
        fs.downsample(df=0.1, dp=1.0)


def test_tfseries_indexing_degrades():
    t = np.arange(10.0)
    f = np.linspace(0.1, 1.0, 5)
    v = np.arange(50.0).reshape(5, 10)
    tf = TFSeries(time=t, frequency=f, values=v)
    row = tf[2]
    assert isinstance(row, TSeries) and row.size == 10
    col = tf[:, 3]
    assert isinstance(col, FSeries) and col.size == 5
    scalar = tf[2, 3]
    assert float(scalar) == v[2, 3]
    sub = tf[1:3, 2:5]
    assert isinstance(sub, TFSeries) and sub.shape == (2, 3)
    # named-dim reductions
    m_t = tf.mean("time")
    assert isinstance(m_t, FSeries) and m_t.size == 5
    m_f = tf.mean("frequency")
    assert isinstance(m_f, TSeries) and m_f.size == 10
    # boolean row mask
    masked = tf[np.array([True, False, True, False, True])]
    assert masked.shape == (3, 10)


def test_tfseries_downsample():
    t = np.arange(40.0)
    f = np.linspace(0.1, 1.0, 16)
    v = np.random.default_rng(0).standard_normal((16, 40))
    tf = TFSeries(time=t, frequency=f, values=v)
    d = tf.downsample(dt=4.0)
    assert d.shape[0] == 16 and d.shape[1] <= 10
    d2 = tf.downsample(df=0.2)
    assert d2.shape[1] == 40 and d2.shape[0] <= 5


def test_tseries_fill_gaps_and_mirror():
    t = np.array([0.0, 1, 2, 3, 7, 8, 9, 10])
    v = np.sin(t)
    sig = TSeries(t, v)
    filled = sig.fill_gaps()
    assert filled.size > sig.size
    assert np.all(np.diff(np.asarray(filled.time)) < 1.5)
    # mirror gap fill runs and leaves no NaNs
    v2 = v.copy()
    sig2 = TSeries(np.arange(8.0), v2)
    holed = TSeries(np.arange(8.0), np.where((np.arange(8) > 2) & (np.arange(8) < 6), np.nan, v2))
    rec = holed.interpolate_na("mirror")
    assert not np.isnan(np.asarray(rec.values)).any()


def test_tseries_acf_unbias_and_float_maxlag():
    t = np.arange(256.0)
    sig = TSeries(t, np.sin(2 * np.pi * t / 16))
    r1 = sig.acf(max_lag=50)
    assert r1.size == 50
    r2 = sig.acf(max_lag=20.0)  # float -> time units
    assert float(np.asarray(r2.time)[-1]) <= 21.0
    # unbias divides by the ACF of self/self (reference core.py:604-606),
    # which requires samples without exact zeros
    sig_nz = TSeries(t, 2.0 + np.sin(2 * np.pi * t / 16))
    r3 = sig_nz.acf(max_lag=50, unbias=True)
    assert float(r3.values[0]) == pytest.approx(1.0)


def test_tseries_curvefit():
    t = np.linspace(0, 10, 100)
    y = 2.5 * np.sin(t) + 0.5
    sig = TSeries(t, y)

    import jax.numpy as jnp

    fit = sig.curvefit(lambda x, a, b: a * jnp.sin(x) + b, p0=[1.0, 0.0])
    coefs = np.asarray(fit.attrs["coefficients"])
    assert coefs[0] == pytest.approx(2.5, rel=1e-4)
    assert coefs[1] == pytest.approx(0.5, abs=1e-4)


def test_numpy_protocol_roundtrip():
    sig = TSeries(np.arange(10.0), np.linspace(-1, 1, 10))
    assert isinstance(np.sin(sig), TSeries)
    assert isinstance(np.abs(sig), TSeries)
    assert float(np.std(sig)) == pytest.approx(np.std(np.linspace(-1, 1, 10)))
    rolled = np.roll(sig, 3)
    assert isinstance(rolled, TSeries)
    z = np.zeros_like(sig)
    assert isinstance(z, TSeries) and float(z.amax()) == 0.0


def test_utils_checkpoint_and_logging(tmp_path):
    import jax.numpy as jnp

    from periodicity_tpu.utils import load_state, log_event, save_state, timer

    state = {"chain": jnp.arange(12.0).reshape(3, 4), "step": jnp.asarray(7)}
    path = os.path.join(tmp_path, "state.npz")
    save_state(path, state)
    restored = load_state(path, state)
    np.testing.assert_allclose(np.asarray(restored["chain"]), np.arange(12.0).reshape(3, 4))
    assert int(restored["step"]) == 7
    log_event("test", n=3)
    with timer("block") as t:
        _ = jnp.sum(jnp.arange(100.0))
    assert t["seconds"] >= 0


def test_smoothing_spline_matches_scipy_and_s_criterion():
    """Reinsch smoothing spline == scipy make_smoothing_spline for given
    lam; the s-targeted wrapper hits FITPACK's residual criterion."""
    from scipy.interpolate import make_smoothing_spline

    from periodicity_tpu.ops.spline import (
        smoothing_spline_eval,
        smoothing_spline_interp,
        smoothing_spline_values,
    )

    rng = np.random.default_rng(0)
    n = 200
    x = np.sort(rng.uniform(0, 10, n))
    y = np.sin(x) + 0.2 * rng.standard_normal(n)
    for lam in [1e-3, 1e-1, 1.0]:
        f, gamma = smoothing_spline_values(x, y, lam)
        ref = make_smoothing_spline(x, y, lam=lam)(x)
        np.testing.assert_allclose(np.asarray(f), ref, atol=1e-8)
    xe = np.linspace(0.5, 9.5, 77)
    f, gamma = smoothing_spline_values(x, y, 0.1)
    np.testing.assert_allclose(
        np.asarray(smoothing_spline_eval(x, f, gamma, xe)),
        make_smoothing_spline(x, y, lam=0.1)(xe),
        atol=1e-8,
    )
    s = 1.6
    fitted = np.asarray(smoothing_spline_interp(x, y, x, s=s))
    assert np.sum((y - fitted) ** 2) == pytest.approx(s, rel=1e-6)
    # container surface: interp(method="spline", s=...)
    sm = TSeries(x, y).interp(xe, method="spline", s=s)
    assert np.isfinite(np.asarray(sm.values)).all()
    # smoothing reduces roughness vs the interpolating spline
    rough = np.sum(np.diff(np.asarray(sm.values), 2) ** 2)
    exact = TSeries(x, y).interp(xe, method="spline")
    rough0 = np.sum(np.diff(np.asarray(exact.values), 2) ** 2)
    assert rough < rough0


def test_fill_gaps_matches_cursor_semantics():
    """Vectorized fill_gaps inserts exactly the timestamps a stepping cursor
    would (reference core.py:703-715)."""
    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(0, 50, 300))
    ts = TSeries(t, rng.standard_normal(300))
    dt = float(ts.median_dt)
    expected = [t[0]]
    for ti in t[1:]:
        prev = expected[-1]
        while (ti - prev) > 1.2 * dt:
            expected.append(prev + dt)
            prev = expected[-1]
        expected.append(ti)
    expected = np.asarray(expected)
    got = np.asarray(ts.fill_gaps().time)
    assert got.size == expected.size
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_downsample_vectorized_matches_per_bin_loop():
    rng = np.random.default_rng(8)
    t = np.sort(rng.uniform(0, 100, 5000))
    v = rng.standard_normal(5000)
    v[rng.integers(0, 5000, 200)] = np.nan
    ts = TSeries(t, v)
    for func in (None, np.median, np.max):
        ds = ts.downsample(2.5, func=func)
        labels = np.arange(t.min(), t.max(), 2.5)
        edges = np.linspace(t.min(), t.max(), labels.size + 1)
        edges[0] -= 1e-9 * (t.max() - t.min())
        which = np.clip(
            np.searchsorted(edges, t, side="left") - 1, 0, labels.size - 1
        )
        out = np.full(labels.size, np.nan)
        for b in range(labels.size):
            vb = v[which == b]
            vb = vb[~np.isnan(vb)]
            if vb.size:
                out[b] = (func or np.mean)(vb)
        keep = ~np.isnan(out)
        np.testing.assert_allclose(
            np.asarray(ds.values), out[keep], atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ds.time), labels[keep], atol=1e-12
        )


def test_interp_quadratic_matches_scipy():
    from scipy.interpolate import make_interp_spline

    rng = np.random.default_rng(9)
    x = np.sort(rng.uniform(0, 10, 60))
    y = np.sin(x) + 0.1 * rng.standard_normal(60)
    xe = np.linspace(x[0], x[-1], 101)
    got = np.asarray(TSeries(x, y).interp(xe, method="quadratic").values)
    want = make_interp_spline(x, y, k=2)(xe)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_tfseries_surface_smoke(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from periodicity_tpu.core import TFSeries

    tf = TFSeries(
        time=np.arange(16.0),
        frequency=np.arange(8.0) + 1,
        values=np.outer(np.arange(8.0), np.ones(16)),
    )
    assert tf.surface() is not None
    plt.savefig(tmp_path / "surf.png")
    plt.close("all")


def test_container_review_regressions():
    """Regression coverage for the containers review findings: ragged
    TFSeries downsample bins, 2-D triangle kernel orientation, float-array
    acf max_lag, interp non-extrapolation, find_dips attrs, axis-number
    reductions, and comparison against unhandled types."""
    import jax.numpy as jnp

    from periodicity_tpu.core import FSeries, TFSeries, TSeries

    # TFSeries.downsample: a bin that is all-NaN in ONE column must be
    # dropped consistently for every column (no ragged stack / misalign)
    t = np.arange(6.0)
    f = np.arange(8.0) + 1.0
    vals = np.ones((8, 6))
    vals[0:4, 1] = np.nan  # half the frequency rows NaN in one column
    tfs = TFSeries(time=t, frequency=f, values=vals)
    down = tfs.downsample(df=4.0)
    assert not np.isnan(np.asarray(down.values)).any()
    assert down.values.shape[0] == down.frequency.shape[0]

    # 2-D triangle smooth: center-weighted pyramid (constant preserved,
    # center weight maximal)
    img = TFSeries(time=np.arange(5.0), frequency=np.arange(5.0),
                   values=np.ones((5, 5)))
    sm = img.smooth(3, kernel="triangle")
    np.testing.assert_allclose(np.asarray(sm.values)[2, 2], 1.0, rtol=1e-12)
    delta = np.zeros((5, 5)); delta[2, 2] = 1.0
    smd = TFSeries(time=np.arange(5.0), frequency=np.arange(5.0),
                   values=delta).smooth(3, kernel="triangle")
    v = np.asarray(smd.values)
    assert v[2, 2] == v.max()  # center of the pyramid, not a corner

    # acf: jnp 0-d float max_lag means a TIME span
    ts = TSeries(np.arange(200.0) * 0.5, np.sin(np.arange(200.0)))
    a1 = ts.acf(max_lag=25.0)
    a2 = ts.acf(max_lag=jnp.asarray(25.0))
    assert a1.size == a2.size
    assert float(a1.time[-1]) <= 25.5

    # interp: no extrapolation for linear/nearest/zero
    ts2 = TSeries(np.array([1.0, 2.0, 3.0]), np.array([1.0, 2.0, 3.0]))
    out = ts2.interp(np.array([0.0, 2.5, 4.0]), method="linear")
    assert np.isnan(np.asarray(out.values)[[0, 2]]).all()
    assert np.asarray(out.values)[1] == 2.5

    # find_dips carries prominences
    dips = TSeries(np.arange(20.0), -np.sin(np.arange(20.0))).find_dips()
    assert "prominences" in dips.attrs and "indices" in dips.attrs

    # axis-number reductions wrap with the surviving coordinate
    m0 = np.mean(tfs, axis=0)
    assert isinstance(m0, TSeries) and m0.size == 6
    m1 = np.mean(tfs, axis=1)
    assert isinstance(m1, FSeries) and m1.size == 8

    # comparisons against unhandled types fall back to Python semantics
    assert (ts2 == "foo") is False
    assert ts2 in [ts2]

    # find_peaks: unknown kwargs raise clearly; height attr set
    import pytest as _pytest

    with _pytest.raises(TypeError):
        ts.find_peaks(not_a_criterion=5)
    pk = TSeries(np.arange(30.0), np.sin(np.arange(30.0))).find_peaks(
        height=0.5
    )
    assert "peak_heights" in pk.attrs


def test_weighted_smoothing_spline_fitpack_criterion():
    """With weights, the s-targeted spline enforces FITPACK's criterion
    sum((w*(y-f))**2) == s (splrep weights the OBJECTIVE by w**2; a
    linear w fits a different curve). Small systems exercise the
    pentadiagonal solver's edge cases."""
    from periodicity_tpu.ops.spline import smoothing_spline_interp

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 80))
    y = np.sin(x) + 0.2 * rng.standard_normal(80)
    w = rng.uniform(0.5, 3.0, 80)
    for s_val in (0.5, 2.0):
        fitted = np.asarray(smoothing_spline_interp(x, y, x, s=s_val, w=w))
        assert np.sum((w * (y - fitted)) ** 2) == pytest.approx(
            s_val, rel=1e-5
        )
    # tiny systems (m = n-2 in {1, 2}) run through the banded solver
    for n_small in (3, 4, 5):
        xs = np.sort(rng.uniform(0, 1, n_small))
        ys = rng.standard_normal(n_small)
        out = np.asarray(
            smoothing_spline_interp(xs, ys, xs, s=0.05)
        )
        assert np.isfinite(out).all()


def test_tridiagonal_pcr_matches_thomas_and_scipy():
    """The O(log n)-depth parallel-cyclic-reduction solve == the Thomas
    scan at machine precision (random diagonally dominant systems, both
    dtypes' solve paths), and the spline built on it still matches
    scipy splrep/splev — including through the masked fixed-capacity
    variant the EMD sift uses."""
    from scipy.interpolate import splev, splrep

    from periodicity_tpu.ops.spline import (
        spline_interp,
        tridiagonal_solve,
        tridiagonal_solve_pcr,
    )

    rng = np.random.default_rng(7)
    for n in (5, 32, 100, 1026, 2048):
        lower = rng.uniform(0.5, 2.0, n)
        diag = 4.0 + rng.uniform(0, 1, n)
        upper = rng.uniform(0.5, 2.0, n)
        rhs = rng.standard_normal(n)
        x_thomas = np.asarray(tridiagonal_solve(lower, diag, upper, rhs))
        x_pcr = np.asarray(tridiagonal_solve_pcr(lower, diag, upper, rhs))
        np.testing.assert_allclose(x_pcr, x_thomas, atol=1e-12)

    x = np.sort(rng.uniform(0, 10, 300))
    y = np.sin(x) + 0.1 * rng.standard_normal(300)
    xn = np.linspace(-0.5, 10.5, 700)
    ours = np.asarray(spline_interp(x, y, xn))
    ref = splev(xn, splrep(x, y, s=0))
    np.testing.assert_allclose(ours, ref, atol=1e-9)

    cap, cnt = 128, 90
    xk = np.sort(rng.uniform(0, 10, cnt))
    yk = np.cos(xk)
    xp = np.concatenate([xk, xk[-1] + 1 + np.arange(cap - cnt)])
    yp = np.concatenate([yk, np.zeros(cap - cnt)])
    o = np.asarray(spline_interp(xp, yp, xn, count=cnt))
    r = splev(xn, splrep(xk, yk, s=0))
    np.testing.assert_allclose(o, r, atol=1e-9)


def test_coords_index_get_axis_from_xray():
    """coords/index/get_axis/from_xray parity (reference core.py:72-148)
    and the module-level full/zeros/ones_like helpers (core.py:38-50)."""
    import types

    from periodicity_tpu.core import full_like, ones_like, zeros_like

    t = np.arange(8.0)
    ts = TSeries(t, t**2)
    assert list(ts.coords) == ["time"]
    np.testing.assert_array_equal(np.asarray(ts.coords["time"]), t)
    assert list(ts.index) == ["time"]
    assert ts.get_axis("time") == 0
    with pytest.raises(ValueError, match="not found"):
        ts.get_axis("frequency")
    tfs = TFSeries(time=t, frequency=np.arange(3.0) + 1, values=np.ones((3, 8)))
    assert tfs.get_axis("frequency") == 0 and tfs.get_axis("time") == 1
    assert set(tfs.coords) == {"frequency", "time"}

    # from_xray: duck-typed DataArray-like
    coord = types.SimpleNamespace(values=t)
    xr_like = types.SimpleNamespace(
        dims=("time",),
        values=np.sin(t),
        coords={"time": coord},
        attrs={"unit": "mag"},
    )
    rebuilt = ts.from_xray(xr_like)
    assert isinstance(rebuilt, TSeries)
    np.testing.assert_array_equal(np.asarray(rebuilt.values), np.sin(t))
    assert rebuilt.attrs["unit"] == "mag"

    filled = full_like(ts, 7.0)
    assert isinstance(filled, TSeries)
    assert np.all(np.asarray(filled.values) == 7.0)
    assert np.all(np.asarray(zeros_like(ts).values) == 0.0)
    assert np.all(np.asarray(ones_like(ts).values) == 1.0)
    # and through the numpy protocol
    assert np.all(np.asarray(np.full_like(ts, 3.0).values) == 3.0)


def test_george_set_params():
    from periodicity_tpu.gp import QuasiPeriodicGP

    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 30, 60))
    y = np.sin(2 * np.pi * t / 5.0) + 0.1 * rng.standard_normal(60)
    m = QuasiPeriodicGP(TSeries(t, y), err=np.full(60, 0.1))
    theta = np.asarray(m.theta0) + 0.05
    out = m.set_params(theta, None)
    assert out is m
    np.testing.assert_allclose(np.asarray(m.theta0), theta)
    mu, sd = m.get_prediction(t[:5])
    assert np.all(np.isfinite(np.asarray(mu))) and np.all(np.asarray(sd) > 0)


def test_implements_and_wrap_reduce_extension_points():
    """implements()/wrap_reduce() public extension points (reference
    core.py:13-35): register a custom numpy-protocol function and a
    dim-aware reduction."""
    from periodicity_tpu.core import implements, wrap_reduce

    t = np.arange(6.0)
    ts = TSeries(t, np.array([1.0, -2.0, 3.0, -4.0, 5.0, -6.0]))

    @implements(np.ptp)
    def _ptp(signal, **kw):
        return float(np.ptp(np.asarray(signal.values), **kw))

    assert np.ptp(ts) == 11.0

    rms = wrap_reduce(lambda v, **kw: np.sqrt(np.mean(np.square(v), **kw)))
    assert rms(ts) == pytest.approx(np.sqrt(np.mean(ts.values**2)))
    tfs = TFSeries(time=t, frequency=np.arange(3.0) + 1.0,
                   values=np.arange(18.0).reshape(3, 6))
    red = rms(tfs, dim="time")
    assert type(red).__name__ == "FSeries"
    np.testing.assert_allclose(
        np.asarray(red.values),
        np.sqrt(np.mean(np.arange(18.0).reshape(3, 6) ** 2, axis=1)),
    )


def test_from_xray_zero_d_and_assume_sorted():
    import types

    t = np.arange(5.0)
    ts = TSeries(t, t)
    zero_d = types.SimpleNamespace(ndim=0, item=lambda: 3.5)
    assert ts.from_xray(zero_d) == 3.5
    shuffled = types.SimpleNamespace(
        dims=("time",),
        ndim=1,
        values=np.array([2.0, 0.0, 1.0]),
        coords={"time": types.SimpleNamespace(values=np.array([2.0, 0.0, 1.0]))},
        attrs={},
    )
    out = ts.from_xray(shuffled)  # default sorts by time
    np.testing.assert_array_equal(np.asarray(out.time), [0.0, 1.0, 2.0])
    out2 = ts.from_xray(shuffled, assume_sorted=True)
    np.testing.assert_array_equal(np.asarray(out2.time), [2.0, 0.0, 1.0])


def test_from_xray_transposed_dims_and_mismatch():
    """A 2-D DataArray-like with dims ('time','frequency') must be
    re-oriented to this library's ('frequency','time') layout, not
    silently mis-labeled; foreign dims raise."""
    import types

    t = np.arange(4.0)
    f = np.arange(4.0) + 1.0
    vals_tf = np.arange(16.0).reshape(4, 4)  # [time, frequency]
    tfs = TFSeries(time=t, frequency=f, values=np.zeros((4, 4)))
    xr_like = types.SimpleNamespace(
        dims=("time", "frequency"),
        ndim=2,
        values=vals_tf,
        coords={
            "time": types.SimpleNamespace(values=t),
            "frequency": types.SimpleNamespace(values=f),
        },
        attrs={},
    )
    out = tfs.from_xray(xr_like)
    np.testing.assert_array_equal(np.asarray(out.values), vals_tf.T)
    # non-square transposed input round-trips too
    vals_rect = np.arange(12.0).reshape(4, 3)  # [time=4, frequency=3]
    xr_rect = types.SimpleNamespace(
        dims=("time", "frequency"),
        ndim=2,
        values=vals_rect,
        coords={
            "time": types.SimpleNamespace(values=t),
            "frequency": types.SimpleNamespace(values=f[:3]),
        },
        attrs={},
    )
    out2 = tfs.from_xray(xr_rect)
    np.testing.assert_array_equal(np.asarray(out2.values), vals_rect.T)
    bad = types.SimpleNamespace(
        dims=("space",), ndim=1, values=t,
        coords={"space": types.SimpleNamespace(values=t)}, attrs={},
    )
    with pytest.raises(ValueError, match="do not match"):
        TSeries(t, t).from_xray(bad)


def test_wrap_reduce_keepdims():
    from periodicity_tpu.core import wrap_reduce

    t = np.arange(6.0)
    tfs = TFSeries(time=t, frequency=np.arange(3.0) + 1.0,
                   values=np.arange(18.0).reshape(3, 6))
    rms = wrap_reduce(lambda v, **kw: np.sqrt(np.mean(np.square(v), **kw)))
    red = rms(tfs, dim="time", keepdims=True)
    assert type(red).__name__ == "FSeries"
    assert np.asarray(red.values).shape == (3,)
    full = rms(tfs, keepdims=True)
    assert np.ndim(full) == 0
