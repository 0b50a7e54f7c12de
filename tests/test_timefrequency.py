"""Time-frequency tests (the reference ships an empty test_timefrequency.py;
this adds the coverage SURVEY §4 calls for)."""

import numpy as np
import pytest

from periodicity_tpu.core import TSeries
from periodicity_tpu.data import SustainedPlusGappedPureTones
from periodicity_tpu.timefrequency import (
    HHT,
    WPS,
    CompositeSpectrum,
    denoise,
)


def test_wps_finds_tone_period():
    t = np.arange(2000) * 0.5
    sig = TSeries(t, np.sin(2 * np.pi * t / 7.0))
    periods = np.linspace(2, 30, 80)
    wps = WPS(periods)
    spec = wps(sig)
    assert spec.shape == (80, 2000)
    gwps = wps.gwps()
    best = float(np.asarray(gwps.period)[np.argmax(np.asarray(gwps.values))])
    assert best == pytest.approx(7.0, abs=0.4)
    # masked variants have NaNs outside the cone of influence
    assert np.isnan(np.asarray(wps.masked_spectrum.values)).any()
    m = wps.masked_gwps()
    assert np.isfinite(np.asarray(m.values)).any()
    sav = wps.sav(pmin=5, pmax=10)
    assert sav.size == 2000


def test_wps_unbiased_power_is_flat_across_frequencies():
    """Liu et al. (2007): power/scale puts equal-amplitude tones on equal
    footing."""
    t = np.arange(4096) * 1.0
    y = np.sin(2 * np.pi * t / 8) + np.sin(2 * np.pi * t / 64)
    wps = WPS(np.geomspace(4, 128, 120))
    wps(TSeries(t, y))
    g = np.asarray(wps.gwps().values)
    p = np.asarray(wps.gwps().period)
    # two peaks with comparable unbiased power (within 30%)
    i8 = np.argmin(np.abs(p - 8))
    i64 = np.argmin(np.abs(p - 64))
    assert g[i8] / g[i64] == pytest.approx(1.0, rel=0.3)


def test_hht_two_tones_instant_frequencies():
    x = TSeries(values=SustainedPlusGappedPureTones())
    freqs = np.linspace(0.0, 0.5, 101)
    hht = HHT(freqs, method="DQ")
    tf = hht(x)
    assert tf.shape == (101, 1000)
    # some mode's instantaneous frequency concentrates at the sustained tone
    medians = [
        float(np.median(np.asarray(f.values)[100:900])) for f in hht.instant_fs
    ]
    assert any(abs(m - 0.065) < 0.01 for m in medians), medians


def test_hht_nht_and_ht_methods_run():
    t = np.arange(600.0)
    sig = TSeries(t, np.sin(2 * np.pi * 0.05 * t))
    freqs = np.linspace(0, 0.25, 64)
    for method, norm in [("NHT", "hilbert"), ("HT", "spline")]:
        hht = HHT(freqs, method=method, norm_type=norm)
        tf = hht(sig)
        assert tf is not None
        assert len(hht.instant_fs) >= 1


def test_composite_spectrum_peak():
    t = np.arange(2000) * 1.0
    sig = TSeries(t, np.sin(2 * np.pi * t / 25.0))
    cs = CompositeSpectrum(np.geomspace(5, 100, 100))(sig)
    best = float(np.asarray(cs.period)[np.nanargmax(np.asarray(cs.values))])
    assert best == pytest.approx(25.0, rel=0.1)


def test_denoise_reduces_noise():
    rng = np.random.default_rng(0)
    t = np.arange(1024.0)
    clean = np.sin(2 * np.pi * t / 100)
    noisy = clean + 0.3 * rng.standard_normal(1024)
    den = denoise(noisy, sigma=0.3)
    assert den.shape == (1024,)
    # soft-threshold denoising shrinks but must improve the estimate
    assert np.std(den - clean) < 0.8 * np.std(noisy - clean)
    # pure noise is almost entirely suppressed (VisuShrink property)
    pure = 0.3 * rng.standard_normal(1024)
    assert np.std(denoise(pure, sigma=0.3)) < 0.25 * np.std(pure)
    # sigma=None estimates the noise level via MAD on the finest detail
    # band (the reference TypeErrors here — documented divergence);
    # the estimate must land close to the explicit-sigma result
    den_auto = denoise(noisy)
    assert np.std(den_auto - clean) < 0.8 * np.std(noisy - clean)
    np.testing.assert_allclose(
        np.std(np.asarray(den_auto) - np.asarray(den)), 0.0, atol=0.05
    )
    # and with the discrete Meyer family through the model-layer API
    den_dmey = denoise(noisy, family="dmey")
    assert np.std(den_dmey - clean) < 0.8 * np.std(noisy - clean)


def test_wps_batch_matches_single():
    from periodicity_tpu.timefrequency import wps_batch

    t = np.arange(1024) * 0.5
    periods = np.geomspace(2, 64, 40)
    ys = np.stack([
        np.sin(2 * np.pi * t / 7.0),
        np.sin(2 * np.pi * t / 21.0) + 0.1 * np.cos(2 * np.pi * t / 5.0),
    ])
    spectra, in_cone = wps_batch(t, ys, periods)
    assert spectra.shape == (2, 40, 1024)
    assert in_cone.shape == (40, 1024)
    for i in range(2):
        wps = WPS(periods)
        wps(TSeries(t, ys[i]))
        np.testing.assert_allclose(
            np.asarray(spectra[i]), np.asarray(wps.spectrum.values),
            rtol=1e-6, atol=1e-12,
        )
        np.testing.assert_array_equal(np.asarray(in_cone), wps.mask_coi)


def test_hht_batch_matches_single():
    """Batched HHT (lock-step EMD + flat-vmapped IF stack) == sequential
    HHT per member, for DQ and TEO."""
    from periodicity_tpu.timefrequency import hht_batch

    rng = np.random.default_rng(0)
    n = 512
    t = np.linspace(0, 10, n)
    ys = np.stack([
        np.sin(2 * np.pi * t * 3.0) + 0.5 * np.sin(2 * np.pi * t * 0.4),
        np.sin(2 * np.pi * t * 5.0)
        + 0.3 * np.cos(2 * np.pi * t * 0.7)
        + 0.05 * rng.standard_normal(n),
    ])
    grid = np.linspace(0.1, 8.0, 64)
    power, modes, residue, n_modes = hht_batch(t, ys, grid, max_modes=6)
    assert power.shape == (2, 64, n)
    for b in range(2):
        h = HHT(grid, method="DQ", norm_type="spline")
        tf = h(TSeries(t, ys[b]))
        assert int(n_modes[b]) == len(h.modes)
        np.testing.assert_allclose(
            np.asarray(power[b]), np.asarray(tf.values), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(residue[b]),
            np.asarray(ys[b]) - np.asarray(modes[b]).sum(0),
            atol=1e-8,
        )
    power_teo, _, _, _ = hht_batch(t, ys, grid, max_modes=6, method="TEO")
    for b in range(2):
        tf = HHT(grid, method="TEO")(TSeries(t, ys[b]))
        np.testing.assert_allclose(
            np.asarray(power_teo[b]), np.asarray(tf.values), atol=1e-8
        )


def test_emd_batch_matches_sequential():
    from periodicity_tpu.ops.emd import emd_batch
    from periodicity_tpu.decomposition import EMD

    t = np.linspace(0, 10, 512)
    ys = np.stack([
        np.sin(2 * np.pi * t * 3.0) + 0.5 * np.sin(2 * np.pi * t * 0.4),
        np.sin(2 * np.pi * t * 1.5),
    ])
    modes, residue, n_modes = emd_batch(t, ys, max_modes=6)
    for b in range(2):
        seq = EMD()(TSeries(t, ys[b]), max_modes=6)
        assert int(n_modes[b]) == len(seq)
        for k, m in enumerate(seq):
            np.testing.assert_allclose(
                np.asarray(modes[b, k]), np.asarray(m.values), atol=1e-10
            )


def test_hht_all_zero_signal_returns_empty():
    """No live modes -> empty per-mode outputs and tf None, matching the
    reference's sum-over-no-modes behavior, for every method and with
    smoothing enabled."""
    t = np.linspace(0, 10, 256)
    zero = TSeries(t, np.zeros_like(t))
    for method in ("DQ", "TEO", "HT"):
        h = HHT(np.linspace(0.1, 5, 16), method=method, smooth_width=5)
        tf = h(zero)
        assert tf is None
        assert h.tfs == []
        assert h.instant_fs == []


def test_hht_batch_zero_mode_member_has_zero_power():
    """A batch member whose EMD yields no IMFs gets ZERO spectrogram
    power for TEO/HT (matching sequential HHT's empty output), not the
    raw-signal spectrogram."""
    from periodicity_tpu.timefrequency import hht_batch

    t = np.linspace(0, 10, 256)
    ys = np.stack([
        np.sin(2 * np.pi * 2.0 * t),   # oscillatory: has modes
        0.1 * t,                        # monotone: zero modes
    ])
    grid = np.linspace(0.05, 4.0, 32)
    power, _, _, n_modes = hht_batch(t, ys, grid, max_modes=4, method="TEO")
    assert int(n_modes[1]) == 0
    assert float(np.abs(np.asarray(power[1])).sum()) == 0.0
    assert float(np.abs(np.asarray(power[0])).sum()) > 0.0


def test_denoise_batch_matches_single():
    from periodicity_tpu.timefrequency import denoise_batch

    rng = np.random.default_rng(5)
    t = np.arange(1024.0)
    clean = np.stack([np.sin(2 * np.pi * t / p) for p in (100.0, 128.0, 160.0)])
    batch = clean + 0.25 * rng.standard_normal((3, 1024))
    # explicit scalar sigma: rows match the single-series path exactly
    many = np.asarray(denoise_batch(batch, sigma=0.25))
    for i in range(3):
        one = np.asarray(denoise(batch[i], sigma=0.25))
        np.testing.assert_allclose(many[i], one, atol=1e-10)
    # per-row MAD default improves every row
    auto = np.asarray(denoise_batch(batch))
    err_before = np.std(batch - clean, axis=1)
    err_after = np.std(auto - clean, axis=1)
    assert (err_after < 0.8 * err_before).all()
    # per-row sigma array accepted
    arr = np.asarray(denoise_batch(batch, sigma=np.full(3, 0.25)))
    np.testing.assert_allclose(arr, many, atol=1e-10)


def test_denoise_integer_input_and_bad_theta():
    """Integer batches promote to float (sigma<1 must not truncate to a
    zero threshold), and GeorgeModeler.set_params validates length."""
    from periodicity_tpu.timefrequency import denoise_batch

    rng = np.random.default_rng(9)
    base = 100.0 * np.sin(2 * np.pi * np.arange(512.0) / 128.0)
    noisy = (base + 30.0 * rng.standard_normal(512)).astype(np.int32)
    batch = np.stack([noisy, noisy])
    out = np.asarray(denoise_batch(batch, sigma=0.9))
    assert np.issubdtype(out.dtype, np.floating)
    # a 0.9-sigma threshold is tiny but nonzero: output != raw input
    assert not np.array_equal(out[0], noisy.astype(out.dtype))
    one = np.asarray(denoise(noisy, sigma=0.9))
    np.testing.assert_allclose(out[0], one, rtol=1e-5, atol=1e-4)


def test_george_set_params_validates_length():
    from periodicity_tpu.core import TSeries
    from periodicity_tpu.gp import QuasiPeriodicGP

    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 30, 50))
    y = np.sin(2 * np.pi * t / 5.0)
    m = QuasiPeriodicGP(TSeries(t, y), err=np.full(50, 0.1))
    with pytest.raises(ValueError, match="expected"):
        m.set_params(np.zeros(3))
