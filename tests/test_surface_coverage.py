"""Coverage for less-traveled estimator surface: LMD, CEEMDAN
postprocessing/orthogonality, GLS psd normalization, HHT TEO method,
WPS cone-of-influence helpers."""

import numpy as np
import pytest

from periodicity_tpu.core import TSeries
from periodicity_tpu.decomposition import CEEMDAN, LMD
from periodicity_tpu.spectral import GLS
from periodicity_tpu.timefrequency import HHT, WPS


def test_lmd_two_tone_product_functions():
    t = np.arange(1000.0)
    slow = np.sin(2 * np.pi * 0.01 * t)
    fast = 0.4 * np.sin(2 * np.pi * 0.1 * t)
    lmd = LMD()
    pfs = lmd(TSeries(t, slow + fast))
    assert len(pfs) >= 1
    A, F = pfs[0]
    # FM component is clipped to unit amplitude
    assert float(np.max(np.abs(np.asarray(F.values)))) <= 1.0 + 1e-9
    # first product function tracks the fast tone
    prod = A * F if not isinstance(A, float) else F * A
    sl = slice(100, -100)
    corr = np.corrcoef(np.asarray(prod.values)[sl], fast[sl])[0, 1]
    assert abs(corr) > 0.9


def test_ceemdan_postprocessing_and_orthogonality():
    t = np.arange(600.0)
    x = TSeries(t, np.sin(2 * np.pi * 0.05 * t) + np.sin(2 * np.pi * 0.21 * t))
    ce = CEEMDAN(ensemble_size=20, random_seed=3)
    modes = ce(x)
    assert len(modes) >= 2
    orth = ce.orthogonality_matrix
    assert orth.shape == (ce.n_modes, ce.n_modes)
    np.testing.assert_allclose(np.diag(orth), 1.0, atol=1e-9)
    # off-diagonal correlations are small for well-separated tones
    off = orth - np.diag(np.diag(orth))
    assert np.max(np.abs(off)) < 0.35
    ce.postprocessing()
    assert len(ce.c_modes) >= 1
    assert ce.c_residue.size == x.size
    assert ce.c_orthogonality_matrix.shape[0] == len(ce.c_modes)


def test_gls_psd_normalization():
    rng = np.random.default_rng(11)
    t = np.sort(rng.uniform(0, 50, 300))
    y = np.sin(2 * np.pi * t / 5.0)
    err = np.full(300, 0.5)
    norm = GLS()(TSeries(t, y), err=err)
    psd = GLS(psd=True)(TSeries(t, y), err=err)
    # psd mode = normalized power * YY * 0.5 * sum(err^-2)
    w = err**-2.0
    wn = w / w.sum()
    yc = y - np.dot(wn, y)
    yy = np.dot(wn, yc**2)
    ratio = np.asarray(psd.values) / np.asarray(norm.values)
    np.testing.assert_allclose(ratio, yy * 0.5 * w.sum(), rtol=1e-8)


def test_hht_teo_method():
    t = np.arange(0, 200, 0.1)
    sig = TSeries(t, np.sin(2 * np.pi * 0.5 * t))
    hht = HHT(np.linspace(0, 2.0, 64), method="TEO")
    tf = hht(sig)
    assert tf is not None
    # TEO instantaneous frequency of a pure tone ~ 0.5 cycles/time
    f_med = float(np.median(np.asarray(hht.instant_fs[0].values)[100:-100]))
    assert f_med == pytest.approx(0.5, rel=0.05)


def test_wps_coi_helpers():
    t = np.arange(1024.0)
    wps = WPS(np.geomspace(4, 128, 40))
    wps(TSeries(t, np.sin(2 * np.pi * t / 32)))
    coi = wps.coi()
    assert coi.size > 0
    # all COI boundary samples lie within the time span
    assert np.all(np.asarray(coi.time) >= 0) and np.all(np.asarray(coi.time) <= 1023)
    mask = wps.mask_coi
    assert mask.shape == (40, 1024)
    # edges are always outside the cone
    assert not mask[:, 0].any() and not mask[:, -1].any()


def test_plotting_smoke(tmp_path):
    """Plot methods render without error on the Agg backend."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.arange(256.0)
    sig = TSeries(t, np.sin(2 * np.pi * t / 16))
    sig.plot()
    sig.hist(bins=16)
    from periodicity_tpu.spectral import GLS

    ls = GLS()(sig)
    ls.plot()
    wps = WPS(np.geomspace(4, 64, 20))
    wps(sig)
    wps.spectrum.pcolormesh()
    wps.spectrum.imshow()
    wps.plot_coi(alpha=0.3)
    plt.savefig(tmp_path / "smoke.png")
    plt.close("all")
