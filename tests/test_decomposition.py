"""Decomposition tests: the reference's seeded CEEMDAN two-tone thresholds
plus EMD/VMD coverage the reference lacks."""

import numpy as np

from periodicity_tpu.core import TSeries
from periodicity_tpu.data import SustainedPlusGappedPureTones
from periodicity_tpu.decomposition import CEEMDAN, EMD, VMD


def test_emd_sift_parity_with_reference_algorithm():
    """EMD of a two-tone signal separates fast from slow component."""
    t = np.arange(1000, dtype=float)
    slow = np.sin(2 * np.pi * 0.005 * t)
    fast = 0.5 * np.sin(2 * np.pi * 0.1 * t)
    sig = TSeries(t, slow + fast)
    imfs = EMD()(sig)
    assert len(imfs) >= 2
    got_fast = np.asarray(imfs[0].values)
    # interior agreement (edges are spline-padded)
    sl = slice(50, -50)
    rrse = np.linalg.norm(got_fast[sl] - fast[sl]) / np.linalg.norm(fast[sl])
    assert rrse < 0.05
    # modes + residue reconstruct the signal exactly
    recon = np.asarray(sum(imfs).values) + np.asarray((sig - sum(imfs)).values)
    np.testing.assert_allclose(recon, np.asarray(sig.values), atol=1e-10)


def test_emd_monotonic_signal_gives_no_modes():
    sig = TSeries(np.arange(100.0), np.linspace(0, 1, 100))
    imfs = EMD()(sig)
    assert len(imfs) == 0


def test_two_tones_two_imfs():
    """Reference tests/test_decomposition.py:8-30 thresholds."""
    x = TSeries(values=SustainedPlusGappedPureTones())
    imfs = CEEMDAN(ensemble_size=50, random_seed=42)(x)
    assert len(imfs) == 2
    left_mse = np.mean(np.square(np.asarray(imfs[0].values)[11:490]))
    right_mse = np.mean(np.square(np.asarray(imfs[0].values)[761:990]))
    assert left_mse < 1e-4
    assert right_mse < 1e-4
    s2 = np.sin(2 * np.pi * 0.065 * np.arange(1000))
    s1 = np.zeros_like(s2)
    s1[500:750] += np.sin(2 * np.pi * 0.255 * np.arange(250))
    err1 = np.asarray((imfs[0] - s1).values)[3:-3]
    err2 = np.asarray((imfs[1] - s2).values)[3:-3]
    err = np.asarray((sum(imfs) - x).values)
    rrse_1 = np.linalg.norm(err1) / np.linalg.norm(s1[3:-3])
    rrse_2 = np.linalg.norm(err2) / np.linalg.norm(s2[3:-3])
    rrse_x = np.linalg.norm(err) / np.linalg.norm(np.asarray(x.values))
    assert rrse_1 < 0.10
    assert rrse_2 < 0.05
    assert rrse_x < 1e-10


def test_vmd_two_tones():
    """VMD (stub in the reference) separates well-spaced tones."""
    t = np.arange(1000, dtype=float)
    s1 = np.sin(2 * np.pi * 0.05 * t)
    s2 = 0.7 * np.sin(2 * np.pi * 0.2 * t)
    modes = VMD(n_modes=2, alpha=2000.0)(TSeries(t, s1 + s2))
    assert len(modes) == 2
    sl = slice(50, -50)
    m1 = np.asarray(modes[0].values)
    m2 = np.asarray(modes[1].values)
    r1 = np.linalg.norm(m1[sl] - s1[sl]) / np.linalg.norm(s1[sl])
    r2 = np.linalg.norm(m2[sl] - s2[sl]) / np.linalg.norm(s2[sl])
    assert r1 < 0.05
    assert r2 < 0.05


def test_vmd_dual_ascent_converges_with_tau():
    """tau > 0 (noise-slack dual ascent) must IMPROVE reconstruction, not
    diverge (regression: the dual update sign was paired with the wrong
    numerator convention and exploded for any tau > 0)."""
    from periodicity_tpu.decomposition import VMD

    t = np.linspace(0, 1, 500, endpoint=False)
    x = np.cos(2 * np.pi * 5 * t) + 0.5 * np.cos(2 * np.pi * 40 * t)

    def rec_err(tau):
        modes = VMD(n_modes=2, tau=tau, max_iter=300)(TSeries(t, x))
        rec = np.sum([np.asarray(m.values) for m in modes], axis=0)
        return np.max(np.abs(rec - x))

    e0, e5 = rec_err(0.0), rec_err(0.5)
    assert np.isfinite(e5)
    assert e5 < e0
    assert e5 < 0.02
