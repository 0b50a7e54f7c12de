"""Jitted LMD kernels (ops/lmd.py) vs an eager container-op oracle.

The oracle reproduces the reference's LMD sift semantics
(reference decomposition.py:127-183) step by step with this library's
container ops — find_peaks/join/pad/fill_gaps/smooth/interp — which is
exactly how the estimator was orchestrated before the jitted redesign.
"""

import numpy as np
import pytest

from periodicity_tpu.core import TSeries
from periodicity_tpu.models.decomposition import LMD
from periodicity_tpu.ops.lmd import lmd_iter, lmd_sift


def eager_sift(sig, pad_width=0, smooth_iter=12):
    """Reference-semantics LMD sift via eager container ops."""
    peaks = sig.find_peaks(include_edges=True)
    dips = sig.find_dips()
    extrema = peaks.join(dips)
    if extrema.size < (2 + pad_width):
        raise ValueError("not enough extrema")
    if pad_width > 0:
        extrema = extrema.pad(
            pad_width, mode="reflect", reflect_type="odd"
        ).drop([pad_width, -pad_width - 1])
    if extrema.size < 3:
        raise ValueError("not enough extrema")
    out = []
    for series in (
        0.5 * (extrema.roll(1) + extrema),
        0.5 * abs(extrema.roll(1) - extrema),
    ):
        filled = series.fill_gaps(dt=float(sig.dt), method="bfill")
        filled = TSeries(
            filled.time,
            filled.values.at[0].set(filled.values[1]),
            assume_sorted=True,
        )
        window = (
            float(np.max(np.diff(np.asarray(extrema.time))) / float(sig.dt))
            // 3
        )
        window = int(max(3, window + (1 - window % 2)))
        # The stop rule "no zero first differences" tests exact zeros: a
        # flat ZOH run wider than the window only erodes through rounding
        # noise, whose last-ulp pattern is summation-order dependent, so
        # the device kernel may legitimately run ONE extra pass relative
        # to this host evaluation. Return both candidates.
        candidates = []
        for it in range(smooth_iter):
            filled = filled.smooth(window, kernel="triangle")
            stop = bool(np.all(np.diff(np.asarray(filled.values))))
            if stop or it == smooth_iter - 1:
                candidates.append(filled.interp(sig.time))
                if stop and it < smooth_iter - 1:
                    extra = filled.smooth(window, kernel="triangle")
                    candidates.append(extra.interp(sig.time))
                break
        out.append(candidates)
    return out[0], out[1]


def assert_matches_one_of(jit_values, candidates, atol):
    errs = [
        float(np.max(np.abs(np.asarray(jit_values) - np.asarray(c.values))))
        for c in candidates
    ]
    assert min(errs) < atol, f"no candidate matched: errors {errs}"


def two_tone():
    t = np.arange(1000.0)
    return TSeries(
        t, np.sin(2 * np.pi * 0.01 * t) + 0.4 * np.sin(2 * np.pi * 0.1 * t)
    )


def noisy():
    rng = np.random.default_rng(0)
    t = 0.25 * np.arange(512) + 3.0
    return TSeries(
        t,
        np.sin(2 * np.pi * 0.05 * np.arange(512))
        + 0.3 * rng.standard_normal(512),
    )


@pytest.mark.parametrize("make", [two_tone, noisy])
@pytest.mark.parametrize("pad_width", [0, 2])
def test_sift_matches_eager_oracle(make, pad_width):
    sig = make()
    mu_cands, env_cands = eager_sift(sig, pad_width=pad_width)
    mu_j, env_j, ok = lmd_sift(sig.time, sig.values, pad_width=pad_width)
    assert bool(ok)
    assert_matches_one_of(mu_j, mu_cands, atol=1e-10)
    assert_matches_one_of(env_j, env_cands, atol=1e-10)


def test_sift_monotonic_parity():
    sig = TSeries(np.arange(50.0), np.linspace(0.0, 1.0, 50))
    with pytest.raises(ValueError):
        eager_sift(sig)
    _, _, ok = lmd_sift(sig.time, sig.values)
    assert not bool(ok)
    with pytest.raises(ValueError):
        LMD().sift(sig)


def test_iter_matches_eager_demodulation():
    sig = two_tone()
    # eager demodulation loop (reference decomposition.py:165-183) on top
    # of the oracle sift
    F = sig.copy()
    A = TSeries(sig.time, np.ones(sig.size), assume_sorted=True)
    for _ in range(10):
        mu_cands, env_cands = eager_sift(F)
        mu, env = mu_cands[0], env_cands[0]
        F = (F - mu) / env
        A = A * env
        if float(np.max(np.abs(np.asarray(F.values)))) - 1.0 < 1e-6:
            break
    A_j, F_j, mono = lmd_iter(sig.time, sig.values)
    assert not bool(mono)
    np.testing.assert_allclose(
        np.asarray(A_j), np.asarray(A.values), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(F_j),
        np.clip(np.asarray(F.values), -1.0, 1.0),
        atol=1e-9,
    )


def test_lmd_estimator_runs_as_jitted_kernels():
    sig = two_tone()
    lmd = LMD()
    pfs = lmd(sig)
    assert len(pfs) >= 1
    A, F = pfs[0]
    assert float(np.max(np.abs(np.asarray(F.values)))) <= 1.0 + 1e-9
    fast = 0.4 * np.sin(2 * np.pi * 0.1 * np.asarray(sig.time))
    prod = np.asarray((A * F).values)
    sl = slice(100, -100)
    corr = np.corrcoef(prod[sl], fast[sl])[0, 1]
    assert abs(corr) > 0.99
    # reconstruction: PFs + residue == signal
    recon = sum(a * f for a, f in pfs) + lmd.residue
    np.testing.assert_allclose(
        np.asarray(recon.values), np.asarray(sig.values), atol=1e-8
    )


def test_hht_lmd_backend_batch_equals_sequential():
    from periodicity_tpu.models.timefrequency import HHT, hht_batch

    sig = two_tone()
    freqs = np.linspace(0.0, 0.15, 40)
    tf = HHT(freqs, norm_type="lmd")(sig)
    power, _, _, n_modes = hht_batch(
        sig.time,
        np.stack([np.asarray(sig.values)] * 2),
        freqs,
        norm_type="lmd",
    )
    assert int(n_modes[0]) >= 2
    np.testing.assert_allclose(
        np.asarray(power[0]), np.asarray(tf.values), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(power[0]), np.asarray(power[1]))
