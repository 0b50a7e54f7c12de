"""Parity tests for ops.peaks against scipy.signal (golden oracle)."""

import numpy as np
import pytest
from scipy import signal as ssig

from periodicity_tpu.ops import peaks as P


def _cases():
    rng = np.random.default_rng(0)
    yield np.sin(np.linspace(0, 30, 301))
    yield rng.standard_normal(500)
    y = rng.standard_normal(200)
    y[50:55] = 3.0  # plateau peak
    y[100:102] = y[99]  # plateau shoulder
    yield y
    yield np.array([0.0, 1.0, 1.0, 0.0, 2.0, 0.5, 0.5, 3.0, 3.0, 3.0, 1.0])


@pytest.mark.parametrize("i", range(4))
def test_local_maxima_matches_scipy(i):
    x = list(_cases())[i]
    ref, _ = ssig.find_peaks(x)
    got = np.where(np.asarray(P.local_maxima_mask(x)))[0]
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("i", range(4))
def test_prominences_match_scipy(i):
    x = list(_cases())[i]
    ref_idx, props = ssig.find_peaks(x, prominence=0.0)
    proms = props["prominences"]
    lb, rb = props["left_bases"], props["right_bases"]
    idx, count, got_proms, got_lb, got_rb = P.find_peaks(x)
    k = int(count)
    np.testing.assert_array_equal(np.asarray(idx[:k]), ref_idx)
    np.testing.assert_allclose(np.asarray(got_proms[:k]), proms, rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(got_lb[:k]), lb)
    np.testing.assert_array_equal(np.asarray(got_rb[:k]), rb)


def test_prominence_filter():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(300)
    ref_idx, props = ssig.find_peaks(x, prominence=0.5)
    idx, count, proms, _, _ = P.find_peaks(x, prominence=0.5)
    k = int(count)
    np.testing.assert_array_equal(np.asarray(idx[:k]), ref_idx)
    np.testing.assert_allclose(np.asarray(proms[:k]), props["prominences"], rtol=1e-12)


def test_zero_crossings():
    x = np.sin(np.linspace(0, 20, 233))
    ref = np.where(np.diff(np.signbit(x)))[0]
    got = np.where(np.asarray(P.zero_crossings_mask(x)))[0]
    np.testing.assert_array_equal(got, ref)
