"""scipy.signal.find_peaks parity for the full criteria set
(threshold / distance / width / wlen / rel_height / plateau_size),
reference core.py:283-317 forwards these kwargs verbatim to scipy."""

import numpy as np
import pytest
import scipy.signal

from periodicity_tpu.core import TSeries
from periodicity_tpu.ops import peaks as P


def signals():
    rng = np.random.default_rng(7)
    out = [
        ("noise", rng.standard_normal(300)),
        ("tones", np.sin(np.linspace(0, 40 * np.pi, 800))
         + 0.4 * np.sin(np.linspace(0, 157 * np.pi, 800))
         + 0.05 * rng.standard_normal(800)),
        ("steps", np.repeat(rng.standard_normal(60), 5)
         + 0.01 * rng.standard_normal(300)),
        ("plateaus", np.repeat(rng.integers(0, 6, 80), 4).astype(float)),
    ]
    return out


def _compare(x, jit_kwargs, scipy_kwargs, check_props=()):
    idx, cnt, props = P.find_peaks_full(x, **jit_kwargs)
    k = int(cnt)
    got = np.asarray(idx[:k])
    want, sprops = scipy.signal.find_peaks(np.asarray(x), **scipy_kwargs)
    np.testing.assert_array_equal(got, want)
    for name in check_props:
        np.testing.assert_allclose(
            np.asarray(props[name][:k]), sprops[name], rtol=1e-10, atol=1e-12,
            err_msg=name,
        )


@pytest.mark.parametrize("name,x", signals())
@pytest.mark.parametrize("threshold", [0.05, (0.02, 1.5), (None, 0.8)])
def test_threshold(name, x, threshold):
    th = list(threshold) if isinstance(threshold, tuple) else threshold
    _compare(
        x, {"threshold": threshold}, {"threshold": th},
        check_props=("left_thresholds", "right_thresholds"),
    )


@pytest.mark.parametrize("name,x", signals())
@pytest.mark.parametrize("distance", [1, 3, 7.5, 40])
def test_distance(name, x, distance):
    if name == "plateaus":
        # scipy's _select_by_peak_distance sorts priorities with an
        # UNSTABLE argsort, so the kept set among exactly-tied heights is
        # implementation-defined; check the greedy invariants instead of
        # the exact set.
        idx, cnt, _ = P.find_peaks_full(x, distance=distance)
        kept = np.asarray(idx[: int(cnt)])
        assert np.all(np.diff(kept) >= np.ceil(distance))
        allp = scipy.signal.find_peaks(x)[0]
        removed = np.setdiff1d(allp, kept)
        for r in removed:
            near = kept[np.abs(kept - r) < np.ceil(distance)]
            assert near.size and np.max(x[near]) >= x[r]
        return
    _compare(x, {"distance": distance}, {"distance": distance})


@pytest.mark.parametrize("name,x", signals())
@pytest.mark.parametrize("width", [1, 2.5, (1.0, 6.0)])
def test_width(name, x, width):
    w = list(width) if isinstance(width, tuple) else width
    _compare(
        x, {"width": width}, {"width": w},
        check_props=("widths", "width_heights", "left_ips", "right_ips",
                     "prominences", "left_bases", "right_bases"),
    )


@pytest.mark.parametrize("name,x", signals())
@pytest.mark.parametrize("wlen", [11, 30])
def test_prominence_with_wlen(name, x, wlen):
    _compare(
        x, {"prominence": 0.05, "wlen": wlen},
        {"prominence": 0.05, "wlen": wlen},
        check_props=("prominences", "left_bases", "right_bases"),
    )


@pytest.mark.parametrize("name,x", signals())
def test_width_with_wlen_and_rel_height(name, x):
    _compare(
        x, {"width": 1.0, "wlen": 21, "rel_height": 0.75},
        {"width": 1.0, "wlen": 21, "rel_height": 0.75},
        check_props=("widths", "left_ips", "right_ips"),
    )


@pytest.mark.parametrize("name,x", signals())
@pytest.mark.parametrize("plateau_size", [1, 2, (2, 5)])
def test_plateau_size(name, x, plateau_size):
    ps = list(plateau_size) if isinstance(plateau_size, tuple) else plateau_size
    _compare(
        x, {"plateau_size": plateau_size}, {"plateau_size": ps},
        check_props=("plateau_sizes", "left_edges", "right_edges"),
    )


@pytest.mark.parametrize("name,x", signals())
def test_combined_criteria(name, x):
    kw = {
        "height": 0.1,
        "threshold": (None, 2.0),
        "distance": 4,
        "prominence": 0.05,
        "width": (0.5, 20.0),
        "wlen": 41,
    }
    skw = dict(kw, threshold=[None, 2.0], width=[0.5, 20.0])
    _compare(
        x, kw, skw,
        check_props=("peak_heights", "prominences", "widths"),
    )


def test_container_surface_forwards_criteria():
    rng = np.random.default_rng(3)
    x = np.sin(np.linspace(0, 30 * np.pi, 500)) + 0.2 * rng.standard_normal(500)
    ts = TSeries(np.arange(500.0), x)
    peaks = ts.find_peaks(distance=10, width=2.0)
    want, props = scipy.signal.find_peaks(x, distance=10, width=2.0)
    np.testing.assert_array_equal(peaks.attrs["indices"], want)
    np.testing.assert_allclose(peaks.attrs["widths"], props["widths"],
                               rtol=1e-10)
    with pytest.raises(TypeError):
        ts.find_peaks(no_such_criterion=1)
