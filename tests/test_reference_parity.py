"""Direct numerical parity against the reference implementation.

The upstream library (mounted read-only at /root/reference when available)
is loaded at runtime — never vendored — and its pure-numpy Press-Rybicki
trig sums and GLS power are compared against this framework's kernels in
float64. Skipped when the reference tree is absent.
"""

import os

import numpy as np
import pytest

REF = "/root/reference/src/periodicity/spectral.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_trig_sum():
    """Load the reference's _trig_sum without importing its package (which
    needs xarray); exec only that self-contained numpy function."""
    src = open(REF).read()
    start = src.index("def _trig_sum")
    end = src.index("class GLS")
    ns = {"np": np}
    exec(src[start:end], ns)  # noqa: S102 - trusted mounted reference
    return ns["_trig_sum"]


def test_anchor_mirror_trig_sum_bit_identical(ref_trig_sum):
    """benchmarks/anchors._mirror_trig_sum (the reviewed first-party
    replacement for exec'ing the mounted reference at benchmark runtime,
    ADVICE r4) must stay BIT-identical to the reference's _trig_sum —
    same extirpolation stencil, same grid, same rotations."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from benchmarks.anchors import _mirror_trig_sum

    rng = np.random.default_rng(3)
    n, nf = 1500, 700
    t = np.sort(rng.uniform(0, 80, n)) + 11.0
    w = rng.standard_normal(n)
    df, fmin = 0.009, 0.0045
    S_ref, C_ref = ref_trig_sum(t, w, df, nf, fmin)
    S, C = _mirror_trig_sum(t, w, df, nf, fmin)
    np.testing.assert_array_equal(S, S_ref)
    np.testing.assert_array_equal(C, C_ref)


def test_trig_sum_matches_reference(ref_trig_sum):
    from periodicity_tpu.ops.trig_sum import trig_sum

    rng = np.random.default_rng(0)
    n, nf = 1000, 500
    t = np.sort(rng.uniform(0, 30, n)) + 5.0
    w = rng.standard_normal(n)
    df, fmin = 0.013, 0.0065
    S_ref, C_ref = ref_trig_sum(t, w, df, nf, fmin)
    S, C = trig_sum(t, w, df, nf, fmin)
    scale = np.max(np.abs(C_ref))
    np.testing.assert_allclose(np.asarray(S), S_ref, atol=1e-8 * scale)
    np.testing.assert_allclose(np.asarray(C), C_ref, atol=1e-8 * scale)


def test_gls_power_matches_reference_formula(ref_trig_sum):
    """Full GLS assembly vs a reference-faithful numpy evaluation built on
    the reference's own _trig_sum."""
    from periodicity_tpu.spectral import gls_power

    rng = np.random.default_rng(1)
    n = 400
    t = np.sort(rng.uniform(0, 50, n))
    y = np.sin(2 * np.pi * t / 4.7) + 0.3 * rng.standard_normal(n)
    err = 0.1 + 0.3 * rng.random(n)
    df = 1.0 / (50.0 * 5)
    fmin = df / 2
    nf = 1024

    # reference spectral.py:99-132 algebra, reproduced with its trig sums
    w = err**-2.0
    w = w / w.sum()
    yc = y - np.dot(w, y)
    Sh, Ch = ref_trig_sum(t, w * yc, df, nf, fmin)
    S2, C2 = ref_trig_sum(t, w, 2 * df, nf, 2 * fmin)
    S, C = ref_trig_sum(t, w, df, nf, fmin)
    tan2wt = (S2 - 2 * S * C) / (C2 - (C * C - S * S))
    C2w = 1 / np.sqrt(1 + tan2wt**2)
    S2w = tan2wt * C2w
    Cw = np.sqrt(0.5) * np.sqrt(1 + C2w)
    Sw = np.sqrt(0.5) * np.sign(S2w) * np.sqrt(1 - C2w)
    YY = np.dot(w, yc**2)
    YC = Ch * Cw + Sh * Sw
    YS = Sh * Cw - Ch * Sw
    CC = 0.5 * (1 + C2 * C2w + S2 * S2w) - (C * Cw + S * Sw) ** 2
    SS = 0.5 * (1 - C2 * C2w - S2 * S2w) - (S * Cw - C * Sw) ** 2
    ref_power = (YC * YC / CC + YS * YS / SS) / YY

    got = np.asarray(gls_power(t, y, err, df, fmin, nf))
    np.testing.assert_allclose(got, ref_power, rtol=1e-6, atol=1e-10)
