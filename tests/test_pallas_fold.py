"""Direct oracle tests for the generalized one-hot MXU fold kernel
(ops/pallas_bls.fold_onehot), run through the Pallas interpreter on CPU.
The scan-level agreement tests live in test_phase.py; these pin the
kernel's own contract: arbitrary value rows, 2-D offset bins, period
padding, and zero-contribution sample padding."""

import numpy as np
import jax
import pytest

from periodicity_tpu.ops.pallas_bls import fold_bins_onehot, fold_onehot


def _oracle(t, values, freqs, n_phi, stride=1, offsets=None):
    nv = values.shape[0]
    out = np.zeros((len(freqs), nv, n_phi * stride))
    off = np.zeros(t.size, np.int64) if offsets is None else offsets
    tr = (t - t[0]).astype(np.float32)  # kernel folds on t - t[0]
    for i, f in enumerate(freqs):
        phi = tr * np.float32(f)
        phi = phi - np.floor(phi)
        pb = np.clip((phi * n_phi).astype(np.int32), 0, n_phi - 1)
        flat = pb * stride + off
        for r in range(nv):
            np.add.at(out[i, r], flat, values[r])
    return out


@pytest.fixture(scope="module")
def sample():
    rng = np.random.default_rng(0)
    n = 700  # deliberately NOT a multiple of the kernel's sample align
    t = np.sort(rng.uniform(0, 120.0, n)).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    return t, x


def test_fold_onehot_multirow_oracle(sample):
    t, x = sample
    V = np.stack([np.ones_like(x), x, x * x])
    freqs = (1.0 / np.linspace(0.7, 30.0, 96)).astype(np.float32)
    out = np.asarray(fold_onehot(t, V, freqs, n_phi=9, interpret=True))
    ref = _oracle(t, V, freqs, n_phi=9)
    np.testing.assert_allclose(out, ref, atol=5e-5)
    # row 0 is a count: each trial's bins partition all N samples
    np.testing.assert_allclose(out[:, 0].sum(axis=1), t.size, rtol=1e-6)


def test_fold_onehot_offset_bins_oracle(sample):
    t, x = sample
    n_mag = 5
    xb = np.clip(((x - x.min()) / (x.max() - x.min() + 1e-12)
                  * n_mag).astype(np.int32), 0, n_mag - 1)
    V = np.ones((1, t.size), np.float32)
    freqs = (1.0 / np.linspace(0.7, 30.0, 64)).astype(np.float32)
    out = np.asarray(fold_onehot(t, V, freqs, n_phi=10, stride=n_mag,
                                 offsets=xb, interpret=True))
    ref = _oracle(t, V, freqs, n_phi=10, stride=n_mag, offsets=xb)
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_fold_onehot_period_padding(sample):
    """P not a multiple of the internal chunk: padded rows are dropped and
    real rows are unchanged."""
    t, x = sample
    V = np.stack([np.abs(x) / np.sum(np.abs(x))])
    freqs = (1.0 / np.linspace(1.0, 15.0, 33)).astype(np.float32)  # 33 % 32 != 0
    out = np.asarray(fold_onehot(t, V, freqs, n_phi=16, interpret=True))
    assert out.shape == (33, 1, 16)
    ref = _oracle(t, V, freqs, n_phi=16)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_fold_bins_onehot_wrapper(sample):
    t, x = sample
    w = np.full(t.size, 1.0 / t.size, np.float32)
    wyc = (w * (x - np.sum(w * x))).astype(np.float32)
    freqs = (1.0 / np.linspace(1.0, 15.0, 32)).astype(np.float32)
    r, s = fold_bins_onehot(t, w, wyc, freqs, nbins=64, interpret=True)
    ref = _oracle(t, np.stack([w, wyc]), freqs, n_phi=64)
    np.testing.assert_allclose(np.asarray(r), ref[:, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), ref[:, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r).sum(axis=1), 1.0, rtol=1e-5)


def test_fold_onehot_absolute_epoch(sample):
    """Absolute-epoch time stamps (BJD ~2.45e6): the epoch subtraction
    happens in float64 BEFORE the f32 cast, so the fold matches the exact
    float64 fold bin-for-bin (up to the documented ~1e-4-bin edge window)
    instead of losing several bins of 256 to f32 phase error."""
    t32, x = sample
    epoch = 2.45e6
    t = t32.astype(np.float64) + epoch  # 120-day baseline at a BJD epoch
    V = np.stack([np.ones_like(x), x]).astype(np.float32)
    periods = np.linspace(0.7, 30.0, 96)
    freqs = (1.0 / periods).astype(np.float32)
    out = np.asarray(fold_onehot(t, V, freqs, n_phi=64, interpret=True))
    # exact float64 fold on the shifted axis
    exact = np.zeros((len(freqs), 2, 64))
    tr = t - t[0]
    for i, p in enumerate(periods):
        phi = (tr * np.float64(np.float32(1.0 / p))) % 1.0
        pb = np.clip((phi * 64).astype(np.int32), 0, 63)
        for r in range(2):
            np.add.at(exact[i, r], pb, V[r])
    # counts row: at most a tiny fraction of samples may hop a bin edge
    moved = np.abs(out[:, 0] - exact[:, 0]).sum() / 2  # each hop counts 2x
    assert moved <= 0.005 * len(freqs) * t.size
    # per-trial bin mass matches closely (no systematic phase smearing)
    np.testing.assert_allclose(out[:, 0].sum(axis=1), t.size, rtol=1e-6)
    corr = [
        np.corrcoef(out[i, 1], exact[i, 1])[0, 1] for i in range(len(freqs))
    ]
    assert min(corr) > 0.999


def test_fold_onehot_jits_around(sample):
    """The fold composes under an outer jit (the scan drivers wrap it)."""
    t, x = sample
    V = np.ones((1, t.size), np.float32)
    freqs = (1.0 / np.linspace(1.0, 15.0, 32)).astype(np.float32)

    @jax.jit
    def total(fr):
        return fold_onehot(t, V, fr, n_phi=8, interpret=True).sum()

    assert np.isclose(float(total(freqs)), 32 * t.size, rtol=1e-6)
