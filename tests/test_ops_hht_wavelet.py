"""Tests for the jitted HHT kernels (ops/hht.py) and the generated DWT
filter families (ops/wavelet.py). scipy/numpy act as golden oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from periodicity_tpu.ops import hht as ops_hht
from periodicity_tpu.ops import wavelet as wav

# Published scaling filters (Daubechies 1992, Table 6.1; pywt dec tables
# reversed to increasing-index convention).
DB2_PUB = np.array(
    [0.48296291314469025, 0.836516303737469, 0.22414386804185735,
     -0.12940952255092145]
)
DB4_PUB = np.array(
    [0.23037781330885523, 0.7148465705525415, 0.6308807679295904,
     -0.02798376941698385, -0.18703481171888114, 0.030841381835986965,
     0.032883011666982945, -0.010597401784997278]
)
SYM4_PUB = np.array(
    [0.032223100604071306, -0.012603967262261437, -0.099219543576935183,
     0.29785779560560505, 0.80373875180591614, 0.49761866763256292,
     -0.029635527645998685, -0.0757657147893567]
)


# ---------------------------------------------------------------------------
# gradient / TEO
# ---------------------------------------------------------------------------

def test_gradient_matches_numpy_uniform_and_nonuniform():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(257)
    np.testing.assert_allclose(
        np.asarray(ops_hht.gradient(y)), np.gradient(y), rtol=1e-12
    )
    t = np.sort(rng.uniform(0, 10, 257))
    np.testing.assert_allclose(
        np.asarray(ops_hht.gradient(y, t)), np.gradient(y, t), rtol=1e-9,
        atol=1e-9,
    )


def test_teager_pure_tone():
    t = np.arange(0, 100, 0.05)
    x = np.sin(2 * np.pi * 0.5 * t)
    freq, amp = ops_hht.instant_frequency(
        jnp.asarray(t), jnp.asarray(x), method="TEO"
    )
    core_f = np.asarray(freq)[100:-100]
    core_a = np.asarray(amp)[100:-100]
    assert np.median(core_f) == pytest.approx(0.5, rel=0.02)
    assert np.median(core_a) == pytest.approx(1.0, rel=0.05)


# ---------------------------------------------------------------------------
# AM/FM normalization + instantaneous frequency
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("norm_type", ["hilbert", "spline"])
def test_am_fm_normalize_unit_amplitude(norm_type):
    t = np.arange(0, 200, 0.1)
    envelope = 1.0 + 0.3 * np.sin(2 * np.pi * t / 80)
    x = envelope * np.sin(2 * np.pi * 0.5 * t)
    A, F = ops_hht.am_fm_normalize(
        jnp.asarray(t), jnp.asarray(x), norm_type=norm_type
    )
    core = slice(100, -100)
    assert float(jnp.max(jnp.abs(F))) <= 1.0 + 1e-9
    # amplitude estimate tracks the true envelope away from the edges
    rel = np.asarray(A)[core] / envelope[core]
    assert np.median(np.abs(rel - 1)) < 0.05


@pytest.mark.parametrize("method", ["DQ", "NHT", "HT"])
def test_instant_frequency_pure_tone(method):
    t = np.arange(0, 400, 0.2)
    x = np.sin(2 * np.pi * 0.25 * t)
    freq, amp = ops_hht.instant_frequency(
        jnp.asarray(t), jnp.asarray(x), method=method
    )
    core = np.asarray(freq)[200:-200]
    assert np.median(core) == pytest.approx(0.25, rel=0.02)


def test_instant_frequency_vmaps_over_modes():
    t = np.arange(0, 100, 0.1)
    modes = np.stack(
        [np.sin(2 * np.pi * f * t) for f in (0.3, 1.0)]
    )
    freq, amp = jax.vmap(
        lambda x: ops_hht.instant_frequency(jnp.asarray(t), x, method="DQ")
    )(jnp.asarray(modes))
    med = np.median(np.asarray(freq)[:, 100:-100], axis=1)
    # the 1.0 cycles/time tone has only 10 samples/cycle, so the spline
    # envelope carries a few percent of discretization bias
    np.testing.assert_allclose(med, [0.3, 1.0], rtol=0.1)


def test_spectrogram_matches_numpy_scatter():
    rng = np.random.default_rng(1)
    grid = np.linspace(0, 1, 33)
    freq = rng.uniform(-0.1, 1.1, 50)
    amp = rng.uniform(0, 1, 50)
    got = np.asarray(ops_hht.spectrogram(
        jnp.asarray(grid), jnp.asarray(freq), jnp.asarray(amp)
    ))
    want = np.zeros((33, 50))
    rows = np.clip(np.searchsorted(grid, freq), 0, 32)
    want[rows, np.arange(50)] += amp
    want[[0, -1]] = 0
    np.testing.assert_allclose(got, want, rtol=1e-12)


# ---------------------------------------------------------------------------
# DWT filter families
# ---------------------------------------------------------------------------

def test_scaling_filters_match_published_tables():
    np.testing.assert_allclose(
        wav.scaling_filter("db1"),
        np.full(2, np.sqrt(0.5)), atol=1e-12,
    )
    np.testing.assert_allclose(wav.scaling_filter("db2"), DB2_PUB, atol=1e-11)
    np.testing.assert_allclose(wav.scaling_filter("db4"), DB4_PUB, atol=1e-11)
    # a filter and its time reversal are the same wavelet mirrored (pywt
    # itself stores both, as dec_lo and rec_lo); match up to that convention
    sym4 = np.asarray(wav.scaling_filter("sym4"))
    err = min(
        np.abs(sym4 - SYM4_PUB).max(), np.abs(sym4[::-1] - SYM4_PUB).max()
    )
    assert err < 1e-11
    # sym2 coincides with db2
    np.testing.assert_allclose(
        wav.scaling_filter("sym2"), DB2_PUB, atol=1e-11
    )


@pytest.mark.parametrize(
    "family",
    [f"db{n}" for n in range(1, 21)] + [f"sym{n}" for n in range(2, 21)],
)
def test_filter_orthonormality_and_moments(family):
    h = wav.scaling_filter(family)
    taps = len(h)
    n_moments = taps // 2
    assert np.sum(h**2) == pytest.approx(1.0, abs=1e-9)
    assert np.sum(h) == pytest.approx(np.sqrt(2), abs=1e-9)
    for k in range(1, n_moments):
        assert abs(np.dot(h[2 * k:], h[: taps - 2 * k])) < 1e-8
    # vanishing moments of the wavelet filter
    g = h[::-1].copy()
    g[1::2] *= -1
    for p in range(min(n_moments, 4)):
        assert abs(np.dot(g, np.arange(taps, dtype=float) ** p)) < 5e-6


@pytest.mark.parametrize("family", ["db1", "db4", "db12", "sym5", "sym8"])
def test_perfect_reconstruction(family):
    rng = np.random.default_rng(2)
    for n in (512, 1001):
        x = rng.standard_normal(n)
        rec = np.asarray(wav.waverec(wav.wavedec(x, family), family))[:n]
        np.testing.assert_allclose(rec, x, atol=1e-10)


def test_symlets_are_more_symmetric_than_db():
    """The least-asymmetric factorization beats extremal phase on the
    linear-phase deviation it minimizes."""

    def asym(h):
        w = np.linspace(0.01, np.pi - 0.01, 256)
        H = np.exp(-1j * np.outer(w, np.arange(len(h)))) @ h
        ph = np.unwrap(np.angle(H))
        slope = np.dot(ph, w) / np.dot(w, w)
        return np.sum((ph - slope * w) ** 2)

    for n in (4, 6, 8, 10):
        assert asym(wav.scaling_filter(f"sym{n}")) <= asym(
            wav.scaling_filter(f"db{n}")
        ) + 1e-9


def test_dwt_denoise_jit_and_vmap():
    rng = np.random.default_rng(3)
    clean = np.sin(2 * np.pi * np.arange(1024.0) / 128)
    batch = clean[None, :] + 0.3 * rng.standard_normal((4, 1024))
    thr = 0.3 * float(np.sqrt(2 * np.log(1024)))
    one = wav.dwt_denoise(jnp.asarray(batch[0]), thr)
    many = jax.vmap(lambda x: wav.dwt_denoise(x, thr))(
        jnp.asarray(batch)
    )
    np.testing.assert_allclose(np.asarray(many[0]), np.asarray(one), atol=1e-12)
    err_before = np.std(batch - clean[None], axis=1)
    err_after = np.std(np.asarray(many) - clean[None], axis=1)
    assert (err_after < 0.8 * err_before).all()


def test_coiflet_construction_properties():
    """coif1-5: exact orthonormality, 2K vanishing wavelet moments, 2K-1
    vanishing scaling moments about c = 4K-1, sum sqrt(2); coif1 matches
    the published table."""
    COIF1_PUB = np.array([
        -0.01565572813546454, -0.0727326195128539, 0.38486484686420286,
        0.8525720202122554, 0.3378976624578092, -0.0727326195128539,
    ])
    for K in (1, 2, 3, 4, 5, 8, 9, 12, 17):
        h = np.asarray(wav.scaling_filter(f"coif{K}"))
        L = 6 * K
        assert h.shape == (L,)
        assert abs(h.sum() - np.sqrt(2)) < 1e-11
        for k in range(3 * K):
            tgt = 1.0 if k == 0 else 0.0
            assert abs(np.dot(h[: L - 2 * k], h[2 * k:]) - tgt) < 1e-11
        m = np.arange(L, dtype=float)
        sgn = (-1.0) ** np.arange(L)
        c = 4 * K - 1
        for p in range(2 * K):
            sc = max(np.max(np.abs((m - c) ** p)), 1.0)
            assert abs(np.dot(sgn * (m - c) ** p, h)) / sc < 1e-10
        for p in range(1, 2 * K):
            sc = max(np.max(np.abs((m - c) ** p)), 1.0)
            assert abs(np.dot((m - c) ** p, h)) / sc < 1e-10
    np.testing.assert_allclose(
        np.asarray(wav.scaling_filter("coif1")), COIF1_PUB, atol=1e-11
    )


def test_discrete_meyer_filter():
    """dmey: 62 symmetric taps (zero-prepended integer-centered Meyer),
    sum sqrt(2), near-orthonormal to the documented ~1e-5 truncation
    floor, Meyer passband/stopband, and near-PR wavedec/waverec."""
    h = np.asarray(wav.scaling_filter("dmey"))
    assert h.shape == (62,)
    assert h[0] == 0.0
    np.testing.assert_allclose(h[1:], h[1:][::-1], atol=1e-15)
    assert abs(h.sum() - np.sqrt(2)) < 1e-4
    assert abs(h[31] - 0.74375) < 1e-3  # classical dmey center tap
    for k in range(31):
        tgt = 1.0 if k == 0 else 0.0
        assert abs(np.dot(h[: 62 - 2 * k], h[2 * k:]) - tgt) < 2e-5
    Hw = np.abs(np.fft.fft(h, 4096))
    assert abs(Hw[0] - np.sqrt(2)) < 1e-4          # DC
    assert Hw[2048] < 1e-4                          # Nyquist
    assert np.all(Hw[: 4096 // 6] > np.sqrt(2) - 1e-3)  # flat |w|<=pi/3
    rng = np.random.default_rng(7)
    x = rng.standard_normal(512)
    rec = np.asarray(wav.waverec(wav.wavedec(x, "dmey"), "dmey"))[:512]
    assert np.max(np.abs(rec - x)) < 5e-4  # documented ~4e-5/level floor
    t = np.linspace(0, 1, 512)
    clean = np.sin(2 * np.pi * 5 * t)
    noisy = clean + 0.3 * rng.standard_normal(512)
    den = np.asarray(
        wav.dwt_denoise(
            jnp.asarray(noisy), 0.3 * np.sqrt(2 * np.log(512)), family="dmey"
        )
    )
    assert np.std(den - clean) < 0.7 * np.std(noisy - clean)


def test_bior_filter_values_and_pr():
    """bior2.2 is the CDF 5/3 pair (exact published values); every
    bior/rbio family perfectly reconstructs through multi-level
    wavedec/waverec."""
    dec_lo, _, rec_lo, _ = wav.filter_bank("bior2.2")
    nz_d = dec_lo[np.abs(dec_lo) > 0]
    nz_r = rec_lo[np.abs(rec_lo) > 0]
    np.testing.assert_allclose(
        nz_d, np.sqrt(2) * np.array([-1 / 8, 1 / 4, 3 / 4, 1 / 4, -1 / 8]),
        atol=1e-14,
    )
    np.testing.assert_allclose(
        nz_r, np.sqrt(2) * np.array([1 / 4, 1 / 2, 1 / 4]), atol=1e-14
    )
    rng = np.random.default_rng(3)
    from periodicity_tpu.ops.wavelet import _BIOR_ORDERS

    def np_dwt(x, bank):
        dlo, dhi = bank[0], bank[1]
        n, taps = x.shape[0], dlo.shape[0]
        g = (2 * np.arange(n // 2)[:, None] + np.arange(taps)[None, :]) % n
        return x[g] @ dlo, x[g] @ dhi

    def np_idwt(a, d, bank):
        rlo, rhi = bank[2], bank[3]
        n = 2 * a.shape[0]
        up_a = np.zeros(n)
        up_a[::2] = a
        up_d = np.zeros(n)
        up_d[::2] = d
        out = np.zeros(n)
        for m in range(rlo.shape[0]):
            out += rlo[m] * np.roll(up_a, m) + rhi[m] * np.roll(up_d, m)
        return out

    # all 30 banks: 2-level perfect reconstruction in pure numpy (the
    # jitted path is exercised on a representative subset below — one
    # compile per (family, level, length) would dominate suite time)
    for nr, nd in _BIOR_ORDERS:
        for fam in (f"bior{nr}.{nd}", f"rbio{nr}.{nd}"):
            bank = wav.filter_bank(fam)
            x = rng.standard_normal(128)
            a1, d1 = np_dwt(x, bank)
            a2, d2 = np_dwt(a1, bank)
            rec = np_idwt(np_idwt(a2, d2, bank), d1, bank)
            assert np.max(np.abs(rec - x)) < 1e-9, fam
    # jitted multi-level wavedec/waverec on representative members
    for fam in ("bior1.3", "bior2.2", "bior4.4", "rbio3.5", "rbio6.8"):
        x = rng.standard_normal(128)
        rec = np.asarray(wav.waverec(wav.wavedec(x, fam), fam))[:128]
        assert np.max(np.abs(rec - x)) < 1e-9, fam


def test_coif_bior_perfect_reconstruction_and_denoise():
    rng = np.random.default_rng(4)
    for fam in ("coif1", "coif3", "coif5", "coif12"):
        x = rng.standard_normal(257)
        rec = np.asarray(wav.waverec(wav.wavedec(x, fam), fam))[:257]
        assert np.max(np.abs(rec - x)) < 1e-9, fam
    # denoise runs under jit with the new families and still denoises
    t = np.linspace(0, 1, 512)
    clean = np.sin(2 * np.pi * 5 * t)
    noisy = clean + 0.3 * rng.standard_normal(512)
    # VisuShrink's threshold calibration assumes an orthonormal transform;
    # biorthogonal frames (especially the rbio duals, which analyze with
    # the spline side) get a weaker but still real improvement
    for fam, factor in (("coif2", 0.8), ("bior2.4", 0.8), ("rbio3.5", 0.9)):
        den = np.asarray(
            wav.dwt_denoise(
                jnp.asarray(noisy),
                0.3 * np.sqrt(2 * np.log(512)),
                family=fam,
            )
        )
        assert np.std(den - clean) < factor * np.std(noisy - clean), fam
