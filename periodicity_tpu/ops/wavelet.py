"""Wavelet and analytic-signal kernels.

TPU-native replacement for the reference's PyWavelets / scipy.signal.hilbert
dependencies (reference: timefrequency.py:5-6,151-167,208-221):

- ``cwt_morlet``: continuous wavelet transform with a complex Morlet
  ``cmorB-C`` (psi(t) = (pi*B)^-1/2 exp(-t^2/B) exp(2i*pi*C*t)) as a single
  batched XLA FFT pipeline: rfft of the (zero-padded) signal x conj(psi_hat)
  per scale, batched inverse FFT over the scale axis. O((S+N) log N) on the
  TPU FFT instead of per-scale convolution.
- ``dwt_per``/``idwt_per``/``wavedec``/``waverec``: periodized discrete
  wavelet transform filter banks (Daubechies), perfect-reconstruction,
  expressed as strided gathers + convolutions.
- ``soft_threshold``, ``hilbert``: elementwise / FFT one-sided doubling.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "central_frequency",
    "psi_zero",
    "cwt_morlet",
    "hilbert",
    "scaling_filter",
    "dwt_per",
    "idwt_per",
    "wavedec",
    "waverec",
    "max_dwt_level",
    "soft_threshold",
]


def _parse_cmor(family):
    """cmorB-C -> (B, C)."""
    if family.startswith("cmor"):
        b, c = family[4:].split("-")
        return float(b), float(c)
    raise ValueError(f"Unknown continuous wavelet family {family}")


def central_frequency(family):
    """Center frequency in cycles/sample at scale 1 (pywt parity)."""
    if family.startswith("cmor"):
        return _parse_cmor(family)[1]
    if family == "morl":
        return 5.0 / (2 * np.pi)
    raise ValueError(f"Unknown wavelet family {family}")


def scale2frequency(family, scale):
    return central_frequency(family) / np.asarray(scale)


def psi_zero(family):
    """psi(0) for inverse-CWT reconstruction (reference
    timefrequency.py:162-167 uses the 'morl' value)."""
    if family == "morl":
        return 1.0
    if family.startswith("cmor"):
        b, _ = _parse_cmor(family)
        return (np.pi * b) ** -0.5
    raise ValueError(f"Unknown wavelet family {family}")


@partial(jax.jit, static_argnames=("nfft",))
def _cwt_kernel(x, scales, b_param, c_param, dt, nfft):
    n = x.shape[0]
    xf = jnp.fft.fft(x, n=nfft)
    freqs = jnp.fft.fftfreq(nfft, d=dt).astype(x.dtype)
    # continuous FT of psi is exp(-pi^2 B (f - C)^2), evaluated at scale*f
    af = scales[:, None] * freqs[None, :]
    psi_hat = jnp.exp(-(jnp.pi**2) * b_param * (af - c_param) ** 2)
    w = jnp.fft.ifft(xf[None, :] * jnp.sqrt(scales[:, None]) * psi_hat, axis=1)
    return w[:, :n]


def cwt_morlet(x, scales, family="cmor2.0-1.0", dt=1.0):
    """CWT coefficients [n_scales, N]; scales in samples (pywt convention:
    scale s responds to frequency C/(s*dt))."""
    x = jnp.asarray(x)
    n = x.shape[0]
    b_param, c_param = _parse_cmor(family)
    nfft = 1 << int(2 * n - 1).bit_length()
    scales = jnp.asarray(scales, x.dtype) * dt  # to time units
    return _cwt_kernel(x, scales, b_param, c_param, dt, nfft)


def hilbert(x):
    """Analytic signal via one-sided spectrum doubling
    (scipy.signal.hilbert parity)."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    xf = jnp.fft.fft(x, axis=-1)
    h = jnp.zeros(n, x.dtype)
    if n % 2 == 0:
        h = h.at[0].set(1).at[n // 2].set(1).at[1 : n // 2].set(2)
    else:
        h = h.at[0].set(1).at[1 : (n + 1) // 2].set(2)
    return jnp.fft.ifft(xf * h, axis=-1)


# ---------------------------------------------------------------------------
# Discrete wavelet transform: generated orthogonal filter families +
# periodized jnp filter banks. Replaces the reference's PyWavelets DWT
# (reference timefrequency.py:151-159 wavedec/waverec mode="per").
# ---------------------------------------------------------------------------


def _binomial_poly_roots(n_moments):
    """Roots (in y) of P(y) = sum_{k<N} C(N-1+k, k) y^k, the half-band
    remainder in Daubechies' construction (Daubechies 1992, ch. 6)."""
    from math import comb

    coefs = [comb(n_moments - 1 + k, k) for k in range(n_moments)]
    if n_moments == 1:
        return np.array([])
    roots = np.roots(coefs[::-1]).astype(complex)
    # Newton-polish: np.roots loses ~5 digits for the high-order families
    # (db16-db20); a few iterations restore them.
    poly = np.array(coefs[::-1], float)
    deriv = np.polyder(poly)
    for _ in range(3):
        roots = roots - np.polyval(poly, roots) / np.polyval(deriv, roots)
    return roots


def _z_roots_of(y):
    """The z-plane root pair of y = (2 - z - 1/z)/4, ordered
    (inside unit circle, outside)."""
    b = 2 - 4 * y
    disc = np.sqrt(b * b - 4 + 0j)
    z1, z2 = (b + disc) / 2, (b - disc) / 2
    return (z1, z2) if abs(z1) < abs(z2) else (z2, z1)


def _filter_from_roots(z_roots, n_moments):
    """Scaling filter sqrt(2)-normalized from its z-plane zeros plus an
    n_moments-fold zero at z = -1."""
    poly = np.array([1.0 + 0j])
    for z in z_roots:
        poly = np.convolve(poly, [1.0, -z])
    for _ in range(n_moments):
        poly = np.convolve(poly, [1.0, 1.0])
    h = np.real(poly)
    return h * (np.sqrt(2.0) / h.sum())


def _daubechies(n_moments):
    """Extremal-phase (db) scaling filter: all spectral-factor zeros inside
    the unit circle. Increasing-index convention; matches the published
    db1-db4 tables to ~1e-12."""
    zs = [_z_roots_of(y)[0] for y in _binomial_poly_roots(n_moments)]
    return _filter_from_roots(zs, n_moments)


def _root_groups(ys):
    """Group the y-roots into units that must flip together to keep the
    filter real: singleton real roots, complex-conjugate pairs."""
    used = np.zeros(len(ys), bool)
    groups = []
    for i, y in enumerate(ys):
        if used[i]:
            continue
        used[i] = True
        if abs(y.imag) < 1e-10:
            groups.append([y.real + 0j])
        else:
            j = int(np.argmin(np.abs(ys - np.conj(y)) + used * 1e9))
            used[j] = True
            groups.append([y, ys[j]])
    return groups


def _symlet(n_moments):
    """Least-asymmetric (sym) scaling filter: among all real spectral
    factorizations (each root group taken inside or outside the unit
    circle), pick the one whose frequency-response phase deviates least
    from linear. Reproduces the published sym4 table to ~1e-12."""
    from itertools import product as _product

    groups = _root_groups(_binomial_poly_roots(n_moments))
    omega = np.linspace(0.01, np.pi - 0.01, 256)
    best, best_score = None, np.inf
    for flags in _product((0, 1), repeat=len(groups)):
        zs = []
        for flag, grp in zip(flags, groups):
            for y in grp:
                inside, outside = _z_roots_of(y)
                zs.append(outside if flag else inside)
        h = _filter_from_roots(zs, n_moments)
        resp = np.exp(-1j * np.outer(omega, np.arange(len(h)))) @ h
        phase = np.unwrap(np.angle(resp))
        slope = np.dot(phase, omega) / np.dot(omega, omega)
        score = np.sum((phase - slope * omega) ** 2)
        if score < best_score:
            best_score, best = score, h
    # A filter and its time-reversal tie on the asymmetry measure (they are
    # the same wavelet mirrored), so the argmin alone is numerically
    # unstable. Canonicalize: orient so the energy centroid sits at or left
    # of the midpoint, then sym2 reproduces db2 and sym4 matches the
    # published table up to this documented convention.
    idx = np.arange(len(best), dtype=float)
    if np.dot(best**2, idx) > (len(best) - 1) / 2:
        best = best[::-1].copy()
    return best


_FILTER_CACHE = {}


def scaling_filter(family):
    """Orthonormal scaling (low-pass) filter for ``dbN`` (N=1..20) and
    ``symN`` (N=2..20), increasing-index convention, sum = sqrt(2)."""
    if family not in _FILTER_CACHE:
        kind = family.rstrip("0123456789")
        num = family[len(kind):]
        if not num:
            raise ValueError(f"Unknown wavelet family {family}")
        n_moments = int(num)
        if kind == "db" and 1 <= n_moments <= 20:
            _FILTER_CACHE[family] = _daubechies(n_moments)
        elif kind == "sym" and 2 <= n_moments <= 20:
            _FILTER_CACHE[family] = _symlet(n_moments)
        else:
            raise ValueError(f"Unknown wavelet family {family}")
    return _FILTER_CACHE[family]


def _quadrature_mirror(lo):
    """High-pass filter g[m] = (-1)^m lo[L-1-m] from the low-pass."""
    hi = lo[::-1] * jnp.where(jnp.arange(lo.shape[0]) % 2 == 0, 1.0, -1.0)
    return hi


def dwt_per(x, lo):
    """One periodized orthogonal analysis level -> (approx, detail).

    a[k] = sum_m lo[m] x[(2k+m) mod n], expressed as a circular gather +
    two small matvecs, so it is jittable and vmaps over leading axes. Odd
    lengths are extended by repeating the last sample (periodization).
    The phase convention may differ from pywt "per" by a circular shift,
    which idwt_per inverts exactly and thresholding is insensitive to.
    """
    x = jnp.asarray(x)
    lo = jnp.asarray(lo, x.dtype)
    n = x.shape[0]
    if n % 2 == 1:
        x = jnp.concatenate([x, x[-1:]])
        n += 1
    taps = lo.shape[0]
    gather = (2 * jnp.arange(n // 2)[:, None] + jnp.arange(taps)[None, :]) % n
    windows = x[gather]
    return windows @ lo, windows @ _quadrature_mirror(lo)


def idwt_per(ca, cd, lo):
    """Periodized orthogonal synthesis (exact inverse of dwt_per).

    x = circconv(upsample(ca), lo) + circconv(upsample(cd), hi) -- a static
    stack of rolled upsampled coefficient arrays contracted against the
    filter taps (branch-free; no scatter).
    """
    ca = jnp.asarray(ca)
    cd = jnp.asarray(cd, ca.dtype)
    lo = jnp.asarray(lo, ca.dtype)
    hi = _quadrature_mirror(lo)
    n = 2 * ca.shape[0]
    up_a = jnp.zeros(n, ca.dtype).at[::2].set(ca)
    up_d = jnp.zeros(n, ca.dtype).at[::2].set(cd)
    taps = lo.shape[0]
    rolled_a = jnp.stack([jnp.roll(up_a, m) for m in range(taps)])
    rolled_d = jnp.stack([jnp.roll(up_d, m) for m in range(taps)])
    return lo @ rolled_a + hi @ rolled_d


def max_dwt_level(n, taps):
    """pywt.dwt_max_level parity: floor(log2(n / (taps - 1)))."""
    if taps <= 2:
        return max(int(np.log2(max(n, 1))), 1)
    return max(int(np.log2(max(n // (taps - 1), 1))), 1)


def wavedec(x, family="db4", level=None):
    """Multi-level periodized DWT -> [cA_n, cD_n, ..., cD_1].

    The level count is static given the input length, so the whole
    decomposition traces into one XLA program when called under jit.
    """
    lo = scaling_filter(family)
    x = jnp.asarray(x)
    n = x.shape[0]
    if level is None:
        level = max_dwt_level(n, len(lo))
    coefs = []
    approx = x
    for _ in range(level):
        if approx.shape[0] < 2:
            break
        approx, detail = dwt_per(approx, lo)
        coefs.append(detail)
    coefs.append(approx)
    return coefs[::-1]


def waverec(coefs, family="db4"):
    """Inverse of wavedec."""
    lo = scaling_filter(family)
    approx = jnp.asarray(coefs[0])
    for detail in coefs[1:]:
        detail = jnp.asarray(detail)
        approx = idwt_per(approx[: detail.shape[0]], detail, lo)
    return approx


def soft_threshold(x, value):
    x = jnp.asarray(x)
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - value, 0.0)


@partial(jax.jit, static_argnames=("family", "level", "detrend"))
def dwt_denoise(x, threshold, family="db4", level=None, detrend=False):
    """Soft-threshold DWT denoising as one jitted program (reference
    timefrequency.py:151-159). Zeroing the approximation band (detrend)
    removes the trend component."""
    coefs = wavedec(x, family, level)
    approx = jnp.zeros_like(coefs[0]) if detrend else coefs[0]
    details = [soft_threshold(c, threshold) for c in coefs[1:]]
    return waverec([approx] + details, family)[: x.shape[0]]
