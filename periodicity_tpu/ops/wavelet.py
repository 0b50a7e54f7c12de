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
    "wavedec",
    "waverec",
    "soft_threshold",
    "DB4_LO",
]

# Daubechies-4 (8-tap) decomposition low-pass filter, standard published
# coefficients (Daubechies 1992, Table 6.1), normalized to sum = sqrt(2).
DB4_LO = np.array(
    [
        -0.010597401784997278,
        0.032883011666982945,
        0.030841381835986965,
        -0.18703481171888114,
        -0.02798376941698385,
        0.6308807679295904,
        0.7148465705525415,
        0.23037781330885523,
    ]
)[::-1].copy()

_DB_LO = {
    "db1": np.array([0.7071067811865476, 0.7071067811865476]),
    "db2": np.array(
        [0.48296291314469025, 0.836516303737469, 0.22414386804185735,
         -0.12940952255092145]
    ),
    "db4": DB4_LO[::-1].copy(),
}


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
    # psi_hat(f) = sqrt(pi*B) * ... continuous FT of psi is exp(-pi^2 B (f-C)^2)
    af = scales[:, None] * dt * freqs[None, :] / dt  # scale * f (f in cycles/time)
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


def _qmf(lo):
    """High-pass from low-pass by quadrature mirror."""
    hi = lo[::-1].copy()
    hi[1::2] = -hi[1::2]
    return hi


def dwt_per(x, lo):
    """One periodized orthogonal DWT level -> (approx, detail).

    Correlation analysis: a[k] = sum_m lo[m] x[(2k+m) mod n]. Phase
    convention may differ from pywt 'per' by a circular shift, which is
    irrelevant for thresholding/denoising and inverted exactly by idwt_per.
    """
    x = np.asarray(x)
    n = x.shape[0]
    if n % 2 == 1:
        x = np.concatenate([x, x[-1:]])
        n += 1
    lo = np.asarray(lo)
    hi = _qmf(lo)
    L = len(lo)
    idx = (2 * np.arange(n // 2)[:, None] + np.arange(L)[None, :]) % n
    xg = x[idx]
    return xg @ lo, xg @ hi


def idwt_per(ca, cd, lo):
    """Inverse of dwt_per (perfect reconstruction for orthonormal filters)."""
    lo = np.asarray(lo)
    hi = _qmf(lo)
    half = len(ca)
    n = 2 * half
    L = len(lo)
    out = np.zeros(n)
    ks = np.arange(half)
    for m in range(L):
        np.add.at(out, (2 * ks + m) % n, lo[m] * ca + hi[m] * cd)
    return out


def wavedec(x, family="db4", level=None):
    """Multi-level periodized DWT -> [cA_n, cD_n, ..., cD_1]."""
    lo = _DB_LO[family]
    x = np.asarray(x, float)
    if level is None:
        level = int(np.log2(max(len(x) // (len(lo) - 1), 1))) or 1
    coefs = []
    a = x
    for _ in range(level):
        if len(a) < 2:
            break
        a, d = dwt_per(a, lo)
        coefs.append(d)
    coefs.append(a)
    return coefs[::-1]


def waverec(coefs, family="db4"):
    """Inverse of wavedec."""
    lo = _DB_LO[family]
    a = np.asarray(coefs[0])
    for d in coefs[1:]:
        d = np.asarray(d)
        a = a[: len(d)]
        a = idwt_per(a, d, lo)
    return a


def soft_threshold(x, value):
    x = np.asarray(x)
    return np.sign(x) * np.maximum(np.abs(x) - value, 0.0)
