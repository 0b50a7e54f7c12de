"""Jitted Hilbert-Huang kernels: AM/FM normalization, instantaneous
frequency, scatter spectrogram.

TPU-native redesign of the reference's instantaneous-frequency stack
(reference: timefrequency.py:71-148), which runs host-side numpy
(np.gradient / np.unwrap / np.add-style scatter) per mode. Here the whole
per-mode pipeline is a single jitted function:

- amplitude normalization (Huang et al. 2009) as a ``lax.while_loop`` with
  a convergence carry instead of a Python break;
- envelopes on device (FFT Hilbert magnitude, or the spline envelope kernel
  from ops.emd);
- instantaneous frequency via DQ / NHT / TEO / HT, with nonuniform-grid
  gradients (np.gradient parity: 2nd-order interior, 1st-order edges);
- the time-frequency projection as one ``.at[].add`` scatter.

Everything vmaps over a leading mode axis, so an M-mode IMF set is one
batched device computation rather than M host round-trips.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .emd import upper_envelope
from .lmd import lmd_sift
from .wavelet import hilbert

__all__ = [
    "gradient",
    "teager",
    "am_fm_normalize",
    "dq_frequency",
    "nht_frequency",
    "instant_frequency",
    "spectrogram",
]


def gradient(y, t=None):
    """np.gradient parity on a (possibly nonuniform) grid.

    Second-order central differences in the interior, first-order one-sided
    differences at the edges (numpy's default edge_order=1). With ``t``
    omitted the sample index is the coordinate.
    """
    y = jnp.asarray(y)
    if t is None:
        interior = (y[2:] - y[:-2]) * 0.5
        return jnp.concatenate(
            [(y[1] - y[0])[None], interior, (y[-1] - y[-2])[None]]
        )
    dt = jnp.diff(t)
    h1, h2 = dt[:-1], dt[1:]
    interior = (
        y[2:] * h1**2 - y[:-2] * h2**2 + y[1:-1] * (h2**2 - h1**2)
    ) / (h1 * h2 * (h1 + h2))
    first = (y[1] - y[0]) / dt[0]
    last = (y[-1] - y[-2]) / dt[-1]
    return jnp.concatenate([first[None], interior, last[None]])


def teager(y, t):
    """Teager energy operator on a nonuniform grid: TEO = (dy)^2 - y d2y."""
    g = gradient(y, t)
    return g * g - y * gradient(g, t)


@partial(jax.jit, static_argnames=("norm_type", "n_iter", "pad_width"))
def am_fm_normalize(t, x, norm_type="spline", n_iter=10, pad_width=2,
                    eps=1e-6):
    """Iterative AM/FM splitting (Huang et al. 2009; reference
    timefrequency.py:71-89) as a device loop.

    Repeatedly divides the mode by its amplitude envelope until the
    residual FM part has unit amplitude (within ``eps``) or ``n_iter``
    passes ran. Returns ``(A, F)`` with ``F`` clipped to [-1, 1].
    ``norm_type`` is ``"hilbert"`` (|analytic signal|), ``"spline"``
    (cubic-spline envelope of |F|), or ``"lmd"`` (single LMD sifts as the
    mean/envelope estimator, reference timefrequency.py:81-83; requires a
    uniformly sampled ``t``).
    """
    if norm_type not in ("hilbert", "spline", "lmd"):
        raise ValueError(f"norm_type {norm_type!r} unknown")
    x = jnp.asarray(x)

    def cond(carry):
        _, _, it, done = carry
        return (~done) & (it < n_iter)

    def body(carry):
        F, A, it, _ = carry
        if norm_type == "lmd":
            # LMD normalization demodulates the local mean too:
            # F <- (F - mu) / env (reference decomposition.py:165-183 via
            # timefrequency.py:81-83); a failed sift (no extrema) stops
            # the loop with the current F, A.
            mu, env, ok = lmd_sift(t, F, pad_width=pad_width)
            newF = jnp.where(ok, (F - mu) / env, F)
            newA = jnp.where(ok, A * env, A)
            done = (~ok) | (jnp.max(jnp.abs(newF)) - 1.0 < eps)
            return newF, newA, it + 1, done
        if norm_type == "hilbert":
            env = jnp.abs(hilbert(F))
        else:
            env = upper_envelope(t, jnp.abs(F), pad_width=pad_width)
        F = F / env
        A = A * env
        done = jnp.max(jnp.abs(F)) - 1.0 < eps
        return F, A, it + 1, done

    F, A, _, _ = jax.lax.while_loop(
        cond, body, (x, jnp.ones_like(x), jnp.asarray(0), jnp.asarray(False))
    )
    return A, jnp.clip(F, -1.0, 1.0)


@jax.jit
def dq_frequency(t, F):
    """Direct-quadrature instantaneous frequency of a unit-amplitude FM
    part: sign-corrected unwrapped arctan2 quadrature phase, then the
    nonuniform phase gradient over 2 pi."""
    quad = jnp.sqrt(jnp.clip(1.0 - F * F, 0.0))
    phi = jnp.arctan2(quad, F)
    phi = jnp.unwrap(phi * jnp.sign(gradient(phi)))
    return gradient(phi, t) / (2 * jnp.pi)


@jax.jit
def nht_frequency(t, F):
    """Normalized-Hilbert-transform instantaneous frequency of a
    unit-amplitude FM part."""
    phi = jnp.unwrap(jnp.angle(hilbert(F)))
    return gradient(phi, t) / (2 * jnp.pi)


@partial(
    jax.jit, static_argnames=("method", "norm_type", "n_iter", "pad_width")
)
def instant_frequency(t, x, method="DQ", norm_type="spline", n_iter=10,
                      pad_width=2):
    """Instantaneous frequency + amplitude of one AM-FM component.

    Methods (reference timefrequency.py:108-134):
    - ``DQ``  direct quadrature of the normalized FM part,
    - ``NHT`` normalized Hilbert transform,
    - ``TEO`` Teager energy operator (no normalization),
    - ``HT``  plain Hilbert transform (no normalization).

    Returns ``(freq [N], amp [N])`` in cycles per time unit.
    """
    two_pi = 2 * jnp.pi
    if method == "DQ":
        A, F = am_fm_normalize(
            t, x, norm_type=norm_type, n_iter=n_iter, pad_width=pad_width
        )
        return dq_frequency(t, F), A
    if method == "NHT":
        A, F = am_fm_normalize(
            t, x, norm_type=norm_type, n_iter=n_iter, pad_width=pad_width
        )
        return nht_frequency(t, F), A
    if method == "TEO":
        e_x = teager(x, t)
        e_dx = teager(gradient(x, t), t)
        amp = e_x / jnp.sqrt(e_dx)
        return jnp.sqrt(e_dx / e_x) / two_pi, amp
    if method == "HT":
        analytic = hilbert(x)
        phi = jnp.unwrap(jnp.angle(analytic))
        return gradient(phi, t) / two_pi, jnp.abs(analytic)
    raise ValueError(f"Method {method} is unknown.")


@jax.jit
def spectrogram(freq_grid, freq, amp):
    """Scatter per-sample amplitude into the nearest-above frequency bin
    (reference timefrequency.py:91-98). Edge rows are zeroed so energy
    landing outside the grid is discarded. Returns [n_freq, n_time]."""
    nf = freq_grid.shape[0]
    nt = freq.shape[0]
    rows = jnp.clip(jnp.searchsorted(freq_grid, freq), 0, nf - 1)
    power = jnp.zeros((nf, nt), amp.dtype).at[rows, jnp.arange(nt)].add(amp)
    return power.at[0].set(0.0).at[-1].set(0.0)
