"""Distributed FFT over a time-sharded axis (sequence parallelism).

SURVEY §5.7: the TPU-native equivalent of "long-context parallelism" for
this domain is sharding the time axis of very long series across chips for
FFT-based pipelines (ACF, CWT). GSPMD would all-gather a sharded FFT
operand; this module implements the communication-optimal radix-D
Cooley-Tukey factorization instead:

  forward (block -> cyclic), decimation in frequency:
      X[D m + r] = DFT_L( s_r[n] * e^{-2 pi i n r / N} )[m]
      s_r[n]     = sum_j x_j[n] * omega_D^{j r}
  - each chip forms its D weighted copies, ONE all_to_all delivers the
    r-th copies to chip r (1x data volume, rides ICI), a local sum, a
    twiddle, and a local L-point FFT finish the job;
  inverse (cyclic -> block) is the exact mirror (decimation in time).

Chip r ends holding the frequency residue class X[r::D] ("cyclic" layout),
which composes with elementwise spectral work (PSD, Wiener filters) and
feeds straight back through the inverse — so a sharded ACF of an
N=10^7-sample series never materializes the full series or spectrum on
one chip.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["distributed_fft", "distributed_ifft", "distributed_acf"]


def _cdtype(x):
    return jnp.complex128 if x.dtype in (jnp.float64, jnp.complex128) else jnp.complex64


def distributed_fft(x, mesh, axis="seq"):
    """DFT of x [N] sharded in contiguous blocks over `axis`.

    Returns the spectrum in cyclic layout: chip r holds X[r::D] (the
    returned array is ordered [r, m] -> X[D m + r], flattened, sharded).
    """
    d = mesh.shape[axis]
    x = jnp.asarray(x)
    n = x.shape[0]
    if n % d:
        raise ValueError(f"N={n} must be divisible by mesh axis size {d}")
    el = n // d
    cdtype = _cdtype(x)

    @partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
             check_vma=False)
    def _fwd(x_local):
        j = jax.lax.axis_index(axis)
        nn = jnp.arange(el)
        r = jnp.arange(d)
        # weighted copies for every target residue class r
        w = jnp.exp(-2j * jnp.pi * (j * r / d).astype(cdtype))  # [D]
        y = w[:, None] * x_local[None, :].astype(cdtype)  # [D, L]
        z = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=0, tiled=True)
        s = jnp.sum(z.reshape(d, el), axis=0)
        twiddle = jnp.exp(-2j * jnp.pi * (nn * j / n).astype(cdtype))
        return jnp.fft.fft(s * twiddle)

    return _fwd(x)


def distributed_ifft(X_cyclic, mesh, axis="seq"):
    """Inverse of distributed_fft: cyclic-layout spectrum -> block-layout
    time series."""
    d = mesh.shape[axis]
    X_cyclic = jnp.asarray(X_cyclic)
    n = X_cyclic.shape[0]
    el = n // d
    cdtype = _cdtype(X_cyclic)

    @partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
             check_vma=False)
    def _inv(X_local):
        r = jax.lax.axis_index(axis)
        nn = jnp.arange(el)
        u = jnp.fft.ifft(X_local)  # L-point inverse of the residue class
        # contributions to every target block j
        j = jnp.arange(d)
        phase_block = jnp.exp(2j * jnp.pi * (j * r / d).astype(cdtype))  # [D]
        phase_in = jnp.exp(2j * jnp.pi * (nn * r / n).astype(cdtype))  # [L]
        v = phase_block[:, None] * (u * phase_in)[None, :]  # [D, L]
        z = jax.lax.all_to_all(v, axis, split_axis=0, concat_axis=0, tiled=True)
        return jnp.sum(z.reshape(d, el), axis=0) / d

    return _inv(X_cyclic)


def distributed_acf(y, mesh, axis="seq", max_lag=None):
    """Autocorrelation of one long series, time-sharded end to end.

    y [N] sharded in blocks over `axis`; zero-padded internally to 2N for
    linear (non-circular) lags. Returns the lag-0-normalized ACF in block
    layout (full [N] array sharded; take [:max_lag] on the host if given).
    """
    d = mesh.shape[axis]
    y = jnp.asarray(y)
    n = y.shape[0]
    mean = jnp.mean(y)
    yc = y - mean
    # pad to 2N, keeping block sharding
    pad = jnp.zeros_like(yc)
    y2 = jnp.concatenate([yc, pad])
    sharding = NamedSharding(mesh, P(axis))
    y2 = jax.lax.with_sharding_constraint(y2, sharding)
    X = distributed_fft(y2, mesh, axis)
    ps = (X * jnp.conj(X)).astype(_cdtype(y))
    r = distributed_ifft(ps, mesh, axis).real[:n]
    r0 = r[0]
    out = r / r0
    if max_lag is not None:
        out = out[:max_lag]
    return out
