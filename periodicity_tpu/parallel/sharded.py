"""Sharded estimator kernels (shard_map over device meshes).

Each scorer shards its *grid* axis: the series (t, y, w) is replicated
(small), every chip scores a contiguous slice of the trial grid with the
same single-chip kernel, and the sharded output IS the assembled
periodogram — XLA inserts the all-gather over ICI only if a replicated
result is requested downstream. This is the TPU-native replacement for the
reference's Pool.map over trial periods (reference phase.py:69-70,183-186).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.spectral import gls_power
from ..models.phase import (
    aov_scan,
    bls_scan,
    conditional_entropy_scan,
    gregory_loredo_scan,
    pdm_scan,
    string_length_scan,
)

__all__ = [
    "sharded_gls",
    "sharded_pdm",
    "sharded_string_length",
    "sharded_bls",
    "sharded_aov",
    "sharded_conditional_entropy",
    "sharded_gregory_loredo",
    "sharded_acf",
]


def sharded_gls(t, y, err, df, fmin, nf, mesh, axis="grid",
                fit_mean=True, psd=False, gridder="scatter"):
    """GLS periodogram with the frequency band split across `axis`.

    Each of the D chips runs the Press-Rybicki kernel on its own nf/D
    sub-band (its extirpolation FFT is D-fold smaller), so the scan is
    compute- and memory-parallel. Returns the full power array (sharded
    over `axis`).
    """
    d = mesh.shape[axis]
    if nf % d:
        raise ValueError(f"nf={nf} must be divisible by mesh axis size {d}")
    nf_local = nf // d

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    def _run(t, y, err):
        idx = jax.lax.axis_index(axis)
        fmin_local = fmin + idx * nf_local * df
        return gls_power(
            t, y, err, df, fmin_local, nf_local, fit_mean=fit_mean,
            psd=psd, gridder=gridder,
        )

    return _run(jnp.asarray(t), jnp.asarray(y), jnp.asarray(err))


def _sharded_period_scan(kernel, t, x, periods, mesh, axis, **kw):
    d = mesh.shape[axis]
    if periods.shape[0] % d:
        raise ValueError(
            f"n_periods={periods.shape[0]} must be divisible by mesh axis size {d}"
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def _run(t, x, periods_local):
        return kernel(t, x, periods_local, **kw)

    return _run(jnp.asarray(t), jnp.asarray(x), jnp.asarray(periods))


def sharded_pdm(t, x, periods, mesh, axis="grid", nb=5, nc=2, batch_size=128):
    """PDM theta over a period grid sharded across chips."""
    return _sharded_period_scan(
        pdm_scan, t, x, jnp.asarray(periods), mesh, axis,
        nb=nb, nc=nc, batch_size=batch_size,
    )


def sharded_string_length(t, m, periods, mesh, axis="grid", batch_size=128):
    """String lengths over a period grid sharded across chips."""
    return _sharded_period_scan(
        string_length_scan, t, m, jnp.asarray(periods), mesh, axis,
        batch_size=batch_size,
    )


def sharded_aov(t, x, periods, mesh, axis="grid", nb=9, batch_size=128,
                binner="scatter"):
    """AoV F-statistic over a period grid sharded across chips. Same
    trial-grid split as :func:`sharded_pdm`; ``binner="pallas"`` runs the
    one-hot MXU fold on each chip's shard."""
    return _sharded_period_scan(
        aov_scan, t, x, jnp.asarray(periods), mesh, axis,
        nb=nb, batch_size=batch_size, binner=binner,
    )


def sharded_conditional_entropy(t, x, periods, mesh, axis="grid", n_phi=10,
                                n_mag=5, batch_size=128, binner="scatter"):
    """Conditional entropy H(mag | phase) over a sharded period grid."""
    return _sharded_period_scan(
        conditional_entropy_scan, t, x, jnp.asarray(periods), mesh, axis,
        n_phi=n_phi, n_mag=n_mag, batch_size=batch_size, binner=binner,
    )


def sharded_gregory_loredo(t, periods, mesh, axis="grid", n_bins=12,
                           batch_size=128, binner="scatter"):
    """Gregory-Loredo log odds over a sharded period grid (the scorer
    folds only the sample times — no magnitude operand to replicate)."""
    periods = jnp.asarray(periods)
    d = mesh.shape[axis]
    if periods.shape[0] % d:
        raise ValueError(
            f"n_periods={periods.shape[0]} must be divisible by mesh axis size {d}"
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def _run(t, periods_local):
        return gregory_loredo_scan(t, periods_local, n_bins=n_bins,
                                   batch_size=batch_size, binner=binner)

    return _run(jnp.asarray(t), periods)


def sharded_bls(t, y, w, periods, mesh, axis="grid", widths=(3, 13, 26),
                nbins=256, batch_size=64, binner="scatter"):
    """BLS over a period grid sharded across chips: each chip folds and
    scores its own contiguous slice of the trial periods with the
    single-chip fold/prefix-sum kernel (series replicated, no
    collectives until a replicated result is requested). ``binner``
    passes through to :func:`bls_scan` — "pallas" runs the one-hot MXU
    fold on each chip's shard. Returns the (power, depth, width_idx,
    bin_start) tuple, each sharded over `axis`."""
    periods = jnp.asarray(periods)
    d = mesh.shape[axis]
    if periods.shape[0] % d:
        raise ValueError(
            f"n_periods={periods.shape[0]} must be divisible by mesh axis size {d}"
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def _run(t, y, w, periods_local):
        return bls_scan(t, y, w, periods_local, widths=widths,
                        nbins=nbins, batch_size=batch_size, binner=binner)

    return _run(jnp.asarray(t), jnp.asarray(y), jnp.asarray(w), periods)


def sharded_acf(y_batch, mesh, batch_axis="batch"):
    """FFT autocorrelation of a batch of uniform series, batch sharded.

    y_batch: [B, N] mean-subtracted uniform series. Uses XLA's sharded FFT:
    under pjit the per-series rfft/irfft pipeline runs where the data
    lives; only layout, no collectives, rides ICI if resharded.
    """
    sharding = NamedSharding(mesh, P(batch_axis, None))
    y = jax.device_put(jnp.asarray(y_batch), sharding)

    @jax.jit
    def _acf(y):
        n = y.shape[-1]
        yc = y - jnp.mean(y, axis=-1, keepdims=True)
        ps = jnp.abs(jnp.fft.rfft(yc, n=2 * n, axis=-1)) ** 2
        r = jnp.fft.irfft(ps, axis=-1)[..., :n]
        return r / r[..., :1]

    return _acf(y)
