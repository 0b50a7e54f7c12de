"""Time-frequency estimators: WPS, HHT, CompositeSpectrum, DWT denoise.

TPU-native designs for the capabilities of the reference timefrequency
module (reference: timefrequency.py:14-318). None of the hot paths touch
host numpy:

- ``WPS``: one jitted kernel computes the complex-Morlet CWT (batched XLA
  FFT pipeline from ops.wavelet), squared magnitude, Liu et al. (2007)
  scale-unbiasing, the cone-of-influence mask, and the NaN-masked spectrum
  in a single fused program. SAV/GWPS band averages are masked jnp
  reductions.
- ``HHT``: modes are stacked into one [n_modes, N] array and pushed through
  a vmapped jitted instantaneous-frequency pipeline (ops.hht): AM/FM
  normalization as a lax.while_loop, DQ/NHT/TEO/HT phase differentiation,
  and a batched scatter spectrogram.
- ``CompositeSpectrum``: GWPS x on-device interpolated ACF (reference
  timefrequency.py:305-318).
- ``denoise``: single-jit soft-threshold DWT with generated db1-db20 /
  sym2-sym20 / coif1-coif17 / dmey / biorNr.Nd / rbioNr.Nd filter banks
  (reference timefrequency.py:151-159 delegates to
  PyWavelets).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core import FSeries, TFSeries, TSeries
from ..ops import hht as _ops_hht
from ..ops import wavelet as _wav
from ..utils.logging import log_event
from .decomposition import EMD

__all__ = [
    "WPS",
    "HHT",
    "CompositeSpectrum",
    "denoise",
    "denoise_batch",
    "reconstruct",
    "wps_batch",
    "hht_batch",
]

_IF_METHODS = ("DQ", "NHT", "TEO", "HT")
_NORM_TYPES = ("hilbert", "spline", "lmd")


class HHT:
    """Hilbert-Huang Transform (capability parity with reference
    timefrequency.py:14-148).

    A pluggable decomposition (``emd``, default :class:`EMD`) extracts
    AM-FM modes; each mode's instantaneous frequency/amplitude and the
    scatter spectrogram are computed by one vmapped jitted kernel.

    After ``__call__``: ``modes``, ``instant_fs``, ``instant_as``, ``tfs``
    (per-mode spectrograms) and ``tf`` (their sum) are set.
    """

    def __init__(
        self,
        frequencies,
        emd=None,
        method="DQ",
        norm_type="spline",
        norm_iter=10,
        smooth_width=None,
    ):
        self.frequencies = np.sort(np.asarray(frequencies, float))
        self.emd = emd if emd is not None else EMD()
        if method.upper() not in _IF_METHODS:
            raise ValueError(f"Method {method} is unknown.")
        if norm_type.lower() not in _NORM_TYPES:
            raise ValueError(f"Method {norm_type} is unknown.")
        self.method = method.upper()
        self.norm_type = norm_type.lower()
        self.norm_iter = norm_iter
        self.smooth_width = smooth_width

    def _per_mode_if(self, t, mode_stack):
        """[M, N] mode values -> ([M, N] frequencies, [M, N] amplitudes).

        One vmapped jitted kernel for every ``norm_type`` — the 'lmd'
        backend runs as single jitted LMD sifts inside the normalization
        while_loop (ops.lmd via ops.hht.am_fm_normalize)."""

        def one(values):
            return _ops_hht.instant_frequency(
                t,
                values,
                method=self.method,
                norm_type=self.norm_type,
                n_iter=self.norm_iter,
            )

        return jax.vmap(one)(mode_stack)

    def __call__(self, signal):
        if not isinstance(signal, TSeries):
            signal = TSeries(values=signal)
        self.signal = signal
        t = jnp.asarray(signal.time)
        grid = jnp.asarray(self.frequencies)
        log_event("hht", n=signal.size, nf=grid.shape[0],
                  method=self.method, norm_type=self.norm_type)

        modes = self.emd(signal)
        live = [m for m in modes if bool(jnp.any(m.values != 0))]

        if self.method in ("TEO", "HT") and live:
            # Computed from the raw signal, so identical for every live
            # mode (reference timefrequency.py:123-134 behavior; with no
            # live modes the reference produces empty output, not a
            # raw-signal row).
            freq, amp = _ops_hht.instant_frequency(
                t, jnp.asarray(signal.values), method=self.method
            )
            n_live = len(live)
            freq_stack = jnp.broadcast_to(freq, (n_live,) + freq.shape)
            amp_stack = jnp.broadcast_to(amp, (n_live,) + amp.shape)
        elif live:
            stack = jnp.stack([jnp.asarray(m.values) for m in live])
            freq_stack, amp_stack = self._per_mode_if(t, stack)
        else:
            freq_stack = jnp.zeros((0, t.shape[0]))
            amp_stack = jnp.zeros((0, t.shape[0]))

        instant_fs = [
            TSeries(t, f, assume_sorted=True) for f in freq_stack
        ]
        instant_as = [
            TSeries(t, a, assume_sorted=True) for a in amp_stack
        ]
        if self.smooth_width is not None and instant_fs:
            instant_fs = [f.smooth(self.smooth_width) for f in instant_fs]
            instant_as = [a.smooth(self.smooth_width) for a in instant_as]
            freq_stack = jnp.stack([f.values for f in instant_fs])
            amp_stack = jnp.stack([a.values for a in instant_as])

        if freq_stack.shape[0]:
            power = jax.vmap(
                lambda f, a: _ops_hht.spectrogram(grid, f, a)
            )(freq_stack, amp_stack)
            tfs = [
                TFSeries(time=t, frequency=grid, values=p) for p in power
            ]
            tf = TFSeries(
                time=t, frequency=grid, values=jnp.sum(power, axis=0)
            )
        else:
            tfs, tf = [], None

        self.modes = modes
        self.instant_fs = instant_fs
        self.instant_as = instant_as
        self.tfs = tfs
        self.tf = tf
        log_event("hht_done", n_modes=len(modes), n_live=len(instant_fs))
        return tf


def _denoise_mad_core(x, family, detrend):
    """Single traced program: wavedec once, MAD sigma from the finest
    detail band, soft-threshold, reconstruct."""
    coefs = _wav.wavedec(x, family)
    sigma = jnp.median(jnp.abs(coefs[-1])) / 0.6745
    threshold = sigma * np.sqrt(2.0 * np.log(x.shape[0]))
    approx = jnp.zeros_like(coefs[0]) if detrend else coefs[0]
    details = [_wav.soft_threshold(c, threshold) for c in coefs[1:]]
    return _wav.waverec([approx] + details, family)[: x.shape[0]]


@partial(jax.jit, static_argnames=("family", "detrend"))
def _denoise_mad(x, family="db4", detrend=False):
    return _denoise_mad_core(x, family, detrend)


@partial(jax.jit, static_argnames=("family", "detrend"))
def _denoise_mad_batch(x, family="db4", detrend=False):
    return jax.vmap(lambda xx: _denoise_mad_core(xx, family, detrend))(x)


@partial(jax.jit, static_argnames=("family", "detrend"))
def _denoise_batch_fixed(x, thresholds, family="db4", detrend=False):
    return jax.vmap(
        lambda xx, th: _wav.dwt_denoise(xx, th, family=family, detrend=detrend)
    )(x, thresholds)


def _as_float(x):
    return x.astype(jnp.result_type(x.dtype, jnp.float32))


def denoise(data, family="db4", sigma=None, detrend=False):
    """Soft-threshold DWT denoising with the universal (VisuShrink)
    threshold sigma * sqrt(2 ln N), optionally zeroing the approximation
    band to detrend (capability parity with reference
    timefrequency.py:151-159). Runs as one jitted program.

    Deliberate divergence: the reference raises TypeError when ``sigma``
    is omitted (``None * np.sqrt(...)``); here ``sigma=None`` estimates
    the noise level on-device with Donoho's MAD rule on the finest
    detail band, sigma = median(|d1|) / 0.6745 — computed inside the
    same jitted program (the decomposition is done once)."""
    x = _as_float(jnp.asarray(data))
    if sigma is None:
        return _denoise_mad(x, family=family, detrend=detrend)
    threshold = float(sigma) * float(np.sqrt(2.0 * np.log(x.shape[0])))
    return _wav.dwt_denoise(x, threshold, family=family, detrend=detrend)


def denoise_batch(batch, family="db4", sigma=None, detrend=False):
    """Vectorized :func:`denoise` over a stack of equal-length series
    (rows = light curves) — the P4 batch path for the wavelet family,
    matching wps_batch/hht_batch. ``sigma`` may be a scalar, a per-row
    array, or None for per-row MAD estimates; everything runs as one
    vmapped jitted program (integer input is promoted to float first,
    like the single-series path)."""
    x = _as_float(jnp.asarray(batch))
    if x.ndim != 2:
        raise ValueError("denoise_batch expects [batch, n] input")
    if sigma is None:
        return _denoise_mad_batch(x, family=family, detrend=detrend)
    sigma = jnp.broadcast_to(jnp.asarray(sigma, x.dtype), (x.shape[0],))
    thr = sigma * np.sqrt(2.0 * np.log(x.shape[1]))
    return _denoise_batch_fixed(x, thr, family=family, detrend=detrend)


def reconstruct(coefs, periods, dt, family):
    """Delta-function inverse CWT: sum over scales of coefs/sqrt(scale),
    normalized by psi(0) of the real Morlet (capability parity with
    reference timefrequency.py:162-167)."""
    scales = jnp.asarray(
        _wav.scale2frequency(family, 1) * np.asarray(periods) / dt
    )
    summed = jnp.sum(jnp.asarray(coefs) / jnp.sqrt(scales)[:, None], axis=0)
    return summed / _wav.psi_zero("morl")


def _coi_correction():
    """e-folding half-width of the cmor2.0-1.0 cone: sqrt(2) periods."""
    return float(np.exp2(0.5))


@jax.jit
def _wps_postprocess(coefs, scales, periods, t):
    """Fused magnitude/unbias/COI stage of the WPS pipeline."""
    power = jnp.square(jnp.abs(coefs))
    unbiased = power / scales[:, None]
    reach = jnp.minimum(t - t[0], t[-1] - t)
    in_cone = _coi_correction() * periods[:, None] < reach[None, :]
    masked = jnp.where(in_cone, unbiased, jnp.nan)
    return power, unbiased, in_cone, masked


class WPS:
    """Morlet (cmor2.0-1.0) wavelet power spectrum (capability parity with
    reference timefrequency.py:170-302).

    The CWT + unbiasing + COI masking is one fused device computation; the
    reference instead dispatches to pywt's conv-or-fft paths and masks with
    host numpy.
    """

    FAMILY = "cmor2.0-1.0"

    def __init__(self, periods):
        self.periods = np.asarray(periods, float)
        self.frequency = 1.0 / self.periods

    def __call__(self, signal):
        if not isinstance(signal, TSeries):
            signal = TSeries(values=signal)
        dt = float(signal.median_dt)
        log_event("wps", n=signal.size, n_scales=self.periods.size)
        scales = _wav.scale2frequency(self.FAMILY, 1) * self.periods / dt

        coefs = _wav.cwt_morlet(
            signal.values - signal.mean(), scales, self.FAMILY, dt=dt
        )
        power, unbiased, in_cone, masked = _wps_postprocess(
            coefs,
            jnp.asarray(scales),
            jnp.asarray(self.periods),
            jnp.asarray(signal.time),
        )

        self.signal = signal
        self.time = signal.time
        self.scales = scales
        self.coefs = coefs
        self._in_cone = in_cone
        self.power = TFSeries(
            time=self.time, frequency=self.frequency, values=power
        )
        self.spectrum = TFSeries(
            time=self.time, frequency=self.frequency, values=unbiased
        )
        self.masked_spectrum = TFSeries(
            time=self.time, frequency=self.frequency, values=masked
        )
        return self.spectrum

    # -- cone of influence --------------------------------------------------
    @property
    def mask_coi(self):
        """Boolean [n_periods, n_times]: True inside the cone."""
        return np.asarray(self._in_cone)

    def coi(self, coi_samples=100):
        """Boundary samples of the cone for plotting: the locus where a
        period's e-folding reach meets the data span, log-spaced in period
        and mirrored about the series midpoint."""
        corr = _coi_correction()
        t = np.asarray(self.time)
        span = t.max() - t.min()
        p = np.logspace(
            np.log10(self.periods.min()),
            np.log10(self.periods.max()),
            coi_samples,
        )
        p = p[corr * p < span / 2]
        edges = np.concatenate([t.min() + corr * p, t.max() - corr * p])
        return TSeries(edges, np.concatenate([p, p]))

    def plot_coi(self, coi_samples=100, **kwargs):
        import matplotlib.pyplot as plt

        boundary = self.coi(coi_samples)
        plt.fill_between(
            np.asarray(boundary.time),
            np.asarray(boundary.values),
            self.periods.max(),
            **kwargs,
        )

    # -- band averages -------------------------------------------------------
    def _rows(self, pmin, pmax):
        lo = -np.inf if pmin is None else pmin
        hi = np.inf if pmax is None else pmax
        return jnp.asarray((self.periods >= lo) & (self.periods <= hi))

    def _cols(self, tmin, tmax):
        t = jnp.asarray(self.time)
        lo = -jnp.inf if tmin is None else tmin
        hi = jnp.inf if tmax is None else tmax
        return (t >= lo) & (t <= hi)

    def sav(self, pmin=None, pmax=None):
        """Scale-averaged variance: mean unbiased power over a period band
        (reference timefrequency.py:264-270)."""
        sel = self._rows(pmin, pmax)
        vals = jnp.asarray(self.spectrum.values)
        avg = jnp.sum(jnp.where(sel[:, None], vals, 0.0), axis=0) / jnp.sum(sel)
        return TSeries(self.time, avg, assume_sorted=True)

    def masked_sav(self, pmin=None, pmax=None):
        """SAV over in-cone values only (NaN-aware mean)."""
        sel = self._rows(pmin, pmax)
        vals = jnp.asarray(self.masked_spectrum.values)
        avg = jnp.nanmean(jnp.where(sel[:, None], vals, jnp.nan), axis=0)
        return TSeries(self.time, avg, assume_sorted=True)

    def gwps(self, tmin=None, tmax=None):
        """Global wavelet power spectrum: time-mean of the unbiased power
        (reference timefrequency.py:282-288)."""
        sel = self._cols(tmin, tmax)
        vals = jnp.asarray(self.spectrum.values)
        avg = jnp.sum(jnp.where(sel[None, :], vals, 0.0), axis=1) / jnp.sum(sel)
        return FSeries(self.frequency, avg)

    def masked_gwps(self, tmin=None, tmax=None):
        sel = self._cols(tmin, tmax)
        vals = jnp.asarray(self.masked_spectrum.values)
        avg = jnp.nanmean(jnp.where(sel[None, :], vals, jnp.nan), axis=1)
        return FSeries(self.frequency, avg)


@partial(jax.jit, static_argnames=("family",))
def _wps_batch_kernel(t, ys, scales, periods, family, dt):
    def one(y):
        coefs = _wav.cwt_morlet(y - jnp.mean(y), scales, family, dt=dt)
        return jnp.square(jnp.abs(coefs)) / scales[:, None]

    unbiased = jax.vmap(one)(ys)
    reach = jnp.minimum(t - t[0], t[-1] - t)
    in_cone = _coi_correction() * periods[:, None] < reach[None, :]
    return unbiased, in_cone


def wps_batch(time, values, periods, family=WPS.FAMILY):
    """Unbiased wavelet power spectra for B light curves sharing one time
    grid: one vmapped CWT+unbias program (the SURVEY §2.2 batch axis the
    strictly single-series reference lacks).

    time [N] (uniformly sampled), values [B, N], periods [S].
    Returns (spectra [B, S, N], in_cone [S, N] bool). Shard the leading
    axis over a mesh for multi-chip batches.
    """
    time = jnp.asarray(time)
    values = jnp.asarray(values)
    periods = np.asarray(periods, float)
    dt = float(np.median(np.diff(np.asarray(time))))
    scales = _wav.scale2frequency(family, 1) * periods / dt
    return _wps_batch_kernel(
        time, values, jnp.asarray(scales), jnp.asarray(periods), family, dt
    )


@partial(
    jax.jit,
    static_argnames=(
        "max_modes", "method", "norm_type", "norm_iter", "max_iter",
        "pad_width",
    ),
)
def _hht_batch_kernel(t, Y, grid, max_modes, method, norm_type, norm_iter,
                      max_iter, pad_width, theta_1, theta_2, alpha):
    from ..ops.emd import emd_batch

    modes, residue, n_modes = emd_batch(
        t, Y, max_modes=max_modes, max_iter=max_iter, pad_width=pad_width,
        theta_1=theta_1, theta_2=theta_2, alpha=alpha,
    )
    power = _hht_post_kernel(t, Y, modes, n_modes, grid, method, norm_type,
                             norm_iter)
    return power, modes, residue, n_modes


@partial(jax.jit, static_argnames=("method", "norm_type", "norm_iter"))
def _hht_post_kernel(t, Y, modes, n_modes, grid, method, norm_type,
                     norm_iter):
    """Spectrogram assembly from decomposed modes: the per-(member, mode)
    instantaneous-frequency stack + batched time-frequency scatter —
    everything in hht_batch AFTER the EMD, so the sifting can run either
    inside one jit (emd_batch) or through the lane-retiring pool driver
    (ops.emd.emd_pool) without duplicating this stage."""
    b, m, n = modes.shape
    live = jnp.arange(m)[None, :] < n_modes[:, None]  # [B, M]

    if method in ("TEO", "HT"):
        # computed from the raw signal, identical for every live mode
        # (reference timefrequency.py:123-134); the mode sum scales power
        # by the live-mode count
        freq, amp = jax.vmap(
            lambda y: _ops_hht.instant_frequency(t, y, method=method)
        )(Y)
        power = jax.vmap(
            lambda f, a: _ops_hht.spectrogram(grid, f, a)
        )(freq, amp)
        # the mode sum scales power by the LIVE count: a member with zero
        # IMFs has zero power, matching sequential HHT's empty output
        return power * n_modes[:, None, None]

    # DQ/NHT need per-mode AM/FM normalization; dead mode slots are all
    # zero (envelope 0 -> NaN), so substitute a benign oscillation and mask
    # the amplitude to zero afterwards
    dummy = jnp.cos(
        2 * jnp.pi * (t - t[0]) / ((t[-1] - t[0]) / 8.0 + 1e-12)
    )
    safe = jnp.where(live[..., None], modes, dummy[None, None, :])

    def one_mode(v):
        return _ops_hht.instant_frequency(
            t, v, method=method, norm_type=norm_type, n_iter=norm_iter,
        )

    freq, amp = jax.vmap(one_mode)(safe.reshape(b * m, n))
    freq = freq.reshape(b, m, n) * live[..., None]
    amp = amp.reshape(b, m, n) * live[..., None]

    def one_member(fs, amps):
        per_mode = jax.vmap(
            lambda f, a: _ops_hht.spectrogram(grid, f, a)
        )(fs, amps)
        return jnp.sum(per_mode, axis=0)

    power = jax.vmap(one_member)(freq, amp)
    return power


def hht_batch(time, values, frequencies, max_modes=8, method="DQ",
              norm_type="spline", norm_iter=10, max_iter=2000, pad_width=2,
              theta_1=0.05, theta_2=0.50, alpha=0.05, sifter="auto",
              unroll=4):
    """Hilbert-Huang spectrograms for B light curves sharing one time grid
    (the estimator-level batch analog of ``HHT()(signal)``, following the
    ``gls_power_batch``/``wps_batch`` pattern; SURVEY §2.2 row (a)).

    ``sifter="pool"`` runs the EMD stage through the lane-retiring pool
    driver (ops.emd.emd_pool): members whose decomposition finishes stop
    consuming device time instead of riding the lock-step batch until
    the slowest member converges — measured sift-unit skew at typical
    shapes is 5-10x, which this reclaims. ``sifter="lockstep"`` keeps
    the whole transform inside ONE jit (ops.emd.emd_batch); per-member
    results are identical either way. ``"auto"`` (default) picks pool
    for B >= 16 — below that the pool cannot compact under its minimum
    bucket and its per-segment host syncs only add latency (measured
    crossover on v5e: lockstep wins at B=8, pool wins 2.3x at B=32).
    ``unroll`` forwards to the pool (sift steps per while_loop trip —
    amortizes the relay's per-dispatch floor; results are unroll-exact).
    The per-(member, mode) instantaneous-frequency stack is one flat
    vmap; the time-frequency scatter is batched. Every ``norm_type``
    (``"spline"``, ``"hilbert"``, ``"lmd"``) runs jitted.

    time [N] (uniformly sampled for ``norm_type="lmd"``), values [B, N],
    frequencies [F] ->
    (power [B, F, N], modes [B, max_modes, N], residue [B, N], n_modes [B]).
    Mode slots past a member's count are zero; each member's spectrogram
    matches the sequential ``HHT(frequencies, method=...)(y_b)`` whenever
    that member decomposes into at most ``max_modes`` IMFs (the batch runs
    at fixed mode capacity under jit — raise ``max_modes`` if members are
    expected to carry more; surplus modes' energy would otherwise be
    dropped, or for TEO/HT the mode-count power scale would differ).
    Shard the leading axis over a mesh for multi-chip batches.
    """
    if method.upper() not in _IF_METHODS:
        raise ValueError(f"Method {method} is unknown.")
    if norm_type.lower() not in _NORM_TYPES:
        raise ValueError(f"Method {norm_type} is unknown.")
    if sifter not in ("auto", "pool", "lockstep"):
        raise ValueError(f"Sifter {sifter} is unknown.")
    grid = jnp.sort(jnp.asarray(frequencies, float))
    t = jnp.asarray(time)
    Y = jnp.asarray(values)
    if sifter == "auto":
        sifter = "pool" if Y.shape[0] >= 16 else "lockstep"
    if sifter == "lockstep":
        return _hht_batch_kernel(
            t, Y, grid, int(max_modes),
            method.upper(), norm_type.lower(), int(norm_iter),
            int(max_iter), int(pad_width), theta_1, theta_2, alpha,
        )
    from ..ops.emd import emd_pool

    modes, residue, n_modes = emd_pool(
        t, Y, max_modes=int(max_modes), max_iter=int(max_iter),
        pad_width=int(pad_width), theta_1=theta_1, theta_2=theta_2,
        alpha=alpha, unroll=int(unroll),
    )
    power = _hht_post_kernel(t, Y, modes, n_modes, grid, method.upper(),
                             norm_type.lower(), int(norm_iter))
    return power, modes, residue, n_modes


class CompositeSpectrum:
    """Product of the max-normalized GWPS with the ACF of the gap-filled
    signal, interpolated onto the GWPS period grid (capability parity with
    reference timefrequency.py:305-318)."""

    def __init__(self, periods):
        self.periods = periods
        self.wps = WPS(periods)

    def __call__(self, signal):
        if not isinstance(signal, TSeries):
            signal = TSeries(values=signal)
        self.wps(signal)
        gwps = self.wps.gwps()
        gwps = gwps / gwps.amax()
        acf = signal.fill_gaps().acf()
        acf_on_grid = jnp.interp(
            jnp.asarray(gwps.period),
            jnp.asarray(acf.time),
            jnp.asarray(acf.values),
        )
        return gwps * acf_on_grid
