"""Time-frequency estimators (WPS, HHT, CompositeSpectrum, DWT denoise).

TPU-native redesign of the reference timefrequency module (reference:
timefrequency.py:14-318):

- WPS: complex-Morlet (cmor2.0-1.0) wavelet power spectrum. The reference
  chooses between pywt's conv and fft paths (timefrequency.py:212-218); here
  the CWT is always the batched XLA FFT pipeline in ops/wavelet.py (one
  forward FFT + one batched inverse FFT over all scales). Liu et al. (2007)
  scale-unbiasing, cone-of-influence masks, SAV and GWPS reductions.
- HHT: pluggable decomposition (EMD default), Huang et al. (2009) iterative
  AM/FM normalization (hilbert/spline/lmd envelopes), instantaneous
  frequency via DQ/NHT/TEO/HT, scatter spectrogram.
- CompositeSpectrum: GWPS x interpolated ACF (timefrequency.py:305-318).
- denoise/reconstruct: periodized DWT soft-threshold denoising and inverse
  CWT reconstruction (timefrequency.py:151-167).
"""

import warnings

import numpy as np
import jax.numpy as jnp

from ..core import TFSeries, TSeries
from ..ops import wavelet as _wav
from .decomposition import EMD, LMD

__all__ = ["WPS", "HHT", "CompositeSpectrum", "denoise", "reconstruct"]


class HHT:
    """Hilbert-Huang Transform (reference timefrequency.py:14-148)."""

    def __init__(
        self,
        frequencies,
        emd=None,
        method="DQ",
        norm_type="spline",
        norm_iter=10,
        smooth_width=None,
    ):
        self.frequencies = np.sort(np.asarray(frequencies))
        if emd is None:
            emd = EMD()
        self.emd = emd
        if method.upper() not in ["DQ", "NHT", "TEO", "HT"]:
            raise ValueError(f"Method {method} is unknown.")
        self.method = method.upper()
        if norm_type.lower() not in ["hilbert", "spline", "lmd"]:
            raise ValueError(f"Method {norm_type} is unknown.")
        self.norm_type = norm_type.lower()
        self.norm_iter = norm_iter
        self.smooth_width = smooth_width

    def _normalize(self, mode, eps=1e-6, pad_width=2):
        """Iterative AM/FM splitting (Huang et al. 2009;
        reference timefrequency.py:71-89)."""
        F = mode.copy()
        A = 1.0
        for _ in range(self.norm_iter):
            if self.norm_type == "hilbert":
                env = np.abs(np.asarray(_wav.hilbert(F.values)))
            elif self.norm_type == "spline":
                env, _ = abs(F).get_envelope(pad_width=pad_width)
            else:  # lmd
                lmd = LMD(pad_width=pad_width)
                mu, env = lmd.sift(F)
                F = F - mu
            F = F / env
            A = A * env
            if float(np.max(np.abs(np.asarray(F.values)))) - 1.0 < eps:
                break
        F = TSeries(F.time, jnp.clip(F.values, -1.0, 1.0), assume_sorted=True)
        return A, F

    def _spectrogram(self, freq_grid, freq, amp):
        tshape = len(freq)
        fshape = len(freq_grid)
        power = np.zeros((fshape, tshape), float)
        f_bins = np.clip(np.searchsorted(freq_grid, freq), 0, fshape - 1)
        power[f_bins, np.arange(tshape)] += amp
        power[[0, -1]] = 0
        return TFSeries(time=self.signal.time, frequency=freq_grid, values=power)

    def __call__(self, signal):
        if not isinstance(signal, TSeries):
            signal = TSeries(values=signal)
        self.signal = signal
        t = np.asarray(signal.time)
        f, a, tfs = [], [], []
        modes = self.emd(signal)
        for mode in modes:
            if not np.any(np.asarray(mode.values)):
                continue
            if self.method == "DQ":
                A, F = self._normalize(mode)
                amp = np.asarray(A.values) if hasattr(A, "values") else np.full(t.size, A)
                Fv = np.asarray(F.values)
                phi = np.arctan2(np.sqrt(np.maximum(1 - Fv**2, 0.0)), Fv)
                corr = np.sign(np.gradient(phi))
                phi = np.unwrap(phi * corr)
                freq = np.gradient(phi, t) / (2 * np.pi)
            elif self.method == "NHT":
                A, F = self._normalize(mode)
                amp = np.asarray(A.values) if hasattr(A, "values") else np.full(t.size, A)
                phi = np.unwrap(np.angle(np.asarray(_wav.hilbert(F.values))))
                freq = np.gradient(phi, t) / (2 * np.pi)
            elif self.method == "TEO":
                teo_x = np.asarray(signal.TEO.values)
                teo_xdot = np.asarray(signal.derivative.TEO.values)
                amp = teo_x / np.sqrt(teo_xdot)
                freq = np.sqrt(teo_xdot / teo_x) / (2 * np.pi)
            else:  # HT
                analytic = np.asarray(_wav.hilbert(signal.values))
                amp = np.abs(analytic)
                phi = np.unwrap(np.angle(analytic))
                freq = np.gradient(phi, t) / (2 * np.pi)
            freq = TSeries(signal.time, freq, assume_sorted=True)
            amp = TSeries(signal.time, amp, assume_sorted=True)
            if self.smooth_width is not None:
                freq = freq.smooth(self.smooth_width)
                amp = amp.smooth(self.smooth_width)
            f.append(freq)
            a.append(amp)
            tfs.append(
                self._spectrogram(
                    self.frequencies, np.asarray(freq.values), np.asarray(amp.values)
                )
            )
        self.modes = modes
        self.instant_fs = f
        self.instant_as = a
        self.tfs = tfs
        self.tf = sum(tfs) if tfs else None
        return self.tf


def denoise(data, family="db4", sigma=None, detrend=False):
    """DWT soft-threshold denoising (reference timefrequency.py:151-159)."""
    coefs = _wav.wavedec(np.asarray(data), family)
    threshold = sigma * np.sqrt(2 * np.log(len(data)))
    new_coefs = list(coefs)
    if detrend:
        new_coefs[0] = np.zeros_like(new_coefs[0])
    new_coefs[1:] = [_wav.soft_threshold(c, threshold) for c in coefs[1:]]
    y = _wav.waverec(new_coefs, family)
    return y[: len(np.asarray(data))]


def reconstruct(coefs, periods, dt, family):
    """Inverse CWT via the delta-function reconstruction
    (reference timefrequency.py:162-167)."""
    scales = _wav.scale2frequency(family, 1) * np.asarray(periods) / dt
    y_0 = _wav.psi_zero("morl")
    r_sum = np.transpose(np.sum(np.transpose(np.asarray(coefs)) / scales**0.5, axis=-1))
    return r_sum * (1 / y_0)


class WPS:
    """Morlet Wavelet Power Spectrum (reference timefrequency.py:170-302).

    Attributes after __call__: signal, time, scales, power, spectrum,
    mask_coi, masked_spectrum; methods sav/masked_sav/gwps/masked_gwps/coi.
    """

    FAMILY = "cmor2.0-1.0"

    def __init__(self, periods):
        self.periods = np.asarray(periods)
        self.frequency = 1.0 / self.periods

    def __call__(self, signal):
        if not isinstance(signal, TSeries):
            signal = TSeries(values=signal)
        dt = float(signal.median_dt)
        scales = _wav.scale2frequency(self.FAMILY, 1) * self.periods / dt
        coefs = _wav.cwt_morlet(
            signal.values - signal.mean(), scales, self.FAMILY, dt=dt
        )
        self.coefs = coefs
        power = jnp.square(jnp.abs(coefs))
        unbiased = power / jnp.asarray(scales)[:, None]
        self.signal = signal
        self.time = signal.time
        self.scales = scales
        self.power = TFSeries(time=self.time, frequency=self.frequency, values=power)
        self.spectrum = TFSeries(
            time=self.time, frequency=self.frequency, values=unbiased
        )
        mask = self.mask_coi
        self.masked_spectrum = TFSeries(
            time=self.time,
            frequency=self.frequency,
            values=jnp.where(jnp.asarray(mask), unbiased, jnp.nan),
        )
        return self.spectrum

    def coi(self, coi_samples=100):
        """Cone-of-influence boundary samples for plotting
        (reference timefrequency.py:237-254)."""
        corr = np.exp2(0.5)
        t = np.asarray(self.time)
        t_max, t_min = t.max(), t.min()
        p_samples = np.logspace(
            np.log10(self.periods.min()), np.log10(self.periods.max()), coi_samples
        )
        p_samples = p_samples[corr * p_samples < (t_max - t_min) / 2]
        t1 = t_min + corr * p_samples
        t2 = t_max - corr * p_samples
        return TSeries(
            np.hstack((t1, t2)), np.hstack((p_samples, p_samples))
        )

    @property
    def mask_coi(self):
        corr = np.exp2(0.5)
        t = np.asarray(self.time)
        t_mesh, p_mesh = np.meshgrid(t, self.periods)
        return corr * p_mesh < np.minimum(t_mesh - t.min(), t.max() - t_mesh)

    def _band_mask(self, pmin, pmax):
        mask = np.ones(len(self.periods), bool)
        if pmin is not None:
            mask &= self.periods >= pmin
        if pmax is not None:
            mask &= self.periods <= pmax
        return mask

    def sav(self, pmin=None, pmax=None):
        """Scale-averaged variance over a period band
        (reference timefrequency.py:264-270)."""
        mask = self._band_mask(pmin, pmax)
        return self.spectrum[mask].mean("frequency")

    def masked_sav(self, pmin=None, pmax=None):
        mask = self._band_mask(pmin, pmax)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            return self.masked_spectrum[mask].mean("frequency")

    def _time_mask(self, tmin, tmax):
        t = np.asarray(self.time)
        mask = np.ones(t.size, bool)
        if tmin is not None:
            mask &= t >= tmin
        if tmax is not None:
            mask &= t <= tmax
        return mask

    def gwps(self, tmin=None, tmax=None):
        """Global wavelet power spectrum (time average;
        reference timefrequency.py:282-288)."""
        mask = self._time_mask(tmin, tmax)
        return self.spectrum[:, mask].mean("time")

    def masked_gwps(self, tmin=None, tmax=None):
        mask = self._time_mask(tmin, tmax)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            return self.masked_spectrum[:, mask].mean("time")

    def plot_coi(self, coi_samples=100, **kwargs):
        import matplotlib.pyplot as plt

        coi = self.coi(coi_samples)
        plt.fill_between(
            np.asarray(coi.time), np.asarray(coi.values), self.periods.max(), **kwargs
        )


class CompositeSpectrum:
    """GWPS x ACF composite spectrum (reference timefrequency.py:305-318)."""

    def __init__(self, periods):
        self.periods = periods
        self.wps = WPS(periods)

    def __call__(self, signal):
        if not isinstance(signal, TSeries):
            signal = TSeries(values=signal)
        self.wps(signal)
        gwps = self.wps.spectrum.mean("time")
        gwps = gwps / gwps.amax()
        ryy = signal.fill_gaps().acf()
        cs = gwps * np.interp(
            np.asarray(gwps.period), np.asarray(ryy.time), np.asarray(ryy.values)
        )
        return cs
