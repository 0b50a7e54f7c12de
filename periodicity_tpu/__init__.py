"""periodicity-tpu: TPU-native framework for period determination in time series.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
``periodicity`` reference library (dioph/periodicity): spectral methods
(GLS), phase-folding methods (StringLength, PDM, AoV), decomposition
(EMD, LMD, CEEMDAN, VMD), time-frequency (WPS, HHT, CompositeSpectrum) and
Gaussian-process period inference (celerite-style O(N) solvers, dense QP
kernels, on-device ensemble MCMC) — all as pure, jittable, vmappable,
shardable functions behind the reference's configured-callable estimator
API.

Module layout mirrors the reference import paths::

    periodicity_tpu.core            TSeries / FSeries / TFSeries
    periodicity_tpu.spectral        GLS (+ jitted gls_power kernel)
    periodicity_tpu.phase           StringLength / PDM / AoV
    periodicity_tpu.decomposition   EMD / LMD / CEEMDAN / VMD
    periodicity_tpu.timefrequency   WPS / HHT / CompositeSpectrum / denoise
    periodicity_tpu.gp              BrownianGP / HarmonicGP / QuasiPeriodicGP ...
    periodicity_tpu.data            bundled datasets + generators
    periodicity_tpu.parallel        mesh + sharded grid scans
    periodicity_tpu.ops             jittable numerical kernels (L1)
"""

from . import core, data, decomposition, gp, ops, parallel, phase, spectral
from . import timefrequency
from .core import FSeries, TFSeries, TSeries

__version__ = "0.1.0"
name = "periodicity_tpu"

__all__ = [
    "TSeries",
    "FSeries",
    "TFSeries",
    "core",
    "spectral",
    "phase",
    "decomposition",
    "timefrequency",
    "gp",
    "data",
    "parallel",
    "ops",
]
