"""periodicity-tpu: TPU-native framework for period determination in time series.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
``periodicity`` reference library (dioph/periodicity): spectral methods
(GLS), phase-folding methods (StringLength, PDM, AoV), decomposition
(EMD, LMD, CEEMDAN), time-frequency (WPS, HHT, CompositeSpectrum) and
Gaussian-process period inference (celerite-style O(N) solvers, dense QP
kernels, on-device ensemble MCMC) — all as pure, jittable, vmappable,
shardable functions behind the reference's configured-callable estimator
API.
"""

__version__ = "0.1.0"
name = "periodicity_tpu"
