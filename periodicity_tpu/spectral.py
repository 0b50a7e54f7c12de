"""Alias module mirroring the reference's import path
(``periodicity.spectral`` -> ``periodicity_tpu.spectral``)."""

from .models.spectral import BGLST, GLS, default_frequency_grid, gls_power

__all__ = ["GLS", "BGLST", "gls_power", "default_frequency_grid"]
