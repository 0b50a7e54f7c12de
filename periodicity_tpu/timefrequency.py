"""Alias module mirroring the reference's import path."""

from .models.timefrequency import HHT, WPS, CompositeSpectrum, denoise, reconstruct

__all__ = ["WPS", "HHT", "CompositeSpectrum", "denoise", "reconstruct"]
