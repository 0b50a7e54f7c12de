"""Alias module mirroring the reference's import path."""

from .models.timefrequency import (
    HHT,
    WPS,
    CompositeSpectrum,
    denoise,
    reconstruct,
    wps_batch,
    hht_batch,
)

__all__ = [
    "WPS",
    "HHT",
    "CompositeSpectrum",
    "denoise",
    "reconstruct",
    "wps_batch",
    "hht_batch",
]
