"""Alias module mirroring the reference's import path."""

from .models.phase import AoV, PDM, StringLength, aov_scan, pdm_scan, string_length_scan

__all__ = ["StringLength", "PDM", "AoV", "string_length_scan", "pdm_scan", "aov_scan"]
