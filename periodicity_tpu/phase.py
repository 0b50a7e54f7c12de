"""Alias module mirroring the reference's import path."""

from .models.phase import (
    AoV,
    ConditionalEntropy,
    PDM,
    StringLength,
    aov_scan,
    conditional_entropy_scan,
    pdm_scan,
    string_length_scan,
)

__all__ = [
    "StringLength",
    "PDM",
    "AoV",
    "ConditionalEntropy",
    "string_length_scan",
    "pdm_scan",
    "aov_scan",
    "conditional_entropy_scan",
]
