"""Alias module mirroring the reference's import path."""

from .models.phase import (
    AoV,
    BLS,
    bls_scan,
    ConditionalEntropy,
    GregoryLoredo,
    PDM,
    StringLength,
    aov_scan,
    conditional_entropy_scan,
    gregory_loredo_scan,
    pdm_batch,
    pdm_scan,
    string_length_batch,
    string_length_scan,
    string_length_scan_fast,
    string_length_approx_scan,
)

__all__ = [
    "StringLength",
    "BLS",
    "bls_scan",
    "PDM",
    "AoV",
    "ConditionalEntropy",
    "GregoryLoredo",
    "gregory_loredo_scan",
    "string_length_scan",
    "string_length_scan_fast",
    "string_length_approx_scan",
    "pdm_scan",
    "pdm_batch",
    "string_length_batch",
    "aov_scan",
    "conditional_entropy_scan",
]
