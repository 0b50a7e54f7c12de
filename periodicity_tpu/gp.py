"""Alias module mirroring the reference's import path."""

from .models.gp import (
    BrownianGP,
    BrownianTerm,
    CeleriteModeler,
    GaussianProcess,
    GeorgeModeler,
    HarmonicGP,
    QuasiPeriodicGP,
    RotationTerm,
    SHOTerm,
    Term,
    TermSum,
    autocorr_time,
    log_likelihood,
    make_gaussian_prior,
    make_ppf,
    run_ensemble,
    run_nuts,
)

__all__ = [
    "GeorgeModeler",
    "CeleriteModeler",
    "QuasiPeriodicGP",
    "BrownianGP",
    "HarmonicGP",
    "make_gaussian_prior",
    "make_ppf",
]
