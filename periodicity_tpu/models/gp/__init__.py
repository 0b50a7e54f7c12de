"""Gaussian-process period inference (celerite scan solver, dense QP GP,
on-device ensemble MCMC, period priors)."""

from .mcmc import autocorr_time, ess, rhat, run_ensemble
from .nuts import run_nuts
from .modelers import (
    BrownianGP,
    CeleriteModeler,
    GeorgeModeler,
    HarmonicGP,
    QuasiPeriodicGP,
)
from .priors import make_gaussian_prior, make_ppf
from .pscan import (
    log_likelihood_blocked,
    log_likelihood_chunked,
    log_likelihood_pscan,
    log_likelihood_sharded,
    ssm_matrices,
)
from .solver import GaussianProcess, log_likelihood
from .terms import BrownianTerm, RotationTerm, SHOTerm, Term, TermSum

__all__ = [
    "GeorgeModeler",
    "CeleriteModeler",
    "QuasiPeriodicGP",
    "BrownianGP",
    "HarmonicGP",
    "make_gaussian_prior",
    "make_ppf",
    "GaussianProcess",
    "log_likelihood",
    "log_likelihood_pscan",
    "log_likelihood_blocked",
    "log_likelihood_chunked",
    "log_likelihood_sharded",
    "ssm_matrices",
    "SHOTerm",
    "RotationTerm",
    "BrownianTerm",
    "Term",
    "TermSum",
    "run_ensemble",
    "run_nuts",
    "autocorr_time",
    "ess",
    "rhat",
]
