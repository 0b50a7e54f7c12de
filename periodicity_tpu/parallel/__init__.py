"""Multi-chip parallelism (mesh, sharded scans, collectives).

The reference's only parallelism is multiprocessing.Pool over trial periods
and ensemble members (reference phase.py:69-70,183-186;
decomposition.py:277,304). The TPU-native equivalents here are first-class
(SURVEY §2.2):

- trial-frequency/period **grid sharding**: shard_map over a device mesh,
  each chip scoring its slice of the grid, results all-gathered over ICI;
- **batch sharding**: vmapped estimators over many light curves with the
  batch axis laid out across chips;
- **ensemble sharding**: CEEMDAN noise realizations / MCMC walkers as a
  sharded vmap axis;
- **sequence sharding**: XLA's distributed FFT under pjit for long-series
  ACF/CWT pipelines.

Single chip stays the zero-config default, exactly as the reference is
single-process by default.
"""

from .dfft import distributed_acf, distributed_fft, distributed_ifft
from .distributed import initialize_distributed, multihost_mesh
from .mesh import default_mesh, grid_sharding
from .sharded import (
    sharded_acf,
    sharded_aov,
    sharded_bls,
    sharded_conditional_entropy,
    sharded_gls,
    sharded_gregory_loredo,
    sharded_pdm,
    sharded_string_length,
)

__all__ = [
    "default_mesh",
    "grid_sharding",
    "sharded_gls",
    "sharded_pdm",
    "sharded_string_length",
    "sharded_bls",
    "sharded_aov",
    "sharded_conditional_entropy",
    "sharded_gregory_loredo",
    "sharded_acf",
    "distributed_fft",
    "distributed_ifft",
    "distributed_acf",
    "initialize_distributed",
    "multihost_mesh",
]
