"""Tutorial: rotation period of KIC 9655172 three ways.

Run from the repo root: python docs/tutorials/spotted_star_rotation.py
(CPU is fine; add jax.config.update('jax_platforms','cpu') if the ambient
platform is the TPU relay and you want local execution).
"""

import numpy as np

from periodicity_tpu import TSeries
from periodicity_tpu.spectral import GLS
from periodicity_tpu.timefrequency import CompositeSpectrum
from periodicity_tpu.data import SpottedStar
from periodicity_tpu.gp import HarmonicGP, make_gaussian_prior


def main():
    t, y, dy = SpottedStar()
    sig = TSeries(t, y)

    # 1) generalized Lomb-Scargle
    ls = GLS()(sig, err=dy)
    print(f"GLS period:        {float(ls.period_at_highest_peak):.2f} d")

    # 2) wavelet composite spectrum (GWPS x ACF)
    cs = CompositeSpectrum(np.geomspace(1.0, 50.0, 200))(sig)
    p_cs = float(np.asarray(cs.period)[np.nanargmax(np.asarray(cs.values))])
    print(f"Composite period:  {p_cs:.2f} d")

    # 3) ACF-quality gaussian prior + GP posterior
    prior = make_gaussian_prior(sig)
    grid = np.linspace(-3, 5, 1000)
    print(f"Prior mode:        {np.exp(grid[prior(grid).argmax()]):.2f} d")

    model = HarmonicGP(sig, err=dy)
    trace, tau = model.mcmc(n_walkers=16, n_steps=500, burn=100, random_seed=42)
    print(f"GP posterior:      {np.median(trace['period']):.2f} d "
          f"(+{np.percentile(trace['period'], 84) - np.median(trace['period']):.2f}"
          f"/-{np.median(trace['period']) - np.percentile(trace['period'], 16):.2f})")


if __name__ == "__main__":
    main()
