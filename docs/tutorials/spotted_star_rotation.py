"""Tutorial: rotation period of KIC 9655172 three ways.

Run from the repo root: python docs/tutorials/spotted_star_rotation.py
"""

import jax

# pin CPU so the narrated numbers are reproducible wherever the tutorial
# runs (the ambient platform may be a TPU relay)
jax.config.update("jax_platforms", "cpu")

import numpy as np

from periodicity_tpu import TSeries
from periodicity_tpu.spectral import GLS
from periodicity_tpu.timefrequency import CompositeSpectrum
from periodicity_tpu.data import SpottedStar
from periodicity_tpu.gp import HarmonicGP, make_gaussian_prior

import _figtools as figs


def main():
    t, y, dy = SpottedStar()
    sig = TSeries(t, y)

    fig = figs.new_figure(figsize=(8, 2.8))
    if fig is not None:
        ax = fig.subplots()
        ax.plot(t, y, ".", ms=2, color="0.35")
        ax.set_xlabel("Time [d]")
        ax.set_ylabel("Norm. flux")
        ax.set_title("KIC 9655172 (SpottedStar)")
        figs.save_fig(fig, "spotted_star_rotation_lightcurve")

    # 1) generalized Lomb-Scargle
    ls = GLS()(sig, err=dy)
    print(f"GLS period:        {float(ls.period_at_highest_peak):.2f} d")

    fig = figs.new_figure(figsize=(8, 2.8))
    if fig is not None:
        ax = fig.subplots()
        ax.plot(np.asarray(ls.period), np.asarray(ls.values),
                color=figs.SERIES[0], lw=1)
        ax.axvline(float(ls.period_at_highest_peak), color=figs.SERIES[1],
                   lw=0.8, linestyle="--")
        ax.set_xscale("log")
        ax.set_xlim(1, 100)
        ax.set_xlabel("Period [d]")
        ax.set_ylabel("GLS power")
        ax.set_title(
            f"Peak at {float(ls.period_at_highest_peak):.2f} d"
        )
        figs.save_fig(fig, "spotted_star_rotation_gls")

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

    fig = figs.new_figure(figsize=(8, 2.8))
    if fig is not None:
        ax = fig.subplots()
        p = np.asarray(trace["period"])
        ax.hist(p, bins=60, color=figs.SERIES[0], edgecolor="white",
                linewidth=0.3)
        ax.axvline(float(np.median(p)), color=figs.SERIES[1], lw=0.8,
                   linestyle="--")
        ax.set_xlabel("Period [d]")
        ax.set_ylabel("posterior samples")
        ax.set_title(
            f"HarmonicGP period posterior (median {np.median(p):.2f} d)"
        )
        figs.save_fig(fig, "spotted_star_rotation_posterior")


if __name__ == "__main__":
    main()
