"""Tutorial: wavelet power spectrum of a spotted star + DWT denoising.

Covers the same ground as the reference's wavelet tutorial
(reference docs/tutorials/wavelet.ipynb): the Morlet wavelet power
spectrum of the KIC 9655172 light curve, cone-of-influence masking,
scale-averaged variance and global spectrum — plus the jitted DWT
soft-threshold denoiser this framework adds on top.

Run: python docs/tutorials/wavelet_spotted_star.py
(saves PNGs to $PERIODICITY_TPU_FIGDIR, or the CWD when unset)
"""

import os

import jax

# pin CPU so the tutorial runs the same everywhere (the ambient platform
# may be a TPU relay, where f32 grids also trip the strict-df ACF check)
jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import _figtools as figs

OUT = figs.fig_dir() or "."


def _save(name):
    plt.savefig(os.path.join(OUT, f"wavelet_spotted_star_{name}.png"),
                dpi=120, bbox_inches="tight")
    plt.close()

from periodicity_tpu.core import TSeries
from periodicity_tpu.data import SpottedStar
from periodicity_tpu.timefrequency import WPS, denoise


def main():
    t, y, dy = SpottedStar()
    sig = TSeries(t, y)

    # --- Morlet wavelet power spectrum over ~1-128 d periods -------------
    periods = np.logspace(0, 7, 400, base=2)
    wps = WPS(periods)
    spectrum = wps(sig)
    print("spectrum:", spectrum.shape)

    plt.figure(figsize=(8, 4))
    spectrum.contourf(y="period", extend="min", levels=10)
    wps.plot_coi(hatch="x", color="grey", alpha=0.5)
    plt.yscale("log")
    plt.xlabel("Time [d]")
    plt.ylabel("Period [d]")
    _save("spectrum")

    # --- scale-averaged variance: in-cone masking matters at the edges ---
    plt.figure(figsize=(8, 3))
    wps.sav().plot("b", label="Unmasked")
    wps.masked_sav().plot("r", label="Masked")
    plt.ylim(0)
    plt.xlabel("Time [d]")
    plt.ylabel("SAV")
    plt.legend()
    _save("sav")

    # --- global spectrum: the stellar rotation period ---------------------
    gwps = wps.gwps()
    masked = wps.masked_gwps()
    print(
        "rotation period estimates [d]:",
        float(gwps.period_at_highest_peak),
        float(masked.period_at_highest_peak),
    )

    plt.figure(figsize=(8, 3))
    gwps.plot("b", label="Unmasked")
    masked.plot("r", label="Masked")
    plt.ylim(0)
    plt.xscale("log")
    plt.xlabel("Period [d]")
    plt.ylabel("GWPS")
    plt.legend()
    _save("gwps")

    # --- DWT soft-threshold denoising (single jitted program) ------------
    noise_level = float(np.median(dy))
    smooth = denoise(y, family="sym8", sigma=noise_level)
    plt.figure(figsize=(8, 3))
    plt.plot(t, y, "k.", ms=2, alpha=0.4, label="raw")
    plt.plot(t, np.asarray(smooth), "r", lw=1, label="denoised (sym8)")
    plt.xlabel("Time [d]")
    plt.ylabel("Norm. flux")
    plt.legend()
    _save("denoised")


if __name__ == "__main__":
    main()
