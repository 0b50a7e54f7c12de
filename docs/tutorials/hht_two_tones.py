"""Tutorial: CEEMDAN + Hilbert-Huang analysis of a gapped two-tone signal.

Run from the repo root: python docs/tutorials/hht_two_tones.py
"""

import numpy as np

from periodicity_tpu import TSeries
from periodicity_tpu.data import SustainedPlusGappedPureTones
from periodicity_tpu.decomposition import CEEMDAN
from periodicity_tpu.timefrequency import HHT

import _figtools as figs


def main():
    x = TSeries(values=SustainedPlusGappedPureTones())

    ceemdan = CEEMDAN(ensemble_size=50, random_seed=42)
    imfs = ceemdan(x)
    print(f"CEEMDAN extracted {len(imfs)} IMFs "
          f"(expected 2: tones at f=0.255 gapped, f=0.065 sustained)")

    fig = figs.new_figure(figsize=(8, 4.5))
    if fig is not None:
        axes = fig.subplots(len(imfs) + 1, 1, sharex=True)
        axes[0].plot(np.asarray(x.time), np.asarray(x.values),
                     color="0.3", linewidth=0.8)
        axes[0].set_ylabel("signal")
        for k, imf in enumerate(imfs):
            axes[k + 1].plot(np.asarray(imf.time), np.asarray(imf.values),
                             color=figs.SERIES[k % len(figs.SERIES)],
                             linewidth=0.8)
            axes[k + 1].set_ylabel(f"IMF {k}")
        axes[-1].set_xlabel("time [samples]")
        fig.suptitle("CEEMDAN modes of the gapped two-tone signal")
        figs.save_fig(fig, "hht_two_tones_imfs")

    freqs = np.linspace(0.0, 0.5, 101)
    hht = HHT(freqs, emd=CEEMDAN(ensemble_size=50, random_seed=42), method="DQ")
    tf = hht(x)
    print(f"HHT spectrogram: {tf.shape} (frequency x time)")
    for k, f in enumerate(hht.instant_fs):
        med = float(np.median(np.asarray(f.values)[100:900]))
        print(f"  mode {k}: median instantaneous frequency {med:.3f}")

    fig = figs.new_figure(figsize=(8, 3.2))
    if fig is not None:
        ax = fig.subplots()
        power = np.asarray(tf.values)
        ax.imshow(
            power, origin="lower", aspect="auto",
            cmap=figs.SEQUENTIAL_CMAP,
            extent=[float(tf.time[0]), float(tf.time[-1]),
                    float(freqs[0]), float(freqs[-1])],
        )
        for f_true in (0.065, 0.255):
            ax.axhline(f_true, color=figs.SERIES[1], linewidth=0.8,
                       linestyle="--")
        ax.set_xlabel("time [samples]")
        ax.set_ylabel("instantaneous frequency")
        ax.set_title("Hilbert-Huang spectrogram (dashes: true tones)")
        figs.save_fig(fig, "hht_two_tones_spectrogram")


if __name__ == "__main__":
    main()
