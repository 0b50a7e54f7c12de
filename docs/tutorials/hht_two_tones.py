"""Tutorial: CEEMDAN + Hilbert-Huang analysis of a gapped two-tone signal.

Run from the repo root: python docs/tutorials/hht_two_tones.py
"""

import numpy as np

from periodicity_tpu import TSeries
from periodicity_tpu.data import SustainedPlusGappedPureTones
from periodicity_tpu.decomposition import CEEMDAN
from periodicity_tpu.timefrequency import HHT


def main():
    x = TSeries(values=SustainedPlusGappedPureTones())

    ceemdan = CEEMDAN(ensemble_size=50, random_seed=42)
    imfs = ceemdan(x)
    print(f"CEEMDAN extracted {len(imfs)} IMFs "
          f"(expected 2: tones at f=0.255 gapped, f=0.065 sustained)")

    freqs = np.linspace(0.0, 0.5, 101)
    hht = HHT(freqs, emd=CEEMDAN(ensemble_size=50, random_seed=42), method="DQ")
    tf = hht(x)
    print(f"HHT spectrogram: {tf.shape} (frequency x time)")
    for k, f in enumerate(hht.instant_fs):
        med = float(np.median(np.asarray(f.values)[100:900]))
        print(f"  mode {k}: median instantaneous frequency {med:.3f}")


if __name__ == "__main__":
    main()
