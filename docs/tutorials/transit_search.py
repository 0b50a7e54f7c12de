"""Tutorial: finding a transiting planet with Box Least Squares.

BLS is a beyond-reference estimator (the reference has no transit
scorer); this walks the full surface: injected box transit -> SR^2
periodogram -> recovered period/depth/duration/epoch -> phase-folded
check against the injection.

Run from the repo root: python docs/tutorials/transit_search.py
(CPU is fine; add jax.config.update('jax_platforms','cpu') if the
ambient platform is the TPU relay and you want local execution).
"""

import numpy as np

from periodicity_tpu import TSeries
from periodicity_tpu.phase import BLS


def main():
    # --- inject a 3.217-day transit into an irregularly sampled curve
    rng = np.random.default_rng(42)
    period, depth, q = 3.217, 0.012, 0.03  # days, rel. flux, phase fraction
    t = np.sort(rng.uniform(0.0, 90.0, 4000))
    phi = (t / period) % 1.0
    flux = np.where(phi < q, -depth, 0.0) + 0.003 * rng.standard_normal(t.size)
    err = np.full(t.size, 0.003)

    # --- scan: durations are trial phase fractions of each period
    bls = BLS(durations=(0.01, 0.03, 0.06), nbins=512,
              p_min=1.0, p_max=30.0, n_periods=20_000)
    pg = bls(TSeries(t, flux), err=err)

    print(f"best period:   {bls.best_period:.4f} d  (true {period})")
    print(f"best depth:    {bls.best_depth:.4f}     (true {depth})")
    print(f"best duration: {bls.best_duration:.3f} d  "
          f"(true {q * period:.3f})")
    print(f"mid-transit:   {bls.best_transit_time:.3f} d")
    print(f"SNR:           {bls.best_snr:.1f}")

    # --- the periodogram is an FSeries: peaks rank like any other scorer
    top = np.asarray(pg.values).argmax()
    assert np.isclose(1.0 / np.asarray(pg.frequency)[top], bls.best_period)

    # --- sanity: fold at the recovered ephemeris, the box must be dark
    phase = ((t - bls.best_transit_time) / bls.best_period) % 1.0
    half_q = 0.5 * bls.best_duration / bls.best_period
    in_box = (phase < half_q) | (phase > 1.0 - half_q)
    dip = flux[~in_box].mean() - flux[in_box].mean()
    print(f"folded box dip: {dip:.4f} (~depth)")
    assert abs(bls.best_period - period) / period < 0.01
    assert dip > 0.5 * depth


if __name__ == "__main__":
    main()
