"""Tutorial: multiband and harmonic periodograms.

Two beyond-reference GLS extensions (astropy-style, rebuilt on the
Press-Rybicki trig-sum pipeline):

- ``MultibandGLS`` fits a shared base harmonic plus per-band offsets/
  harmonics. The demo signal has three photometric bands whose phases
  sit 120 degrees apart, so naively concatenating the bands CANCELS the
  signal at the true frequency — the single-band GLS misses what the
  multiband model recovers.
- ``GLS(nterms=K)`` fits K Fourier terms per trial frequency and
  concentrates the power of non-sinusoidal shapes into the fundamental.

Run from the repo root: python docs/tutorials/multiband_phase_shift.py
"""

import jax

# pin CPU + x64 so the narrated peak comparisons below are reproducible
# (the ambient platform may be the TPU relay, whose f32 fast path could
# shift a borderline peak)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from periodicity_tpu import TSeries
from periodicity_tpu.spectral import GLS, MultibandGLS

import _figtools as figs


def main():
    rng = np.random.default_rng(42)
    period = 2.3

    # --- three bands, phases 120 degrees apart, different amplitudes
    # and large instrument offsets (the classic LSST/ZTF situation)
    signals, errs = {}, {}
    for i, (name, amp, off) in enumerate(
        [("g", 1.0, 0.0), ("r", 0.7, 5.0), ("i", 1.3, -4.0)]
    ):
        t = np.sort(rng.uniform(0.0, 40.0, 180))
        y = (off + amp * np.sin(2 * np.pi * t / period + 2 * np.pi * i / 3)
             + 0.05 * rng.standard_normal(t.size))
        signals[name] = TSeries(t, y)
        errs[name] = np.full(t.size, 0.05)

    # --- naive approach: subtract each band's mean, concatenate, GLS
    t_all = np.concatenate([np.asarray(s.time) for s in signals.values()])
    y_all = np.concatenate(
        [np.asarray(s.values) - float(np.mean(s.values))
         for s in signals.values()]
    )
    order = np.argsort(t_all)
    naive = GLS(fmax=2.0)
    fs_naive = naive(TSeries(t_all[order], y_all[order]),
                     err=np.full(t_all.size, 0.05))
    p_naive = float(fs_naive.period_at_highest_peak)
    print(f"naive concatenated GLS peak: {p_naive:.3f} d (true {period})")

    # --- multiband: shared base sinusoid + per-band harmonic corrections
    mb = MultibandGLS(fmax=2.0, nterms_base=1, nterms_band=1)
    fs_mb = mb(signals, err=errs)
    p_mb = float(fs_mb.period_at_highest_peak)
    print(f"multiband GLS peak:          {p_mb:.3f} d (true {period})")

    # the 120-degree phase spread cancels the concatenated signal at the
    # true frequency; the per-band model recovers it
    assert abs(p_mb - period) / period < 0.05
    assert abs(p_naive - period) / period > 0.05

    # --- is the multiband peak significant? The bootstrap resamples
    # (value, error) pairs WITHIN each band — cadence and per-band weight
    # budgets stay intact, only the shared-period phase coherence is
    # destroyed — and the replicates re-run the exact statistic of record.
    mb.bootstrap(20, random_seed=0)
    peak_mb = float(np.max(np.asarray(fs_mb.values)))
    print(f"multiband bootstrap FAP of the peak: {mb.fap(peak_mb):.3f}")
    print(f"power needed for FAP=0.05:           {mb.fal(0.05):.3f}")

    # --- exact refinement + the fitted per-band light curves: the fast
    # scan locates the peak to within its grid; refine() solves the exact
    # direct design on a fine local grid, and model() returns the fitted
    # base + band curve the peak's power scored
    mb.refine(n_peaks=1)
    print(f"refined peak: {1 / mb.refined_fbest:.4f} d (true {period})")
    tf = np.linspace(10.0, 15.0, 200)
    for name in signals:
        fit = mb.model(tf, mb.refined_fbest, name)
        print(f"band {name}: fitted mean {float(np.mean(fit.values)):+.2f} "
              f"(instrument offset recovered)")

    fig = figs.new_figure(figsize=(8, 5.2))
    if fig is not None:
        ax_fold, ax_pow = fig.subplots(2, 1)
        for i, (name, sig) in enumerate(signals.items()):
            phase = (np.asarray(sig.time) * mb.refined_fbest) % 1.0
            yv = np.asarray(sig.values) - float(np.mean(sig.values))
            ax_fold.plot(phase, yv, ".", ms=3, color=figs.SERIES[i],
                         label=f"band {name}")
            fitp = mb.model(
                np.sort(np.asarray(sig.time)), mb.refined_fbest, name
            )
            order = np.argsort((np.asarray(fitp.time)
                                * mb.refined_fbest) % 1.0)
            ax_fold.plot(
                ((np.asarray(fitp.time) * mb.refined_fbest) % 1.0)[order],
                (np.asarray(fitp.values)
                 - float(np.mean(sig.values)))[order],
                color=figs.SERIES[i], lw=1,
            )
        ax_fold.set_xlabel("phase at the refined period")
        ax_fold.set_ylabel("mean-subtracted flux")
        ax_fold.legend(loc="upper right", fontsize=8)
        ax_fold.set_title("Per-band folds + fitted multiband model")
        ax_pow.plot(np.asarray(fs_naive.frequency),
                    np.asarray(fs_naive.values), color=figs.SERIES[3],
                    lw=1, label="naive concatenation")
        ax_pow.plot(np.asarray(fs_mb.frequency), np.asarray(fs_mb.values),
                    color=figs.SERIES[0], lw=1, label="multiband")
        ax_pow.axvline(1 / period, color="0.5", lw=0.8, linestyle="--")
        ax_pow.axhline(mb.fal(0.05), color=figs.SERIES[1], lw=0.8,
                       linestyle=":", label="FAP 5% level")
        ax_pow.set_xlabel("frequency [1/d]")
        ax_pow.set_ylabel("power")
        ax_pow.legend(loc="upper right", fontsize=8)
        fig.tight_layout()
        figs.save_fig(fig, "multiband_phase_shift_summary")

    # --- harmonic GLS: a sawtooth-ish shape splits its power across
    # harmonics in the single-term periodogram; nterms=2 re-concentrates
    t = np.sort(rng.uniform(0.0, 30.0, 300))
    y = (np.sin(2 * np.pi * t / period)
         + 0.6 * np.sin(4 * np.pi * t / period + 0.4)
         + 0.1 * rng.standard_normal(t.size))
    err = np.full(t.size, 0.1)
    for k in (1, 2):
        gls_k = GLS(fmax=2.0, nterms=k)
        fs_k = gls_k(TSeries(t, y), err=err)
        print(f"nterms={k}: peak {float(fs_k.period_at_highest_peak):.3f} d, "
              f"max power {float(np.max(np.asarray(fs_k.values))):.3f}")

    # --- significance with nterms>1 must come from the bootstrap (it
    # resamples the harmonic statistic itself; the analytic Baluev bound
    # covers only the single-term periodogram and raises here). Bind the
    # harmonic instance explicitly: the bootstrap belongs to nterms=2.
    gls2 = GLS(fmax=2.0, nterms=2)
    fs2 = gls2(TSeries(t, y), err=err)
    gls2.bootstrap(20, random_seed=0)
    peak_power = float(np.max(np.asarray(fs2.values)))
    print(f"bootstrap FAP of the harmonic peak: {gls2.fap(peak_power):.3f}")


if __name__ == "__main__":
    main()
