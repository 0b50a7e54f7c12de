"""Headline benchmark: Lomb-Scargle trial-frequency scan rate.

Runs on whatever accelerator the ambient JAX platform provides (TPU under
the driver). Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Baseline: the BASELINE.json north star of 1e6 trial frequencies/sec per
chip on an N=1e5-point light curve (the reference library itself publishes
no numbers and is orders of magnitude slower single-core).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.models.spectral import gls_power

    n = 100_000
    nf = 1_000_000
    rng = np.random.default_rng(0)
    baseline_t = 1000.0
    t = np.sort(rng.uniform(0, baseline_t, n)).astype(np.float32)
    y = (np.sin(2 * np.pi * t / 7.7) + 0.3 * rng.standard_normal(n)).astype(
        np.float32
    )
    err = np.full(n, 0.3, np.float32)
    df = np.float32(0.5 / baseline_t)  # n=5 samples/peak over the band
    fmin = np.float32(df / 2)

    tj = jnp.asarray(t)
    yj = jnp.asarray(y)
    ej = jnp.asarray(err)

    # measure pure on-device time: K chained periodograms inside one jit
    # (each iteration's input depends on the previous output, so nothing can
    # be cached or overlapped with host transfers), then one scalar readback
    k_iters = 20

    def make_loop(gridder):
        @jax.jit
        def loop(y):
            def body(_, carry):
                y, acc = carry
                # fmin = df/2 -> conjugate-symmetry pairing: 2 grid+FFT
                # pipelines per periodogram instead of 3; grids built by the
                # Pallas one-hot MXU kernel (sorted, non-wrapping positions)
                p = gls_power(tj, y, ej, df, fmin, nf, pair_q=1,
                              gridder=gridder)
                return (y + p[: y.shape[0]] * 1e-9, acc + p[0])

            return jax.lax.fori_loop(
                0, k_iters, body, (y, jnp.float32(0.0))
            )[1]

        return loop

    try:
        loop = make_loop("pallas")
        loop(yj).block_until_ready()  # compile
    except Exception as e:  # Mosaic lowering/backends without Pallas
        print(f"# pallas gridder unavailable ({type(e).__name__}); "
              "falling back to scatter", flush=True)
        loop = make_loop("scatter")
        loop(yj).block_until_ready()
    times = []
    for i in range(3):
        yi = yj + np.float32(1e-5 * (i + 1))
        yi.block_until_ready()
        t0 = time.perf_counter()
        float(loop(yi))
        times.append((time.perf_counter() - t0) / k_iters)
    dt = float(np.median(times))
    freqs_per_sec = nf / dt
    out = {
        "metric": "gls_trial_frequencies_per_sec_N1e5",
        "value": freqs_per_sec,
        "unit": "freqs/sec",
        "vs_baseline": freqs_per_sec / 1e6,
    }
    # host-CPU anchor: the reference's own _trig_sum GLS at this exact
    # shape (benchmarks/anchors.py config 6, single-curve rate)
    try:
        import os

        anchors = json.load(
            open(os.path.join(os.path.dirname(__file__),
                              "benchmarks", "anchors.json"))
        )
        cpu_rate = anchors["6"]["cpu_units_per_sec"]
        out["speedup_vs_cpu_anchor"] = freqs_per_sec / cpu_rate
    except (OSError, KeyError, ValueError):
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
