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

    fn = jax.jit(lambda a, b, c: gls_power(a, b, c, df, fmin, nf))
    # warmup/compile
    fn(tj, yj, ej).block_until_ready()
    times = []
    for i in range(5):
        # vary the input each run so no layer can serve a cached result
        yi = yj + np.float32(1e-4 * (i + 1))
        yi.block_until_ready()
        t0 = time.perf_counter()
        fn(tj, yi, ej).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    freqs_per_sec = nf / dt
    print(
        json.dumps(
            {
                "metric": "gls_trial_frequencies_per_sec_N1e5",
                "value": freqs_per_sec,
                "unit": "freqs/sec",
                "vs_baseline": freqs_per_sec / 1e6,
            }
        )
    )


if __name__ == "__main__":
    main()
