"""One-off probe: headline-shape GLS timing and accuracy across
(nfft, taps) variants on the ambient backend (TPU under the driver).

Stage 1 (CPU subprocess, x64): writes the f64 oracle powers to /tmp.
Stage 2 (ambient TPU): times each variant with K chained data-dependent
iterations in one jit, then checks its max power error vs the oracle.

Usage: python benchmarks/_probe_gls_variants.py [oracle|run]
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 100_000
NF = 1_000_000
K = 10
ORACLE_PATH = "/tmp/gls_oracle_f64.npy"


def make_data():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 1000.0, N))
    y = np.sin(2 * np.pi * t / 7.7) + 0.3 * rng.standard_normal(N)
    err = np.full(N, 0.3)
    df = 0.5 / 1000.0
    return t, y, err, df, df / 2


def oracle():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from periodicity_tpu.models.spectral import gls_power
    from periodicity_tpu.ops.trig_sum import grid_size

    t, y, err, df, fmin = make_data()
    p = gls_power(t, y, err, df, fmin, NF, pair_q=1, taps=12,
                  nfft=2 * grid_size(NF, 5))
    np.save(ORACLE_PATH, np.asarray(p))
    print("oracle saved", flush=True)


def run():
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.models.spectral import gls_power
    from periodicity_tpu.ops.trig_sum import grid_size

    t, y, err, df, fmin = make_data()
    tj = jnp.asarray(t, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    ej = jnp.asarray(err, jnp.float32)
    df32 = np.float32(df)
    fmin32 = np.float32(fmin)
    orc = np.load(ORACLE_PATH) if os.path.exists(ORACLE_PATH) else None

    full = grid_size(NF, 5)
    variants = [
        ("current 2^23 t4", None, 4),
        ("half 2^22 t4", full // 2, 4),
        ("half 2^22 t6", full // 2, 6),
        ("half 2^22 t8", full // 2, 8),
    ]
    for name, nfft, taps in variants:
        @jax.jit
        def loop(y, nfft=nfft, taps=taps):
            def body(_, carry):
                y, acc = carry
                p = gls_power(tj, y, ej, df32, fmin32, NF, pair_q=1,
                              gridder="pallas", nfft=nfft, taps=taps)
                return (y + p[: y.shape[0]] * 1e-9, acc + p[0])
            return jax.lax.fori_loop(0, K, body, (y, jnp.float32(0.0)))[1]

        loop(yj).block_until_ready()
        times = []
        for i in range(3):
            yi = yj + np.float32(1e-5 * (i + 1))
            yi.block_until_ready()
            t0 = time.perf_counter()
            float(loop(yi))
            times.append((time.perf_counter() - t0) / K)
        dt = float(np.median(times))
        errmax = None
        if orc is not None:
            p = np.asarray(gls_power(tj, yj, ej, df32, fmin32, NF, pair_q=1,
                                     gridder="pallas", nfft=nfft, taps=taps))
            errmax = float(np.max(np.abs(p - orc)) / orc.max())
        print(json.dumps({"variant": name, "s_per_pgram": dt,
                          "freqs_per_sec": NF / dt, "err_max": errmax}),
              flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "oracle":
        oracle()
    elif mode == "both":
        subprocess.run([sys.executable, __file__, "oracle"], check=True)
        run()
    else:
        run()
