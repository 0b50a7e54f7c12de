"""One-off probe: where does the headline periodogram's time go on TPU?

Times, with K data-dependent iterations chained inside one jit each
(relay-safe: scalar readback, no identical-args cache hits):
  a) full gls_power (the bench configuration)
  b) the Pallas grid build alone at nfft=2^23
  c) the complex ifft alone at 2^23 and 2^22
  d) power assembly alone at nf=1e6

Usage: python benchmarks/_probe_gls_parts.py [part ...]
"""

import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from periodicity_tpu.models.spectral import gls_power
from periodicity_tpu.ops.trig_sum import _extirpolate_weights, _phase_factor
from periodicity_tpu.ops.pallas_grid2 import extirpolate_grid_factored

N = 100_000
NF = 1_000_000
NFFT = 1 << 23
K = 10


def timeit(fn, arg):
    fn(arg).block_until_ready()
    times = []
    for i in range(3):
        a = arg + np.float32(1e-5 * (i + 1))
        a.block_until_ready()
        t0 = time.perf_counter()
        float(fn(a))
        times.append((time.perf_counter() - t0) / K)
    return float(np.median(times))


def setup():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 1000.0, N)).astype(np.float32)
    y = (np.sin(2 * np.pi * t / 7.7) + 0.3 * rng.standard_normal(N)).astype(
        np.float32
    )
    err = np.full(N, 0.3, np.float32)
    df = np.float32(0.5 / 1000.0)
    fmin = np.float32(df / 2)
    return t, y, err, df, fmin


def main():
    parts = set(sys.argv[1:]) or {"full", "grid", "fft", "assemble"}
    t, y, err, df, fmin = setup()
    tj, yj, ej = jnp.asarray(t), jnp.asarray(y), jnp.asarray(err)

    if "full" in parts:
        @jax.jit
        def full(y):
            def body(_, carry):
                y, acc = carry
                p = gls_power(tj, y, ej, df, fmin, NF, pair_q=1,
                              gridder="pallas")
                return (y + p[: y.shape[0]] * 1e-9, acc + p[0])
            return jax.lax.fori_loop(0, K, body, (y, jnp.float32(0.0)))[1]

        print("full gls_power:", timeit(full, yj), "s/iter", flush=True)

    if "grid" in parts:
        # precompute positions/rotation as jit ARGUMENTS: closure-captured
        # device arrays get inlined as MLIR constants, which forces a
        # device->host readback the relay can't do for complex arrays
        @jax.jit
        def precompute(tj):
            trel = tj - tj.min()
            inds, lag = _extirpolate_weights(trel, df, NFFT, jnp.float32)
            ilo = inds[:, 0].astype(jnp.int32)
            rot = _phase_factor(fmin, trel, jnp.float32, jnp.complex64)
            return ilo, lag, rot.real, rot.imag

        ilo, lag, rot_re, rot_im = precompute(tj)

        for von_m in (False, True):
            @partial(jax.jit, static_argnames=("von_m",))
            def grid_only(w, ilo, lag, rot_re, rot_im, von_m=von_m):
                def body(_, carry):
                    w, acc = carry
                    ure = w * rot_re
                    uim = w * rot_im
                    gre, gim = extirpolate_grid_factored(
                        ilo, ure, uim, lag, NFFT, value_on_m=von_m)
                    return (w + gre[: w.shape[0]] * 1e-9, acc + gre[0])
                return jax.lax.fori_loop(
                    0, K, body, (w, jnp.float32(0.0)))[1]

            def fn(w, von_m=von_m):
                return grid_only(w, ilo, lag, rot_re, rot_im, von_m=von_m)

            print(f"pallas grid 2^23 value_on_m={von_m}:",
                  timeit(fn, yj), "s/iter", flush=True)

    if "fft" in parts:
        for nfft in (1 << 23, 1 << 22):
            g = jnp.asarray(
                np.random.default_rng(1).standard_normal(nfft, np.float32))

            @jax.jit
            def fft_only(g, nfft=nfft):
                def body(_, carry):
                    g, acc = carry
                    F = jnp.fft.ifft(jax.lax.complex(g, g * 0.5))
                    return (g + F.real * 1e-9, acc + F.real[0])
                return jax.lax.fori_loop(0, K, body, (g, jnp.float32(0.0)))[1]

            print(f"c64 ifft 2^{nfft.bit_length()-1}:",
                  timeit(fft_only, g), "s/iter", flush=True)

    if "assemble" in parts:
        from periodicity_tpu.models.spectral import _assemble_gls_power
        arrs = jnp.asarray(
            np.random.default_rng(2).standard_normal((6, NF)).astype(
                np.float32) * 0.1 + 0.5)

        @jax.jit
        def asm_only(a):
            def body(_, carry):
                a, acc = carry
                p = _assemble_gls_power(a[0], a[1], a[2], a[3], a[4], a[5],
                                        jnp.float32(1.0), jnp.float32(1.0),
                                        True, False)
                return (a + p[None, :] * 1e-9, acc + p[0])
            return jax.lax.fori_loop(0, K, body, (a, jnp.float32(0.0)))[1]

        print("assembly nf=1e6:", timeit(asm_only, arrs), "s/iter",
              flush=True)


if __name__ == "__main__":
    main()
