"""Full benchmark suite: the five configs of record from BASELINE.md.

Usage: python benchmarks/run_benchmarks.py [--configs 1,2,3,4,5]
Each config prints one JSON line; timings are pure on-device (chained
iterations inside one jit where the computation allows it).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import roofline  # noqa: E402 (analytic utilization models)


def _sync_time(fn, reps=3):
    import jax

    fn()  # warmup/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def config1_gls():
    """GLS of synthetic sinusoid+noise, N=1e4 (BASELINE config 1)."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.models.spectral import gls_power

    n = 10_000
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 100.0, n)).astype(np.float32)
    y = (np.sin(2 * np.pi * t / 7.7) + 0.3 * rng.standard_normal(n)).astype(np.float32)
    err = np.full(n, 0.3, np.float32)
    df = np.float32(1.0 / (100.0 * 5))
    fmin = np.float32(df / 2)
    nf = int((0.5 * n / 100.0) / df)
    tj, yj, ej = jnp.asarray(t), jnp.asarray(y), jnp.asarray(err)
    k = 50

    @jax.jit
    def loop(y):
        def body(_, carry):
            y, acc = carry
            p = gls_power(tj, y, ej, df, fmin, nf, pair_q=1,
                          gridder="pallas")
            return (y + p[: y.shape[0]] * 1e-9, acc + p[0])

        return jax.lax.fori_loop(0, k, body, (y, jnp.float32(0)))[1]

    dt = _sync_time(lambda: float(loop(yj))) / k
    return roofline.config1({
        "metric": "gls_periodograms_per_sec_N1e4",
        "value": 1.0 / dt,
        "unit": "periodograms/sec",
        "detail": {"nf": nf, "ms_per_call": dt * 1e3},
    })


def config2_acf():
    """FFT ACF + smoothing on a Kepler-like light curve (config 2).

    Two shapes: the reference's own single-series latency shape (N=2148 —
    far too small to feed a TPU; the host CPU wins it, and the anchor
    records that honestly) and the TPU framing of the same workload — a
    BATCH of light curves through one jitted batched rfft/irfft pipeline
    (SURVEY §2.2 row P4). The headline value is the batched aggregate;
    the single-series latency stays in detail."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.data import SpottedStar
    from periodicity_tpu.ops.filters import boxcar_kernel1d, convolve1d

    t, y, dy = SpottedStar()
    n = len(y)
    yj = jnp.asarray(y.astype(np.float32))
    k = 100
    kern = boxcar_kernel1d(5, dtype=jnp.float32)

    @jax.jit
    def loop(y0):
        def body(_, carry):
            y, acc = carry
            yc = y - jnp.mean(y)
            ps = jnp.abs(jnp.fft.rfft(yc, n=2 * n)) ** 2
            r = jnp.fft.irfft(ps)[:n]
            r = r / r[0]
            r = convolve1d(r, kern)
            return (y + r * 1e-9, acc + r[1])

        return jax.lax.fori_loop(0, k, body, (y0, jnp.float32(0)))[1]

    dt = _sync_time(lambda: float(loop(yj))) / k

    # batched: B=256 curves per call, the same ACF+smooth per row
    b = 256
    rng = np.random.default_rng(0)
    ys = (y[None, :] + 1e-4 * rng.standard_normal((b, n))).astype(np.float32)
    ysj = jnp.asarray(ys)
    kb = 10

    @jax.jit
    def loop_b(y0):
        def body(_, carry):
            ys, acc = carry
            yc = ys - jnp.mean(ys, axis=1, keepdims=True)
            ps = jnp.abs(jnp.fft.rfft(yc, n=2 * n, axis=1)) ** 2
            r = jnp.fft.irfft(ps, axis=1)[:, :n]
            r = r / r[:, :1]
            r = jax.vmap(lambda row: convolve1d(row, kern))(r)
            return (ys + r * 1e-9, acc + jnp.sum(r[:, 1]))

        return jax.lax.fori_loop(0, kb, body, (y0, jnp.float32(0)))[1]

    dt_b = _sync_time(lambda: float(loop_b(ysj))) / kb
    return {
        "metric": "fft_acf_smooth_per_sec_B256_N2148",
        "value": b / dt_b,
        "unit": "acfs/sec aggregate",
        "detail": {
            "ms_per_batch": dt_b * 1e3,
            "batch": b,
            "single_series_acfs_per_sec": 1.0 / dt,
            "single_series_ms": dt * 1e3,
        },
    }


def config3_wps():
    """Morlet WPS + GWPS (config 3). Two shapes, like config 2: the
    single-series latency form (N=4096 x 64 scales — a ~3 MB FFT
    pipeline that underfills the chip) and the TPU framing, a BATCH of
    light curves through one vmapped CWT+unbias program (wps_batch,
    SURVEY §2.2 row P4). The headline is the batched aggregate."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.ops.wavelet import cwt_morlet

    n, n_scales = 4096, 64
    rng = np.random.default_rng(0)
    y = (np.sin(2 * np.pi * np.arange(n) / 64.0) + 0.2 * rng.standard_normal(n)).astype(
        np.float32
    )
    scales = np.geomspace(8, 512, n_scales).astype(np.float32)
    yj = jnp.asarray(y)
    k = 20

    @jax.jit
    def loop(y0):
        def body(_, carry):
            y, acc = carry
            co = cwt_morlet(y - jnp.mean(y), scales)
            p = jnp.abs(co) ** 2 / scales[:, None]
            g = jnp.mean(p, axis=1)
            return (y + g[:1] * 1e-9, acc + g[0])

        return jax.lax.fori_loop(0, k, body, (y0, jnp.float32(0)))[1]

    dt = _sync_time(lambda: float(loop(yj))) / k

    # batched: B=32 curves per call through the same CWT+unbias pipeline
    b = 32
    ys = (y[None, :] + 1e-3 * rng.standard_normal((b, n))).astype(np.float32)
    ysj = jnp.asarray(ys)
    kb = 10

    @jax.jit
    def loop_b(y0):
        def body(_, carry):
            ys, acc = carry
            def one(row):
                co = cwt_morlet(row - jnp.mean(row), scales)
                p = jnp.abs(co) ** 2 / scales[:, None]
                return jnp.mean(p, axis=1)
            g = jax.vmap(one)(ys)
            return (ys + g[:, :1] * 1e-9, acc + jnp.sum(g[:, 0]))

        return jax.lax.fori_loop(0, kb, body, (y0, jnp.float32(0)))[1]

    dt_b = _sync_time(lambda: float(loop_b(ysj))) / kb
    return {
        "metric": "morlet_wps_per_sec_B32_N4096x64",
        "value": b / dt_b,
        "unit": "spectra/sec aggregate",
        "detail": {"ms_per_batch": dt_b * 1e3, "batch": b,
                   "single_series_per_sec": 1.0 / dt,
                   "single_series_ms": dt * 1e3},
    }


def config4_phase():
    """StringLength + PDM over 1e5 trial periods (config 4)."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.models.phase import (
        pdm_scan,
        string_length_scan,
        string_length_scan_fast,
    )

    n, n_periods = 2000, 100_000
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 200.0, n)).astype(np.float32)
    y = (np.sin(2 * np.pi * t / 7.7) + 0.2 * rng.standard_normal(n)).astype(np.float32)
    periods = np.linspace(0.5, 100.0, n_periods).astype(np.float32)
    tj, yj, pj = jnp.asarray(t), jnp.asarray(y), jnp.asarray(periods)

    # chained data-dependent iterations inside one jit + scalar readback:
    # on the relay, identical-args calls can be CACHE-SERVED and
    # block_until_ready does not synchronize (CLAUDE.md), so per-call
    # timings of a fixed-input kernel measure nothing
    k = 3

    def chained(scan_fn):
        @jax.jit
        def loop(y0):
            def body(_, carry):
                y0, acc = carry
                s = scan_fn(y0)
                return (y0 + s[0] * 1e-9, acc + jnp.sum(s[:8]))

            return jax.lax.fori_loop(0, k, body, (y0, jnp.float32(0)))[1]

        return _sync_time(lambda: float(loop(yj))) / k

    dt_pdm = chained(lambda y0: pdm_scan(tj, y0, pj, batch_size=512))
    dt_sl = chained(
        lambda y0: string_length_scan(tj, y0, pj, batch_size=512)
    )
    dt_slf = chained(
        lambda y0: string_length_scan_fast(tj, y0, pj, batch_size=512)
    )
    return {
        "metric": "pdm_trial_periods_per_sec_N2000",
        "value": n_periods / dt_pdm,
        "unit": "periods/sec",
        "detail": {
            "pdm_sec": dt_pdm,
            "stringlength_sec": dt_sl,
            "stringlength_periods_per_sec": n_periods / dt_sl,
            "stringlength_fast_sec": dt_slf,
            "stringlength_fast_periods_per_sec": n_periods / dt_slf,
        },
    }


def config5_gp():
    """SHO-kernel GP log-likelihood evals/sec, vmapped walkers (config 5)."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.data import SpottedStar
    from periodicity_tpu.models.gp.solver import log_likelihood
    from periodicity_tpu.models.gp.terms import BrownianTerm

    t, y, dy = SpottedStar()
    tj = jnp.asarray(t)
    yj = jnp.asarray(y - y.mean())
    diag = jnp.asarray(dy**2)
    n_walkers = 64
    rng = np.random.default_rng(0)
    walkers = jnp.asarray(rng.uniform(0.8, 1.2, (n_walkers, 4)))
    k = 10

    @jax.jit
    def loop(ws):
        def body(_, carry):
            ws, acc = carry

            def one(w):
                term = BrownianTerm(0.01 * w[0], 20.0 * w[1], 10.0 * w[2], 0.3 * w[3])
                return log_likelihood(term, tj, diag, yj)

            lls = jax.vmap(one)(ws)
            return (ws + lls[:, None] * 1e-12, acc + lls[0])

        zero = jnp.float64(0) if ws.dtype == jnp.float64 else jnp.float32(0)
        return jax.lax.fori_loop(0, k, body, (ws, zero))[1]

    dt = _sync_time(lambda: float(loop(walkers))) / k
    evals_per_sec = n_walkers / dt
    return roofline.config5({
        "metric": "celerite_logL_evals_per_sec_N2148",
        "value": evals_per_sec,
        "unit": "evals/sec",
        "detail": {"n_walkers": n_walkers, "ms_per_batch": dt * 1e3},
    })


def config6_gls_batch():
    """Batched GLS: 4 light curves x 1e6 frequencies on one chip (beyond the
    reference's strictly single-series scope; SURVEY §2.2 batch axis)."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.models.spectral import gls_power_batch

    # B=32 is the measured optimum of the round-5 scaling curve
    # (B=4/8/16/32 -> 1.10/1.18/1.23/1.25 e8 aggregate freqs/s): wider
    # batches buy only +6% past B=8, i.e. batching does NOT recover the
    # 9.4% HBM fraction — the per-curve FFT-pass floor binds (VERDICT r4
    # directive 4, documented in docs/performance.md)
    n, nf, b = 100_000, 1_000_000, 32
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 1000.0, n)).astype(np.float32)
    base_periods = [5.0, 7.7, 11.0, 17.0, 23.0, 31.0, 43.0, 59.0]
    ys = np.stack(
        [np.sin(2 * np.pi * t / p) for p in (base_periods * 4)[:b]]
    ).astype(np.float32)
    errs = np.full((b, n), 0.3, np.float32)
    df = np.float32(0.5 / 1000.0)
    fmin = np.float32(df / 2)
    tj, ysj, ej = jnp.asarray(t), jnp.asarray(ys), jnp.asarray(errs)
    k = 5

    @jax.jit
    def loop(ys):
        def body(_, carry):
            ys, acc = carry
            # mapped Pallas pipeline: 1.11e8 aggregate freqs/sec vs
            # 6.9e7 for the 4-row-chunked row-scatter (and the 8-row
            # chunk plans ~20 GB and OOMs the 16 GB HBM)
            p = gls_power_batch(tj, ys, ej, df, fmin, nf, pair_q=1,
                                gridder="pallas")
            return (ys + p[:, :n] * 1e-9, acc + jnp.sum(p[:, 0]))

        return jax.lax.fori_loop(0, k, body, (ys, jnp.float32(0)))[1]

    dt = _sync_time(lambda: float(loop(ysj))) / k
    return roofline.config6({
        "metric": f"gls_batched_freqs_per_sec_B{b}_N1e5",
        "value": b * nf / dt,
        "unit": "freqs/sec aggregate",
        "detail": {"ms_per_batch": dt * 1e3, "batch": b,
                   "b_scaling_freqs_per_sec": {
                       "B4": 1.096e8, "B8": 1.182e8,
                       "B16": 1.231e8, "B32": 1.254e8}},
    })


def config7_gp_scaling():
    """Celerite likelihood scaling curve (VERDICT r1 item 6): the
    sequential-scan solver at N = 1e4 / 1e5 and the associative-scan
    (pscan) solver at N = 1e4 / 1e5 / 1e6. The 1e6-step sequential scan is
    deliberately excluded: its O(N) depth is impractical on the relay,
    which is precisely what the O(log N) pscan path exists for.
    Each compile on the remote-compile service can take minutes."""
    import sys

    import jax
    import jax.numpy as jnp

    from periodicity_tpu.models.gp.pscan import (
        log_likelihood_blocked,
        log_likelihood_pscan,
    )
    from periodicity_tpu.models.gp.solver import log_likelihood
    from periodicity_tpu.models.gp.terms import BrownianTerm

    def blocked(term, t, diag, y):
        n_blocks = max(min(t.shape[0] // 256, 512), 16)
        return log_likelihood_blocked(term, t, diag, y, n_blocks=n_blocks)

    rng = np.random.default_rng(0)
    points = {}
    cases = [
        ("scan", log_likelihood, 10_000),
        ("scan", log_likelihood, 100_000),
        ("pscan", log_likelihood_pscan, 10_000),
        ("pscan", log_likelihood_pscan, 100_000),
        # full pscan at N=1e6 is excluded: its O(N r^2) per-tree-level
        # element traffic did not complete in 45 min on the relay; the
        # blocked two-level composition is the long-series path
        ("blocked", blocked, 10_000),
        ("blocked", blocked, 100_000),
    ]
    for name, ll_fn, n in cases:
        t = np.sort(rng.uniform(0, 1000.0, n)).astype(np.float32)
        y = (np.sin(2 * np.pi * t / 20.0)
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        tj = jnp.asarray(t)
        yj = jnp.asarray(y - y.mean())
        diag = jnp.full(n, 0.01, jnp.float32)
        k = 3

        @jax.jit
        def loop(y0, ll_fn=ll_fn, tj=tj, diag=diag):
            def body(_, carry):
                y0, acc = carry
                term = BrownianTerm(0.01, 20.0, 10.0, 0.3)
                ll = ll_fn(term, tj, diag, y0)
                return (y0 + ll * 1e-12, acc + ll)

            return jax.lax.fori_loop(0, k, body, (y0, jnp.float32(0)))[1]

        dt = _sync_time(lambda loop=loop, yj=yj: float(loop(yj)), reps=2) / k
        points[f"{name}_N{n}"] = {"ms": dt * 1e3, "evals_per_sec": 1.0 / dt}
        print(f"config7 point {name} N={n}: {dt*1e3:.2f} ms",
              file=sys.stderr, flush=True)

    # N=1e6 point, ALWAYS recorded (VERDICT r2 item 5): a bounded
    # subprocess attempts the blocked solver on the ambient backend (the
    # relay's remote compile is nondeterministically slow — observed
    # minutes to >50 min — but a persistent compile cache makes any later
    # round instant after one success); on deadline, the sequence-parallel
    # sharded solver on an 8-device virtual CPU mesh records the scaling
    # shape instead.
    import subprocess

    probe = os.path.join(os.path.dirname(__file__), "_gp1e6_probe.py")
    deadline = int(os.environ.get("PERIODICITY_BENCH_1E6_DEADLINE", 1500))
    point_1e6 = None
    for mode, budget in (("chunked", deadline), ("sharded", 3600)):
        try:
            out = subprocess.run(
                [sys.executable, probe, mode], capture_output=True,
                text=True, timeout=budget,
            )
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if out.returncode == 0 and line:
                point_1e6 = json.loads(line[-1])
                break
            print(f"config7 1e6 probe {mode} failed rc={out.returncode}:"
                  f" {out.stderr[-300:]}", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"config7 1e6 probe {mode} exceeded {budget}s",
                  file=sys.stderr, flush=True)
    if point_1e6 is not None:
        key = f"{point_1e6['mode']}_N1000000"
        points[key] = {
            "ms": point_1e6["ms"],
            "evals_per_sec": point_1e6["evals_per_sec"],
            "platform": point_1e6["platform"],
        }
        top = key
    else:
        top = "blocked_N100000"
    return roofline.config7({
        "metric": f"celerite_logL_evals_per_sec_{top.split('_N')[1]}",
        "value": points[top]["evals_per_sec"],
        "unit": "evals/sec",
        "detail": points,
    })


def config8_mcmc_throughput():
    """Full MCMC sampler throughput on the BrownianGP posterior shape:
    walker-steps/sec for 64 walkers on the SpottedStar light curve (the
    reference's emcee loop makes ~50k sequential C++ calls for the same
    work, gp.py:477)."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.data import SpottedStar
    from periodicity_tpu.models.gp.mcmc import run_ensemble
    from periodicity_tpu.models.gp.solver import log_likelihood
    from periodicity_tpu.models.gp.terms import BrownianTerm

    t, y, dy = SpottedStar()
    tj = jnp.asarray(t, jnp.float32)
    yj = jnp.asarray((y - y.mean()), jnp.float32)
    diag = jnp.asarray(dy**2, jnp.float32)
    n_walkers, n_steps = 64, 50

    def log_prob(w):
        term = BrownianTerm(0.01 * w[0], 20.0 * w[1], 10.0 * w[2], 0.3 * w[3])
        ll = log_likelihood(term, tj, diag, yj)
        return jnp.where(jnp.isfinite(ll), ll, -1e25)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0.9, 1.1, (n_walkers, 4)), jnp.float32)
    key = jax.random.PRNGKey(0)

    def run():
        chain, lps, acc = run_ensemble(log_prob, x0, key, n_steps)
        return float(lps[-1, 0])

    dt = _sync_time(run)
    walker_steps_per_sec = n_walkers * n_steps / dt
    return {
        "metric": "mcmc_walker_steps_per_sec_N2148",
        "value": walker_steps_per_sec,
        "unit": "walker-steps/sec",
        "detail": {"n_walkers": n_walkers, "n_steps": n_steps,
                   "seconds_per_run": dt},
    }


def config9_hht_batch():
    """Batched HHT over a stack of light curves: batched EMD (lane-
    retiring pool for B >= 16; one-jit lock-step below) + flat-vmapped
    instantaneous-frequency stack + batched scatter (SURVEY §2.2 batch
    axis; the reference's HHT is strictly single-series). The headline is
    the B=32 aggregate — the batch axis IS the TPU framing of this
    workload (per-transform latency at B=8 is dependency-chain bound and
    a compiled CPU sift wins it; the anchor records that honestly in
    detail). Sifting is data-dependent (lax.while_loop), so timing uses
    fresh perturbed inputs per repetition instead of a chained fori
    (identical-args calls can be cache-served on the relay)."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.models.timefrequency import hht_batch

    n = 2048
    t = np.linspace(0.0, 20.0, n).astype(np.float32)
    rng = np.random.default_rng(0)
    grid = np.linspace(0.1, 8.0, 64).astype(np.float32)

    def series(b):
        return np.stack([
            np.sin(2 * np.pi * t * f)
            + 0.4 * np.sin(2 * np.pi * t * f / 6.0)
            + 0.05 * rng.standard_normal(n)
            for f in np.linspace(2.0, 4.0, b)
        ]).astype(np.float32)

    def timed(b):
        ysj = jnp.asarray(series(b))

        def run(Y):
            power, _, _, n_modes = hht_batch(t, Y, grid, max_modes=4)
            return float(jnp.sum(power)), int(jnp.max(n_modes))

        run(ysj)  # compile (pool: all bucket shapes on the same data)
        times = []
        for i in range(3):
            yi = ysj + np.float32(1e-4 * (i + 1))
            float(yi[0, 0])  # relay: only a readback truly synchronizes
            t0 = time.perf_counter()
            run(yi)
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), ysj

    dt8, _ = timed(8)
    dt32, ysj32 = timed(32)
    dt64, ysj64 = timed(64)
    # headline = measured-best aggregate (the pool's saturation point
    # moved from B~32 to B~64 once the unrolled segments amortized the
    # relay dispatch floor; same measured-optimum treatment as config 6)
    bbest, dtb, ysjb = max(
        [(32, dt32, ysj32), (64, dt64, ysj64)], key=lambda r: r[0] / r[1]
    )
    # sift-unit count at the headline shape (the roofline's work unit)
    from periodicity_tpu.ops.emd import emd_pool

    *_, units = emd_pool(t, ysjb + np.float32(1e-4), max_modes=4,
                         return_units=True)
    return roofline.config9({
        "metric": f"hht_batched_transforms_per_sec_B{bbest}_N2048",
        "value": bbest / dtb,
        "unit": "transforms/sec aggregate",
        "detail": {"ms_per_batch": dtb * 1e3, "batch": bbest,
                   "b8_ms_per_batch": dt8 * 1e3,
                   "b8_transforms_per_sec": 8 / dt8,
                   "b32_transforms_per_sec": 32 / dt32,
                   "b64_transforms_per_sec": 64 / dt64},
    }, sift_units=int(np.sum(np.asarray(units))))


def config10_ceemdan():
    """CEEMDAN two-tone decomposition, ensemble_size=50 (the reference
    fans the ensemble over a multiprocessing Pool, decomposition.py:277;
    here the whole ensemble is ONE vmap — SURVEY §2.2 row P2). Seconds per
    full decomposition; sifting is data-dependent so each repetition uses
    a fresh perturbed input (identical-args calls can be cache-served on
    the relay)."""
    import jax.numpy as jnp

    from periodicity_tpu.models.decomposition import CEEMDAN

    n = 1024
    t = np.linspace(0.0, 2.0, n)
    rng = np.random.default_rng(0)
    base = np.sin(2 * np.pi * 40.0 * t) + 0.6 * np.sin(2 * np.pi * 5.0 * t)

    def run(y):
        dec = CEEMDAN(ensemble_size=50, random_seed=42)
        modes = dec(y)
        return len(modes), float(jnp.sum(jnp.abs(modes[0].values)))

    run(base.copy())  # compile
    times = []
    for i in range(3):
        yi = base + 1e-4 * (i + 1) * rng.standard_normal(n)
        t0 = time.perf_counter()
        n_modes, _ = run(yi)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "metric": "ceemdan_decompositions_per_sec_N1024_E50",
        "value": 1.0 / dt,
        "unit": "decompositions/sec",
        "detail": {"seconds_per_run": dt, "ensemble_size": 50,
                   "n_modes": n_modes},
    }


def config11_bls():
    """BLS transit search over 1e5 trial periods x 4 durations (beyond
    reference; scatter-add fold + circular prefix-sum box grid). Same
    chained data-dependent timing discipline as config 4."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.models.phase import bls_scan

    n, n_periods = 2000, 100_000
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 200.0, n)).astype(np.float32)
    phi = (t / 7.7) % 1.0
    y = (
        np.where(phi < 0.05, -0.02, 0.0)
        + 0.005 * rng.standard_normal(n)
    ).astype(np.float32)
    w = np.full(n, 1.0 / n, dtype=np.float32)
    periods = np.linspace(0.5, 100.0, n_periods).astype(np.float32)
    widths = (3, 6, 13, 26)
    tj, yj, wj, pj = map(jnp.asarray, (t, y, w, periods))

    k = 3

    binner = ("pallas" if jax.default_backend() in ("tpu", "axon")
              else "scatter")

    @jax.jit
    def loop(y0):
        def body(_, carry):
            y0, acc = carry
            power, depth, _, _ = bls_scan(
                tj, y0, wj, pj, widths=widths, nbins=256, batch_size=512,
                binner=binner,
            )
            return (y0 + power[0] * 1e-9, acc + jnp.sum(power[:8]))

        return jax.lax.fori_loop(0, k, body, (y0, jnp.float32(0)))[1]

    dt = _sync_time(lambda: float(loop(yj))) / k
    return roofline.config11({
        "metric": "bls_trial_periods_per_sec_N2000_4dur",
        "value": n_periods / dt,
        "unit": "periods/sec",
        "detail": {"seconds_per_scan": dt, "n_durations": len(widths),
                   "nbins": 256, "binner": binner},
    })


def config12_multiterm():
    """Multi-term (nterms=3) harmonic GLS scan, N=1e4, fast path: the
    (2K+1)-square normal equations assembled from 3K Press-Rybicki
    pipelines + batched MXU solves (beyond reference — the reference GLS
    is single-sinusoid only)."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.models.spectral import gls_power_multiterm

    n = 10_000
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 100.0, n)).astype(np.float32)
    y = (
        np.sin(2 * np.pi * t / 7.7)
        + 0.5 * np.sin(4 * np.pi * t / 7.7 + 0.4)
        + 0.3 * rng.standard_normal(n)
    ).astype(np.float32)
    err = np.full(n, 0.3, np.float32)
    df = np.float32(1.0 / (100.0 * 5))
    fmin = np.float32(df / 2)
    nf = int((0.5 * n / 100.0) / df)
    tj, yj, ej = jnp.asarray(t), jnp.asarray(y), jnp.asarray(err)
    k = 10

    @jax.jit
    def loop(y):
        def body(_, carry):
            y, acc = carry
            p = gls_power_multiterm(tj, y, ej, df, fmin, nf, 3)
            return (y + p[: y.shape[0]] * 1e-9, acc + p[0])

        return jax.lax.fori_loop(0, k, body, (y, jnp.float32(0)))[1]

    dt = _sync_time(lambda: float(loop(yj))) / k
    return {
        "metric": "multiterm_gls_k3_freqs_per_sec_N1e4",
        "value": nf / dt,
        "unit": "freqs/sec",
        "detail": {"nf": nf, "nterms": 3, "ms_per_scan": dt * 1e3},
    }


def config13_nuts():
    """NUTS gradient-based sampling throughput on the BrownianGP
    posterior shape (SpottedStar, N=2148): leapfrog-gradient evaluations
    per second — each one is a forward+adjoint sweep of the celerite scan
    solver under jax.grad (the role of the reference's dead
    celerite2.theano backend, gp.py:541-637)."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.data import SpottedStar
    from periodicity_tpu.models.gp.nuts import run_nuts
    from periodicity_tpu.models.gp.solver import log_likelihood
    from periodicity_tpu.models.gp.terms import BrownianTerm

    t, y, dy = SpottedStar()
    tj = jnp.asarray(t, jnp.float32)
    yj = jnp.asarray((y - y.mean()), jnp.float32)
    diag = jnp.asarray(dy**2, jnp.float32)

    def log_prob(w):
        term = BrownianTerm(
            0.01 * jnp.exp(w[0]), 20.0 * jnp.exp(w[1]),
            10.0 * jnp.exp(w[2]), 0.3 * jax.nn.sigmoid(w[3]),
        )
        ll = log_likelihood(term, tj, diag, yj)
        return jnp.where(jnp.isfinite(ll), ll, -1e25) - 0.5 * jnp.sum(w**2)

    key = jax.random.PRNGKey(0)
    state = {}

    def make_run(n_chains, n_steps, n_warmup, max_depth):
        x0 = jnp.zeros((n_chains, 4), jnp.float32)

        def run():
            out = run_nuts(log_prob, x0, key, n_steps, n_warmup=n_warmup,
                           max_depth=max_depth)
            state["n_leapfrog"] = int(np.sum(np.asarray(out["n_leapfrog"])))
            state["n_leapfrog_warmup"] = int(
                np.sum(np.asarray(out["n_leapfrog_warmup"]))
            )
            state["divergences"] = int(np.sum(np.asarray(out["divergences"])))
            state["chain"] = np.asarray(out["chain"])
            return float(np.asarray(out["log_probs"])[-1, 0])

        return run

    # full shape first (4 chains, depth 6); the relay's TPU worker faulted
    # reproducibly on this program in round 4 — fall back to the half
    # shape and record the fault honestly rather than killing the config
    n_chains, n_steps, n_warmup = 4, 40, 60
    full_status = "OK"
    try:
        dt = _sync_time(make_run(n_chains, n_steps, n_warmup, 6), reps=2)
    except Exception as e:
        full_status = f"FAILED: {type(e).__name__}: {str(e)[:120]}"
        n_chains, n_steps, n_warmup = 2, 20, 30
        dt = _sync_time(make_run(n_chains, n_steps, n_warmup, 5), reps=2)
    from periodicity_tpu.models.gp.mcmc import ess as _ess, rhat as _rhat

    ess_per_dim = _ess(state["chain"])
    rhat_per_dim = _rhat(state["chain"])
    # the timed run includes warmup, so count warmup leapfrogs too (each
    # warmup leapfrog does the same gradient work as a sampling one)
    n_total = state["n_leapfrog"] + state["n_leapfrog_warmup"]
    evals_per_sec = n_total / dt

    # chains-scaling block (VERDICT r4 directive 5): grad-evals/sec vs
    # vmapped chain count at reduced depth/steps, so the batched-chains
    # argument for NUTS-on-TPU is MEASURED, not asserted. Each point is
    # crash-tolerant (the relay faulted on deep NUTS trees in round 4).
    chains_scaling = {}
    for c in (2, 8, 16):
        try:
            xc = jnp.zeros((c, 4), jnp.float32)

            def run_c(xc=xc):
                out = run_nuts(log_prob, xc, key, 10, n_warmup=20,
                               max_depth=4)
                nl = int(np.sum(np.asarray(out["n_leapfrog"])))
                nlw = int(np.sum(np.asarray(out["n_leapfrog_warmup"])))
                chains_scaling[f"chains_{c}_leapfrogs"] = nl + nlw
                return float(np.asarray(out["log_probs"])[-1, 0])

            dtc = _sync_time(run_c, reps=2)
            chains_scaling[f"chains_{c}_grad_evals_per_sec"] = (
                chains_scaling[f"chains_{c}_leapfrogs"] / dtc
            )
        except Exception as e:  # pragma: no cover - relay fault guard
            chains_scaling[f"chains_{c}_error"] = (
                f"{type(e).__name__}: {str(e)[:120]}"
            )

    return {
        "metric": "nuts_leapfrog_grad_evals_per_sec_N2148",
        "value": evals_per_sec,
        "unit": "grad-evals/sec",
        "detail": {"n_chains": n_chains, "n_steps": n_steps,
                   "n_leapfrog_sampling": state["n_leapfrog"],
                   "n_leapfrog_warmup": state["n_leapfrog_warmup"],
                   "seconds_per_run": dt,
                   "divergences": state["divergences"],
                   "min_ess": float(np.min(ess_per_dim)),
                   "ess_per_sec": float(np.min(ess_per_dim) / dt),
                   "max_rhat": float(np.max(rhat_per_dim)),
                   "full_config_status": full_status,
                   "chains_scaling": chains_scaling},
    }


def config14_long_series():
    """Single-chip long-series point (SURVEY §5.7: the reference caps out
    at N=74,326 sunspot samples — this is where the TPU build visibly
    dwarfs it): one GLS periodogram of an N=1e6-sample light curve over
    nf=1e5 trial frequencies, plus an N=2^21 FFT-ACF in detail. The
    extirpolation grid stays modest (nfft = 2^19), so the dominant work
    is the N=1e6 sample gridding — the opposite balance from config 6."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.models.spectral import gls_power

    n, nf = 1_000_000, 100_000
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 1000.0, n)).astype(np.float32)
    y = (np.sin(2 * np.pi * t / 7.7)
         + 0.3 * rng.standard_normal(n)).astype(np.float32)
    err = np.full(n, 0.3, np.float32)
    df = np.float32(1.0 / (1000.0 * 5))
    fmin = np.float32(df / 2)
    tj, yj, ej = jnp.asarray(t), jnp.asarray(y), jnp.asarray(err)
    k = 10

    @jax.jit
    def loop(y):
        def body(_, carry):
            y, acc = carry
            p = gls_power(tj, y, ej, df, fmin, nf, pair_q=1,
                          gridder="pallas")
            # nf < n here: feed the whole spectrum back into the first nf
            # samples to keep iterations data-dependent
            return (y.at[: p.shape[0]].add(p * 1e-9), acc + p[0])

        return jax.lax.fori_loop(0, k, body, (y, jnp.float32(0)))[1]

    dt = _sync_time(lambda: float(loop(yj))) / k

    # FFT ACF at N=2^21 (~2.1M uniform samples) — 28x the reference's
    # largest series, single chip, one jit
    n_acf = 1 << 21
    y2 = (np.sin(2 * np.pi * np.arange(n_acf) / 5000.0)
          + 0.1 * rng.standard_normal(n_acf)).astype(np.float32)
    y2j = jnp.asarray(y2)
    k2 = 10

    @jax.jit
    def loop_acf(y0):
        def body(_, carry):
            y, acc = carry
            yc = y - jnp.mean(y)
            ps = jnp.abs(jnp.fft.rfft(yc, n=2 * n_acf)) ** 2
            r = jnp.fft.irfft(ps)[:n_acf]
            r = r / r[0]
            return (y + r * 1e-9, acc + r[1])

        return jax.lax.fori_loop(0, k2, body, (y0, jnp.float32(0)))[1]

    dt_acf = _sync_time(lambda: float(loop_acf(y2j))) / k2
    return roofline.config14({
        "metric": "gls_long_series_periodograms_per_sec_N1e6_nf1e5",
        "value": 1.0 / dt,
        "unit": "periodograms/sec",
        "detail": {"n": n, "nf": nf, "sec_per_call": dt,
                   "acf_n": n_acf, "acf_sec_per_call": dt_acf,
                   "acf_per_sec": 1.0 / dt_acf},
    })


CONFIGS = {
    1: config1_gls,
    2: config2_acf,
    3: config3_wps,
    4: config4_phase,
    5: config5_gp,
    6: config6_gls_batch,
    7: config7_gp_scaling,
    8: config8_mcmc_throughput,
    9: config9_hht_batch,
    10: config10_ceemdan,
    11: config11_bls,
    12: config12_multiterm,
    13: config13_nuts,
    14: config14_long_series,
}


def _load_anchors():
    """Host-CPU reference-algorithm anchors (benchmarks/anchors.py; cached
    in anchors.json). Every config of record carries a measured
    speedup_vs_cpu_anchor — regenerate with `python benchmarks/anchors.py`
    when shapes change."""
    path = os.path.join(os.path.dirname(__file__), "anchors.json")
    if not os.path.exists(path):
        return {}
    return {int(k): v for k, v in json.load(open(path)).items()}


def _join_anchor(result, anchor):
    if anchor is None:
        return result
    cpu_rate = anchor["cpu_units_per_sec"]
    if "per_n" in anchor:
        # match the anchor point with the metric's own N (config 7: which
        # N gets recorded depends on the remote-compile deadline)
        n_suffix = result["metric"].rsplit("_", 1)[-1].lstrip("N")
        cpu_rate = anchor["per_n"].get(n_suffix, cpu_rate)
    result["cpu_anchor_units_per_sec"] = cpu_rate
    result["speedup_vs_cpu_anchor"] = result["value"] / cpu_rate
    result["cpu_anchored_by"] = anchor["anchored_by"]
    if "note" in anchor:
        result["cpu_anchor_note"] = anchor["note"]
    if "cores_scale" in anchor:
        # Pool-parallel reference families: charge a nominal multicore
        # deployment, not just the serial 1-core anchor (VERDICT r4 dir 2a)
        scale = anchor["cores_scale"]
        result["cores_scaled_estimate_units_per_sec"] = cpu_rate * scale
        result["speedup_vs_cores_scaled_estimate"] = (
            result["value"] / (cpu_rate * scale)
        )
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs",
                    default="1,2,3,4,5,6,7,8,9,10,11,12,13,14")
    args = ap.parse_args()
    anchors = _load_anchors()
    for c in [int(x) for x in args.configs.split(",")]:
        if c not in CONFIGS:
            ap.error(
                f"unknown config {c}; choose from {sorted(CONFIGS)}"
            )
        try:
            result = CONFIGS[c]()
        except Exception as e:  # a relay/worker fault must not kill the
            # remaining configs (observed: TPU worker crash mid-suite)
            print(f"config {c} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            print(json.dumps({"metric": f"config{c}", "value": None,
                              "unit": "FAILED",
                              "error": f"{type(e).__name__}: {str(e)[:200]}"}))
            continue
        result = _join_anchor(result, anchors.get(c))
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
