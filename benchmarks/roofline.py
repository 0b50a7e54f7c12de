"""Analytic roofline/utilization models for the benchmark configs.

For each config of record this module converts the measured rate into
achieved HBM bandwidth and FLOP throughput from DOCUMENTED op/byte
counts, and reports both as fractions of the TPU v5e peaks — so an op/s
number can be judged as "near roofline" vs "leaving 10x on the table"
(VERDICT r3 directive #5).

The models are deliberately conservative LOWER bounds on the work one
evaluation must move/execute (algorithmic traffic, not measured HLO
traffic): a fraction near 1 means truly roofline-bound; a small fraction
means either headroom or a latency-/serialization-bound kernel — each
config's ``note`` says which interpretation the shape supports.

v5e peaks (public spec): 819 GB/s HBM per chip, 197 TFLOP/s bf16 MXU
(f32 elementwise work runs on the VPU at a small fraction of that — the
``mxu_frac`` of a non-matmul config is expected to be tiny and is
reported against the bf16 peak anyway for one consistent denominator).
"""

import numpy as np

HBM_PEAK_GBPS = 819.0
MXU_PEAK_GFLOPS = 197_000.0

F32 = 4
C64 = 8  # complex64


def _next_pow2(n):
    return 1 << int(n - 1).bit_length()


def _fft_flops(n):
    """Complex-FFT real-FLOP count, the standard 5 n log2 n model."""
    return 5.0 * n * np.log2(n)


def _fft_bytes(n):
    """HBM traffic of one complex64 FFT: read + write per stage pass;
    XLA's TPU FFT runs as a few fused radix passes — 2 full passes
    (4 array touches) is the conservative floor."""
    return 4.0 * n * C64


def _gls_eval(n, nf, paired=True):
    """One fast-path GLS periodogram (gls_power, models/spectral.py):
    extirpolated gridding + FFTs + per-frequency assembly.

    paired: the conjugate-symmetry pairing serves the (wy, w) sums from
    ONE nfft-point FFT plus the 2f sum from a half-size FFT (f32).
    """
    nfft = _next_pow2(5 * nf - 1)
    nfft2 = nfft // 2  # f32 2f pipeline (_nfft_2f)
    taps = 4
    n_pipelines = 2 if paired else 3
    flops = (
        _fft_flops(nfft) * (1 if paired else 2)
        + _fft_flops(nfft2)
        + 2.0 * taps * 2 * n * n_pipelines  # Lagrange gridding MACs
        + 50.0 * nf  # tan2wt/C2w/S2w/YC/YS/CC/SS assembly
    )
    byts = (
        (_fft_bytes(nfft) + 2.0 * nfft * C64) * (1 if paired else 2)
        + _fft_bytes(nfft2) + 2.0 * nfft2 * C64  # grid write + spectrum read
        + 12.0 * nf * F32  # assembly streams
        + 3.0 * n * F32  # t, y, w reads
    )
    return flops, byts


def config1(result):
    n, nf = 10_000, 25_000
    flops, byts = _gls_eval(n, nf, paired=True)
    rate = result["value"]  # already periodograms/sec
    return _annotate(result, rate * flops, rate * byts,
                     "extirpolation+FFT pipeline; FFT-bandwidth bound at "
                     "this nf — small grids underfill the chip")


def config6(result):
    n, nf = 100_000, 1_000_000
    flops, byts = _gls_eval(n, nf, paired=True)
    rate = result["value"] / nf  # curves/sec (aggregate freqs/sec / nf)
    return _annotate(result, rate * flops, rate * byts,
                     "batched extirpolation+FFT; the binding resource is "
                     "HBM traffic of the nfft=8.4M-point FFTs")


def config5(result):
    n, rank = 2148, 4
    # celerite factor + forward/backward solve + logdet per eval
    # (Foreman-Mackey 2017 eq. 46): ~6R^2+8R+12 flops/sample
    flops = (6 * rank**2 + 8 * rank + 12.0) * n
    # U, V, P, A, y streams in; W, D, z, x out — ~(6R + 6) f32 per sample
    byts = (6 * rank + 6.0) * F32 * n
    rate = result["value"]
    return _annotate(result, rate * flops, rate * byts,
                     "O(N) recursion is SERIAL per eval: a single logL is "
                     "latency-bound, not roofline-bound — throughput comes "
                     "from batching evals (config 8) or the pscan solver")


def config9(result, sift_units=None):
    n = 2048
    cap = n // 2 + 2
    if sift_units is None:
        return result
    # one sift: extrema masks + 2 capacity-K compactions/pads + 2 PCR
    # spline solves (log2 K sweeps x ~6 arrays) + N-point Hermite eval
    # with cumsum interval index; ~30 N-passes + ~(6 log2 K) K-passes
    byts = (30.0 * n + 6.0 * np.log2(cap) * cap) * F32
    flops = 40.0 * n + 4.0 * np.log2(cap) * cap
    batch_sec = result["detail"]["ms_per_batch"] / 1e3
    rate = sift_units / batch_sec
    out = _annotate(result, rate * flops, rate * byts,
                    "sift is VPU/bandwidth work (no MXU); the roofline "
                    "counts per-sift passes x measured sift units")
    out["detail"]["sift_units_per_batch"] = int(sift_units)
    out["detail"]["sift_units_per_sec"] = rate
    return out


def config7(result, rank=4):
    """Chunked/blocked Kalman celerite likelihood at the headline N.

    Per-sample work (r = state dim; BrownianTerm with concrete Q lowers
    to 1 complex pair + 2 real slots -> r = 4): element construction
    ~8r^3, ~3 _combine
    applications (inner scan + stitch + summary) at ~6r^3 each with the
    unrolled shared-matrix solve, innovation ~4r^3 -> ~30 r^3 flops.
    Traffic floor: the five element leaves (~3r^2 + 2r f32 per sample)
    written once and re-read twice (scan + stitch)."""
    detail = result.get("detail", {})
    key = next((k for k in detail if k.endswith("_N1000000")), None)
    if key is None or "evals_per_sec" not in detail.get(key, {}):
        return result
    n = 1_000_000
    rate = detail[key]["evals_per_sec"]
    flops = 30.0 * rank**3 * n
    byts = 3.0 * (3 * rank**2 + 2 * rank) * F32 * n
    return _annotate(result, rate * flops, rate * byts,
                     "two-level Kalman composition is DEPTH-bound, not "
                     "roofline-bound: ~N/inner_blocks sequential combine "
                     "steps per eval dominate; throughput comes from "
                     "vmapping walkers over the same scan")


def config11(result):
    """BLS over the one-hot MXU fold: per trial period the fold is ONE
    [rows=2, N] x [N, nbins] matmul (the one-hot operand built in VMEM —
    no HBM traffic for it), then circular prefix-sum window stats.

    flops: 2 rows x 2 flops/MAC x N x nbins per period (+ N x nbins
    one-hot build compares + ~30 x nbins window-stat ops). bytes: the
    folded [2, nbins] bins written + ~3 read passes for window stats;
    inputs amortize over the 512-period chunk."""
    n, nbins, n_periods = 2000, 256, 100_000
    per_period_flops = 2 * 2.0 * n * nbins + n * nbins + 30.0 * nbins
    per_period_bytes = 8.0 * nbins * F32 + 3.0 * n * F32 / 512
    rate = result["value"]  # periods/sec
    return _annotate(result, rate * per_period_flops,
                     rate * per_period_bytes,
                     "one-hot fold is real MXU matmul work; mfu is the "
                     "meaningful utilization number for this config")


def config14(result):
    """Long-series GLS (N=1e6 samples, nf=1e5): same pipeline model as
    config 1/6 — the balance flips to sample gridding (N >> nf)."""
    n, nf = 1_000_000, 100_000
    flops, byts = _gls_eval(n, nf, paired=True)
    rate = result["value"]  # periodograms/sec
    return _annotate(result, rate * flops, rate * byts,
                     "gridding-dominated GLS: 1e6-sample extirpolation "
                     "into a 2^19 grid; FFT cost is secondary at this nf")


def _annotate(result, flops_per_sec, bytes_per_sec, note):
    hbm = bytes_per_sec / 1e9
    gf = flops_per_sec / 1e9
    result["hbm_gbps"] = round(hbm, 2)
    result["hbm_frac"] = round(hbm / HBM_PEAK_GBPS, 4)
    result["gflops"] = round(gf, 2)
    result["mfu"] = round(gf / MXU_PEAK_GFLOPS, 6)
    result["roofline_note"] = note
    return result
