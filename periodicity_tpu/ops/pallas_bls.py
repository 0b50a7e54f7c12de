"""Pallas TPU phase-fold binning: one-hot MXU matmul accumulation.

The phase-scorer family's hot op is the per-period fold histogram:
``bls_scan`` scatter-adds weights and weighted values, ``aov_scan``
counts/sums/sum-squares, ``conditional_entropy_scan`` a 2-D
(phase x magnitude) count, ``gregory_loredo_scan`` event counts — all
paying the XLA scatter floor of ~13 ns/index (docs/performance.md),
which at N~2000 x 1e5 trial periods is seconds of pure scatter. This
kernel replaces every one of them with the ops/pallas_grid2.py playbook:
per period, the fold is ONE [nv, N] x [N, nbins] matmul where the
one-hot operand is built by a vectorized compare —

    acc[v, k] = sum_i V[v, i] * onehot(bin_p(i) == k)

with the value rows V shared by every period (only the bins change).
Bins generalize to ``phase_bin * stride + offset[i]`` so a 2-D histogram
(conditional entropy: stride = n_mag, offset = per-sample magnitude bin)
is the same kernel. The one-hot side is bf16-exact in the MXU; the value
side runs at ``Precision.HIGHEST`` (3-pass bf16 f32 emulation — the LHS
is only a few rows, so exactness is free; measured on v5e the plain
bf16 path loses the f32 tail entirely).

Each program handles a CHUNK of periods (program overhead is ~3 us on
this chip — one period per program would dominate), looping inside with
dynamic row stores; trial frequencies ride the scalar-prefetch slot
(Mosaic cannot load a VMEM vector element at a dynamic index). Samples
are padded with all-zero value rows, so padding never contributes
regardless of its bin. Lane padding rounds the bin axis up to 128.

Binning formulation: ``floor(frac((t - t[0]) * f) * n_phi)`` with
f = 1/period in float32. The epoch subtraction happens in the INPUT
dtype before the f32 cast: absolute-epoch time stamps (BJD ~2.45e6 over
a ~1e3-day baseline) would otherwise put t*f at ~1e6 cycles, where f32
phase error spans several bins of 256 and transit depths lose up to
half their statistic. After the shift the f32 phase error is
``(elapsed/period) * 2^-24`` cycles — ~1e-4 of a bin for a 1400-day
baseline at a 0.5-day trial period, i.e. only samples within that
distance of a bin edge can hop one bin relative to the exact fold.
All scorer statistics (BLS power/depth, AoV F, conditional entropy,
Gregory-Loredo counts) are phase-origin invariant; reported bin phases
reference t[0] (``bls_scan`` folds both binners on the same origin).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fold_onehot", "fold_bins_onehot"]

_ALIGN = 512  # sample padding unit (second-minor vector alignment)
_CHUNK = 32  # periods per program (overhead vs VMEM-residency tradeoff)
_LANE = 128  # bin-axis lane rounding


def _kernel(freqs_ref, t_ref, v_ref, off_ref, *out_refs, nbinsp, stride,
            n_phi, chunk, nv):
    b = pl.program_id(0)
    t = t_ref[...]  # [npad]
    v = v_ref[...]  # [nv, npad] f32 values (zero at padding)
    off = off_ref[...]  # [npad] int32 per-sample bin offset
    npad = t.shape[0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (npad, nbinsp), 1)

    def body(c, _):
        f = freqs_ref[b * chunk + c]
        phi = t * f
        phi = phi - jnp.floor(phi)
        pb = jnp.clip((phi * n_phi).astype(jnp.int32), 0, n_phi - 1)
        bins = pb * stride + off
        sel = (iota_k == bins[:, None]).astype(jnp.float32)  # [npad, nbinsp]
        acc = jnp.dot(v, sel, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # [nv, nbinsp]
        # one full-row dynamic store per value-row OUTPUT (Mosaic rejects
        # lane-offset dynamic stores: "dynamic store with unaligned
        # indices" at nv*nbinsp-lane packing)
        for r in range(nv):  # static unroll over value rows
            out_refs[r][c, :] = acc[r]
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@partial(jax.jit, static_argnames=("n_phi", "stride", "interpret"))
def fold_onehot(t, values, freqs, n_phi, stride=1, offsets=None,
                interpret=False):
    """Weighted phase-fold histograms for every trial frequency.

    t [N] times; values [nv, N] value rows (weights, weighted values,
    counts-of-ones, squares, ...); freqs [P] trial frequencies
    (1/period); n_phi phase bins; optional per-sample integer
    ``offsets`` [N] in [0, stride) for 2-D histograms (flat bin =
    phase_bin * stride + offset).

    Phases are referenced to t[0]: the fold is ``frac((t - t[0]) * f)``
    with the epoch subtraction in the input dtype (see module docstring
    for the precision analysis). Returns [P, nv, n_phi * stride] f32.
    P is padded internally to the program chunk; padded rows are
    dropped before returning.
    """
    t = jnp.asarray(t)
    t = (t - t[0]).astype(jnp.float32)
    values = jnp.atleast_2d(jnp.asarray(values, jnp.float32))
    freqs = jnp.asarray(freqs, jnp.float32)
    nv, n = values.shape
    nbins = n_phi * stride
    nbinsp = -(-nbins // _LANE) * _LANE
    p = freqs.shape[0]
    ppad = (-p) % _CHUNK
    if ppad:
        freqs = jnp.concatenate([freqs, freqs[-1:].repeat(ppad)])
    pad = (-n) % _ALIGN
    tp = jnp.concatenate([t, jnp.zeros(pad, jnp.float32)])
    vp = jnp.concatenate(
        [values, jnp.zeros((nv, pad), jnp.float32)], axis=1
    )
    if offsets is None:
        offp = jnp.zeros(n + pad, jnp.int32)
    else:
        offp = jnp.concatenate(
            [jnp.asarray(offsets, jnp.int32), jnp.zeros(pad, jnp.int32)]
        )

    outs = pl.pallas_call(
        partial(_kernel, nbinsp=nbinsp, stride=stride, n_phi=n_phi,
                chunk=_CHUNK, nv=nv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=((p + ppad) // _CHUNK,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=[
                pl.BlockSpec((_CHUNK, nbinsp), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM)
            ] * nv,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((p + ppad, nbinsp), jnp.float32)
        ] * nv,
        interpret=interpret,
    )(freqs, tp, vp, offp)
    return jnp.stack(outs, axis=1)[:p, :, :nbins]


def fold_bins_onehot(t, w, wyc, freqs, nbins=256, interpret=False):
    """BLS-shaped wrapper: (r_bin, s_bin) each [P, nbins] from value rows
    [w, w*yc] (see :func:`fold_onehot`)."""
    out = fold_onehot(t, jnp.stack([jnp.asarray(w, jnp.float32),
                                    jnp.asarray(wyc, jnp.float32)]),
                      freqs, n_phi=nbins, interpret=interpret)
    return out[:, 0, :], out[:, 1, :]
