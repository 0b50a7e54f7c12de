"""Pallas TPU phase-fold binning: one-hot MXU matmul accumulation.

The BLS scorer's hot op is the per-period weighted phase-fold histogram
(``bls_scan``: two scatter-adds of N samples into nbins bins per trial
period). The XLA scatter floor on v5e is ~13 ns/index
(docs/performance.md), so N=2000 x 1e5 periods pays ~5 s of pure
scatter. This kernel replaces the scatter with the ops/pallas_grid2.py
playbook: per period, the fold is ONE [2, N] x [N, nbins] matmul where
the one-hot operand is built by a vectorized compare —

    acc[v, k] = sum_i V[v, i] * onehot(bin_p(i) == k)

with V = [w, w*yc] shared by every period (only the bins change). The
one-hot side is bf16-exact in the MXU; the value side runs at
``Precision.HIGHEST`` (the 3-pass bf16 f32 emulation) — the LHS is only
[2, N], so exactness costs nothing here, unlike the gridding kernel's
[128, 1024] operands where a head/tail split was the budget-fitting
form.

Each program handles a CHUNK of periods (program overhead on this chip
is ~3 us — one period per program would dominate the runtime), looping
inside with dynamic row stores. Samples are padded with zero weights, so
padding never contributes regardless of its bin.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fold_bins_onehot"]

_ALIGN = 512  # sample padding unit (second-minor vector alignment)
_CHUNK = 32  # periods per program (overhead vs VMEM-residency tradeoff)


def _kernel(freqs_ref, t_ref, v_ref, out_ref, *, nbins, npad, chunk):
    # freqs ride the scalar-prefetch slot (SMEM): Mosaic cannot load a
    # single element of a VMEM vector at a dynamic index
    b = pl.program_id(0)
    t = t_ref[...]  # [npad]
    v = v_ref[...]  # [2, npad] f32 values
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (npad, nbins), 1)

    def body(c, _):
        f = freqs_ref[b * chunk + c]
        phi = t * f
        phi = phi - jnp.floor(phi)
        bins = jnp.clip((phi * nbins).astype(jnp.int32), 0, nbins - 1)
        sel = (iota_k == bins[:, None]).astype(jnp.float32)  # [npad, nbins]
        acc = jnp.dot(v, sel, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        # out row c: [r_bins | s_bins] packed in 2*nbins lanes
        out_ref[c, : nbins] = acc[0]
        out_ref[c, nbins:] = acc[1]
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@partial(jax.jit, static_argnames=("nbins", "interpret"))
def fold_bins_onehot(t, w, wyc, freqs, nbins=256, interpret=False):
    """Weighted phase-fold histograms for every trial frequency.

    t [N] times, w [N] weights, wyc [N] weighted centered values,
    freqs [P] trial frequencies (1/period) -> (r_bin, s_bin) each
    [P, nbins] f32: r = per-bin weight sums, s = per-bin weighted-value
    sums, bins k = floor(frac(t*f) * nbins).

    P must be a multiple of the internal chunk (the BLS scorer pads).
    """
    t = jnp.asarray(t, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    wyc = jnp.asarray(wyc, jnp.float32)
    freqs = jnp.asarray(freqs, jnp.float32)
    n = t.shape[0]
    p = freqs.shape[0]
    assert p % _CHUNK == 0, (p, _CHUNK)
    pad = (-n) % _ALIGN
    npad = n + pad
    tp = jnp.concatenate([t, jnp.zeros(pad, jnp.float32)])
    v = jnp.stack([
        jnp.concatenate([w, jnp.zeros(pad, jnp.float32)]),
        jnp.concatenate([wyc, jnp.zeros(pad, jnp.float32)]),
    ])  # [2, npad]

    out = pl.pallas_call(
        partial(_kernel, nbins=nbins, npad=npad, chunk=_CHUNK),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(p // _CHUNK,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((_CHUNK, 2 * nbins), lambda b, *_: (b, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((p, 2 * nbins), jnp.float32),
        interpret=interpret,
    )(freqs, tp, v)
    return out[:, :nbins], out[:, nbins:]
