"""Pallas TPU extirpolation gridding v2: one-hot MXU matmul accumulation.

Second-generation scatter-free spreading kernel for the Press-Rybicki hot
loop (reference spectral.py:24,33 ``np.add.at``). The round-1 kernel
(ops/pallas_grid.py) was correct but slow (~47 ms at N=1e5, nfft=2^23):
16384 one-tile programs paid ~3 us each of program/predication overhead.
This kernel restructures the computation so everything inside a program is
a static-shape vector/matrix op:

- the grid is processed in SUPERBLOCKS of 128 rows x 512 lanes = 65536
  cells (128 programs at nfft=2^23);
- each program walks its samples in 1024-aligned windows (sorted
  positions -> contiguous sample ranges, bounds via scalar prefetch);
- per window and per Lagrange tap j, the absolute in-block cell
  c = ilo + j - base decomposes as c = 512*bin + h (bin == output row);
  the spread becomes acc[bin, h] += sum_s val_j[s] * onehot[bin_j[s] ==
  bin] — ONE [128, 1024] x [1024, 512] matmul per (tap, plane) on the
  MXU, with the one-hot M and value-carrying V built by vectorized
  compares (the accumulator IS the output block; no in-kernel reshape,
  which Mosaic cannot lower);
- out-of-block taps simply fail the one-hot match (no spill bookkeeping);
  boundary-straddling samples appear in both neighbors' windows and each
  block keeps only its own cells;

Cost model: MACs ~= (aligned-window size) x (occupied grid cells) per
(tap, plane, head/tail) pass — the window/block-size sweep in
docs/performance.md sits at the program-overhead vs per-chunk-MAC
optimum. Measured at N=1e5, nfft=2^23 on v5e: 5.8 ms per grid build vs
10.7 ms for the XLA scatter floor.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["extirpolate_grid_factored"]

_ALIGN = 1024  # sample-window alignment (Mosaic's hard 1-D dynamic-load
# unit: 512 fails with "cannot statically prove multiple of 1024")
_LANES = 512  # output block lane width == one-hot second-level width
_ROWS = 128  # output block rows (swept 32/64/128/256 -> 9.0/6.2/5.8/7.0
# ms at the headline shape; program overhead vs per-chunk MAC tradeoff)
_BINW = _LANES  # bin width; acc [_ROWS, _BINW] IS the output block
_NBINS = _ROWS


def _kernel(starts_ref, ends_ref, ilo_ref, ure_ref, uim_ref,
            *rest, taps, rows, value_on_m, split_values):
    lag_refs = rest[:taps]
    out_re_ref, out_im_ref = rest[taps], rest[taps + 1]
    b = pl.program_id(0)
    base = b * (rows * _LANES)
    s = starts_ref[b]
    e = ends_ref[b]

    acc_re = jnp.zeros((rows, _BINW), jnp.float32)
    acc_im = jnp.zeros((rows, _BINW), jnp.float32)

    iota_bins = jax.lax.broadcasted_iota(jnp.int32, (rows, _ALIGN), 0)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (_ALIGN, _BINW), 1)
    shift = _LANES.bit_length() - 1  # log2(bin width)

    def body(carry):
        chunk, acc_re, acc_im = carry
        chunk = pl.multiple_of(chunk, _ALIGN)
        ilo_w = ilo_ref[pl.ds(chunk, _ALIGN)]
        ure_w = ure_ref[pl.ds(chunk, _ALIGN)]
        uim_w = uim_ref[pl.ds(chunk, _ALIGN)]
        off = ilo_w - base  # [_ALIGN]
        for j in range(taps):
            lag_w = lag_refs[j][pl.ds(chunk, _ALIGN)]
            c = off + j
            valid = (c >= 0) & (c < rows * _LANES)
            # invalid samples get bin -1, which matches no one-hot row —
            # the M mask alone suffices (Mosaic cannot minor-dim-insert
            # an i1 vector, so no bool [:, None] anywhere)
            c_safe = jnp.where(valid, c, -1)
            bin_j = c_safe >> shift  # -1 for invalid -> matches no row
            h_j = c_safe & (_BINW - 1)
            m = (iota_bins == bin_j[None, :]).astype(jnp.float32)
            if value_on_m:
                # candidate variant: the VALUES ride on the m side (the
                # [rows, ALIGN] matrix, 4x smaller than sel's
                # [ALIGN, BINW]) — scaling m by v[None, :] costs a
                # [rows, ALIGN] FMA where where(sel, v[:, None], 0) costs
                # an [ALIGN, BINW] select. ON-DEVICE RULING (v5e,
                # N=1e5/nfft=2^23): 6.56 ms vs 6.41 ms for the production
                # form — 2.4% SLOWER; the kernel is not select-bound, so
                # the default stays False. Kept as the A/B harness.
                sel_f = (iota_h == h_j[:, None]).astype(jnp.float32)
            else:
                sel = iota_h == h_j[:, None]
            # The TPU matmul truncates f32 inputs to bf16 (measured 4e-3
            # relative grid error at default precision; HIGHEST emulation
            # blows the VMEM budget). The one-hot operand is bf16-exact,
            # so split each VALUE into a bf16 head plus an f32 tail before
            # it enters the MXU: two exact-head dots per plane bound the
            # error at ~bf16_eps^2 ~ 1.6e-5 relative.
            v_re = ure_w * lag_w
            v_im = uim_w * lag_w
            for hi_lo in range(2 if split_values else 1):
                if split_values and hi_lo == 0:
                    vr = v_re.astype(jnp.bfloat16).astype(jnp.float32)
                    vi = v_im.astype(jnp.bfloat16).astype(jnp.float32)
                    v_re, v_im = v_re - vr, v_im - vi
                else:
                    vr, vi = v_re, v_im
                if value_on_m:
                    acc_re = acc_re + jnp.dot(
                        m * vr[None, :], sel_f,
                        preferred_element_type=jnp.float32,
                    )
                    acc_im = acc_im + jnp.dot(
                        m * vi[None, :], sel_f,
                        preferred_element_type=jnp.float32,
                    )
                else:
                    acc_re = acc_re + jnp.dot(
                        m, jnp.where(sel, vr[:, None], 0.0),
                        preferred_element_type=jnp.float32,
                    )
                    acc_im = acc_im + jnp.dot(
                        m, jnp.where(sel, vi[:, None], 0.0),
                        preferred_element_type=jnp.float32,
                    )
        return chunk + _ALIGN, acc_re, acc_im

    chunk0 = (s // _ALIGN) * _ALIGN
    _, acc_re, acc_im = jax.lax.while_loop(
        lambda carry: carry[0] < e, body, (chunk0, acc_re, acc_im)
    )
    # bins ARE the output rows (bin width == lane width): no reshape
    out_re_ref[...] = acc_re
    out_im_ref[...] = acc_im


@partial(jax.jit, static_argnames=("nfft", "interpret", "value_on_m",
                                   "split_values"))
def extirpolate_grid_factored(ilo, u_re, u_im, lag, nfft, interpret=False,
                              value_on_m=False, split_values=True):
    """Spread u * lag[:, j] at sorted bases ilo [N]: the factored form the
    trig-sum pipelines produce (u = complex weights x phase rotation, lag =
    [N, taps] Lagrange weights; taps static from the shape). Returns
    (grid_re, grid_im) [nfft] f32.

    ``value_on_m`` selects the candidate inner form that carries sample
    values on the small bin-match matrix instead of the lane selector
    (identical results; an on-device A/B knob, default = the measured
    production form).

    ``split_values=False`` drops the f32-tail dot of the bf16 head+tail
    value split: HALF the MXU work per (tap, plane) at ~4e-3 relative
    grid error (the TPU matmul's bf16 input truncation) — the VERDICT r4
    directive-4 precision/throughput experiment knob. Default keeps the
    exact two-dot split (~1.6e-5 relative error)."""
    taps = lag.shape[1]
    # adapt the superblock height to small grids (e.g. the f32 half-size
    # 2f grid); nfft and _LANES are powers of two, so rows always divides
    rows = max(1, min(_ROWS, nfft // _LANES))
    block = rows * _LANES
    assert nfft % block == 0, (nfft, block)
    n_blocks = nfft // block
    ilo = jnp.asarray(ilo, jnp.int32)
    base_ids = jnp.arange(n_blocks, dtype=jnp.int32) * block
    starts = jnp.searchsorted(
        ilo, base_ids - (taps - 1), side="left"
    ).astype(jnp.int32)
    ends = jnp.searchsorted(ilo, base_ids + block, side="left").astype(jnp.int32)

    pad = _ALIGN + (-ilo.shape[0]) % _ALIGN
    zpad = jnp.zeros(pad, jnp.float32)
    ilo_p = jnp.concatenate([ilo, jnp.full(pad, nfft + 8, jnp.int32)])
    ure_p = jnp.concatenate([jnp.asarray(u_re, jnp.float32), zpad])
    uim_p = jnp.concatenate([jnp.asarray(u_im, jnp.float32), zpad])
    lags = [
        jnp.concatenate([jnp.asarray(lag[:, j], jnp.float32), zpad])
        for j in range(taps)
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + taps),
        out_specs=[
            pl.BlockSpec((rows, _LANES), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_re, out_im = pl.pallas_call(
        partial(_kernel, taps=taps, rows=rows, value_on_m=value_on_m,
                split_values=split_values),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nfft // _LANES, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((nfft // _LANES, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(starts, ends, ilo_p, ure_p, uim_p, *lags)
    return out_re.reshape(nfft), out_im.reshape(nfft)
