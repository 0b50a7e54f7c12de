"""Pallas TPU kernel for extirpolation gridding (NUFFT type-1 spreading).

The Press-Rybicki hot loop scatters N samples x 4 Lagrange taps onto an
nfft-point grid (reference spectral.py:24,33 uses np.add.at; the XLA
lowering is a serialized scatter). This kernel exploits that the target
indices are *sorted* (time-sorted samples -> monotone grid positions):

- the grid is processed in tiles of TILE positions (one grid program per
  tile, output block [1, TILE] in VMEM);
- the contiguous range of points touching each tile is precomputed with two
  searchsorted calls and passed via scalar prefetch
  (PrefetchScalarGridSpec), so each program reads only its own points;
- within a tile, point contributions accumulate via one-hot matmuls
  ([1, CAP] @ [CAP, TILE] on the MXU) over fixed-size chunks inside a
  lax.while_loop — no scatter instruction anywhere.

Complex values are handled as separate real/imaginary planes.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["extirpolate_grid"]


_ALIGN = 1024  # Mosaic 1-D dynamic-load alignment (8 sublanes x 128 lanes)


def _kernel(starts_ref, ends_ref, ilo_ref, vre_ref, vim_ref,
            out_re_ref, out_im_ref, *, tile, cap):
    b = pl.program_id(0)
    s = starts_ref[b]
    e = ends_ref[b]
    base_pos = b * tile
    iota = jax.lax.broadcasted_iota(jnp.int32, (cap, tile), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
    n_sub = _ALIGN // cap

    out_re_ref[...] = jnp.zeros((1, tile), jnp.float32)
    out_im_ref[...] = jnp.zeros((1, tile), jnp.float32)

    def body(chunk):
        # aligned window load (point arrays are padded by >= _ALIGN)
        chunk = pl.multiple_of(chunk, _ALIGN)
        ilo_w = ilo_ref[pl.ds(chunk, _ALIGN)]
        vre_w = vre_ref[:, pl.ds(chunk, _ALIGN)]
        vim_w = vim_ref[:, pl.ds(chunk, _ALIGN)]

        for k in range(n_sub):  # static unroll; predicated per subchunk
            lo = k * cap

            @pl.when((chunk + lo < e) & (chunk + lo + cap > s))
            def _(lo=lo):
                ilo_c = ilo_w[lo : lo + cap]
                vre_c = vre_w[:, lo : lo + cap]
                vim_c = vim_w[:, lo : lo + cap]
                gidx = chunk + lo + sub_iota
                valid = (gidx >= s) & (gidx < e)
                off = ilo_c - base_pos  # in [-3, tile) when relevant
                acc_re = jnp.zeros((1, tile), jnp.float32)
                acc_im = jnp.zeros((1, tile), jnp.float32)
                for j in range(4):
                    onehot = (
                        (iota == (off[:, None] + j)) & valid[:, None]
                    ).astype(jnp.float32)
                    acc_re = acc_re + jnp.dot(
                        vre_c[j][None, :], onehot,
                        preferred_element_type=jnp.float32,
                    )
                    acc_im = acc_im + jnp.dot(
                        vim_c[j][None, :], onehot,
                        preferred_element_type=jnp.float32,
                    )
                out_re_ref[...] += acc_re
                out_im_ref[...] += acc_im

        return chunk + _ALIGN

    chunk0 = (s // _ALIGN) * _ALIGN
    jax.lax.while_loop(lambda c: c < e, body, chunk0)


@partial(jax.jit, static_argnames=("nfft", "tile", "cap", "interpret", "as_complex"))
def extirpolate_grid(ilo, vals, nfft, tile=512, cap=32, interpret=False,
                     as_complex=True):
    """Spread vals [N, 4] (complex) at bases ilo [N] (sorted int32) onto a
    complex grid of length nfft: grid[ilo[p] + j] += vals[p, j].

    Equivalent to the XLA scatter in ops.trig_sum but scatter-free.
    """
    assert nfft % tile == 0
    n_tiles = nfft // tile
    ilo = jnp.asarray(ilo, jnp.int32)
    # [4, N] layout: a tiny trailing dim of 4 would tile-pad to 128 lanes in
    # VMEM (32x memory blow-up); rows-of-taps keeps the lane dim long
    vre = jnp.real(vals).astype(jnp.float32).T
    vim = jnp.imag(vals).astype(jnp.float32).T
    tile_starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    starts = jnp.searchsorted(ilo, tile_starts - 3, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(ilo, tile_starts + tile, side="left").astype(jnp.int32)
    # sentinel-pad to an _ALIGN boundary + one window so aligned in-kernel
    # loads never clamp
    pad = _ALIGN + (-ilo.shape[0]) % _ALIGN
    ilo = jnp.concatenate([ilo, jnp.full(pad, nfft + 8, jnp.int32)])
    vre = jnp.concatenate([vre, jnp.zeros((4, pad), jnp.float32)], axis=1)
    vim = jnp.concatenate([vim, jnp.zeros((4, pad), jnp.float32)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda b, *_: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b, *_: (0, b), memory_space=pltpu.VMEM),
        ],
    )
    out_re, out_im = pl.pallas_call(
        partial(_kernel, tile=tile, cap=cap),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, nfft), jnp.float32),
            jax.ShapeDtypeStruct((1, nfft), jnp.float32),
        ],
        interpret=interpret,
    )(starts, ends, ilo, vre, vim)
    if not as_complex:
        return out_re.reshape(-1), out_im.reshape(-1)
    return (out_re.reshape(-1) + 1j * out_im.reshape(-1)).astype(jnp.complex64)
