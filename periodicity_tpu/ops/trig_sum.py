"""Press-Rybicki fast trig sums on TPU.

Computes, for a uniform frequency grid f_j = fmin + j*df (j < nf):

    S_j = sum_i w_i sin(2 pi f_j t_i)
    C_j = sum_i w_i cos(2 pi f_j t_i)

in O(N + nfft log nfft) by Lagrange "extirpolation" of the samples onto a
power-of-two grid followed by a single complex IFFT (Press & Rybicki 1989).
TPU-native redesign of the reference's numpy implementation
(reference: spectral.py:11-40): the ``np.add.at`` scatter loops become one
batched XLA scatter-add with sorted-index hints, the FFT is the XLA TPU FFT,
and the whole kernel jits/vmaps (bootstrap replicates, batched light curves)
and shards (frequency-band splits across chips).

Precision: positions on the oversampled grid are computed with a Dekker
two-product compensation so the fractional extirpolation offsets stay
accurate in float32 (TPU-native dtype) for N up to ~1e7-sample baselines;
in float64 the compensation is exact noise-level.

Kernel variants (measured rulings in docs/performance.md):
- ``trig_sum``: single series; two f32 plane scatters of 4N taps + 1 FFT.
- ``trig_sum_pair``: two real-weight sums at the same half-bin grid from
  ONE complex pipeline via conjugate symmetry (fmin = q*df/2).
- ``trig_sum_batch``: B series sharing a time grid; one N-index row
  scatter with (taps x re/im x batch)-packed rows (scatter cost on TPU is
  index-count-bound, not payload-bound).
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["trig_sum", "trig_sum_batch", "trig_sum_batch_pair", "trig_sum_pair", "grid_size"]


def grid_size(nf, n=5):
    """Power-of-two extirpolation grid size (reference spectral.py:18)."""
    return 1 << int(nf * n - 1).bit_length()


def _two_prod(a, b):
    """Dekker two-product: a*b = p + err exactly (assuming no fma fusion)."""
    p = a * b
    # split constant: 2^ceil(mantissa/2)+1
    shift = 4097.0 if a.dtype == jnp.float32 else 134217729.0
    ac = a * shift
    ah = ac - (ac - a)
    al = a - ah
    bc = b * shift
    bh = bc - (bc - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _phase_factor(a, b, dtype, cdtype):
    """exp(2*pi*i * a * b) with the product reduced mod 1 in compensated
    arithmetic. In float32 a plain ``exp(2j*pi*(a*b))`` loses
    ``eps * |a*b|`` CYCLES of phase (tmin * fmax easily reaches 1e3-1e6
    cycles, i.e. 1e-4..1e-1 rad of error feeding straight into the
    periodogram); the Dekker two-product recovers the rounding term and
    fmod is exact, so the reduced phase is accurate to ~1e-7 rad
    regardless of magnitude. ``a`` scalar, ``b`` scalar or array (values
    exactly representable products, e.g. fmin, df*j, trel)."""
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    p, e = _two_prod(a, b)
    frac = (p % 1.0) + e
    ang = (2 * jnp.pi) * frac
    return jax.lax.complex(jnp.cos(ang), jnp.sin(ang)).astype(cdtype)


def _grid_rotation(tmin, df, fmin, nf, dtype, cdtype):
    """Post-rotation exp(2*pi*i * tmin * (fmin + df*j)) for j < nf with
    compensated mod-1 phase: tmin*fmin and (tmin*df)*j each go through
    the two-product reduction, so the f32 fast path keeps rotation phases
    accurate over arbitrarily long baselines/grids."""
    j = jnp.arange(nf, dtype=dtype)
    tmin = jnp.asarray(tmin, dtype)
    h1, l1 = _two_prod(tmin, jnp.asarray(fmin, dtype))
    h2, l2 = _two_prod(tmin, jnp.asarray(df, dtype))
    p, e = _two_prod(h2, j)
    frac = (p % 1.0) + ((h1 % 1.0) + (e + (l1 + l2 * j)))
    ang = (2 * jnp.pi) * frac
    return jax.lax.complex(jnp.cos(ang), jnp.sin(ang)).astype(cdtype)


def _extirpolate_weights(trel, df, nfft, dtype, taps=4):
    """Positions + ``taps``-point Lagrange weights for scattering samples
    onto the oversampled grid. Returns (inds [N,taps], lagrange [N,taps]).

    The reference uses 4 taps (spectral.py:23-25); higher orders shrink
    the extirpolation truncation error as ~(nf/nfft)^taps — at the default
    oversample ~8.4 going 4 -> 8 taps cuts the float64 fast-path power
    error ~30x (1e-4 -> 3.4e-6 measured) at 2x the scatter index count.
    """
    from math import factorial

    scale = jnp.asarray(df, dtype) * nfft
    tnorm, terr = _two_prod(trel, scale)
    tnorm = (tnorm % nfft) + terr
    half = taps // 2
    ilo = jnp.clip(
        jnp.floor(tnorm - (half - 1) - 1.0).astype(jnp.int32), 0, nfft - taps
    )
    frac = tnorm - ilo
    offs = jnp.arange(taps, dtype=dtype)
    d = frac[:, None] - offs[None, :]
    prod_all = jnp.prod(d, axis=1)
    denom = jnp.asarray(
        [
            ((-1.0) ** (taps - 1 - j)) * factorial(j) * factorial(taps - 1 - j)
            for j in range(taps)
        ],
        dtype,
    )
    safe_d = jnp.where(jnp.abs(d) < 1e-12, 1.0, d)
    lagrange = prod_all[:, None] / (denom[None, :] * safe_d)
    is_int = jnp.abs(d) < 1e-12
    lagrange = jnp.where(
        jnp.any(is_int, axis=1, keepdims=True), is_int.astype(dtype), lagrange
    )
    inds = (ilo[:, None] + jnp.arange(taps)[None, :]) % nfft
    return inds, lagrange


def _grid_planes(u, inds, lag, nfft, gridder):
    """Complex extirpolation grid build: scatter (default) or the Pallas
    one-hot MXU kernel (ops.pallas_grid2; requires time-sorted samples on
    a non-wrapping grid — true for every df*baseline < 1 grid, e.g. all
    default GLS grids — and measured 6.2 ms vs 10.7 ms for the scatter at
    N=1e5, nfft=2^23 on v5e)."""
    # the Pallas kernel computes in float32 (split-bf16 MXU accumulation);
    # float64 pipelines keep the exact scatter so gridder="pallas" can
    # never silently demote an x64 computation
    if (gridder == "pallas" and nfft >= 512
            and u.real.dtype == jnp.float32):
        from .pallas_grid2 import extirpolate_grid_factored

        interpret = jax.default_backend() == "cpu"
        return extirpolate_grid_factored(
            inds[:, 0].astype(jnp.int32), u.real, u.imag, lag, nfft,
            interpret=interpret,
        )
    dtype = u.real.dtype
    vals = (u[:, None] * lag.astype(u.dtype)).reshape(-1)
    flat = inds.reshape(-1)
    grid_re = jnp.zeros(nfft, dtype).at[flat].add(vals.real)
    grid_im = jnp.zeros(nfft, dtype).at[flat].add(vals.imag)
    return grid_re, grid_im


@partial(jax.jit, static_argnames=("nf", "nfft", "q", "gridder", "taps"))
def trig_sum_pair(t, w1, w2, df, nf, fmin, nfft=None, n=5, q=1,
                  gridder="scatter", taps=4):
    """Two trig sums over REAL weights at the same grid from ONE
    extirpolation + FFT.

    When ``2*fmin/df`` is an integer ``q`` (the GLS default grid has
    fmin = df/2, i.e. q = 1), the extirpolated spectrum of real weights is
    conjugate-symmetric about the wrap: G[nfft - k - q] = conj(G[k]). The
    classic two-real-FFTs-in-one trick therefore applies to the *complex
    packed* weights u = w1 + i*w2:

        G1[k] = (G[k] + conj(G[nfft - k - q])) / 2
        G2[k] = (G[k] - conj(G[nfft - k - q])) / (2i)

    This halves the scatter+FFT work of the (wy, w) pair a floating-mean
    GLS needs at (df, fmin) — one of the three Press-Rybicki pipelines per
    periodogram (reference spectral.py:109-112) disappears. The backward
    branch evaluates harmonic k+q instead of k, so the extirpolation error
    differs at its own (documented, ~1e-3 f32 power) level — same order,
    not bit-identical to two separate sums.

    Returns (S1, C1, S2, C2), each [nf].
    """
    if nfft is None:
        nfft = grid_size(nf, n)
    if not 1 <= q <= nfft - nf:
        raise ValueError(
            f"pairing needs 1 <= q <= nfft - nf (q={q}, nf={nf}, "
            f"nfft={nfft}); use the unpaired kernels"
        )
    t = jnp.asarray(t)
    w1 = jnp.asarray(w1)
    w2 = jnp.asarray(w2)
    dtype = jnp.result_type(t.dtype, w1.dtype, w2.dtype, jnp.float32)
    cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
    t = t.astype(dtype)
    tmin = jnp.min(t)
    trel = t - tmin
    rot = _phase_factor(fmin, trel, dtype, cdtype)
    u = (w1.astype(dtype) + 1j * w2.astype(dtype)).astype(cdtype) * rot
    inds, lag = _extirpolate_weights(trel, df, nfft, dtype, taps=taps)
    grid_re, grid_im = _grid_planes(u, inds, lag, nfft, gridder)
    G = nfft * jnp.fft.ifft(jax.lax.complex(grid_re, grid_im))
    # indices nfft - k - q for k in [0, nf) form a contiguous descending
    # range (q >= 1 keeps it in bounds): a static slice + flip, not a
    # mod-indexed gather (reversed gathers of the full grid are slow on TPU)
    back = jnp.flip(jnp.conj(G[nfft - q - nf + 1 : nfft - q + 1]))
    G1 = 0.5 * (G[:nf] + back)
    G2 = -0.5j * (G[:nf] - back)
    post = _grid_rotation(tmin, df, fmin, nf, dtype, cdtype)
    G1 = G1 * post
    G2 = G2 * post
    return G1.imag, G1.real, G2.imag, G2.real


def _batch_row_grid(u_rows, trel, df, nfft, dtype, taps=4):
    """Shared batched grid build: ONE row-scatter of N indices with
    (tap x re/im x batch)-packed rows + shifted-slice tap recombination.

    PRECONDITION (the ``indices_are_sorted`` hint): time-sorted samples on
    a non-wrapping grid (df * baseline < 1) — guaranteed by the GLS
    estimator surface; see trig_sum_batch's docstring for direct callers.
    Returns (gre [B, nfft], gim [B, nfft])."""
    b = u_rows.shape[0]
    inds, lag = _extirpolate_weights(trel, df, nfft, dtype, taps=taps)
    ilo = inds[:, 0].astype(jnp.int32)
    ur = u_rows.real
    ui = u_rows.imag
    rows = jnp.concatenate(
        [
            jnp.concatenate(
                [lag[:, j:j + 1] * ur.T, lag[:, j:j + 1] * ui.T], axis=1
            )
            for j in range(taps)
        ],
        axis=1,
    )  # [N, taps * 2B]
    grid = jnp.zeros((nfft + taps, 2 * taps * b), dtype).at[ilo].add(
        rows, indices_are_sorted=True, unique_indices=False
    )
    total = grid[0:nfft, 0:2 * b]
    for j in range(1, taps):
        block = grid[:, 2 * b * j: 2 * b * (j + 1)]
        total = total + jnp.concatenate(
            [jnp.zeros((j, 2 * b), dtype), block[: nfft - j]], axis=0
        )
    return total[:, :b].T, total[:, b:].T


@partial(jax.jit, static_argnames=("nf", "nfft", "q", "taps"))
def trig_sum_batch_pair(t, w1_rows, w2_rows, df, nf, fmin, nfft=None, n=5,
                        q=1, taps=4):
    """Batched conjugate-symmetry pairing: the (w1, w2) sums for B curves
    at the same half-bin grid (fmin = q*df/2) from ONE row-scatter + ONE
    batched FFT. Combines the trig_sum_batch row packing with the
    trig_sum_pair separation. Returns (S1, C1, S2, C2), each [B, nf]."""
    if nfft is None:
        nfft = grid_size(nf, n)
    t = jnp.asarray(t)
    w1_rows = jnp.asarray(w1_rows)
    w2_rows = jnp.asarray(w2_rows)
    dtype = jnp.result_type(t.dtype, w1_rows.dtype, w2_rows.dtype,
                            jnp.float32)
    cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
    t = t.astype(dtype)
    tmin = jnp.min(t)
    trel = t - tmin
    rot = _phase_factor(fmin, trel, dtype, cdtype)
    u = (w1_rows.astype(dtype) + 1j * w2_rows.astype(dtype)) * rot[None, :]
    gre, gim = _batch_row_grid(u, trel, df, nfft, dtype, taps=taps)
    G = nfft * jnp.fft.ifft(jax.lax.complex(gre, gim), axis=-1)  # [B, nfft]
    back = jnp.flip(
        jnp.conj(G[:, nfft - q - nf + 1 : nfft - q + 1]), axis=-1
    )
    G1 = 0.5 * (G[:, :nf] + back)
    G2 = -0.5j * (G[:, :nf] - back)
    post = _grid_rotation(tmin, df, fmin, nf, dtype, cdtype)[None, :]
    G1 = G1 * post
    G2 = G2 * post
    return G1.imag, G1.real, G2.imag, G2.real


@partial(jax.jit, static_argnames=("nf", "nfft", "taps"))
def trig_sum_batch(t, w_rows, df, nf, fmin, nfft=None, n=5, taps=4):
    """Fast trig sums for B weight rows sharing one time grid.

    The extirpolation scatter on TPU is bound by the *number of scatter
    indices*, not the payload width (measured: N indices x 64-float rows
    take 5.5 ms where 4N x 16-float take 25 ms at N=1e5, nfft=2^19). So the
    batched kernel issues ONE row-scatter of N sorted indices whose rows
    pack (tap j) x (re, im) x (batch) = [4 * 2B] floats, then combines the
    tap blocks with static shifted slices on a (+4)-padded grid and runs
    one batched inverse FFT. Measured 4.8x the aggregate throughput of
    sequentially mapping the single-series kernel at B=8 (N=1e5, nf=1e5 on
    TPU v5e) — the SURVEY §2.2 batch-axis speedup the reference gets from
    multiprocessing.Pool (reference spectral.py:140-152 reenters the whole
    periodogram per bootstrap replicate).

    Parameters
    ----------
    t: [N] shared sample times — must be TIME-SORTED and the grid
       non-wrapping (df * baseline < 1, true for every default GLS grid):
       the row scatter passes ``indices_are_sorted``, whose violation is
       implementation-defined on TPU. The GLS estimator surface
       guarantees both (TSeries sorts; default grids have
       df * baseline = 1/n).
    w_rows: [B, N] weight rows (real).
    df, fmin: uniform grid spec; nf static; nfft static power of two.

    Returns (S [B, nf], C [B, nf]).
    """
    if nfft is None:
        nfft = grid_size(nf, n)
    t = jnp.asarray(t)
    w_rows = jnp.asarray(w_rows)
    dtype = jnp.result_type(t.dtype, w_rows.dtype, jnp.float32)
    cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
    t = t.astype(dtype)
    w_rows = w_rows.astype(dtype)
    tmin = jnp.min(t)
    trel = t - tmin
    rot = _phase_factor(fmin, trel, dtype, cdtype)
    u = w_rows.astype(cdtype) * rot[None, :]
    gre, gim = _batch_row_grid(u, trel, df, nfft, dtype, taps=taps)
    fftgrid = jnp.fft.ifft(jax.lax.complex(gre, gim), axis=-1)[:, :nf]
    fftgrid = fftgrid * _grid_rotation(tmin, df, fmin, nf, dtype, cdtype)[None, :]
    return nfft * fftgrid.imag, nfft * fftgrid.real


@partial(jax.jit, static_argnames=("nf", "nfft", "gridder", "taps"))
def trig_sum(t, w, df, nf, fmin, nfft=None, n=5, gridder="scatter", taps=4):
    """Fast trig sums; returns (S[nf], C[nf]).

    Parameters
    ----------
    t: [N] sample times (any order for the scatter gridder; the
       ``gridder="pallas"`` path requires TIME-SORTED samples on a
       non-wrapping grid — df * baseline < 1 — or results are silently
       wrong; the GLS estimator guards both).
    w: [N] weights (real).
    df, fmin: uniform grid spec (scalars).
    nf: static number of frequencies.
    nfft: static FFT size; defaults to next_pow2(nf*n - 1).
    """
    if nfft is None:
        nfft = grid_size(nf, n)
    t = jnp.asarray(t)
    w = jnp.asarray(w)
    dtype = jnp.result_type(t.dtype, w.dtype, jnp.float32)
    cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
    t = t.astype(dtype)
    w = w.astype(dtype)
    tmin = jnp.min(t)
    trel = t - tmin
    wc = w.astype(cdtype) * _phase_factor(fmin, trel, dtype, cdtype)
    inds, lagrange = _extirpolate_weights(trel, df, nfft, dtype, taps=taps)
    # the real/imag planes are gridded separately and the complex grid
    # formed just before the FFT: a complex64 scatter feeding an FFT
    # forces a hostile TPU layout and runs ~11x slower (measured, see
    # docs/performance.md)
    grid_re, grid_im = _grid_planes(wc, inds, lagrange, nfft, gridder)
    fftgrid = jnp.fft.ifft(jax.lax.complex(grid_re, grid_im))[:nf]
    fftgrid = fftgrid * _grid_rotation(tmin, df, fmin, nf, dtype, cdtype)
    C = nfft * fftgrid.real
    S = nfft * fftgrid.imag
    return S, C
