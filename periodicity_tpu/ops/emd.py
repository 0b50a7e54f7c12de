"""Jitted EMD sifting kernels.

TPU-native redesign of the reference's EMD inner loops (reference:
decomposition.py:45-91). The reference sift calls scipy find_peaks +
FITPACK splines per iteration and uses ValueError-as-control-flow for
monotonic residues; here the entire sifting iteration runs inside
``lax.while_loop`` with:

- plateau-aware extrema masks (ops.peaks) instead of index lists;
- fixed-capacity extrema buffers (``jnp.nonzero(..., size=K)``) with dynamic
  counts, so shapes stay static under jit/vmap;
- odd-reflection extrema padding (reference core.py:726-739 pad +
  decomposition.py:55-60 drop) expressed as branch-free index arithmetic;
- masked not-a-knot spline envelopes (ops.spline) — Thomas-scan tridiagonal
  solves;
- the "monotonic" ValueError becomes a carried boolean (SURVEY §5.3).

Everything vmaps over a leading ensemble axis, which is how CEEMDAN's
noise-realization fan-out (reference decomposition.py:277,304, a
multiprocessing.Pool) becomes a single batched device computation.
"""

from functools import partial

import jax
import jax.numpy as jnp

from . import peaks as _peaks
from . import spline as _spline

__all__ = ["sift", "emd_iter", "emd_batch", "upper_envelope", "EMDConfig"]


def _compact_with_edges(t, x, mask, cap):
    """Extrema sequence [x0, interior..., x_{N-1}] in capacity buffers.

    Returns (et [cap+2], ev [cap+2], m) with m = interior_count + 2; pad
    slots strictly increasing in time.
    """
    n = t.shape[0]
    idx = jnp.nonzero(mask, size=cap, fill_value=n)[0]
    m_int = jnp.sum(idx < n)
    m = m_int + 2
    slots = jnp.arange(cap + 2)
    gi = jnp.clip(idx[jnp.clip(slots - 1, 0, cap - 1)], 0, n - 1)
    fdt = (t[-1] - t[0]) / n + 1.0
    filler_t = t[-1] + (slots - (m - 1)) * fdt
    et = jnp.where(
        slots == 0,
        t[0],
        jnp.where(
            slots <= m_int,
            t[gi],
            jnp.where(slots == m - 1, t[-1], filler_t),
        ),
    )
    ev = jnp.where(
        slots == 0,
        x[0],
        jnp.where(
            slots <= m_int,
            x[gi],
            jnp.where(slots == m - 1, x[-1], 0.0),
        ),
    )
    return et, ev, m


def _pad_reflect_drop(et, ev, m, pad_width):
    """Odd-reflect pad by pad_width extrema on each side, dropping the
    original edge samples (reference decomposition.py:55-60).

    Input buffers [C0]; output buffers [C0 + 2*pad_width] with
    count = m + 2*pad_width - 2 and strictly-increasing padded times.
    """
    c0 = et.shape[0]
    w = pad_width
    c = c0 + 2 * w
    i = jnp.arange(c)
    count = m + 2 * w - 2
    t0 = et[0]
    tl = et[jnp.clip(m - 1, 0, c0 - 1)]

    # left section: src = w - i, odd-reflected times, even values
    src_left = jnp.clip(w - i, 0, c0 - 1)
    # middle: src = i - w + 1
    src_mid = jnp.clip(i - w + 1, 0, c0 - 1)
    # right: src = (m - 2) - (i - (m + w - 2))
    src_right = jnp.clip(2 * m + w - 4 - i, 0, c0 - 1)

    in_left = i < w
    in_mid = (i >= w) & (i < m + w - 2)
    in_right = (i >= m + w - 2) & (i < count)

    out_t = jnp.where(
        in_left,
        2 * t0 - et[src_left],
        jnp.where(in_mid, et[src_mid], 2 * tl - et[src_right]),
    )
    out_v = jnp.where(
        in_left,
        ev[src_left],
        jnp.where(in_mid, ev[src_mid], ev[src_right]),
    )
    # strictly increasing fillers past the valid range
    fdt = (tl - t0) + 1.0
    last_valid_t = 2 * tl - et[jnp.clip(m - 1 - w, 0, c0 - 1)]
    filler = last_valid_t + (i - (count - 1)) * (fdt / c + 1e-3)
    out_t = jnp.where(in_left | in_mid | in_right, out_t, filler)
    out_v = jnp.where(in_left | in_mid | in_right, out_v, 0.0)
    return out_t, out_v, count


class EMDConfig:
    """Static sifting configuration (reference decomposition.py:13-15)."""

    def __init__(self, max_iter=2000, pad_width=2, theta_1=0.05, theta_2=0.50,
                 alpha=0.05):
        self.max_iter = max_iter
        self.pad_width = pad_width
        self.theta_1 = theta_1
        self.theta_2 = theta_2
        self.alpha = alpha


@partial(jax.jit, static_argnames=("pad_width",))
def sift(t, x, pad_width=2):
    """One sifting evaluation (reference decomposition.py:45-70).

    Returns (mu [N], sigma [N], n_ext, n_zero, ok). ``ok`` is False where
    the reference raises ValueError (not enough extrema).
    """
    n = t.shape[0]
    cap = n // 2 + 2
    neg = -x
    peak_mask = _peaks.local_maxima_mask(x)
    dip_mask = _peaks.local_maxima_mask(neg)
    n_peaks = jnp.sum(peak_mask)
    n_dips = jnp.sum(dip_mask)
    n_ext = n_peaks + n_dips
    n_zero = jnp.sum(_peaks.zero_crossings_mask(x))

    pt, pv, pm = _compact_with_edges(t, x, peak_mask, cap)
    dt_, dv, dm = _compact_with_edges(t, neg, dip_mask, cap)
    dv = -dv

    ppt, ppv, pcount = _pad_reflect_drop(pt, pv, pm, pad_width)
    dpt, dpv, dcount = _pad_reflect_drop(dt_, dv, dm, pad_width)

    ok = (n_peaks >= pad_width) & (n_dips >= pad_width)
    ok = ok & (pcount >= 4) & (dcount >= 4)
    # guard the solves against degenerate knot sets
    pc_s = jnp.maximum(pcount, 4)
    dc_s = jnp.maximum(dcount, 4)
    # The padded knot vector is [pad_width reflections < t[0]] + [interior
    # extrema] + [reflections > t[-1]] (the original edge samples are
    # DROPPED, reference decomposition.py:55-60), and every query is a
    # sample of t itself — so searchsorted(knots, t[i], "right") is just
    # pad_width + #{interior extrema at positions <= i}: one cumsum of the
    # extrema mask instead of an O(N*K) comparison-sum per envelope (the
    # dominant batch-proportional cost of the sift loop).
    hi_up = pad_width + jnp.cumsum(peak_mask.astype(jnp.int32))
    hi_lo = pad_width + jnp.cumsum(dip_mask.astype(jnp.int32))
    upper = _spline.spline_interp(ppt, ppv, t, count=pc_s, hi=hi_up)
    lower = _spline.spline_interp(dpt, dpv, t, count=dc_s, hi=hi_lo)
    mu = (upper + lower) / 2
    amp = (upper - lower) / 2
    sigma = jnp.abs(mu / amp)
    return mu, sigma, n_ext, n_zero, ok


@partial(jax.jit, static_argnames=("pad_width",))
def upper_envelope(t, x, pad_width=2):
    """Cubic-spline envelope through the local maxima of ``x`` (edges
    included as knots, odd-reflection padded by ``pad_width`` extrema).

    The jitted building block for HHT amplitude normalization (reference
    timefrequency.py:79 uses get_envelope of ``abs(F)``); vmaps over a
    leading mode axis.

    Where the reference raises ValueError for signals without enough
    extrema to pad (core.py:741-774), this branch-free kernel falls back
    to the constant max|x| envelope: raising is impossible under
    jit/vmap, and the degenerate knot set would otherwise divide by zero
    and silently poison the whole HHT pipeline with NaNs.
    """
    n = t.shape[0]
    cap = n // 2 + 2
    mask = _peaks.local_maxima_mask(x)
    n_interior = jnp.sum(mask)
    et, ev, m = _compact_with_edges(t, x, mask, cap)
    pt, pv, cnt = _pad_reflect_drop(et, ev, m, pad_width)
    # cumsum interval index — same layout argument as in sift() above
    hi = pad_width + jnp.cumsum(mask.astype(jnp.int32))
    env = _spline.spline_interp(pt, pv, t, count=jnp.maximum(cnt, 4), hi=hi)
    ok = (n_interior >= jnp.maximum(pad_width, 1)) & (cnt >= 4)
    fallback = jnp.full_like(env, jnp.max(jnp.abs(x)))
    return jnp.where(ok, env, fallback)


def _emd_iter_counted(t, x, max_iter=2000, pad_width=2, theta_1=0.05,
                      theta_2=0.50, alpha=0.05):
    """emd_iter plus the number of sift evaluations consumed."""
    t = jnp.asarray(t)
    x = jnp.asarray(x)

    def cond(carry):
        mode, it, finished, mono = carry
        return (~finished) & (it < max_iter)

    def body(carry):
        mode, it, finished, mono = carry
        mu, sigma, n_ext, n_zero, ok = sift(t, mode, pad_width=pad_width)
        is_imf = jnp.mean((sigma > theta_1).astype(mode.dtype)) < alpha
        is_imf = is_imf & jnp.all(sigma < theta_2)
        is_imf = is_imf & (jnp.abs(n_zero - n_ext) <= 1)
        new_mode = jnp.where(ok & ~is_imf, mode - mu, mode)
        finished = (~ok) | is_imf
        mono = ~ok
        return (new_mode, it + 1, finished, mono)

    init = (x, jnp.asarray(0), jnp.asarray(False), jnp.asarray(False))
    mode, it, _, mono = jax.lax.while_loop(cond, body, init)
    if x.shape[0] < 4:
        mono = jnp.asarray(True)
    return (mode, mono), it


@partial(jax.jit, static_argnames=("max_iter", "pad_width"))
def emd_iter(t, x, max_iter=2000, pad_width=2, theta_1=0.05, theta_2=0.50,
             alpha=0.05):
    """Extract one IMF by iterated sifting (reference decomposition.py:72-91).

    Returns (mode [N], is_monotonic). The monotonic flag mirrors the
    reference's ValueError path: the signal ran out of extrema.
    """
    (mode, mono), _ = _emd_iter_counted(
        t, x, max_iter=max_iter, pad_width=pad_width,
        theta_1=theta_1, theta_2=theta_2, alpha=alpha,
    )
    return mode, mono


@partial(jax.jit, static_argnames=("max_modes", "max_iter", "pad_width",
                                   "return_units"))
def emd_batch(t, Y, max_modes=8, max_iter=2000, pad_width=2, theta_1=0.05,
              theta_2=0.50, alpha=0.05, return_units=False):
    """Full EMD of a BATCH of series sharing one time grid.

    The estimator-level batch axis the strictly single-series reference
    lacks (SURVEY §2.2 row (a)): every batch member's outer mode-extraction
    loop advances in lock-step as one ``lax.scan`` over ``max_modes`` fixed
    mode slots, with per-member done masks where the reference would exit
    its Python while-loop (reference decomposition.py:93-117).

    t [N], Y [B, N] -> (modes [B, max_modes, N], residue [B, N],
    n_modes [B]). Mode slots past a member's own count are zero; the
    decomposition of each member matches sequential ``EMD()(y_b)`` exactly.

    ``return_units=True`` appends a 4th output ``sift_units [B]`` — the
    number of sift evaluations each member consumed — the work unit for
    throughput/roofline accounting (each sift is a fixed-cost pass:
    extrema masks, two capacity-K spline solves, an N-point evaluation).
    """
    t = jnp.asarray(t)
    Y = jnp.asarray(Y)

    def one(y):
        def step(carry, _):
            residue, done = carry
            (mode, mono), its = _emd_iter_counted(
                t, residue, max_iter=max_iter, pad_width=pad_width,
                theta_1=theta_1, theta_2=theta_2, alpha=alpha,
            )
            take = (~done) & (~mono)
            out = jnp.where(take, mode, jnp.zeros_like(mode))
            residue = jnp.where(take, residue - mode, residue)
            units = jnp.where(done, 0, its)
            return (residue, done | mono), (out, take, units)

        init_done = jnp.asarray(y.shape[-1] < 4)
        (residue, _), (modes, takes, units) = jax.lax.scan(
            step, (y, init_done), None, length=max_modes
        )
        return modes, residue, jnp.sum(takes), jnp.sum(units)

    modes, residue, n_modes, units = jax.vmap(one)(Y)
    if return_units:
        return modes, residue, n_modes, units
    return modes, residue, n_modes
