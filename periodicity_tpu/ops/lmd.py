"""Jitted Local Mean Decomposition sifting kernels.

TPU-native redesign of the reference's LMD inner loops (reference:
decomposition.py:127-183). The reference sift builds zero-order-hold local
means/envelopes between consecutive extrema with pandas-style gap filling
and backward-fill, smooths them with a data-dependent triangle window, and
demodulates in a host loop. LMD is only defined for uniformly sampled
signals (the reference reads ``signal.dt``, which raises otherwise), and on
a uniform grid every step has an exact static-shape formulation:

- extrema (peaks + dips + both edges, reference decomposition.py:128-137)
  live in capacity buffers of integer *grid indices*; odd-reflection
  padding (``pad(mode="reflect", reflect_type="odd")`` + edge drop) is
  branch-free index arithmetic with odd-reflected values;
- the ``fill_gaps(method="bfill")`` ZOH fill (decomposition.py:139-144)
  restores exactly the underlying uniform grid, so it becomes one
  ``searchsorted`` of dense grid indices into the extrema-index buffer;
- the triangle smoothing with window = max extrema spacing / 3
  (decomposition.py:146-155) is a masked gather convolution: a
  static-capacity triangle kernel whose *effective* half-width is a traced
  value, with jnp.pad-'reflect' boundary indexing at the dynamic grid end,
  iterated in a ``lax.while_loop`` until no flat segments remain;
- demodulation (decomposition.py:165-183) is a ``lax.while_loop`` whose
  ValueError-as-control-flow (not enough extrema) becomes a carried
  ``monotonic`` boolean (SURVEY §5.3).

Everything vmaps over a leading mode/ensemble axis; ``am_fm_normalize``
in ops.hht uses ``lmd_sift`` as its 'lmd' envelope backend, which is what
makes ``hht_batch(norm_type="lmd")`` a single batched device computation.
"""

from functools import partial

import jax
import jax.numpy as jnp

from . import peaks as _peaks
from .spline import _interval_index

__all__ = ["lmd_sift", "lmd_iter"]


def _extrema_indices(x):
    """Indices of local extrema of ``x`` plus both edges, in a capacity-n
    int32 buffer (sentinel ``n`` past the count), with the count."""
    n = x.shape[0]
    mask = _peaks.local_maxima_mask(x) | _peaks.local_maxima_mask(-x)
    mask = mask.at[0].set(True).at[n - 1].set(True)
    idx = jnp.nonzero(mask, size=n, fill_value=n)[0].astype(jnp.int32)
    m = jnp.sum(idx < n).astype(jnp.int32)
    return idx, m


def _pad_reflect_drop_odd(idx, x, m, pad_width):
    """Odd-reflect the extrema sequence by ``pad_width`` entries per side
    and drop the original edge samples (reference decomposition.py:131-133:
    ``pad(mode="reflect", reflect_type="odd")`` applies the odd reflection
    to both times and values, then ``drop`` removes the edge knots).

    idx: [n] int32 extrema grid indices (ascending, sentinel n); x: [n]
    signal; m: extrema count. Returns (q [n+2w] int32 grid indices which
    may be negative or >= n, v [n+2w] values, count = m + 2w - 2).
    """
    n = x.shape[0]
    c0 = idx.shape[0]
    w = pad_width
    c = c0 + 2 * w
    i = jnp.arange(c, dtype=jnp.int32)
    count = m + 2 * w - 2
    def safe(s):
        return jnp.clip(s, 0, c0 - 1)

    def gi(s):
        return idx[safe(s)]

    def gv(s):
        return x[jnp.clip(idx[safe(s)], 0, n - 1)]

    p0 = gi(0)
    v0 = gv(0)
    plast = gi(m - 1)
    vlast = gv(m - 1)

    src_left = w - i
    src_mid = i - w + 1
    src_right = 2 * m + w - 4 - i
    in_left = i < w
    in_mid = (i >= w) & (i < m + w - 2)
    in_right = (i >= m + w - 2) & (i < count)

    q = jnp.where(
        in_left,
        2 * p0 - gi(src_left),
        jnp.where(in_mid, gi(src_mid), 2 * plast - gi(src_right)),
    )
    v = jnp.where(
        in_left,
        2 * v0 - gv(src_left),
        jnp.where(in_mid, gv(src_mid), 2 * vlast - gv(src_right)),
    )
    big = jnp.int32(3 * n + 1)
    q = jnp.where(i < count, q, big)
    v = jnp.where(i < count, v, 0.0)
    return q, v, count


def _zoh_dense(q, vals, count, ne):
    """Backward-fill the per-extremum values ``vals`` onto the dense
    integer grid spanned by the extrema indices ``q`` (the
    ``fill_gaps(method="bfill")`` + ``values[0] = values[1]`` construct of
    reference decomposition.py:139-144). Returns (dense [ne], m_dense)."""
    q0 = q[0]
    j = jnp.arange(ne, dtype=jnp.int32)
    i = q0 + j
    k = _interval_index(q, i, side="left")
    k = jnp.clip(k, 1, jnp.maximum(count - 1, 1))
    m_dense = q[jnp.clip(count - 1, 0, q.shape[0] - 1)] - q0 + 1
    return vals[k], m_dense


def _triangle_smooth_until_monotone(y, m_dense, half, smooth_iter, h_cap):
    """Repeat triangle smoothing (window = 2*half+1, jnp.pad-'reflect'
    boundary like filters.convolve1d(mode="mirror")) until the valid region
    has no zero first differences, at most ``smooth_iter`` times
    (reference decomposition.py:148-155)."""
    ne = y.shape[0]
    d = jnp.arange(-h_cap, h_cap + 1)
    wts = jnp.clip((half + 1) - jnp.abs(d), 0).astype(y.dtype)
    wts = wts / ((half + 1).astype(y.dtype) ** 2)
    j = jnp.arange(ne, dtype=jnp.int32)
    p = jnp.maximum(2 * m_dense - 2, 1)
    jj = j[:, None] + d[None, :]
    r = jnp.mod(jj, p)
    ridx = jnp.where(r < m_dense, r, p - r)
    ridx = jnp.clip(ridx, 0, ne - 1)

    def smooth_once(yv):
        return jnp.einsum("jd,d->j", yv[ridx], wts)

    valid_diff = jnp.arange(ne - 1) < (m_dense - 1)

    def cond(carry):
        _, it, done = carry
        return (~done) & (it < smooth_iter)

    def body(carry):
        yv, it, _ = carry
        y2 = smooth_once(yv)
        diffs = y2[1:] - y2[:-1]
        done = jnp.all(jnp.where(valid_diff, diffs != 0, True))
        return y2, it + 1, done

    y, _, _ = jax.lax.while_loop(
        cond, body, (y, jnp.asarray(0), jnp.asarray(False))
    )
    return y


@partial(jax.jit, static_argnames=("pad_width", "smooth_iter"))
def lmd_sift(t, x, pad_width=0, smooth_iter=12):
    """One LMD sifting evaluation (reference decomposition.py:127-163).

    Requires a uniformly sampled ``t`` (the reference reads ``signal.dt``);
    the caller is responsible for validating uniformity eagerly.

    Returns (mu [N], env [N], ok). ``ok`` is False where the reference
    raises ValueError (fewer than ``2 + pad_width`` extrema, or fewer than
    3 knots after padding).
    """
    del t  # uniform by contract; all arithmetic is index-based
    x = jnp.asarray(x)
    n = x.shape[0]
    idx, m = _extrema_indices(x)
    ok = m >= (2 + pad_width)
    if pad_width > 0:
        q, v, count = _pad_reflect_drop_odd(idx, x, m, pad_width)
        ne = 3 * n
    else:
        q, count = idx, m
        v = x[jnp.clip(idx, 0, n - 1)]
        v = jnp.where(idx < n, v, 0.0)
        ne = n
    ok = ok & (count >= 3)
    count_s = jnp.maximum(count, 2)

    # per-extremum local mean / envelope magnitude between knots k-1 and k
    # (reference decomposition.py:139-144: roll(1) midpoints / half-ranges)
    vprev = v[jnp.clip(jnp.arange(v.shape[0]) - 1, 0, v.shape[0] - 1)]
    muv = 0.5 * (vprev + v)
    envv = 0.5 * jnp.abs(v - vprev)

    mu_dense, m_dense = _zoh_dense(q, muv, count_s, ne)
    env_dense, _ = _zoh_dense(q, envv, count_s, ne)

    # window = (max extrema spacing / dt) // 3, forced odd and >= 3
    # (reference decomposition.py:146-147)
    karr = jnp.arange(q.shape[0] - 1)
    gaps = jnp.where(karr < count_s - 1, q[1:] - q[:-1], 0)
    wf = jnp.max(gaps) // 3
    window = jnp.maximum(jnp.where(wf % 2 == 0, wf + 1, wf), 3)
    half = window // 2
    h_cap = ne // 6 + 2

    mu_dense = _triangle_smooth_until_monotone(
        mu_dense, m_dense, half, smooth_iter, h_cap
    )
    env_dense = _triangle_smooth_until_monotone(
        env_dense, m_dense, half, smooth_iter, h_cap
    )

    # restrict to the original grid (the reference's final interp back onto
    # signal.time, decomposition.py:156-157, is an exact lookup here)
    orig = jnp.arange(n, dtype=jnp.int32) - q[0]
    orig = jnp.clip(orig, 0, ne - 1)
    return mu_dense[orig], env_dense[orig], ok


@partial(jax.jit, static_argnames=("max_iter", "pad_width", "smooth_iter"))
def lmd_iter(t, x, max_iter=10, pad_width=0, smooth_iter=12, eps=1e-6):
    """Extract one product function by iterated demodulation (reference
    decomposition.py:165-183).

    Returns (A [N], F [N], is_monotonic). ``F`` is clipped to [-1, 1]; the
    monotonic flag mirrors the reference's ValueError path (sifting ran out
    of extrema at any demodulation step, discarding the iteration's
    update).
    """
    t = jnp.asarray(t)
    x = jnp.asarray(x)

    def cond(carry):
        _, _, it, done, _ = carry
        return (~done) & (it < max_iter)

    def body(carry):
        F, A, it, _, mono = carry
        mu, env, ok = lmd_sift(
            t, F, pad_width=pad_width, smooth_iter=smooth_iter
        )
        newF = jnp.where(ok, (F - mu) / env, F)
        newA = jnp.where(ok, A * env, A)
        converged = (jnp.max(jnp.abs(newF)) - 1.0) < eps
        done = (~ok) | converged
        return newF, newA, it + 1, done, mono | ~ok

    init = (
        x,
        jnp.ones_like(x),
        jnp.asarray(0),
        jnp.asarray(False),
        jnp.asarray(False),
    )
    F, A, _, _, mono = jax.lax.while_loop(cond, body, init)
    return A, jnp.clip(F, -1.0, 1.0), mono
