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

import numpy as np
import jax
import jax.numpy as jnp

from . import peaks as _peaks
from . import spline as _spline

__all__ = ["sift", "emd_iter", "emd_batch", "emd_pool", "emd_iter_pool",
           "upper_envelope", "EMDConfig"]


def _compact_with_edges(t, x, mask, cap):
    """Extrema sequence [x0, interior..., x_{N-1}] in capacity buffers.

    Returns (et [cap+2], ev [cap+2], m) with m = interior_count + 2; pad
    slots strictly increasing in time.

    Compaction is ONE multi-operand ``lax.sort`` (key = position for
    extrema, N otherwise) carrying (t, x) as co-sorted operands —
    the StringLength trick. The previous ``jnp.nonzero(size=cap)`` +
    ``t[idx]`` formulation lowered to batched dynamic gathers, which
    serialize badly on TPU under vmap and dominated the whole sift
    (~45% of per-iteration time at the HHT shape).

    The sort runs at HALF width: two adjacent samples can never both be
    local maxima (every plateau/peak is flanked by strict drops, so two
    midpoints at i and i+1 would each need to be strictly below the
    other), so one elementwise select packs each (2i, 2i+1) pair into a
    single slot first. Bitonic sort cost is ~width * log^2(width); the
    pre-pack cuts the dominant sift cost ~2.4x at N=2048.
    """
    n = t.shape[0]
    if n % 2:
        t = jnp.pad(t, (0, 1))
        x = jnp.pad(x, (0, 1))
        mask = jnp.pad(mask, (0, 1))
    n2 = (n + 1) // 2
    mp = mask.reshape(n2, 2)
    tp = t.reshape(n2, 2)
    xp = x.reshape(n2, 2)
    if n % 2:
        t, x, mask = t[:-1], x[:-1], mask[:-1]
    pos2 = 2 * jnp.arange(n2, dtype=jnp.int32)
    me, mo = mp[:, 0], mp[:, 1]
    keys = jnp.where(me, pos2, jnp.where(mo, pos2 + 1, jnp.int32(n)))
    t2 = jnp.where(me, tp[:, 0], tp[:, 1])
    x2 = jnp.where(me, xp[:, 0], xp[:, 1])
    _, st, sx = jax.lax.sort((keys, t2, x2), num_keys=1)
    m_int = jnp.sum(mask)
    m = m_int + 2
    slots = jnp.arange(cap + 2)
    # slots 1..m_int read the sorted extrema at STATIC offsets slots-1
    mid_t = st[jnp.clip(slots - 1, 0, n2 - 1)]
    mid_v = sx[jnp.clip(slots - 1, 0, n2 - 1)]
    fdt = (t[-1] - t[0]) / n + 1.0
    filler_t = t[-1] + (slots - (m - 1)) * fdt
    et = jnp.where(
        slots == 0,
        t[0],
        jnp.where(
            slots <= m_int,
            mid_t,
            jnp.where(slots == m - 1, t[-1], filler_t),
        ),
    )
    ev = jnp.where(
        slots == 0,
        x[0],
        jnp.where(
            slots <= m_int,
            mid_v,
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

    def pick(a, j):  # one scalar dynamic pick (vmaps to an [L]-gather)
        return jax.lax.dynamic_index_in_dim(
            a, jnp.clip(j, 0, c0 - 1), keepdims=False
        )

    tl = pick(et, m - 1)

    # left section: src = w - i (STATIC indices); middle: src = i - w + 1
    # (STATIC) — both compile to constant gathers, no dynamic addressing
    src_left = jnp.clip(w - i, 0, c0 - 1)
    src_mid = jnp.clip(i - w + 1, 0, c0 - 1)

    in_left = i < w
    in_mid = (i >= w) & (i < m + w - 2)
    in_right = (i >= m + w - 2) & (i < count)

    out_t = jnp.where(in_left, 2 * t0 - et[src_left], et[src_mid])
    out_v = jnp.where(in_left, ev[src_left], ev[src_mid])
    # right section: the w slots i = m+w-2+k reflect source m-2-k — w
    # scalar dynamic picks unrolled over the static pad width instead of
    # a capacity-wide dynamic gather (the gather serialized on TPU)
    for k in range(w):
        sel = i == (m + w - 2 + k)
        out_t = jnp.where(sel, 2 * tl - pick(et, m - 2 - k), out_t)
        out_v = jnp.where(sel, pick(ev, m - 2 - k), out_v)
    # strictly increasing fillers past the valid range
    fdt = (tl - t0) + 1.0
    last_valid_t = 2 * tl - pick(et, m - 1 - w)
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
    # The upper (maxima of x) and lower (maxima of -x, negated) envelope
    # pipelines are identical programs on different data — run them as ONE
    # 2-wide vmapped chain instead of two sequential chains: the sift is
    # dependency-latency bound at these shapes, so halving the op count
    # matters more than the (free) doubled width.
    xx = jnp.stack([x, -x])
    masks = jax.vmap(_peaks.local_maxima_mask)(xx)
    n_each = jnp.sum(masks, axis=1)
    n_ext = n_each[0] + n_each[1]
    n_zero = jnp.sum(_peaks.zero_crossings_mask(x))

    def envelope(xv, maskv):
        et, ev, m = _compact_with_edges(t, xv, maskv, cap)
        pt, pv, cnt = _pad_reflect_drop(et, ev, m, pad_width)
        # The padded knot vector is [pad_width reflections < t[0]] +
        # [interior extrema] + [reflections > t[-1]] (the original edge
        # samples are DROPPED, reference decomposition.py:55-60), and
        # every query is a sample of t itself — so searchsorted(knots,
        # t[i], "right") is just pad_width + #{interior extrema at
        # positions <= i}: one cumsum of the extrema mask instead of a
        # search per envelope.
        hi = pad_width + jnp.cumsum(maskv.astype(jnp.int32))
        env = _spline.spline_interp(
            pt, pv, t, count=jnp.maximum(cnt, 4), hi=hi
        )
        return env, cnt

    envs, counts = jax.vmap(envelope)(xx, masks)
    upper = envs[0]
    lower = -envs[1]
    ok = (n_each[0] >= pad_width) & (n_each[1] >= pad_width)
    ok = ok & (counts[0] >= 4) & (counts[1] >= 4)
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


@partial(jax.jit, static_argnames=("max_modes", "max_iter", "pad_width",
                                   "unroll"))
def _emd_pool_segment(t, cur, residue, modes, kmode, it, done, units,
                      gidx, sidx, seg, max_modes, max_iter, pad_width,
                      theta_1, theta_2, alpha, unroll=1):
    """Run up to ``seg`` sift units of the unified EMD state machine for
    the bucket of lanes ``gidx`` (one sift evaluation per unit, INCLUDING
    mode transitions, so a lane leaves the pool only when its whole
    decomposition is done).

    The full-batch state arrays ride through the kernel; gather-by-gidx,
    the bucketed while_loops, and scatter-by-sidx
    (sentinel b -> drop) are ONE dispatched program per segment — on a
    network-relay backend that is the difference between one round trip
    and a dozen. ``seg`` is a dynamic scalar: one compile per bucket
    SHAPE, reused across every segment-budget value. Per-lane semantics
    are identical to ``emd_batch``'s scan-of-while_loops, so a lane's
    trajectory does not depend on which bucket it runs in.
    """

    def one(cur, residue, modes, kmode, it, done, units):
        def cond(c):
            return (~c[5]) & (c[7] < seg)

        def step(c):
            cur, residue, modes, kmode, it, done, units, used = c
            mu, sigma, n_ext, n_zero, ok = sift(t, cur, pad_width=pad_width)
            is_imf = jnp.mean((sigma > theta_1).astype(cur.dtype)) < alpha
            is_imf = is_imf & jnp.all(sigma < theta_2)
            is_imf = is_imf & (jnp.abs(n_zero - n_ext) <= 1)
            new_cur = jnp.where(ok & ~is_imf, cur - mu, cur)
            it1 = it + 1
            finished = (~ok) | is_imf | (it1 >= max_iter)
            accept = finished & ok
            modes = modes.at[kmode].set(
                jnp.where(accept, new_cur, modes[kmode])
            )
            residue = jnp.where(accept, residue - new_cur, residue)
            kmode = kmode + accept.astype(jnp.int32)
            done = done | (finished & ~ok) | (kmode >= max_modes)
            cur = jnp.where(finished, residue, new_cur)
            it = jnp.where(finished, 0, it1)
            return (cur, residue, modes, kmode, it, done, units + 1,
                    used + 1)

        def body(c):
            # ``unroll`` guarded sift steps per while_loop iteration: the
            # relay executes each loop trip as a separate dispatch with a
            # measured ~0.8 ms floor regardless of work, so amortizing it
            # over several steps is nearly free compute. Each inner step
            # freezes lanes whose ``done`` flag is already set, keeping
            # per-lane trajectories bit-identical to unroll=1.
            for _ in range(unroll):
                frozen = c[5]
                c2 = step(c)
                c = tuple(
                    jnp.where(frozen, a, b) for a, b in zip(c, c2)
                )
            return c

        init = (cur, residue, modes, kmode, it, done, units, jnp.int32(0))
        out = jax.lax.while_loop(cond, body, init)
        return out[:7]

    bcur, bres, bmodes, bk, bit, bdone, bunits = jax.vmap(one)(
        cur[gidx], residue[gidx], modes[gidx], kmode[gidx], it[gidx],
        done[gidx], units[gidx],
    )
    cur = cur.at[sidx].set(bcur, mode="drop")
    residue = residue.at[sidx].set(bres, mode="drop")
    modes = modes.at[sidx].set(bmodes, mode="drop")
    kmode = kmode.at[sidx].set(bk, mode="drop")
    it = it.at[sidx].set(bit, mode="drop")
    done = done.at[sidx].set(bdone, mode="drop")
    units = units.at[sidx].set(bunits, mode="drop")
    return (cur, residue, modes, kmode, it, done, units,
            bdone.astype(jnp.float32))


_POOL_SEG_SCHEDULE = (64, 128, 256, 512, 1024)


def emd_pool(t, Y, max_modes=8, max_iter=2000, pad_width=2, theta_1=0.05,
             theta_2=0.50, alpha=0.05, min_bucket=8, return_units=False,
             unroll=4):
    """Full EMD of a batch with LANE RETIREMENT (the scaling fix for
    lock-step batch sifting, VERDICT r3 directive #2).

    ``emd_batch`` advances every member until the slowest finishes: a
    vmapped while_loop pays max-member cost, and measured sift-unit skew
    at typical shapes is 5-10x (one member can need 900 sifts while the
    median needs 80). Here the batch runs as a sequence of fixed-budget
    jitted SEGMENTS; between segments, still-active members are compacted
    to the smallest power-of-two bucket (>= ``min_bucket``) and finished
    members stop consuming device time entirely. Per-member trajectories
    are identical to ``emd_batch`` — only the scheduling changes — so
    outputs match exactly.

    Bucket shapes are {B} + powers of two in [min_bucket, B/2]: at most
    ~log2(B) compiles, each reused by every later call at that bucket.
    Host round-trips are one small boolean readback per segment, with a
    geometric segment-budget schedule so the count stays O(log units).

    Same signature/returns as ``emd_batch`` (a host-level driver, not
    jittable — call ``emd_batch`` when the whole decomposition must live
    inside an enclosing jit).
    """
    t = jnp.asarray(t)
    Y = jnp.asarray(Y)
    b, n = Y.shape
    dtype = Y.dtype
    cur = Y
    residue = Y
    modes = jnp.zeros((b, max_modes, n), dtype)
    kmode = jnp.zeros(b, jnp.int32)
    it = jnp.zeros(b, jnp.int32)
    done = jnp.full(b, n < 4)
    units = jnp.zeros(b, jnp.int32)
    active = np.arange(b)
    if n < 4:
        active = active[:0]
    si = 0
    while active.size:
        seg = _POOL_SEG_SCHEDULE[min(si, len(_POOL_SEG_SCHEDULE) - 1)]
        si += 1
        if active.size > b // 2:
            bucket = b
        else:
            bucket = 1 << int(active.size - 1).bit_length()
            bucket = min(b, max(min_bucket, bucket))
        # gather indices: pad with a real row (recomputed, then dropped);
        # scatter indices: sentinel b -> mode="drop"
        sidx = np.full(bucket, b, np.int64)
        sidx[: active.size] = active
        gidx = np.where(sidx == b, active[0], sidx)
        (cur, residue, modes, kmode, it, done, units,
         bdone) = _emd_pool_segment(
            t, cur, residue, modes, kmode, it, done, units,
            jnp.asarray(gidx), jnp.asarray(sidx), jnp.int32(seg),
            max_modes, max_iter, pad_width, theta_1, theta_2, alpha,
            unroll=unroll,
        )
        # one small f32 readback per segment (bool/int readbacks can hit
        # UNIMPLEMENTED on the relay)
        done_rows = np.asarray(bdone[: active.size]) > 0.5
        active = active[~done_rows]
    if return_units:
        return modes, residue, kmode, units
    return modes, residue, kmode


def emd_iter_pool(t, X, max_iter=2000, pad_width=2, theta_1=0.05,
                  theta_2=0.50, alpha=0.05, min_bucket=8):
    """Batched single-mode extraction with lane retirement: the pooled
    analog of ``vmap(emd_iter)`` (one IMF per member). Returns
    (modes [B, N], mono [B]) matching the vmapped kernel exactly; members
    whose sift converges early stop consuming device time (the CEEMDAN
    ensemble's per-stage fan-out, reference decomposition.py:277,304)."""
    modes, _, kmode = emd_pool(
        t, X, max_modes=1, max_iter=max_iter, pad_width=pad_width,
        theta_1=theta_1, theta_2=theta_2, alpha=alpha,
        min_bucket=min_bucket,
    )
    return modes[:, 0, :], kmode == 0
