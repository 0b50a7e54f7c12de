"""Cubic-spline interpolation as batched tridiagonal solves.

TPU-native replacement for the FITPACK (scipy.interpolate.splrep/splev)
dependency of the reference (reference: core.py:655-658, used by envelope
extraction core.py:741-774 and EMD sifting decomposition.py:65-66).

An interpolating cubic spline with not-a-knot end conditions is numerically
identical to ``splrep(x, y, s=0)`` / ``splev`` including cubic
extrapolation beyond the data range (verified against scipy at 1e-14).

The solver targets XLA: a Thomas-algorithm ``lax.scan`` over a tridiagonal
system in the *first-derivative* formulation, so not-a-knot stays strictly
tridiagonal. Everything is pure, jittable and vmaps over batches of knot
sets (the EMD ensemble axis). A masked variant supports fixed-capacity knot
buffers with a dynamic ``count`` — the static-shape idiom that keeps the
sifting loop inside ``lax.while_loop``.
"""

import jax
import jax.numpy as jnp

__all__ = [
    "tridiagonal_solve",
    "spline_derivatives",
    "spline_eval",
    "spline_interp",
    "quadratic_spline_interp",
    "smoothing_spline_values",
    "smoothing_spline_eval",
    "smoothing_spline_interp",
]


def tridiagonal_solve_pcr(lower, diag, upper, rhs):
    """Parallel cyclic reduction: O(log n) DEPTH tridiagonal solve.

    The Thomas scan below is O(n) *sequential* steps — under ``jit`` on TPU
    each step is a tiny dependent op, and under ``vmap`` (the EMD ensemble /
    batched-HHT axes) the lock-stepped scan keeps the VPU almost idle. PCR
    instead eliminates the couplings to rows ``i +- 2^k`` level by level:
    every level is a handful of full-width elementwise ops + two static
    shifts, so depth is ``ceil(log2 n)`` and vmapped batches vectorize
    across the whole lane width. Out-of-range neighbours are modelled as
    identity rows (a=c=0, b=1, d=0), which is exactly how the masked spline
    system pads beyond ``count`` — padding stays inert.

    Numerically exact (up to roundoff ordering) for the diagonally dominant
    systems the spline formulation produces; parity with the Thomas scan is
    tested at 1e-12 (f64) on random well-conditioned systems.

    All inputs [n]; lower[0], upper[-1] ignored.
    """
    n = diag.shape[0]
    dt = diag.dtype
    a = jnp.concatenate([jnp.zeros((1,), dt), lower[1:]])
    c = jnp.concatenate([upper[:-1], jnp.zeros((1,), dt)])
    b = diag
    d = rhs

    def shift_up(v, s, fill):
        # v[i - s] with identity-row fill for i < s
        return jnp.concatenate([jnp.full((s,), fill, dt), v[: n - s]])

    def shift_dn(v, s, fill):
        # v[i + s] with identity-row fill for i >= n - s
        return jnp.concatenate([v[s:], jnp.full((s,), fill, dt)])

    s = 1
    while s < n:
        a_u = shift_up(a, s, 0.0)
        b_u = shift_up(b, s, 1.0)
        c_u = shift_up(c, s, 0.0)
        d_u = shift_up(d, s, 0.0)
        a_d = shift_dn(a, s, 0.0)
        b_d = shift_dn(b, s, 1.0)
        c_d = shift_dn(c, s, 0.0)
        d_d = shift_dn(d, s, 0.0)
        alpha = -a / b_u
        beta = -c / b_d
        a = alpha * a_u
        c = beta * c_d
        b = b + alpha * c_u + beta * a_d
        d = d + alpha * d_u + beta * d_d
        s *= 2
    return d / b


def tridiagonal_solve(lower, diag, upper, rhs):
    """Thomas algorithm via lax.scan. All inputs [n]; lower[0], upper[-1] ignored."""
    n = diag.shape[0]

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        a, b, c, d = inp
        denom = b - a * cp_prev
        cp = c / denom
        dp = (d - a * dp_prev) / denom
        return (cp, dp), (cp, dp)

    a = jnp.concatenate([jnp.zeros_like(lower[:1]), lower[1:]])
    init = (jnp.zeros_like(diag[0]), jnp.zeros_like(rhs[0]))
    _, (cp, dp) = jax.lax.scan(fwd, init, (a, diag, upper, rhs))

    def bwd(carry, inp):
        x_next = carry
        cp_i, dp_i = inp
        x = dp_i - cp_i * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros_like(rhs[0]), (cp, dp), reverse=True)
    return xs


# below this static size the two Thomas scans are shallow enough that PCR's
# ~2x arithmetic buys nothing; above it PCR's log-depth dominates (the EMD
# sift capacity n//2+2 is ~1e3 for typical light curves — 11 PCR levels vs
# 2052 dependent scan steps, and vmapped ensembles vectorize across lanes)
_PCR_MIN_SIZE = 32


def _solve_tridiag(lower, diag, upper, rhs):
    if diag.shape[0] >= _PCR_MIN_SIZE:
        return tridiagonal_solve_pcr(lower, diag, upper, rhs)
    return tridiagonal_solve(lower, diag, upper, rhs)


def spline_derivatives(x, y, count=None):
    """First derivatives s_i of the not-a-knot cubic spline through (x, y).

    Parameters
    ----------
    x: [K] strictly increasing knots (entries >= count are padding and must
        still be strictly increasing to keep the solve well-posed).
    y: [K] values.
    count: optional dynamic number of valid knots (count >= 4 for true
        not-a-knot behavior; the masked rows beyond count are replaced by
        identity equations).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    k = x.shape[0]
    dx = jnp.diff(x)
    slope = jnp.diff(y) / dx
    dx0, dx1 = dx[0], dx[1]
    dxl, dxm = dx[-1], dx[-2]  # last, second-to-last (static view; fixed below)

    # interior rows i=1..k-2:  dx[i]*s[i-1] + 2(dx[i-1]+dx[i])*s[i] + dx[i-1]*s[i+1]
    lower = jnp.concatenate([jnp.zeros((1,), x.dtype), dx[1:], jnp.zeros((1,), x.dtype)])
    diag = jnp.concatenate(
        [jnp.ones((1,), x.dtype), 2.0 * (dx[:-1] + dx[1:]), jnp.ones((1,), x.dtype)]
    )
    upper = jnp.concatenate([jnp.zeros((1,), x.dtype), dx[:-1], jnp.zeros((1,), x.dtype)])
    rhs = jnp.concatenate(
        [
            jnp.zeros((1,), x.dtype),
            3.0 * (dx[1:] * slope[:-1] + dx[:-1] * slope[1:]),
            jnp.zeros((1,), x.dtype),
        ]
    )

    if count is None:
        # static not-a-knot boundary rows
        d0 = x[2] - x[0]
        b0 = ((dx0 + 2.0 * d0) * dx1 * slope[0] + dx0 * dx0 * slope[1]) / d0
        dn = x[-1] - x[-3]
        bn = (dxl * dxl * slope[-2] + (2.0 * dn + dxl) * dxm * slope[-1]) / dn
        diag = diag.at[0].set(dx1).at[-1].set(dxm)
        upper = upper.at[0].set(d0)
        lower = lower.at[-1].set(dn)
        rhs = rhs.at[0].set(b0).at[-1].set(bn)
        return _solve_tridiag(lower, diag, upper, rhs)

    # masked variant: valid knots are x[0:count]
    c = count
    dx_l = x[jnp.minimum(c - 1, k - 1)] - x[jnp.minimum(c - 2, k - 1)]
    dx_m = x[jnp.minimum(c - 2, k - 1)] - x[jnp.minimum(c - 3, k - 1)]
    sl_l = (y[jnp.minimum(c - 1, k - 1)] - y[jnp.minimum(c - 2, k - 1)]) / dx_l
    sl_m = (y[jnp.minimum(c - 2, k - 1)] - y[jnp.minimum(c - 3, k - 1)]) / dx_m
    d0 = x[2] - x[0]
    b0 = ((dx0 + 2.0 * d0) * dx1 * slope[0] + dx0 * dx0 * slope[1]) / d0
    dn = x[jnp.minimum(c - 1, k - 1)] - x[jnp.minimum(c - 3, k - 1)]
    bn = (dx_l * dx_l * sl_m + (2.0 * dn + dx_l) * dx_m * sl_l) / dn
    diag = diag.at[0].set(dx1)
    upper = upper.at[0].set(d0)
    rhs = rhs.at[0].set(b0)
    idx = jnp.arange(k)
    is_last = idx == (c - 1)
    pad = idx >= c
    lower = jnp.where(is_last, dn, jnp.where(pad, 0.0, lower))
    diag = jnp.where(is_last, dx_m, jnp.where(pad, 1.0, diag))
    upper = jnp.where(is_last | pad, 0.0, upper)
    rhs = jnp.where(is_last, bn, jnp.where(pad, 0.0, rhs))
    return _solve_tridiag(lower, diag, upper, rhs)


# searchsorted on TPU lowers to a log2(K)-round binary-search gather chain
# (measured 1.4 ms above the loop floor at K~1e3, M~2e3, B=8 inside the EMD
# sift, where it was the single hottest op); a brute-force comparison-sum
# `sum(x[j] <= q)` fuses into one full-width compare+reduce and measures AT
# the loop floor. Quadratic in problem size, so only used while M*K stays
# small; large single-shot interpolations keep searchsorted.
_CMPSUM_MAX_ELEMS = 1 << 26


def _interval_index(x, q, side="right"):
    """``searchsorted(x, q, side)``: #{j : x[j] <= q} (right) / < q (left)."""
    if q.ndim == 1 and x.shape[0] * q.shape[0] <= _CMPSUM_MAX_ELEMS:
        if side == "right":
            return jnp.sum(x[None, :] <= q[:, None], axis=1)
        return jnp.sum(x[None, :] < q[:, None], axis=1)
    return jnp.searchsorted(x, q, side=side)


def spline_eval(x, y, s, xnew, count=None, hi=None):
    """Evaluate the Hermite form of the spline at xnew (cubic extrapolation).

    x, y, s: [K] knots, values, derivatives. xnew: [M]. count: dynamic valid
    knot count (padding entries of x must be increasing). ``hi`` optionally
    supplies the precomputed interval index ``searchsorted(x, xnew,
    "right")`` — callers that know each knot's source position among the
    query points (the EMD sift: knots are extrema OF the sample grid being
    evaluated) can form it with one O(M) cumsum instead of the O(M*K)
    comparison-sum / O(M log K) binary-search gather chain here.
    """
    k = x.shape[0]
    if hi is None:
        hi = _interval_index(x, xnew)
    if count is None:
        i = jnp.clip(hi - 1, 0, k - 2)
    else:
        i = jnp.clip(hi - 1, 0, jnp.maximum(count - 2, 0))
        # keep within the valid segment range even when xnew beyond x[count-1]
        i = jnp.minimum(i, jnp.maximum(count - 2, 0))
    # Interval data rides ONE row gather instead of six element gathers:
    # gather cost on TPU is per INDEX (~13 ns, docs/performance.md), so
    # packing (x0, x1, y0, y1, s0, s1) into [K, 6] rows cuts the eval's
    # gather bill 6x — it was the hottest op of the EMD sift envelope.
    nxt = jnp.concatenate([jnp.arange(1, k), jnp.asarray([k - 1])])
    P = jnp.stack([x, x[nxt], y, y[nxt], s, s[nxt]], axis=-1)  # [K, 6]
    rows = P[i]  # [M, 6]
    x0, x1, y0, y1, s0, s1 = (rows[..., j] for j in range(6))
    h = x1 - x0
    t = (xnew - x0) / h
    h00 = (1 + 2 * t) * (1 - t) ** 2
    h10 = t * (1 - t) ** 2
    h01 = t * t * (3 - 2 * t)
    h11 = t * t * (t - 1)
    return h00 * y0 + h10 * h * s0 + h01 * y1 + h11 * h * s1


def spline_interp(x, y, xnew, count=None, hi=None):
    """Not-a-knot cubic spline interpolation (== scipy splrep(s=0)/splev)."""
    s = spline_derivatives(x, y, count=count)
    return spline_eval(x, y, s, xnew, count=count, hi=hi)


def _quadratic_bspline_basis(knots, x):
    """The three nonzero degree-2 B-spline values at x.

    Returns (j0 [M], b [M, 3]) with b[:, r] the value of basis j0 + r.
    Unrolled de Boor recurrence; 0/0 conventions handled with safe
    denominators.
    """
    n_knots = knots.shape[0]
    ind = jnp.clip(_interval_index(knots, x) - 1, 2, n_knots - 4)

    def basis_step(bs, degree):
        # bs[r] = B[ind - degree + 1 + r, degree - 1], r < degree
        out = []
        for r in range(degree + 1):
            j = ind - degree + r
            left = bs[r - 1] if r > 0 else jnp.zeros_like(x)
            right = bs[r] if r < degree else jnp.zeros_like(x)
            tj = knots[j]
            tjd = knots[jnp.clip(j + degree, 0, n_knots - 1)]
            tj1 = knots[jnp.clip(j + 1, 0, n_knots - 1)]
            tjd1 = knots[jnp.clip(j + degree + 1, 0, n_knots - 1)]
            d1 = tjd - tj
            d2 = tjd1 - tj1
            a = jnp.where(d1 > 0, (x - tj) / jnp.where(d1 > 0, d1, 1.0), 0.0)
            c = jnp.where(d2 > 0, (tjd1 - x) / jnp.where(d2 > 0, d2, 1.0), 0.0)
            out.append(a * left + c * right)
        return out

    b0 = [jnp.ones_like(x)]
    b1 = basis_step(b0, 1)
    b2 = basis_step(b1, 2)
    return ind - 2, jnp.stack(b2, axis=-1)


def quadratic_spline_interp(x, y, xnew):
    """Quadratic (k=2) B-spline interpolation with midpoint interior knots
    (scipy make_interp_spline(k=2) / interp1d(kind="quadratic") parity).

    The collocation system is tridiagonal for this knot layout, so the
    coefficients come from one Thomas-scan solve; jittable and vmappable.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    mids = 0.5 * (x[1:-2] + x[2:-1])
    knots = jnp.concatenate(
        [jnp.repeat(x[0], 3), mids, jnp.repeat(x[-1], 3)]
    )
    j0, basis = _quadratic_bspline_basis(knots, x)
    # with midpoint knots, row i's nonzero columns are j0[i] + (0, 1, 2)
    # centered on i: offsets j0 + r - i land in {-1, 0, 1}
    offs = j0[:, None] + jnp.arange(3)[None, :] - jnp.arange(n)[:, None]
    lower = jnp.sum(jnp.where(offs == -1, basis, 0.0), axis=1)
    diag = jnp.sum(jnp.where(offs == 0, basis, 0.0), axis=1)
    upper = jnp.sum(jnp.where(offs == 1, basis, 0.0), axis=1)
    coefs = _solve_tridiag(lower, diag, upper, y)
    j0n, basis_n = _quadratic_bspline_basis(knots, xnew)
    cols = j0n[:, None] + jnp.arange(3)[None, :]
    return jnp.sum(coefs[jnp.clip(cols, 0, n - 1)] * basis_n, axis=1)


def smoothing_spline_values(x, y, lam, w=None):
    """Cubic smoothing spline (Reinsch 1967): fitted values and natural
    second derivatives at the knots.

    Minimizes sum_i w_i (y_i - f(x_i))^2 + lam * int f''(t)^2 dt. Returns
    (f [n], gamma [n]) where gamma are f'' at the knots (natural ends = 0).
    TPU-native counterpart of scipy.interpolate.make_smoothing_spline /
    splrep(s>0) (reference core.py:655-658 exposes the s parameter).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    if w is None:
        w = jnp.ones(n, x.dtype)
    w = jnp.asarray(w)
    h = jnp.diff(x)  # [n-1]
    # T [(n-2) x (n-2)] tridiagonal; Q^T rows carry the 3-point second
    # difference q_i = (1/h_i, -1/h_i - 1/h_{i+1}, 1/h_{i+1}) at columns
    # (i, i+1, i+2). M = lam Q^T W^-1 Q + T is symmetric PENTAdiagonal,
    # so its bands are assembled directly and solved with the O(n) LDL^T
    # scan below — never as a dense matrix (a dense solve is O(n^3) and
    # the s-criterion bisection evaluates this ~60 times).
    hi = h[:-1]
    hj = h[1:]
    main_T = (hi + hj) / 3.0
    off_T = h[1:-1] / 6.0
    q0 = 1.0 / hi
    q1 = -1.0 / hi - 1.0 / hj
    q2 = 1.0 / hj
    Dinv2 = 1.0 / w  # variance weights
    wi = Dinv2[: n - 2]
    wi1 = Dinv2[1 : n - 1]
    wi2 = Dinv2[2:]
    a0 = wi * q0**2 + wi1 * q1**2 + wi2 * q2**2
    a1 = wi1[: n - 3] * q1[: n - 3] * q0[1:] + wi2[: n - 3] * q2[: n - 3] * q1[1:]
    a2 = wi2[: n - 4] * q2[: n - 4] * q0[2:]
    main = lam * a0 + main_T
    off1 = lam * a1 + off_T[: n - 3]
    off2 = lam * a2
    gamma_int = _pentadiagonal_solve(main, off1, off2, _qt_apply(q0, q1, q2, y))
    f = y - lam * Dinv2 * _qt_transpose_apply(q0, q1, q2, gamma_int, n)
    gamma = jnp.concatenate(
        [jnp.zeros((1,), x.dtype), gamma_int, jnp.zeros((1,), x.dtype)]
    )
    return f, gamma


def _qt_apply(q0, q1, q2, y):
    """Q^T y for the banded second-difference operator."""
    return q0 * y[:-2] + q1 * y[1:-1] + q2 * y[2:]


def _qt_transpose_apply(q0, q1, q2, g, n):
    """Q g (length n) for the banded second-difference operator."""
    out = jnp.zeros(n, g.dtype)
    out = out.at[: n - 2].add(q0 * g)
    out = out.at[1 : n - 1].add(q1 * g)
    out = out.at[2:].add(q2 * g)
    return out


def _pentadiagonal_solve(main, off1, off2, rhs):
    """Solve the symmetric positive-definite pentadiagonal system with
    diagonals (main [m], off1 [m-1], off2 [m-2]) by an LDL^T
    factorization expressed as two lax.scans (O(m) work and depth O(m),
    like the Thomas solve above)."""
    m = main.shape[0]
    # [:m] guards the tiny-system cases (m <= 2, empty off-diagonals)
    b_full = jnp.concatenate([jnp.zeros(1, main.dtype), off1])[:m]
    c_full = jnp.concatenate([jnp.zeros(2, main.dtype), off2])[:m]

    def factor(carry, inp):
        D1, D2, al1, _ = carry  # D_{i-1}, D_{i-2}, alpha_{i-1}
        a_i, b_i, c_i = inp
        beta = jnp.where(D2 != 0, c_i / jnp.where(D2 == 0, 1.0, D2), 0.0)
        alpha = jnp.where(
            D1 != 0,
            (b_i - beta * al1 * D2) / jnp.where(D1 == 0, 1.0, D1),
            0.0,
        )
        D = a_i - alpha**2 * D1 - beta**2 * D2
        return (D, D1, alpha, beta), (D, alpha, beta)

    _, (D, alpha, beta) = jax.lax.scan(
        factor, (jnp.zeros_like(main[0]),) * 4, (main, b_full, c_full)
    )

    def fwd(carry, inp):
        z1, z2 = carry
        r_i, al_i, be_i = inp
        z = r_i - al_i * z1 - be_i * z2
        return (z, z1), z

    _, z = jax.lax.scan(
        fwd, (jnp.zeros_like(rhs[0]),) * 2, (rhs, alpha, beta)
    )
    zd = z / D

    # back substitution: x_i = z_i/D_i - alpha_{i+1} x_{i+1} - beta_{i+2} x_{i+2}
    al_next = jnp.concatenate([alpha[1:], jnp.zeros(1, main.dtype)])[:m]
    be_next2 = jnp.concatenate([beta[2:], jnp.zeros(2, main.dtype)])[:m]

    def bwd(carry, inp):
        x1, x2 = carry
        zd_i, al_i1, be_i2 = inp
        xv = zd_i - al_i1 * x1 - be_i2 * x2
        return (xv, x1), xv

    _, xs = jax.lax.scan(
        bwd, (jnp.zeros_like(rhs[0]),) * 2, (zd, al_next, be_next2),
        reverse=True,
    )
    return xs


def smoothing_spline_eval(x, f, gamma, xnew):
    """Evaluate the natural cubic spline with knot values f and second
    derivatives gamma at xnew. Beyond the data range the EDGE-SEGMENT
    cubic is extrapolated (matching splev/make_smoothing_spline, verified
    to 5e-12), not a linear extension."""
    x = jnp.asarray(x)
    n = x.shape[0]
    i = jnp.clip(jnp.searchsorted(x, jnp.asarray(xnew), side="right") - 1, 0, n - 2)
    h = x[i + 1] - x[i]
    a = (x[i + 1] - xnew) / h
    b = (xnew - x[i]) / h
    return (
        a * f[i]
        + b * f[i + 1]
        + ((a**3 - a) * gamma[i] + (b**3 - b) * gamma[i + 1]) * h**2 / 6.0
    )


def smoothing_spline_interp(x, y, xnew, s, w=None, max_iter=60):
    """splrep(s)/splev-style smoothing interpolation: picks lam so that
    FITPACK's smoothing condition sum((w * (y - f))**2) ~= s holds, then
    evaluates at xnew. FITPACK's objective weights residuals by w**2, so
    the Reinsch solve receives squared weights (a linear w here would fit
    a different curve than splrep for any non-uniform w).
    s == 0 falls back to the exact interpolating not-a-knot spline.
    """
    if s == 0:
        return spline_interp(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xnew))
    import numpy as _np

    x = jnp.asarray(x)
    y = jnp.asarray(y)
    w2 = None if w is None else jnp.asarray(w) ** 2

    def rss(lam):
        f, _ = smoothing_spline_values(x, y, lam, w2)
        r = y - f
        ww = jnp.ones_like(y) if w2 is None else w2
        return float(jnp.sum(ww * r * r))

    # bisection on log(lam): rss is monotone increasing in lam
    lo, hi = 1e-12, 1e12
    if rss(hi) < s:
        lam = hi
    elif rss(lo) > s:
        lam = lo
    else:
        for _ in range(max_iter):
            mid = _np.sqrt(lo * hi)
            if rss(mid) > s:
                hi = mid
            else:
                lo = mid
        lam = _np.sqrt(lo * hi)
    f, gamma = smoothing_spline_values(x, y, lam, w2)
    return smoothing_spline_eval(x, f, gamma, jnp.asarray(xnew))
