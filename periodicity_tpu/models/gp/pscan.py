"""Parallel (associative-scan) celerite GP likelihood.

The sequential solver in solver.py has O(N) depth; on TPUs depth is the
enemy. This module evaluates the same GP log-likelihood with O(log N)
depth via ``jax.lax.associative_scan``:

1. Every celerite SHO-family term is an exact Gauss-Markov (state-space)
   process: a complex pair (a, b, c, d) with b = a*c/d (true for all
   SHO-derived terms: SHOTerm, RotationTerm, BrownianTerm) has the 2-state
   realization

       A(dt) = exp(-c dt) [[cos(d dt), sin(d dt)], [-sin, cos]]
       Pinf  = [[a, b], [b, a(1 + 2 c^2/d^2)]]        (Lyapunov-consistent)
       H     = [1, 0]

   and a real term (a, c) the 1-state realization A = exp(-c dt),
   Pinf = a, H = 1. Stationarity gives the exact discrete process noise
   Q_k = Pinf - A_k Pinf A_k^T, so the Kalman innendecomposition of the
   likelihood equals the dense GP likelihood identically.

2. The Kalman filter itself is parallelized with the associative filtering
   elements of Sarkka & Garcia-Fernandez (2021, "Temporal Parallelization
   of Bayesian Smoothers"): per-step 5-tuples (A, b, C, eta, J) composed
   with an associative operator, evaluated by lax.associative_scan. The
   predictive means/variances needed for the log-likelihood come
   elementwise from the (shifted) filtered results.

3. ``log_likelihood_blocked`` is the depth/throughput middle ground
   (ROADMAP r1 item 3): split the series into B blocks, run the cheap
   sequential composition *within* each block (all blocks advance in
   lock-step, vectorized over the block axis), compose the B block
   summaries with one associative scan, and stitch block carries onto the
   within-block prefixes with a single vectorized combine. Depth
   N/B + log B instead of N, with none of the full pscan's O(N r^2)
   element traffic at every tree level.

This is the "ring-attention analog" for this domain (SURVEY §5.7): the
binary operator is associative, so the factorization also decomposes
across chips with one carry exchange per boundary.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "ssm_matrices",
    "log_likelihood_pscan",
    "log_likelihood_blocked",
    "log_likelihood_chunked",
    "log_likelihood_sharded",
]


def ssm_matrices(term, t):
    """Exact discrete SSM (A_k [N,R,R], Pinf [R,R], H [R]) for a celerite
    SHO-family term on the (sorted) time grid t."""
    t = jnp.asarray(t)
    dt = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.diff(t)])
    return _ssm_from_dt(term, dt)


def _ssm_from_dt(term, dt):
    """SSM matrices from per-step time deltas dt [N] (dt[0] is the slot
    reserved for the stationary prior and may hold any value)."""
    ar, cr, ac, bc, cc, dc = term.coefficients()
    dt = jnp.asarray(dt)
    n = dt.shape[0]
    blocks_a = []
    blocks_p = []
    h_entries = []
    jr = int(ar.shape[0])
    jc = int(ac.shape[0])
    for j in range(jr):
        e = jnp.exp(-cr[j] * dt)  # [N]
        blocks_a.append(e[:, None, None])
        blocks_p.append(jnp.asarray(ar[j])[None, None])
        h_entries.append(1.0)
    for j in range(jc):
        e = jnp.exp(-cc[j] * dt)
        cosd = jnp.cos(dc[j] * dt)
        sind = jnp.sin(dc[j] * dt)
        rot = jnp.stack(
            [
                jnp.stack([cosd, sind], -1),
                jnp.stack([-sind, cosd], -1),
            ],
            -2,
        )  # [N, 2, 2]
        blocks_a.append(e[:, None, None] * rot)
        # masked (zero-amplitude) slots carry dc == 0; keep them inert
        d_safe = jnp.where(jnp.abs(dc[j]) < 1e-30, 1.0, dc[j])
        p22 = ac[j] * (1.0 + 2.0 * cc[j] ** 2 / d_safe**2)
        pinf_j = jnp.stack(
            [
                jnp.stack([ac[j], bc[j]]),
                jnp.stack([bc[j], p22]),
            ]
        )
        blocks_p.append(pinf_j)
        h_entries.extend([1.0, 0.0])
    r = jr + 2 * jc
    A = jnp.zeros((n, r, r), dt.dtype)
    Pinf = jnp.zeros((r, r), dt.dtype)
    pos = 0
    for blk_a, blk_p in zip(blocks_a, blocks_p):
        w = blk_p.shape[-1]
        A = A.at[:, pos : pos + w, pos : pos + w].set(
            blk_a if blk_a.ndim == 3 else blk_a[:, None, None]
        )
        Pinf = Pinf.at[pos : pos + w, pos : pos + w].set(blk_p)
        pos += w
    H = jnp.asarray(h_entries, dt.dtype)
    return A, Pinf, H


def _elements_from_AQ(A, Q, H, diag, y):
    """Sarkka & Garcia-Fernandez filtering elements from discrete (A, Q)."""
    n, r, _ = A.shape
    eye = jnp.eye(r, dtype=A.dtype)
    HQH = jnp.einsum("i,nij,j->n", H, Q, H) + diag  # S_k = H Q H^T + R
    K = (Q @ H) / HQH[:, None]  # [N, R]
    ImKH = eye[None] - K[:, :, None] * H[None, None, :]
    A_el = ImKH @ A
    b_el = K * y[:, None]
    C_el = ImKH @ Q
    HA = jnp.einsum("i,nij->nj", H, A)  # [N, R]
    eta_el = HA * (y / HQH)[:, None]
    J_el = HA[:, :, None] * HA[:, None, :] / HQH[:, None, None]
    return (A_el, b_el, C_el, eta_el, J_el)


def _filter_elements(A, Pinf, H, diag, y):
    """Sarkka & Garcia-Fernandez filtering elements + fixed (A, Q).

    Returns (elems 5-tuple with leading dim N, A [N,R,R], Q [N,R,R]); step
    0 starts from the stationary prior (A_0 := 0, Q_0 := Pinf).
    """
    n, r, _ = A.shape
    Q = Pinf[None] - A @ Pinf[None] @ jnp.swapaxes(A, 1, 2)
    A = A.at[0].set(jnp.zeros((r, r), A.dtype))
    Q = Q.at[0].set(Pinf)
    return _elements_from_AQ(A, Q, H, diag, y), A, Q


def _solve_small(M, B):
    """Batched solve M X = B by unrolled Gaussian elimination with partial
    pivoting; M [..., r, r], B [..., r, k] with r small and STATIC.

    XLA's generic batched LU (``jnp.linalg.solve``) lowers to a serial
    while-loop program on TPU that costs milliseconds per call at
    [hundreds, 5, 5] shapes; unrolling the elimination turns the whole
    solve into fused vector ops (measured ~50x faster per _combine step).
    """
    r = M.shape[-1]
    MB = jnp.concatenate([M, B], axis=-1)  # [..., r, r+k]
    rows = jnp.arange(r)
    for col in range(r - 1):
        mags = jnp.where(rows >= col, jnp.abs(MB[..., :, col]), -1.0)
        p = jnp.argmax(mags, axis=-1)  # [...] pivot row
        # swap rows col <-> p with one-hot selects — NO gathers: a
        # take_along_axis here faults the TPU kernel when this runs
        # inside the big associative scan at N=1e5+ (observed worker
        # crash), and masked selects fuse better anyway
        is_p = (rows == p[..., None])[..., None]  # [..., r, 1]
        is_col = (rows == col)[..., None]
        row_p = jnp.sum(jnp.where(is_p, MB, 0.0), axis=-2)  # [..., r+k]
        row_col = MB[..., col, :]  # static index
        MB = jnp.where(
            is_col,
            row_p[..., None, :],
            jnp.where(is_p, row_col[..., None, :], MB),
        )
        pivot = MB[..., col : col + 1, col : col + 1]
        factors = MB[..., col + 1 :, col : col + 1] / pivot
        MB = MB.at[..., col + 1 :, :].add(-factors * MB[..., col : col + 1, :])
    xrows = [None] * r
    for i in reversed(range(r)):
        s = MB[..., i, r:]
        for j in range(i + 1, r):
            s = s - MB[..., i, j : j + 1] * xrows[j]
        xrows[i] = s / MB[..., i, i : i + 1]
    return jnp.stack(xrows, axis=-2)  # [..., r, k]


def _combine(ei, ej):
    """Associative composition of filtering elements: ``ei`` earlier,
    ``ej`` later. Leading dims must match (any number of batch dims folded
    into one).

    All three linear solves of the Sarkka & Garcia-Fernandez composition
    share ONE matrix: C and J are symmetric (preserved exactly by the
    composition via the push-through identity), so
    (I + Ci Jj)^T = I + Jj Ci, and the m1/m2/m3 systems below all solve
    against M = I + Jj Ci. One unrolled factorization with a stacked
    [r, 2r+1] right-hand side replaces three batched LU solves.
    """
    Ai, bi, Ci, etai, Ji = ei
    Aj, bj, Cj, etaj, Jj = ej
    r = Ai.shape[-1]
    eye = jnp.eye(r, dtype=Ai.dtype)
    M = eye + Jj @ Ci
    rhs = jnp.concatenate(
        [
            jnp.swapaxes(Aj, -1, -2),
            (etaj - jnp.einsum("...ij,...j->...i", Jj, bi))[..., None],
            Jj @ Ai,
        ],
        axis=-1,
    )
    sol = _solve_small(M, rhs)
    m1t = jnp.swapaxes(sol[..., :r], -1, -2)  # = Aj (I + Ci Jj)^{-1}
    m2 = sol[..., r]  # = M^{-1} (etaj - Jj bi)
    m3 = sol[..., r + 1 :]  # = M^{-1} Jj Ai
    A_n = m1t @ Ai
    b_n = (
        jnp.einsum("...ij,...j->...i", m1t, bi + jnp.einsum("...ij,...j->...i", Ci, etaj))
        + bj
    )
    C_n = m1t @ Ci @ jnp.swapaxes(Aj, -1, -2) + Cj
    eta_n = jnp.einsum("...ji,...j->...i", Ai, m2) + etai
    J_n = jnp.einsum("...ji,...jk->...ik", Ai, m3) + Ji
    return (A_n, b_n, C_n, eta_n, J_n)


def _innovation_loglik(A, Q, Pinf, H, diag, y, m_filt, P_filt):
    """Log-likelihood from filtered means/covariances via one-step
    predictive innovations."""
    m_pred = jnp.einsum("nij,nj->ni", A[1:], m_filt[:-1])
    P_pred = A[1:] @ P_filt[:-1] @ jnp.swapaxes(A[1:], 1, 2) + Q[1:]
    mu = jnp.concatenate([jnp.zeros((1,), y.dtype), m_pred @ H])
    s = jnp.concatenate(
        [
            (H @ Pinf @ H)[None] + diag[:1],
            jnp.einsum("i,nij,j->n", H, P_pred, H) + diag[1:],
        ]
    )
    resid = y - mu
    return -0.5 * jnp.sum(resid**2 / s + jnp.log(2 * jnp.pi * s))


@jax.jit
def _pkf_loglik(A, Pinf, H, diag, y):
    """Parallel-Kalman GP log-likelihood (O(log N) depth).

    A [N,R,R] transitions (A[0] unused), Pinf [R,R], H [R], diag [N]
    observation noise variances, y [N] residuals.
    """
    elems, A, Q = _filter_elements(A, Pinf, H, diag, y)
    _, b_c, C_c, _, _ = jax.lax.associative_scan(_combine, elems)
    return _innovation_loglik(A, Q, Pinf, H, diag, y, b_c, C_c)


def _identity_elements(shape_prefix, r, dtype):
    eye = jnp.broadcast_to(jnp.eye(r, dtype=dtype), shape_prefix + (r, r))
    zv = jnp.zeros(shape_prefix + (r,), dtype)
    zm = jnp.zeros(shape_prefix + (r, r), dtype)
    return (eye, zv, zm, zv, zm)


def _pad_identity(elems, pad, r, dtype):
    """Append ``pad`` composition-identity slots to a 5-tuple of elements."""
    if not pad:
        return elems
    A_el, b_el, C_el, eta_el, J_el = elems
    eye_pad = jnp.broadcast_to(jnp.eye(r, dtype=dtype), (pad, r, r))
    zv_pad = jnp.zeros((pad, r), dtype)
    zm_pad = jnp.zeros((pad, r, r), dtype)
    return (
        jnp.concatenate([A_el, eye_pad]),
        jnp.concatenate([b_el, zv_pad]),
        jnp.concatenate([C_el, zm_pad]),
        jnp.concatenate([eta_el, zv_pad]),
        jnp.concatenate([J_el, zm_pad]),
    )


def _blocked_inclusive_prefixes(elems, n_blocks):
    """Inclusive ``_combine`` prefixes of a 5-tuple of elements [n, ...]
    in natural order, via the two-level composition: sequential scan
    within ``n_blocks`` lock-step blocks, one associative scan over the
    block summaries, one vectorized carry stitch. n must be divisible by
    n_blocks. Depth n/n_blocks + log(n_blocks)."""
    A_el = elems[0]
    n = A_el.shape[0]
    r = A_el.shape[-1]
    dtype = A_el.dtype
    blk = n_blocks
    length = n // blk

    def reshape_scan_order(leaf):
        # [blk*length, ...] -> [length, blk, ...] so lax.scan walks within
        # blocks while the block axis stays vectorized
        return jnp.swapaxes(leaf.reshape((blk, length) + leaf.shape[1:]), 0, 1)

    elems_lb = tuple(reshape_scan_order(leaf) for leaf in elems)

    def step(carry, e_l):
        new = _combine(carry, e_l)
        return new, new

    init = _identity_elements((blk,), r, dtype)
    summaries, prefixes = jax.lax.scan(step, init, elems_lb)

    # exclusive block carries: identity, then inclusive prefixes shifted
    incl = jax.lax.associative_scan(_combine, summaries)
    ident1 = _identity_elements((1,), r, dtype)
    carries = tuple(
        jnp.concatenate([i1, leaf[:-1]]) for i1, leaf in zip(ident1, incl)
    )

    # stitch: total prefix at (l, b) = carry_b  then  within-prefix_(l, b)
    def expand(leaf):  # [blk, ...] -> [length*blk, ...] (l-major like prefixes)
        return jnp.broadcast_to(
            leaf[None], (length,) + leaf.shape
        ).reshape((length * blk,) + leaf.shape[1:])

    flat_prefix = tuple(
        leaf.reshape((length * blk,) + leaf.shape[2:]) for leaf in prefixes
    )
    total = _combine(tuple(expand(c) for c in carries), flat_prefix)

    # back to natural order: [length, blk, ...] -> [blk*length, ...]
    def natural(leaf):
        leaf = leaf.reshape((length, blk) + leaf.shape[1:])
        return jnp.swapaxes(leaf, 0, 1).reshape((blk * length,) + leaf.shape[2:])

    return tuple(natural(leaf) for leaf in total)


@partial(jax.jit, static_argnames=("n_blocks",))
def _pkf_loglik_blocked(A, Pinf, H, diag, y, n_blocks):
    """Two-level Kalman composition: sequential within blocks (vectorized
    across blocks), associative across block summaries. Depth
    N/n_blocks + log(n_blocks)."""
    n, r, _ = A.shape
    elems, A, Q = _filter_elements(A, Pinf, H, diag, y)
    blk = n_blocks
    length = -(-n // blk)
    pad = blk * length - n
    elems = _pad_identity(elems, pad, r, A.dtype)
    total = _blocked_inclusive_prefixes(elems, blk)
    m_filt = total[1][:n]
    P_filt = total[2][:n]
    return _innovation_loglik(A, Q, Pinf, H, diag, y, m_filt, P_filt)


@partial(jax.jit, static_argnames=("inner_blocks",))
def _pkf_loglik_chunked(coeffs, dt_c, diag_c, y_c, valid_c, inner_blocks):
    """Bounded-compile GP log-likelihood: lax.scan over fixed-size chunks.

    The compiled program contains ONE chunk's worth of work (elements,
    two-level composition, innovation terms) regardless of N — the scan
    body is compiled once — so the N=1e6 likelihood compiles like an
    N=chunk one (VERDICT r4 directive 1: the monolithic blocked program
    misses the relay's remote-compile deadline at N=1e6; this one cannot).
    The carry is the composed filtering element of everything before the
    chunk — five tensors of at most [R, R] — plus the running log-lik.
    """
    term = _CoeffTerm(coeffs)
    n_chunks, chunk = dt_c.shape
    _, Pinf0, H0 = _ssm_from_dt(term, dt_c[0, :1])
    r = H0.shape[0]
    dtype = dt_c.dtype

    def body(carry, xs):
        elem_c, ll_acc = carry
        dt_l, diag_l, y_l, valid_l, idx = xs
        A_l, Pinf, H = _ssm_from_dt(term, dt_l)
        Q_l = Pinf[None] - A_l @ Pinf[None] @ jnp.swapaxes(A_l, 1, 2)
        # global position 0 encodes the stationary prior (A=0, Q=Pinf)
        first = (idx == 0) & (jnp.arange(chunk) == 0)
        A_l = jnp.where(first[:, None, None], 0.0, A_l)
        Q_l = jnp.where(first[:, None, None], Pinf[None], Q_l)
        elems = _elements_from_AQ(A_l, Q_l, H, diag_l, y_l)
        # padding slots must be composition identities
        ident = _identity_elements((chunk,), r, dtype)
        elems = tuple(
            jnp.where(
                valid_l.reshape((chunk,) + (1,) * (leaf.ndim - 1)), leaf, iv
            )
            for leaf, iv in zip(elems, ident)
        )
        prefixes = _blocked_inclusive_prefixes(elems, inner_blocks)
        carry_b = tuple(jnp.broadcast_to(c, (chunk,) + c.shape) for c in elem_c)
        total = _combine(carry_b, prefixes)
        m_filt, P_filt = total[1], total[2]
        # innovation at local j uses the filtered state at j-1; for j=0
        # that is the carry's (b, C) — the filtered state at the previous
        # chunk's last sample (zeros before chunk 0, where A[0]=0/Q[0]=Pinf
        # encode the stationary prior globally)
        m_prev = jnp.concatenate([elem_c[1][None], m_filt[:-1]])
        P_prev = jnp.concatenate([elem_c[2][None], P_filt[:-1]])
        m_pred = jnp.einsum("nij,nj->ni", A_l, m_prev)
        P_pred = A_l @ P_prev @ jnp.swapaxes(A_l, 1, 2) + Q_l
        mu = m_pred @ H
        s = jnp.einsum("i,nij,j->n", H, P_pred, H) + diag_l
        ll_pos = -0.5 * (jnp.square(y_l - mu) / s + jnp.log(2 * jnp.pi * s))
        ll_acc = ll_acc + jnp.sum(jnp.where(valid_l, ll_pos, 0.0))
        new_elem = tuple(leaf[-1] for leaf in total)
        return (new_elem, ll_acc), None

    init = (_identity_elements((), r, dtype), jnp.zeros((), dtype))
    xs = (dt_c, diag_c, y_c, valid_c, jnp.arange(n_chunks))
    (_, ll), _ = jax.lax.scan(body, init, xs)
    return ll


class _CoeffTerm:
    """Minimal term shim carrying precomputed coefficient arrays through
    a jit boundary (term objects are not pytrees; their coefficients are)."""

    def __init__(self, coeffs):
        self._coeffs = coeffs

    def coefficients(self):
        return self._coeffs


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _sharded_pkf_loglik(A, Pinf, H, diag, y, mesh, axis):
    """Chip-sharded two-level Kalman composition (the multi-chip extension
    of ``_pkf_loglik_blocked``): the time axis is split into one contiguous
    block per device, each chip composes its local filtering elements with
    a sequential scan (depth N/D, vectorized on-chip), the D block
    summaries — five tensors of at most [R, R] each — are exchanged with
    ONE ``all_gather`` over the mesh axis, every chip stitches its
    exclusive carry onto its local prefixes, and the per-chip innovation
    log-likelihood contributions are ``psum``-reduced. Total cross-chip
    traffic per evaluation: O(D R^2) floats, independent of N.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n, r, _ = A.shape
    d = mesh.shape[axis]
    if n % d:
        raise ValueError(f"n={n} must be divisible by mesh axis size {d}")

    elems, A, Q = _filter_elements(A, Pinf, H, diag, y)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            (P(axis),) * 5,  # filtering elements, time-sharded
            P(axis),  # A
            P(axis),  # Q
            P(axis),  # diag
            P(axis),  # y
            P(),  # H (replicated)
        ),
        out_specs=P(),
        check_vma=False,
    )
    def _run(elems_l, A_l, Q_l, diag_l, y_l, H):
        nl = y_l.shape[0]

        def step(carry, e):
            new = _combine(carry, e)
            return new, new

        init = _identity_elements((), r, A_l.dtype)
        _, prefixes = jax.lax.scan(step, init, elems_l, unroll=4)
        summary = tuple(leaf[-1] for leaf in prefixes)

        # one small collective: every chip sees all D block summaries
        gathered = jax.lax.all_gather(summary, axis)  # leading dim D
        incl = jax.lax.associative_scan(_combine, gathered)
        idx = jax.lax.axis_index(axis)
        ident = _identity_elements((), r, A_l.dtype)
        carry = tuple(
            jnp.where(idx == 0, i, jax.lax.dynamic_index_in_dim(
                g, jnp.maximum(idx - 1, 0), keepdims=False))
            for i, g in zip(ident, incl)
        )

        # total prefix at local position j = carry ∘ local_prefix_j
        carry_b = tuple(
            jnp.broadcast_to(c, (nl,) + c.shape) for c in carry
        )
        total = _combine(carry_b, prefixes)
        m_filt, P_filt = total[1], total[2]

        # innovation at local j needs the filtered state at j-1; for j=0
        # that is the carry's (b, C) — the previous chip's last filtered
        # state (zeros on chip 0, where A_l[0] = 0 / Q_l[0] = Pinf encode
        # the stationary prior globally).
        m_prev = jnp.concatenate([carry[1][None], m_filt[:-1]])
        P_prev = jnp.concatenate([carry[2][None], P_filt[:-1]])
        m_pred = jnp.einsum("nij,nj->ni", A_l, m_prev)
        P_pred = A_l @ P_prev @ jnp.swapaxes(A_l, 1, 2) + Q_l
        mu = m_pred @ H
        s = jnp.einsum("i,nij,j->n", H, P_pred, H) + diag_l
        resid = y_l - mu
        ll_local = -0.5 * jnp.sum(resid**2 / s + jnp.log(2 * jnp.pi * s))
        return jax.lax.psum(ll_local, axis)

    return _run(elems, A, Q, diag, y, H)


def log_likelihood_pscan(term, t, diag, resid):
    """GP log-likelihood via the O(log N)-depth parallel Kalman filter.

    Matches solver.log_likelihood (and the dense Cholesky) for all
    SHO-family terms; preferred on TPU for long series and low-latency
    single evaluations.
    """
    A, Pinf, H = ssm_matrices(term, jnp.asarray(t))
    return _pkf_loglik(A, Pinf, H, jnp.asarray(diag), jnp.asarray(resid))


def log_likelihood_blocked(term, t, diag, resid, n_blocks=64):
    """GP log-likelihood via the blocked two-level Kalman composition:
    depth N/n_blocks + log n_blocks (the scan/pscan throughput-latency
    middle ground). Matches solver.log_likelihood for SHO-family terms."""
    A, Pinf, H = ssm_matrices(term, jnp.asarray(t))
    return _pkf_loglik_blocked(
        A, Pinf, H, jnp.asarray(diag), jnp.asarray(resid), n_blocks
    )


def log_likelihood_chunked(term, t, diag, resid, chunk=65536, inner_blocks=512):
    """GP log-likelihood with BOUNDED compile size for any N.

    A ``lax.scan`` over fixed-size chunks: each chunk runs the two-level
    blocked composition (depth chunk/inner_blocks + log inner_blocks) and
    hands the next chunk a composed filtering element (five tensors of at
    most [R, R]). The compiled program is one chunk's worth of HLO no
    matter how large N is — the long-series path for hardware whose
    compiler cannot digest a monolithic N=1e6 program (the relay's
    remote-compile service; VERDICT r4 directive 1). Matches
    ``solver.log_likelihood`` for SHO-family terms.
    """
    t = jnp.asarray(t)
    y = jnp.asarray(resid)
    diag = jnp.broadcast_to(jnp.asarray(diag), t.shape)
    n = t.shape[0]
    inner_blocks = int(min(inner_blocks, chunk, n))
    chunk = int(min(chunk, n))
    chunk = max((chunk // inner_blocks) * inner_blocks, inner_blocks)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    dt = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.diff(t)])
    valid = jnp.ones((n,), bool)
    if pad:
        dt = jnp.concatenate([dt, jnp.zeros((pad,), dt.dtype)])
        diag = jnp.concatenate([diag, jnp.ones((pad,), diag.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return _pkf_loglik_chunked(
        term.coefficients(),
        dt.reshape(n_chunks, chunk),
        diag.reshape(n_chunks, chunk),
        y.reshape(n_chunks, chunk),
        valid.reshape(n_chunks, chunk),
        inner_blocks,
    )


def log_likelihood_sharded(term, t, diag, resid, mesh, axis="seq"):
    """GP log-likelihood with the TIME axis sharded across a device mesh.

    The multi-chip extension of ``log_likelihood_blocked``: one contiguous
    block per chip, sequential Kalman composition on-chip, one
    ``all_gather`` of the D block summaries (O(D R^2) floats — independent
    of N), carry stitch, ``psum`` of per-chip innovation contributions.
    Matches ``solver.log_likelihood`` for SHO-family terms. This is the
    sequence-parallel GP path (SURVEY §5.7): N = 10^6+ samples spread over
    ICI-connected chips with a single tiny collective per evaluation.
    """
    A, Pinf, H = ssm_matrices(term, jnp.asarray(t))
    return _sharded_pkf_loglik(
        A, Pinf, H, jnp.asarray(diag), jnp.asarray(resid), mesh, axis
    )
