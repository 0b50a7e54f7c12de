"""On-device No-U-Turn sampler (gradient-based posterior sampling).

The reference advertises a ``celerite2.theano`` implementation whose role
is gradient-based posterior inference; the code is dead upstream (reference
gp.py:1-3,541-637 — fully commented out). Here that role is filled for
real: multinomial NUTS (Hoffman & Gelman 2014; Betancourt 2017) with exact
``jax.grad`` gradients through the celerite scan solver, entirely on
device — warmup (dual-averaging step size + diagonal mass adaptation on
Stan's window schedule) and sampling run as ``lax.scan`` chains under one
jit, vmapped over chains.

Tree building uses the ITERATIVE formulation (Phan, Pradhan & Jankowiak
2019, arXiv:1912.11554): a subtree of depth ``d`` is expanded one leapfrog
step at a time inside a ``lax.while_loop`` with an O(max_depth) checkpoint
buffer for the sub-U-turn checks — static shapes, no recursion, which is
the form XLA compiles well.

Conventions: the inverse mass matrix is diagonal, ``inv_mass ~ var(z)``;
kinetic energy ``0.5 * sum(r^2 * inv_mass)``; velocity ``v = inv_mass*r``.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["run_nuts"]

_MAX_DELTA_ENERGY = 1000.0  # divergence threshold (Stan's default)


def _popcount(n):
    return lax.population_count(n.astype(jnp.uint32)).astype(jnp.int32)


def _trailing_ones(n):
    # number of contiguous low 1-bits: popcount(n & ~(n+1))
    n = n.astype(jnp.uint32)
    return _popcount(n & ~(n + jnp.uint32(1)))


def _is_turning(inv_mass, r_left, r_right, rho):
    """Generalized U-turn criterion on a trajectory segment.

    ``rho`` is the sum of all momenta in the segment (endpoints included);
    turning when the segment momentum points against either end velocity.
    """
    v_left = inv_mass * r_left
    v_right = inv_mass * r_right
    return (jnp.dot(v_left, rho) <= 0) | (jnp.dot(v_right, rho) <= 0)


def _make_leapfrog(value_and_grad_fn):
    def leapfrog(z, r, grad, eps, inv_mass):
        r = r + 0.5 * eps * grad  # grad of log_prob, so +
        z = z + eps * inv_mass * r
        logp, grad = value_and_grad_fn(z)
        r = r + 0.5 * eps * grad
        return z, r, logp, grad

    return leapfrog


def _build_subtree(leapfrog, depth, direction, z0, r0, grad0, joint0, eps,
                   inv_mass, max_depth, key):
    """Iteratively build a subtree of 2**depth leapfrog steps from one end.

    Returns the final end state, the multinomial proposal drawn from the
    subtree, its total log weight and momentum sum, turning/diverging
    flags, and the summed Metropolis accept statistic.
    """
    d = z0.shape[0]
    n_leaves = jnp.int32(1) << depth
    signed_eps = jnp.where(direction, eps, -eps)

    def cond(state):
        leaf = state[0]
        turning, diverging = state[-3], state[-2]
        return (leaf < n_leaves) & ~turning & ~diverging

    def body(state):
        (leaf, z, r, grad, z_prop, logp_prop, grad_prop, lsw, rho,
         r_ckpts, rsum_ckpts, sum_acc, turning, diverging, key) = state
        z, r, logp, grad = leapfrog(z, r, grad, signed_eps, inv_mass)
        joint = logp - 0.5 * jnp.sum(r * r * inv_mass)
        lw = joint - joint0
        lw = jnp.where(jnp.isnan(lw), -jnp.inf, lw)
        diverging = lw < -_MAX_DELTA_ENERGY
        sum_acc = sum_acc + jnp.minimum(1.0, jnp.exp(lw))
        # progressive multinomial sampling within the subtree
        lsw_new = jnp.logaddexp(lsw, lw)
        key, k_take = jax.random.split(key)
        take = jnp.log(jax.random.uniform(k_take, dtype=z.dtype)) < lw - lsw_new
        z_prop = jnp.where(take, z, z_prop)
        logp_prop = jnp.where(take, logp, logp_prop)
        grad_prop = jnp.where(take, grad, grad_prop)
        rho_before = rho
        rho = rho + r
        # -- iterative sub-U-turn bookkeeping (arXiv:1912.11554) ----------
        # even leaf: checkpoint (momentum at subtree start, cumulative
        # momentum sum BEFORE it) at slot popcount(leaf >> 1)
        ckpt_idx = _popcount(leaf >> 1)
        is_even = (leaf % 2) == 0
        r_ckpts = jnp.where(
            is_even & (jnp.arange(max_depth)[:, None] == ckpt_idx),
            r[None, :], r_ckpts,
        )
        rsum_ckpts = jnp.where(
            is_even & (jnp.arange(max_depth)[:, None] == ckpt_idx),
            rho_before[None, :], rsum_ckpts,
        )
        # odd leaf: every complete subtree ending here gets a U-turn check
        idx_max = ckpt_idx
        idx_min = idx_max - _trailing_ones(leaf) + 1

        def check(i, turn):
            active = ~is_even & (i >= idx_min) & (i <= idx_max)
            rho_i = rho - rsum_ckpts[i]
            t = _is_turning(inv_mass, r_ckpts[i], r, rho_i)
            return turn | (active & t)

        turning = lax.fori_loop(0, max_depth, check, turning)
        return (leaf + 1, z, r, grad, z_prop, logp_prop, grad_prop,
                lsw_new, rho, r_ckpts, rsum_ckpts, sum_acc, turning,
                diverging, key)

    dtype = z0.dtype
    init = (
        jnp.int32(0), z0, r0, grad0,
        z0, jnp.asarray(-jnp.inf, dtype), grad0,        # proposal slot
        jnp.asarray(-jnp.inf, dtype),                   # log sum weight
        jnp.zeros(d, dtype),                            # rho
        jnp.zeros((max_depth, d), dtype),               # r checkpoints
        jnp.zeros((max_depth, d), dtype),               # rho-before ckpts
        jnp.asarray(0.0, dtype),                        # sum accept stat
        jnp.asarray(False), jnp.asarray(False), key,
    )
    (leaf, z, r, grad, z_prop, logp_prop, grad_prop, lsw, rho,
     _, _, sum_acc, turning, diverging, _) = lax.while_loop(cond, body, init)
    return dict(
        z_end=z, r_end=r, grad_end=grad, z_prop=z_prop, logp_prop=logp_prop,
        grad_prop=grad_prop, lsw=lsw, rho=rho, turning=turning,
        diverging=diverging, sum_acc=sum_acc, n_leaf=leaf,
    )


def _nuts_step(leapfrog, z, logp, grad, eps, inv_mass, max_depth, key):
    """One multinomial-NUTS transition. Returns the new (z, logp, grad)
    plus (accept_stat, n_leapfrog, diverging, depth)."""
    d = z.shape[0]
    dtype = z.dtype
    key, k_mom = jax.random.split(key)
    r0 = jax.random.normal(k_mom, (d,), dtype) / jnp.sqrt(inv_mass)
    joint0 = logp - 0.5 * jnp.sum(r0 * r0 * inv_mass)

    def cond(state):
        depth, turning, diverging = state[0], state[-3], state[-2]
        return (depth < max_depth) & ~turning & ~diverging

    def body(state):
        (depth, z_l, r_l, g_l, z_r, r_r, g_r, rho, z_prop, logp_prop,
         g_prop, lsw, sum_acc, n_leaf, turning, diverging, key) = state
        key, k_dir, k_sub, k_acc = jax.random.split(key, 4)
        go_right = jax.random.bernoulli(k_dir)
        z0 = jnp.where(go_right, z_r, z_l)
        r0_end = jnp.where(go_right, r_r, r_l)
        g0 = jnp.where(go_right, g_r, g_l)
        sub = _build_subtree(leapfrog, depth, go_right, z0, r0_end, g0,
                             joint0, eps, inv_mass, max_depth, k_sub)
        ok = ~sub["turning"] & ~sub["diverging"]
        # biased progressive sampling across doublings
        accept_new = (
            jnp.log(jax.random.uniform(k_acc, dtype=dtype)) < sub["lsw"] - lsw
        ) & ok
        z_prop = jnp.where(accept_new, sub["z_prop"], z_prop)
        logp_prop = jnp.where(accept_new, sub["logp_prop"], logp_prop)
        g_prop = jnp.where(accept_new, sub["grad_prop"], g_prop)
        lsw = jnp.where(ok, jnp.logaddexp(lsw, sub["lsw"]), lsw)
        rho_new = rho + sub["rho"]
        rho = jnp.where(ok, rho_new, rho)
        z_l = jnp.where(ok & ~go_right, sub["z_end"], z_l)
        r_l = jnp.where(ok & ~go_right, sub["r_end"], r_l)
        g_l = jnp.where(ok & ~go_right, sub["grad_end"], g_l)
        z_r = jnp.where(ok & go_right, sub["z_end"], z_r)
        r_r = jnp.where(ok & go_right, sub["r_end"], r_r)
        g_r = jnp.where(ok & go_right, sub["grad_end"], g_r)
        turning = jnp.where(
            ok, _is_turning(inv_mass, r_l, r_r, rho), jnp.asarray(True)
        )
        diverging = diverging | sub["diverging"]
        sum_acc = sum_acc + sub["sum_acc"]
        n_leaf = n_leaf + sub["n_leaf"]
        return (depth + 1, z_l, r_l, g_l, z_r, r_r, g_r, rho, z_prop,
                logp_prop, g_prop, lsw, sum_acc, n_leaf, turning,
                diverging, key)

    init = (
        jnp.int32(0), z, r0, grad, z, r0, grad, r0,
        z, logp, grad, jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype), jnp.int32(0),
        jnp.asarray(False), jnp.asarray(False), key,
    )
    (depth, _, _, _, _, _, _, _, z_new, logp_new, g_new, _, sum_acc,
     n_leaf, _, diverging, _) = lax.while_loop(cond, body, init)
    accept_stat = sum_acc / jnp.maximum(n_leaf, 1)
    return z_new, logp_new, g_new, accept_stat, n_leaf, diverging, depth


def _find_reasonable_eps(leapfrog, z, logp, grad, inv_mass, key):
    """Hoffman & Gelman Algorithm 4: double/halve until the one-step
    acceptance crosses 1/2."""
    d = z.shape[0]
    dtype = z.dtype
    r0 = jax.random.normal(key, (d,), dtype) / jnp.sqrt(inv_mass)
    joint0 = logp - 0.5 * jnp.sum(r0 * r0 * inv_mass)

    def delta(eps):
        _, r, logp1, _ = leapfrog(z, r0, grad, eps, inv_mass)
        joint = logp1 - 0.5 * jnp.sum(r * r * inv_mass)
        dj = joint - joint0
        return jnp.where(jnp.isnan(dj), -jnp.inf, dj)

    eps0 = jnp.asarray(1.0, dtype)
    direction = jnp.where(delta(eps0) > jnp.log(0.5), 1.0, -1.0)

    def cond(state):
        eps, it = state
        keep = jnp.where(
            direction > 0, delta(eps) > jnp.log(0.5), delta(eps) < jnp.log(0.5)
        )
        return keep & (it < 60) & jnp.isfinite(eps) & (eps > 1e-10)

    def body(state):
        eps, it = state
        return eps * jnp.where(direction > 0, 2.0, 0.5), it + 1

    eps, _ = lax.while_loop(cond, body, (eps0, jnp.int32(0)))
    return jnp.clip(eps, 1e-8, 1e3)


def _warmup_schedule(n_warmup, init_buffer=75, term_buffer=50, base_window=25):
    """Stan's three-stage warmup: step-size-only head, doubling
    mass-estimation windows, step-size-only tail. Returns per-step bool
    arrays (in_mass_window, is_window_end)."""
    in_window = np.zeros(n_warmup, bool)
    window_end = np.zeros(n_warmup, bool)
    if n_warmup <= 0:
        # no adaptation at all (e.g. reusing a tuned step size)
        return in_window, window_end
    if n_warmup < init_buffer + term_buffer + base_window:
        # too short for the full schedule: single window over the middle
        lo = n_warmup // 4
        hi = min(max(lo + 1, (3 * n_warmup) // 4), n_warmup)
        in_window[lo:hi] = True
        window_end[hi - 1] = True
        return in_window, window_end
    start = init_buffer
    size = base_window
    while start < n_warmup - term_buffer:
        end = start + size
        if end + 2 * size > n_warmup - term_buffer:
            end = n_warmup - term_buffer
        in_window[start:end] = True
        window_end[end - 1] = True
        start = end
        size *= 2
    return in_window, window_end


@partial(
    jax.jit,
    static_argnames=("log_prob_fn", "n_steps", "n_warmup", "max_depth",
                     "target_accept"),
)
def run_nuts(log_prob_fn, x0, key, n_steps, n_warmup=500, max_depth=8,
             target_accept=0.8):
    """Multinomial NUTS with Stan-style warmup adaptation.

    Parameters
    ----------
    log_prob_fn : differentiable pure fn params[D] -> scalar log density
        (unnormalized). Must be finite at ``x0``.
    x0 : [C, D] initial positions (one row per chain).
    key : PRNG key. n_steps/n_warmup : post-warmup and warmup step counts.
    max_depth : maximum tree doubling depth (Stan default 10; default 8
        here keeps worst-case leapfrog count bounded at 255 per step).
    target_accept : dual-averaging target (Stan's ``adapt_delta``).

    Returns
    -------
    dict with ``chain`` [n_steps, C, D], ``log_probs`` [n_steps, C],
    ``accept_prob`` [C] (post-warmup mean), ``divergences`` [C]
    (post-warmup count), ``step_size`` [C], ``inv_mass`` [C, D],
    ``tree_depth`` [n_steps, C].

    Each chain adapts independently (its own step size and diagonal mass),
    so chains vmap with no cross-talk; with the celerite scan solver the
    per-leapfrog gradient is one O(N) forward+adjoint sweep, batched
    across chains.
    """
    x0 = jnp.atleast_2d(jnp.asarray(x0))
    n_chains, d = x0.shape
    dtype = x0.dtype
    vg = jax.value_and_grad(log_prob_fn)
    leapfrog = _make_leapfrog(vg)
    in_window, window_end = _warmup_schedule(int(n_warmup))
    in_window = jnp.asarray(in_window)
    window_end = jnp.asarray(window_end)
    # dual-averaging constants (Hoffman & Gelman 2014)
    da_gamma, da_t0, da_kappa = 0.05, 10.0, 0.75

    def one_chain(z0, key):
        logp0, grad0 = vg(z0)
        inv_mass0 = jnp.ones(d, dtype)
        k_eps, k_warm, k_samp = jax.random.split(key, 3)
        eps0 = _find_reasonable_eps(leapfrog, z0, logp0, grad0, inv_mass0,
                                    k_eps)
        # dual-averaging state: (mu, log_eps, log_eps_avg, h_bar, count)
        da0 = (jnp.log(10.0 * eps0), jnp.log(eps0),
               jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype),
               jnp.asarray(0.0, dtype))
        # Welford state over z for the mass windows
        w0 = (jnp.asarray(0.0, dtype), jnp.zeros(d, dtype),
              jnp.zeros(d, dtype))

        def warm_step(carry, inputs):
            z, logp, grad, da, welford, inv_mass = carry
            key, in_win, win_end = inputs
            mu, log_eps, log_eps_avg, h_bar, count = da
            eps = jnp.exp(log_eps)
            z, logp, grad, acc, n_leaf, _, _ = _nuts_step(
                leapfrog, z, logp, grad, eps, inv_mass, max_depth, key
            )
            # dual averaging
            count = count + 1
            w = 1.0 / (count + da_t0)
            h_bar = (1 - w) * h_bar + w * (target_accept - acc)
            log_eps = mu - jnp.sqrt(count) / da_gamma * h_bar
            eta = count ** (-da_kappa)
            log_eps_avg = eta * log_eps + (1 - eta) * log_eps_avg
            # Welford accumulation inside mass windows
            n_w, mean_w, m2_w = welford
            n_new = n_w + 1
            delta = z - mean_w
            mean_new = mean_w + delta / n_new
            m2_new = m2_w + delta * (z - mean_new)
            welford = jax.tree.map(
                lambda new, old: jnp.where(in_win, new, old),
                (n_new, mean_new, m2_new), welford,
            )
            # window end: set regularized diagonal inv-mass, reset
            # Welford, re-center dual averaging on the current step size
            n_w, mean_w, m2_w = welford
            var = m2_w / jnp.maximum(n_w - 1, 1)
            var = (n_w / (n_w + 5.0)) * var + 1e-3 * (5.0 / (n_w + 5.0))
            inv_mass = jnp.where(win_end & (n_w > 1), var, inv_mass)
            welford = jax.tree.map(
                lambda w0_leaf, w_leaf: jnp.where(win_end, w0_leaf, w_leaf),
                w0, welford,
            )
            mu = jnp.where(win_end, jnp.log(10.0) + log_eps, mu)
            h_bar = jnp.where(win_end, 0.0, h_bar)
            count = jnp.where(win_end, 0.0, count)
            da = (mu, log_eps, log_eps_avg, h_bar, count)
            return (z, logp, grad, da, welford, inv_mass), n_leaf

        keys = jax.random.split(k_warm, n_warmup)
        (z, logp, grad, da, _, inv_mass), warm_leafs = lax.scan(
            warm_step, (z0, logp0, grad0, da0, w0, inv_mass0),
            (keys, in_window, window_end),
        )
        # averaged step size; with no warmup there is nothing averaged —
        # fall back to the Algorithm-4 initial guess
        eps = jnp.exp(da[2]) if n_warmup > 0 else eps0

        def samp_step(carry, key):
            z, logp, grad = carry
            z, logp, grad, acc, n_leaf, div, depth = _nuts_step(
                leapfrog, z, logp, grad, eps, inv_mass, max_depth, key
            )
            return (z, logp, grad), (z, logp, acc, div, depth, n_leaf)

        keys = jax.random.split(k_samp, n_steps)
        _, (chain, lps, accs, divs, depths, n_leafs) = lax.scan(
            samp_step, (z, logp, grad), keys
        )
        return dict(
            chain=chain, log_probs=lps, accept_prob=jnp.mean(accs),
            divergences=jnp.sum(divs.astype(jnp.int32)), step_size=eps,
            inv_mass=inv_mass, tree_depth=depths,
            n_leapfrog=jnp.sum(n_leafs),
            n_leapfrog_warmup=jnp.sum(warm_leafs),
        )

    keys = jax.random.split(key, n_chains)
    out = jax.vmap(one_chain)(x0, keys)
    # [C, n_steps, ...] -> [n_steps, C, ...]
    out["chain"] = jnp.swapaxes(out["chain"], 0, 1)
    out["log_probs"] = jnp.swapaxes(out["log_probs"], 0, 1)
    out["tree_depth"] = jnp.swapaxes(out["tree_depth"], 0, 1)
    return out
