"""On-device affine-invariant ensemble MCMC.

TPU-native replacement for emcee (reference gp.py:5,285-292,471-481):
the stretch move (Goodman & Weare 2010) as two vmapped half-ensemble
updates per step, ``lax.scan`` over steps, jax.random key plumbing, and an
FFT-based integrated autocorrelation time estimator (emcee's method).

The log-probability is evaluated for an entire half-ensemble in one vmapped
call — with the celerite scan solver this means every walker's O(N) solve
runs in lock-step as batched O(R^2) ops, which is the shape TPUs like.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "run_ensemble",
    "run_ensemble_checkpointed",
    "run_ensemble_sharded",
    "autocorr_time",
    "ess",
    "rhat",
]


@partial(jax.jit, static_argnames=("log_prob_fn", "n_steps", "a"))
def run_ensemble(log_prob_fn, x0, key, n_steps, a=2.0):
    """Goodman-Weare stretch-move ensemble sampler.

    Parameters
    ----------
    log_prob_fn: vmappable pure fn params[D] -> scalar log-probability.
    x0: [W, D] initial walkers (W even).
    key: PRNG key. n_steps: steps (each = both half-updates).

    Returns
    -------
    chain [n_steps, W, D], log_probs [n_steps, W], acceptance fraction.
    """
    x0 = jnp.asarray(x0)
    w, d = x0.shape
    half = w // 2
    lp0 = jax.vmap(log_prob_fn)(x0)

    def half_update(x_move, lp_move, x_other, key):
        k1, k2, k3 = jax.random.split(key, 3)
        u = jax.random.uniform(k1, (half,), x_move.dtype)
        z = ((a - 1.0) * u + 1.0) ** 2 / a
        j = jax.random.randint(k2, (half,), 0, half)
        partners = x_other[j]
        prop = partners + z[:, None] * (x_move - partners)
        lp_prop = jax.vmap(log_prob_fn)(prop)
        log_r = (d - 1) * jnp.log(z) + lp_prop - lp_move
        accept = jnp.log(jax.random.uniform(k3, (half,), x_move.dtype)) < log_r
        x_new = jnp.where(accept[:, None], prop, x_move)
        lp_new = jnp.where(accept, lp_prop, lp_move)
        return x_new, lp_new, accept

    def step(carry, key):
        x, lp = carry
        k1, k2 = jax.random.split(key)
        x1, lp1, acc1 = half_update(x[:half], lp[:half], x[half:], k1)
        x2, lp2, acc2 = half_update(x[half:], lp[half:], x1, k2)
        x = jnp.concatenate([x1, x2])
        lp = jnp.concatenate([lp1, lp2])
        return (x, lp), (x, lp, jnp.concatenate([acc1, acc2]))

    keys = jax.random.split(key, n_steps)
    (_, _), (chain, lps, accepts) = jax.lax.scan(step, (x0, lp0), keys)
    return chain, lps, jnp.mean(accepts.astype(jnp.float32))


def run_ensemble_checkpointed(log_prob_fn, x0, key, n_steps, a=2.0,
                              checkpoint_path=None, checkpoint_every=100,
                              progress=False):
    """Chunked ensemble sampler with save/resume (SURVEY §5.4).

    Runs ``run_ensemble`` in chunks of ``checkpoint_every`` steps, saving
    resumable state (walker positions, accumulated chain, chunk counter)
    after each chunk. If ``checkpoint_path`` exists the run resumes from it
    and — because every chunk's PRNG key is derived from the chunk index,
    not from the interrupted process — produces samples identical to an
    uninterrupted run. The reference keeps emcee chains only in memory
    (gp.py:292,483), so a killed run loses everything.

    Returns (chain [n_steps, W, D], log_probs [n_steps, W], acceptance).
    """
    import os

    from ...utils.checkpoint import _npz_path, load_state, save_state

    x0 = jnp.asarray(x0)
    w, d = x0.shape
    n_chunks = -(-n_steps // checkpoint_every)
    keys = jax.random.split(key, n_chunks)

    start = 0
    x = x0
    chain = np.zeros((0, w, d), np.asarray(x0).dtype)
    lps = np.zeros((0, w), np.asarray(x0).dtype)
    acc_steps = np.zeros((0, 2))  # (acceptance, n_steps) per chunk

    like = {"chunk": np.asarray(0), "x": np.asarray(x0), "chain": chain,
            "lps": lps, "acc_steps": acc_steps}
    # save_state/load_state append '.npz' when missing; the existence
    # probe must look for the SAME name or an extensionless
    # checkpoint_path would silently restart instead of resuming
    if checkpoint_path and os.path.exists(_npz_path(checkpoint_path)):
        saved = load_state(checkpoint_path, like)
        start = int(saved["chunk"])
        x = jnp.asarray(saved["x"])
        chain = saved["chain"]
        lps = saved["lps"]
        acc_steps = saved["acc_steps"]

    chunk_iter = range(start, n_chunks)
    if progress:
        from tqdm.auto import tqdm

        chunk_iter = tqdm(chunk_iter, total=n_chunks, initial=start,
                          desc="MCMC chunks")
    for i in chunk_iter:
        steps = min(checkpoint_every, n_steps - i * checkpoint_every)
        c, l, acc = run_ensemble(log_prob_fn, x, keys[i], steps, a=a)
        chain = np.concatenate([chain, np.asarray(c)])
        lps = np.concatenate([lps, np.asarray(l)])
        acc_steps = np.concatenate(
            [acc_steps, np.asarray([[float(acc), steps]])]
        )
        x = c[-1]
        if checkpoint_path:
            save_state(checkpoint_path, {
                "chunk": np.asarray(i + 1), "x": np.asarray(x),
                "chain": chain, "lps": lps, "acc_steps": acc_steps,
            })

    acceptance = float(
        np.average(acc_steps[:, 0], weights=acc_steps[:, 1])
    )
    return jnp.asarray(chain), jnp.asarray(lps), acceptance


def run_ensemble_sharded(log_prob_fn, x0, key, n_steps, mesh, axis="walkers",
                         a=2.0):
    """Stretch-move ensemble MCMC with the walker axis sharded over a mesh.

    Each chip owns W/D walkers and evaluates their log-probabilities
    locally; the complementary half-ensemble needed for partner draws is
    exchanged with one all-gather over ICI per half-update. Detailed
    balance follows the standard red-black (two-half) scheme: walkers with
    global index < W/2 form half A. Proposals are computed for every local
    walker each half-update but only the active half may accept.

    x0 [W, D] with W divisible by 2*mesh.shape[axis]. Returns
    (chain [n_steps, W, D], log_probs [n_steps, W], acceptance).
    """
    from jax.sharding import NamedSharding, PartitionSpec as Pspec
    from jax import shard_map

    x0 = jnp.asarray(x0)
    w, d = x0.shape
    n_dev = mesh.shape[axis]
    if w % (2 * n_dev):
        raise ValueError(f"n_walkers={w} must be divisible by 2*{n_dev}")
    half = w // 2

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(Pspec(axis), Pspec()),
        out_specs=(Pspec(None, axis), Pspec(None, axis), Pspec()),
        check_vma=False,
    )
    def _run(x_local, key):
        w_local = x_local.shape[0]
        dev = jax.lax.axis_index(axis)
        # decorrelate per-device randomness (the key arrives replicated)
        key_dev = jax.random.fold_in(key, dev)
        gidx = dev * w_local + jnp.arange(w_local)
        is_a = gidx < half
        lp_local = jax.vmap(log_prob_fn)(x_local)

        def half_update(x_local, lp_local, active_mask, key):
            full = jax.lax.all_gather(x_local, axis, tiled=True)  # [W, D]
            k1, k2, k3 = jax.random.split(key, 3)
            # partner: uniform over the complementary half
            u = jax.random.uniform(k1, (w_local,), x_local.dtype)
            z = ((a - 1.0) * u + 1.0) ** 2 / a
            j = jax.random.randint(k2, (w_local,), 0, half)
            # A-walkers draw from half B (offset by `half`), B from half A
            pidx = jnp.where(active_mask, j + half, j)
            partners = full[pidx]
            prop = partners + z[:, None] * (x_local - partners)
            lp_prop = jax.vmap(log_prob_fn)(prop)
            log_r = (d - 1) * jnp.log(z) + lp_prop - lp_local
            accept = (
                jnp.log(jax.random.uniform(k3, (w_local,), x_local.dtype)) < log_r
            ) & active_mask
            x_new = jnp.where(accept[:, None], prop, x_local)
            lp_new = jnp.where(accept, lp_prop, lp_local)
            return x_new, lp_new, accept

        def step(carry, key):
            x, lp = carry
            k1, k2 = jax.random.split(key)
            x, lp, acc1 = half_update(x, lp, is_a, k1)
            x, lp, acc2 = half_update(x, lp, ~is_a, k2)
            return (x, lp), (x, lp, acc1 | acc2)

        keys = jax.random.split(key_dev, n_steps)
        (_, _), (chain, lps, accepts) = jax.lax.scan(step, (x_local, lp_local), keys)
        acc = jax.lax.pmean(jnp.mean(accepts.astype(jnp.float32)), axis)
        return chain, lps, acc

    sharding = NamedSharding(mesh, jax.sharding.PartitionSpec(axis))
    x0 = jax.device_put(x0, sharding)
    return _run(x0, key)


def _acf_1d(x):
    """Normalized autocorrelation function via FFT (emcee function_1d)."""
    x = np.asarray(x, float)
    n = len(x)
    nfft = 1 << (2 * n - 1).bit_length()
    f = np.fft.fft(x - np.mean(x), n=nfft)
    acf = np.fft.ifft(f * np.conjugate(f))[:n].real
    if acf[0] == 0:
        return np.zeros(n)
    return acf / acf[0]


def autocorr_time(chain, c=5, quiet=True):
    """Integrated autocorrelation time per dimension (emcee's estimator:
    walker-averaged FFT autocorrelation + Sokal auto-windowing).

    chain: [n_steps, W, D]. Returns tau [D].
    """
    chain = np.asarray(chain)
    n_steps, n_walkers, ndim = chain.shape
    taus = np.empty(ndim)
    for dim in range(ndim):
        f = np.zeros(n_steps)
        for w in range(n_walkers):
            f += _acf_1d(chain[:, w, dim])
        f /= n_walkers
        t = 2.0 * np.cumsum(f) - 1.0
        # auto-window (emcee's auto_window): smallest M with M >= c*tau[M];
        # when the window never closes emcee's np.argmin over the all-True
        # mask yields 0 (tau = t[0]), NOT the largest cumulative estimate
        m = np.arange(len(t)) < c * t
        window = np.argmin(m) if np.any(m) else len(t) - 1
        taus[dim] = t[window]
    if not quiet and np.any(taus * 50 > n_steps):
        raise RuntimeError("chain too short for reliable autocorr time")
    return taus


def ess(chain, c=5, tau=None):
    """Effective sample size per dimension from the FFT autocorrelation
    time: ``n_steps * n_chains / tau``.

    chain: [n_steps, C, D]. NUTS chains are often ANTI-correlated
    (tau < 1, ESS above the raw draw count — Stan reports this too); the
    only clamping here is a tiny positive floor on tau against degenerate
    constant chains. Pass a precomputed ``tau`` to reuse one estimate.
    """
    chain = np.asarray(chain)
    n_steps, n_chains, _ = chain.shape
    if tau is None:
        tau = autocorr_time(chain, c=c)
    return n_steps * n_chains / np.maximum(np.asarray(tau, float), 1e-3)


def rhat(chain):
    """Split-R-hat convergence diagnostic per dimension (Gelman et al.
    2013): each chain is split in half, and the pooled between-/within-
    variance ratio of the 2C half-chains is returned. Values near 1
    indicate the chains agree; > ~1.01 flags non-convergence.

    chain: [n_steps, C, D] -> [D].
    """
    x = np.asarray(chain, float)
    n, _, _ = x.shape
    half = n // 2
    if half < 2:
        raise ValueError("split R-hat needs at least 4 steps")
    x = np.concatenate([x[:half], x[half : 2 * half]], axis=1)  # [half, 2C, D]
    means = x.mean(axis=0)  # [2C, D]
    within = x.var(axis=0, ddof=1).mean(axis=0)  # [D]
    between = half * means.var(axis=0, ddof=1)  # [D]
    var_hat = (half - 1) / half * within + between / half
    return np.sqrt(var_hat / np.maximum(within, 1e-300))
