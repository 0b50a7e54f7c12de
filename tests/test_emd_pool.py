"""Lane-retiring EMD pool driver: exact equivalence with the one-jit
lock-step kernels (the pool changes SCHEDULING only), bucket compaction
behavior, and the hht_batch sifter knob."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from periodicity_tpu.ops.emd import (
    emd_batch,
    emd_iter,
    emd_iter_pool,
    emd_pool,
)


@pytest.fixture(scope="module")
def skewed_batch():
    """A batch whose members need very different sift-unit counts (the
    scheduling case the pool exists for)."""
    n = 1024
    t = np.linspace(0.0, 20.0, n).astype(np.float64)
    rng = np.random.default_rng(0)
    ys = np.stack([
        np.sin(2 * np.pi * t * f) + 0.4 * np.sin(2 * np.pi * t * f / 6.0)
        + 0.05 * rng.standard_normal(n)
        for f in np.linspace(2.0, 4.0, 24)
    ])
    return t, ys


def test_pool_matches_lockstep_exactly(skewed_batch):
    t, ys = skewed_batch
    Y = jnp.asarray(ys)
    m1, r1, k1, u1 = emd_batch(t, Y, max_modes=4, return_units=True)
    m2, r2, k2, u2 = emd_pool(t, Y, max_modes=4, return_units=True)
    # bit-identical: the pool reorders WHEN lanes run, never WHAT they run
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def test_pool_units_skewed(skewed_batch):
    """The fixture really is skewed (max/min sift units well apart) —
    otherwise these tests exercise nothing."""
    t, ys = skewed_batch
    *_, units = emd_batch(t, jnp.asarray(ys), max_modes=4,
                          return_units=True)
    u = np.asarray(units)
    assert u.max() > 3 * u.min()


def test_iter_pool_matches_vmapped_iter(skewed_batch):
    t, ys = skewed_batch
    Y = jnp.asarray(ys)
    m_ref, mono_ref = jax.vmap(lambda y: emd_iter(t, y))(Y)
    m_p, mono_p = emd_iter_pool(t, Y)
    assert np.array_equal(np.asarray(mono_ref), np.asarray(mono_p))
    live = ~np.asarray(mono_ref)[:, None]
    np.testing.assert_array_equal(
        np.asarray(m_ref) * live, np.asarray(m_p) * live
    )


def test_pool_short_series_all_done():
    t = np.arange(3.0)
    Y = np.ones((5, 3))
    modes, residue, n_modes = emd_pool(t, Y, max_modes=2)
    assert np.all(np.asarray(n_modes) == 0)
    np.testing.assert_array_equal(np.asarray(residue), Y)
    assert np.all(np.asarray(modes) == 0.0)


def test_pool_min_bucket_respected(skewed_batch):
    """min_bucket larger than the batch still works (single full-batch
    bucket, no compaction)."""
    t, ys = skewed_batch
    Y = jnp.asarray(ys[:6])
    m1, r1, k1 = emd_batch(t, Y, max_modes=3)
    m2, r2, k2 = emd_pool(t, Y, max_modes=3, min_bucket=64)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_hht_batch_sifter_equivalence(skewed_batch):
    from periodicity_tpu.models.timefrequency import hht_batch

    t, ys = skewed_batch
    Y = jnp.asarray(ys[:16, :512])
    tt = t[:512]
    grid = np.linspace(0.1, 8.0, 32)
    p1, m1, r1, n1 = hht_batch(tt, Y, grid, max_modes=3, sifter="lockstep")
    p2, m2, r2, n2 = hht_batch(tt, Y, grid, max_modes=3, sifter="pool")
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)
    with pytest.raises(ValueError, match="Sifter"):
        hht_batch(tt, Y, grid, sifter="bogus")
