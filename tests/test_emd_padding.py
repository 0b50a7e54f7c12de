"""Adversarial check of the EMD sifting building blocks.

The capacity-masked extrema padding in ops/emd.py reimplements the
reference's pad(reflect, odd-time)/drop sequence (reference
decomposition.py:55-60 over core.py:726-739) with branch-free index
arithmetic; this compares it against a direct numpy transcription of the
semantics for random signals, and checks the resulting envelope means.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from periodicity_tpu.ops import peaks as P
from periodicity_tpu.ops.emd import _compact_with_edges, _pad_reflect_drop, sift


def _numpy_padded_extrema(t, x, mask, pad_width):
    """Reference semantics in plain numpy: extrema sequence with edges,
    odd-reflect times / even-reflect values by pad_width, drop the original
    edge entries."""
    idx = np.where(mask)[0]
    et = np.concatenate([[t[0]], t[idx], [t[-1]]])
    ev = np.concatenate([[x[0]], x[idx], [x[-1]]])
    tp = np.pad(et, pad_width, mode="reflect", reflect_type="odd")
    vp = np.pad(ev, pad_width, mode="reflect")
    keep = np.ones(tp.size, bool)
    keep[pad_width] = False
    keep[-pad_width - 1] = False
    return tp[keep], vp[keep]


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("pad_width", [1, 2, 3])
def test_padded_extrema_match_reference_semantics(seed, pad_width):
    rng = np.random.default_rng(seed)
    n = 257
    t = np.sort(rng.uniform(0, 40, n))
    x = np.sin(2 * np.pi * t / 5.0) + 0.5 * rng.standard_normal(n)
    mask = np.asarray(P.local_maxima_mask(x))
    cap = n // 2 + 2
    et, ev, m = _compact_with_edges(jnp.asarray(t), jnp.asarray(x),
                                    jnp.asarray(mask), cap)
    pt, pv, count = _pad_reflect_drop(et, ev, m, pad_width)
    ref_t, ref_v = _numpy_padded_extrema(t, x, mask, pad_width)
    k = int(count)
    assert k == ref_t.size
    np.testing.assert_allclose(np.asarray(pt[:k]), ref_t, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(pv[:k]), ref_v, rtol=1e-12)
    # padded times stay strictly increasing through the capacity padding
    assert np.all(np.diff(np.asarray(pt)) > 0)


def test_sift_mean_envelope_on_pure_tone():
    """For a pure tone the sifting mean should be ~0 away from edges and the
    IMF criteria should hold immediately."""
    t = np.arange(512.0)
    x = np.sin(2 * np.pi * t / 16)
    mu, sigma, n_ext, n_zero = (
        np.asarray(v) for v in sift(jnp.asarray(t), jnp.asarray(x))[:4]
    )
    assert np.max(np.abs(mu[32:-32])) < 5e-3
    assert abs(int(n_zero) - int(n_ext)) <= 1
