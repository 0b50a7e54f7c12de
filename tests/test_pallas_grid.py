"""Pallas extirpolation-gridding kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest

from periodicity_tpu.ops.pallas_grid import extirpolate_grid


def _scatter_ref(ilo, vals, nfft):
    ref = np.zeros(nfft, np.complex64)
    for j in range(4):
        np.add.at(ref, ilo + j, vals[:, j])
    return ref


@pytest.mark.parametrize(
    "n,nfft,lo,hi",
    [
        (50, 2048, 0, 2044),
        (5000, 1 << 16, 0, (1 << 16) - 4),
        (5000, 1 << 16, 1000, 1200),  # heavily clustered in one tile
        (3000, 1 << 14, (1 << 14) - 300, (1 << 14) - 4),  # clustered at end
    ],
)
def test_extirpolate_grid_matches_scatter(n, nfft, lo, hi):
    rng = np.random.default_rng(0)
    ilo = np.sort(rng.integers(lo, hi, n)).astype(np.int32)
    vals = (rng.standard_normal((n, 4)) + 1j * rng.standard_normal((n, 4))).astype(
        np.complex64
    )
    ref = _scatter_ref(ilo, vals, nfft)
    got = np.asarray(extirpolate_grid(ilo, vals, nfft, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5 * max(1.0, np.abs(ref).max()))
