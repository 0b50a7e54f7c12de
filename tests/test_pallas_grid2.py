"""Factored one-hot MXU gridding kernel tests (ops/pallas_grid2), run
through the Pallas interpreter on CPU.

The factored kernel is the production gridder of the GLS fast path on
TPU (models/spectral.py gridder="pallas"); these tests pin its numerics
against the scatter reference for both value-precision modes.
"""

import numpy as np
import pytest

from periodicity_tpu.ops.pallas_grid2 import extirpolate_grid_factored


def _scatter_ref(ilo, u, lag, nfft):
    ref = np.zeros(nfft, np.complex128)
    for j in range(lag.shape[1]):
        np.add.at(ref, np.clip(ilo + j, 0, nfft - 1), u * lag[:, j])
    return ref


@pytest.mark.parametrize(
    "n,nfft",
    [
        (200, 1 << 13),
        (3000, 1 << 16),
    ],
)
def test_factored_grid_matches_scatter(n, nfft):
    rng = np.random.default_rng(1)
    ilo = np.sort(rng.integers(0, nfft - 8, n)).astype(np.int32)
    u = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    lag = rng.standard_normal((n, 4)).astype(np.float32)
    ref = _scatter_ref(ilo, u, lag, nfft)
    gre, gim = extirpolate_grid_factored(
        ilo, u.real, u.imag, lag, nfft, interpret=True
    )
    got = np.asarray(gre) + 1j * np.asarray(gim)
    scale = max(1.0, np.abs(ref).max())
    # exact bf16 head+tail split: ~bf16_eps^2-level error
    np.testing.assert_allclose(got, ref, atol=5e-5 * scale)


def test_factored_grid_bf16_fast_mode_error_bound():
    """split_values=False (single bf16 dot) stays within the documented
    ~4e-3 relative error envelope and nowhere near garbage."""
    rng = np.random.default_rng(2)
    n, nfft = 3000, 1 << 16
    ilo = np.sort(rng.integers(0, nfft - 8, n)).astype(np.int32)
    u = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    lag = rng.standard_normal((n, 4)).astype(np.float32)
    ref = _scatter_ref(ilo, u, lag, nfft)
    gre, gim = extirpolate_grid_factored(
        ilo, u.real, u.imag, lag, nfft, interpret=True, split_values=False
    )
    got = np.asarray(gre) + 1j * np.asarray(gim)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    # interpreter matmuls are f32 (no bf16 truncation), so the fast mode
    # is tight here; the bound documents the ON-DEVICE envelope
    assert rel < 4e-3, rel
