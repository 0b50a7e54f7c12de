"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from periodicity_tpu.core import TSeries
from periodicity_tpu.parallel import (
    default_mesh,
    sharded_acf,
    sharded_gls,
    sharded_pdm,
    sharded_string_length,
)
from periodicity_tpu.spectral import gls_power
from periodicity_tpu.phase import pdm_scan, string_length_scan


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return default_mesh(("grid",))


def _data(n=500, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 60, n))
    y = np.sin(2 * np.pi * t / 5.5) + 0.2 * rng.standard_normal(n)
    err = np.full(n, 0.2)
    return t, y, err


def test_sharded_gls_matches_single_device(mesh):
    t, y, err = _data()
    df, fmin, nf = 0.001, 0.0005, 4096
    exact = np.asarray(gls_power(t, y, err, df, fmin, nf, method="direct"))
    fast = np.asarray(gls_power(t, y, err, df, fmin, nf))
    got = np.asarray(sharded_gls(t, y, err, df, fmin, nf, mesh))
    # each shard extirpolates its own sub-band, so the approximation error
    # differs slightly from the single-device fast path; both must track the
    # exact power closely and agree on the peak
    assert np.max(np.abs(got - exact)) < 2e-3
    assert np.max(np.abs(fast - exact)) < 2e-3
    assert np.argmax(got) == np.argmax(exact)


def test_sharded_pdm_matches_single_device(mesh):
    t, y, _ = _data()
    periods = np.linspace(2.0, 12.0, 800)
    ref = np.asarray(pdm_scan(t, y, periods))
    got = np.asarray(sharded_pdm(t, y, periods, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_sharded_string_length_matches_single_device(mesh):
    t, y, _ = _data()
    m = (y - y.max()) / (2 * (y.max() - y.min())) + 0.25
    periods = np.linspace(2.0, 12.0, 800)
    ref = np.asarray(string_length_scan(t, m, periods))
    got = np.asarray(sharded_string_length(t, m, periods, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_sharded_aov_matches_single_device(mesh):
    from periodicity_tpu.parallel import sharded_aov
    from periodicity_tpu.phase import aov_scan

    t, y, _ = _data()
    periods = np.linspace(2.0, 12.0, 800)
    ref = np.asarray(aov_scan(t, y, periods))
    got = np.asarray(sharded_aov(t, y, periods, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_sharded_conditional_entropy_matches_single_device(mesh):
    from periodicity_tpu.parallel import sharded_conditional_entropy
    from periodicity_tpu.phase import conditional_entropy_scan

    t, y, _ = _data()
    periods = np.linspace(2.0, 12.0, 800)
    ref = np.asarray(conditional_entropy_scan(t, y, periods))
    got = np.asarray(sharded_conditional_entropy(t, y, periods, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-10)
    assert np.argmin(got) == np.argmin(ref)


def test_sharded_gregory_loredo_matches_single_device(mesh):
    from periodicity_tpu.parallel import sharded_gregory_loredo
    from periodicity_tpu.phase import gregory_loredo_scan

    t, _, _ = _data()
    periods = np.linspace(2.0, 12.0, 800)
    ref = np.asarray(gregory_loredo_scan(t, periods))
    got = np.asarray(sharded_gregory_loredo(t, periods, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_sharded_acf_batch(mesh):
    mesh2 = default_mesh(("batch",))
    rng = np.random.default_rng(1)
    y = rng.standard_normal((8, 256))
    got = np.asarray(sharded_acf(y, mesh2))
    assert got.shape == (8, 256)
    # per-series check against container ACF
    ref = np.asarray(TSeries(np.arange(256.0), y[3]).acf(max_lag=256).values)
    np.testing.assert_allclose(got[3], ref, rtol=1e-8, atol=1e-10)


def test_sharded_ensemble_mcmc_samples_gaussian(mesh):
    """Walker-sharded stretch-move MCMC recovers a known 2-D gaussian; one
    all-gather per half-update carries the complementary ensemble."""
    import jax
    import jax.numpy as jnp

    from periodicity_tpu.models.gp.mcmc import run_ensemble_sharded

    mesh_w = __import__("periodicity_tpu").parallel.default_mesh(("walkers",))

    mu = jnp.asarray([1.0, -2.0])
    sd = jnp.asarray([0.5, 2.0])

    def log_prob(x):
        return -0.5 * jnp.sum(((x - mu) / sd) ** 2)

    w = 64
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (w, 2))
    chain, lps, acc = run_ensemble_sharded(
        log_prob, x0, jax.random.PRNGKey(1), 1500, mesh_w
    )
    samples = np.asarray(chain[500:]).reshape(-1, 2)
    assert 0.1 < float(acc) < 0.95
    np.testing.assert_allclose(samples.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(samples.std(0), np.asarray(sd), rtol=0.15)


def test_sharded_gp_likelihood_matches_sequential(mesh):
    """Time-sharded (sequence-parallel) celerite likelihood == the
    sequential scan: one all_gather of D block summaries + psum."""
    from jax.sharding import Mesh

    from periodicity_tpu.models.gp.terms import RotationTerm, SHOTerm
    from periodicity_tpu.models.gp.solver import log_likelihood
    from periodicity_tpu.models.gp.pscan import log_likelihood_sharded

    smesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
    rng = np.random.default_rng(0)
    n = 1024
    t = np.sort(rng.uniform(0, 100.0, n))
    y = np.sin(2 * np.pi * t / 7.7) + 0.3 * rng.standard_normal(n)
    diag = np.full(n, 0.09)
    for term in (
        RotationTerm(sigma=1.2, period=7.7, Q0=2.0, dQ=1.0, f=0.3),
        SHOTerm(sigma=0.8, rho=3.0, Q=4.0),
    ):
        ref = float(log_likelihood(term, t, diag, y))
        got = float(log_likelihood_sharded(term, t, diag, y, smesh))
        assert got == pytest.approx(ref, rel=1e-12)


def test_distributed_fft_matches_numpy(mesh):
    """Radix-D Cooley-Tukey distributed FFT (one all_to_all) vs np.fft."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from periodicity_tpu.parallel import (
        default_mesh as dm,
        distributed_acf,
        distributed_fft,
        distributed_ifft,
    )

    smesh = dm(("seq",))
    d = smesh.shape["seq"]
    rng = np.random.default_rng(0)
    n = 4096
    x = rng.standard_normal(n)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(smesh, P("seq")))
    X = np.asarray(distributed_fft(xs, smesh)).reshape(d, n // d)
    X_nat = np.empty(n, complex)
    for r in range(d):
        X_nat[r::d] = X[r]
    ref = np.fft.fft(x)
    np.testing.assert_allclose(X_nat, ref, atol=1e-9 * np.max(np.abs(ref)))
    back = np.asarray(distributed_ifft(distributed_fft(xs, smesh), smesh))
    np.testing.assert_allclose(back, x, atol=1e-10)
    # time-sharded ACF == container ACF
    y = np.sin(2 * np.pi * np.arange(n) / 64) + 0.2 * rng.standard_normal(n)
    ys = jax.device_put(jnp.asarray(y), NamedSharding(smesh, P("seq")))
    got = np.asarray(distributed_acf(ys, smesh))[: n // 2]
    ref_r = np.asarray(TSeries(np.arange(float(n)), y).acf(max_lag=n // 2).values)
    np.testing.assert_allclose(got, ref_r, atol=1e-10)


def test_sharded_solver_in_modeler(mesh):
    """BrownianGP with solver='sharded' + a mesh gives the same NLL
    surface as the sequential scan."""
    from jax.sharding import Mesh

    from periodicity_tpu.models.gp.modelers import BrownianGP

    rng = np.random.default_rng(0)
    n = 512
    t = np.sort(rng.uniform(0, 50.0, n))
    y = np.sin(2 * np.pi * t / 5.0) + 0.1 * rng.standard_normal(n)
    dy = np.full(n, 0.1)
    sig = TSeries(t, y)
    smesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
    m_scan = BrownianGP(sig, err=dy)
    m_shard = BrownianGP(sig, err=dy, solver="sharded", mesh=smesh)
    u = np.full(6, 50.0)
    assert float(m_scan.nll(u)) == pytest.approx(
        float(m_shard.nll(u)), rel=1e-10
    )


def test_multihost_helpers_single_process(mesh):
    """initialize_distributed is a no-op without a coordinator; the
    multihost mesh degrades to [1 host, local devices] and still drives a
    sharded kernel."""
    from periodicity_tpu.parallel import (
        initialize_distributed,
        multihost_mesh,
        sharded_gls,
    )

    assert initialize_distributed() is False  # zero-config single process
    m = multihost_mesh(ici_axes=("grid",), dcn_axes=("batch",))
    assert m.shape["batch"] * m.shape["grid"] == jax.device_count()
    t, y, err = _data()
    nf = 128 * m.shape["grid"]
    power = np.asarray(sharded_gls(t, y, err, 0.001, 0.0005, nf, m))
    assert power.shape == (nf,)
    assert np.all(np.isfinite(power))


def test_sharded_bls_matches_single_device(mesh):
    from periodicity_tpu.parallel import sharded_bls
    from periodicity_tpu.phase import bls_scan

    t, y, err = _data()
    inv = 1.0 / err**2
    w = inv / inv.sum()
    periods = np.linspace(2.0, 12.0, 800)
    widths, nbins = (3, 13, 26), 128
    ref = bls_scan(t, y, w, periods, widths=widths, nbins=nbins)
    got = sharded_bls(t, y, w, periods, mesh, widths=widths, nbins=nbins)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-10)
