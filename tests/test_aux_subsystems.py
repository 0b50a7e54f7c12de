"""Aux-subsystem wiring tests (SURVEY §5.4-5.5): checkpoint/resume of the
ensemble sampler and structured event logging from estimators."""

import json
import logging

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from periodicity_tpu.core import TSeries
from periodicity_tpu.models.gp.mcmc import (
    run_ensemble_checkpointed,
)
from periodicity_tpu.utils.logging import get_logger, log_event, set_verbosity


def _log_prob(u):
    return -0.5 * jnp.sum(u**2)


def test_mcmc_checkpoint_resume_identical_samples(tmp_path):
    """A run killed mid-chain and resumed from its checkpoint reproduces the
    uninterrupted run's samples exactly."""
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (8, 2))

    full_chain, full_lps, full_acc = run_ensemble_checkpointed(
        _log_prob, x0, key, n_steps=50, checkpoint_every=10
    )

    ckpt = str(tmp_path / "mcmc.npz")

    # simulate a kill: run only the first 3 chunks, then abandon the process
    partial_chain, _, _ = run_ensemble_checkpointed(
        _log_prob, x0, key, n_steps=30, checkpoint_every=10,
        checkpoint_path=ckpt,
    )
    assert partial_chain.shape == (30, 8, 2)

    # resume: same call as the full run, picking up from the checkpoint
    resumed_chain, resumed_lps, resumed_acc = run_ensemble_checkpointed(
        _log_prob, x0, key, n_steps=50, checkpoint_every=10,
        checkpoint_path=ckpt,
    )
    np.testing.assert_array_equal(
        np.asarray(resumed_chain), np.asarray(full_chain)
    )
    np.testing.assert_array_equal(
        np.asarray(resumed_lps), np.asarray(full_lps)
    )
    assert resumed_acc == pytest.approx(full_acc, abs=1e-12)


def test_mcmc_checkpointed_matches_itself_without_path():
    """checkpoint_path=None gives the same chunked-deterministic samples."""
    key = jax.random.PRNGKey(5)
    x0 = jax.random.normal(jax.random.PRNGKey(6), (6, 3))
    c1, _, _ = run_ensemble_checkpointed(_log_prob, x0, key, 25,
                                         checkpoint_every=10)
    c2, _, _ = run_ensemble_checkpointed(_log_prob, x0, key, 25,
                                         checkpoint_every=10)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.events = []

    def emit(self, record):
        self.events.append(json.loads(record.getMessage()))


@pytest.fixture
def captured_events():
    logger = get_logger()
    handler = _Capture()
    logger.addHandler(handler)
    old_level = logger.level
    set_verbosity("info")
    yield handler.events
    logger.removeHandler(handler)
    logger.setLevel(old_level)


def test_estimators_emit_log_events(captured_events):
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 30, 200))
    y = np.sin(2 * np.pi * t / 3.0) + 0.1 * rng.standard_normal(200)
    sig = TSeries(t, y)

    from periodicity_tpu.spectral import GLS
    from periodicity_tpu.phase import PDM, StringLength
    from periodicity_tpu.decomposition import EMD

    GLS()(sig)
    PDM(n_periods=50)(sig)
    StringLength(n_periods=50)(sig)
    EMD(max_iter=10)(sig, max_modes=1)

    names = [e["event"] for e in captured_events]
    for expected in ("gls", "pdm", "string_length", "emd", "emd_done"):
        assert expected in names, names
    gls_event = next(e for e in captured_events if e["event"] == "gls")
    assert gls_event["n"] == 200 and gls_event["nf"] > 0


def test_logging_quiet_by_default(capsys):
    logger = get_logger()
    assert logger.level == logging.WARNING or logger.level == 0
    log_event("should_not_appear", x=1)
    assert "should_not_appear" not in capsys.readouterr().err


def test_checkpoint_roundtrip_and_structure_validation(tmp_path):
    """Extension-less paths round-trip (np.savez appends .npz silently);
    loading into a mismatched structure raises instead of silently
    swapping arrays."""
    import pytest

    from periodicity_tpu.utils import load_state, save_state

    state = {"chain": np.arange(6.0).reshape(2, 3), "key": np.arange(2)}
    p = str(tmp_path / "ckpt")  # no extension
    save_state(p, state)
    back = load_state(p, {"chain": np.zeros((2, 3)), "key": np.zeros(2)})
    np.testing.assert_array_equal(back["chain"], state["chain"])
    with pytest.raises(ValueError):
        load_state(p, {"renamed": np.zeros((2, 3)), "key": np.zeros(2)})


def test_set_verbosity_importable_and_no_double_handlers():
    import logging

    from periodicity_tpu.utils import set_verbosity, get_logger

    set_verbosity("info")
    set_verbosity("info")
    logger = get_logger()
    streams = [h for h in logger.handlers
               if type(h) is logging.StreamHandler]
    assert len(streams) == 1
    assert logger.propagate is False
    set_verbosity("warning")


def test_all_estimator_families_emit_log_events(captured_events):
    """VERDICT r2 item 6: every family logs — WPS/HHT/BGLST/LMD and GP
    minimize/mcmc included."""
    rng = np.random.default_rng(1)
    n = 150
    t = np.arange(float(n))
    y = np.sin(2 * np.pi * t / 12.0) + 0.1 * rng.standard_normal(n)
    sig = TSeries(t, y)

    from periodicity_tpu.decomposition import LMD
    from periodicity_tpu.spectral import BGLST
    from periodicity_tpu.timefrequency import HHT, WPS
    from periodicity_tpu.gp import BrownianGP

    WPS(np.linspace(5.0, 20.0, 8))(sig)
    HHT(np.linspace(0.0, 0.2, 16), norm_type="hilbert", method="HT")(sig)
    BGLST()(sig, err=np.full(n, 0.2))
    LMD(max_iter=2)(sig, max_modes=1)
    gp = BrownianGP(sig, err=np.full(n, 0.2))
    gp.minimize(max_steps=3)
    gp.mcmc(n_walkers=8, n_steps=4, random_seed=0)

    names = [e["event"] for e in captured_events]
    for expected in ("wps", "hht", "hht_done", "bglst", "lmd", "lmd_done",
                     "gp_minimize", "gp_minimize_done", "gp_mcmc",
                     "gp_mcmc_done"):
        assert expected in names, names


def test_george_mcmc_checkpoint_resume(tmp_path):
    """GeorgeModeler.mcmc mirrors the celerite kill+resume contract: an
    interrupted checkpointed run resumed with the same arguments yields
    samples identical to an uninterrupted run (VERDICT r2 item 6)."""
    from periodicity_tpu.gp import QuasiPeriodicGP

    rng = np.random.default_rng(2)
    n = 60
    t = np.arange(float(n))
    y = np.sin(2 * np.pi * t / 8.0) + 0.1 * rng.standard_normal(n)
    err = np.full(n, 0.1)
    qp_full = QuasiPeriodicGP(TSeries(t, y), err)
    full_samples, _ = qp_full.mcmc(n_walkers=6, n_steps=20, random_seed=3,
                                   checkpoint_path=str(tmp_path / "a.npz"),
                                   checkpoint_every=5)
    full_chain = qp_full.chain.copy()

    # "killed" run: only the first 10 steps, same checkpoint file
    ckpt = str(tmp_path / "resume.npz")
    qp_part = QuasiPeriodicGP(TSeries(t, y), err)
    qp_part.mcmc(n_walkers=6, n_steps=10, random_seed=3,
                 checkpoint_path=ckpt, checkpoint_every=5)
    # resume with the full-length arguments
    qp_res = QuasiPeriodicGP(TSeries(t, y), err)
    qp_res.mcmc(n_walkers=6, n_steps=20, random_seed=3,
                checkpoint_path=ckpt, checkpoint_every=5)
    np.testing.assert_array_equal(qp_res.chain, full_chain)


def test_checkpoint_resume_extensionless_path(tmp_path):
    """A checkpoint_path without '.npz' must RESUME, not silently restart
    (save_state appends the extension; the probe must match)."""
    x0 = np.zeros((4, 2)) + np.arange(2)
    key = jax.random.PRNGKey(0)
    ckpt = str(tmp_path / "noext")
    full, _, _ = run_ensemble_checkpointed(_log_prob, x0, key, 20,
                                           checkpoint_every=5)
    run_ensemble_checkpointed(_log_prob, x0, key, 10, checkpoint_every=5,
                              checkpoint_path=ckpt)
    assert not (tmp_path / "noext").exists()  # saved as noext.npz
    resumed, _, _ = run_ensemble_checkpointed(_log_prob, x0, key, 20,
                                              checkpoint_every=5,
                                              checkpoint_path=ckpt)
    np.testing.assert_array_equal(np.asarray(resumed), np.asarray(full))
