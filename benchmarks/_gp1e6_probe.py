"""Subprocess probe for the N=1e6 GP likelihood point (config 7).

Modes, each printing ONE json line on success:

- ``chunked``: the bounded-compile solver (lax.scan over fixed-size
  chunks, composed-element carry; pscan.log_likelihood_chunked). The
  compiled program is one chunk's worth of HLO regardless of N, so the
  relay's remote-compile service digests it like an N=65536 program —
  this is the VERDICT r4 directive-1 path and the mode tried first.
- ``blocked``: the monolithic two-level Kalman composition on the
  ambient backend. Its N=1e6 compile is nondeterministically slow on
  the relay (observed minutes to >50 min), so the parent runs it under
  a wall-clock deadline; kept as an A/B reference.
- ``sharded``: the sequence-parallel solver on an 8-device virtual CPU
  mesh (the VERDICT r2 sanctioned substitute for the scaling shape);
  compiles locally in ~2 min and always terminates.

Usage: python benchmarks/_gp1e6_probe.py chunked|blocked|sharded
"""

import json
import os
import sys
import time


def main(mode):
    if mode == "sharded":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if mode == "sharded":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from periodicity_tpu.models.gp.terms import BrownianTerm

    n = 1_000_000
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 1000.0, n)).astype(np.float32)
    y = (np.sin(2 * np.pi * t / 20.0)
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    tj = jnp.asarray(t)
    yj = jnp.asarray(y - y.mean())
    diag = jnp.full(n, 0.01, jnp.float32)
    k = 3

    if mode == "chunked":
        from periodicity_tpu.models.gp.pscan import log_likelihood_chunked

        chunk = int(os.environ.get("PERIODICITY_GP_CHUNK", 65536))
        inner = int(os.environ.get("PERIODICITY_GP_INNER", 512))

        def ll_fn(term, y0):
            return log_likelihood_chunked(
                term, tj, diag, y0, chunk=chunk, inner_blocks=inner
            )
    elif mode == "blocked":
        from periodicity_tpu.models.gp.pscan import log_likelihood_blocked

        n_blocks = max(min(n // 256, 512), 16)

        def ll_fn(term, y0):
            return log_likelihood_blocked(
                term, tj, diag, y0, n_blocks=n_blocks
            )
    else:
        from jax.sharding import Mesh
        from periodicity_tpu.models.gp.pscan import log_likelihood_sharded

        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("seq",))

        def ll_fn(term, y0):
            return log_likelihood_sharded(term, tj, diag, y0, mesh,
                                          axis="seq")

    @jax.jit
    def loop(y0):
        def body(_, carry):
            y0, acc = carry
            term = BrownianTerm(0.01, 20.0, 10.0, 0.3)
            ll = ll_fn(term, y0)
            return (y0 + ll * 1e-12, acc + ll)

        return jax.lax.fori_loop(0, k, body, (y0, jnp.float32(0)))[1]

    float(loop(yj))  # compile + warm
    t0 = time.perf_counter()
    float(loop(yj))
    dt = (time.perf_counter() - t0) / k
    print(json.dumps({
        "mode": mode,
        "platform": jax.default_backend() if mode != "sharded"
        else "cpu-virtual-mesh-8",
        "n": n,
        "ms": dt * 1e3,
        "evals_per_sec": 1.0 / dt,
    }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "chunked")
