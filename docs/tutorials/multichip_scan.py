"""Tutorial: shard a large trial-frequency grid across a device mesh.

Works on real multi-chip TPU slices or on virtual CPU devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python docs/tutorials/multichip_scan.py
"""

import numpy as np
import jax


def main():
    devs = jax.devices()
    print(f"{len(devs)} devices: {devs[0].platform}")

    from periodicity_tpu.parallel import default_mesh, sharded_gls, sharded_pdm

    rng = np.random.default_rng(0)
    n = 4000
    t = np.sort(rng.uniform(0, 500.0, n))
    y = np.sin(2 * np.pi * t / 11.3) + 0.3 * rng.standard_normal(n)
    err = np.full(n, 0.3)

    mesh = default_mesh(("grid",))
    d = mesh.shape["grid"]

    # frequency band split across chips; each runs its own extirpolation FFT
    df = 1.0 / (500.0 * 5)
    nf = (65536 // d) * d  # divisible by mesh size
    power = sharded_gls(t, y, err, df, df / 2, nf, mesh)
    freqs = df / 2 + df * np.arange(nf)
    print(f"GLS over {nf} frequencies on {d} chips: "
          f"peak period {1/freqs[int(np.argmax(np.asarray(power)))]:.2f}")

    # trial-period grid split across chips
    periods = np.linspace(2.0, 50.0, (20000 // d) * d)
    theta = sharded_pdm(t, y, periods, mesh, batch_size=256)
    print(f"PDM over {periods.size} periods: "
          f"best {periods[int(np.argmin(np.asarray(theta)))]:.2f}")


if __name__ == "__main__":
    main()
