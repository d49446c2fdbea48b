"""Worker for the real 2-process jax.distributed test (test_distributed.py).

Run as:  python tests/_multihost_worker.py <proc_id> <n_procs> <port> <outdir>

Each process gets 4 virtual CPU devices (8 global over 2 processes),
initializes jax.distributed against a localhost coordinator, runs
run_chains_multihost, and saves its ADDRESSABLE shards keyed by global chain
offset. The parent test stitches the shards and compares bitwise against the
single-process run_chains result. make_case() is imported by the parent to
guarantee both sides build identical data/config.
"""

import os
import sys

# running as a script puts tests/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_case():
    import numpy as np
    from gpirt_tpu.models.config import GPIRTConfig, make_constants

    rng = np.random.default_rng(0)
    n, m = 8, 4
    y = rng.integers(1, 3, (1, n, m)).astype(np.int32)
    config = GPIRTConfig(n=n, m=m, horizon=1, C=2, dtype="float64",
                         grid_size=61)
    consts = make_constants(
        config,
        beta_prior_means=np.zeros((3, m)),
        beta_prior_sds=np.full((3, m), 3.0),
        theta_prior_means=np.zeros((2, n)),
        theta_prior_sds=np.zeros((2, n)),
    )
    thr = np.zeros((1, m, 3))
    thr[..., 0], thr[..., 2] = -np.inf, np.inf
    ti = np.zeros((1, n))
    return y, ti, thr, consts, config


SEED, N_CHAINS = 5, 8
RUN_KW = dict(sample_iterations=6, burn_iterations=2)


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    # env vars alone are not enough in this image: a sitecustomize module
    # touches jax at interpreter startup, so the platform must also be
    # forced through jax.config (same workaround as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4

    import numpy as np
    from gpirt_tpu.parallel.distributed import run_chains_multihost

    y, ti, thr, consts, config = make_case()
    draws = run_chains_multihost(
        SEED, N_CHAINS, y, ti, thr, consts, config, **RUN_KW
    )
    out = {}
    for name, arr in draws.items():
        for sh in arr.addressable_shards:
            start = sh.index[0].start or 0
            out[f"{name}|{start}"] = np.asarray(sh.data)
    np.savez(os.path.join(outdir, f"proc{pid}.npz"), **out)
    print(f"proc {pid} ok: {sorted(out)}", flush=True)


if __name__ == "__main__":
    main()
