"""Multi-host readiness, exercised on the virtual 8-device CPU mesh.

Real multi-host cannot run in CI; what CAN be validated is everything up to
the collective boundary: global-mesh construction, per-shard input assembly
via make_array_from_single_device_arrays, the sharded chain program, and the
device-side pooled diagnostics — all identical code paths a multi-process
run takes (process_count == 1 here, so every shard is local).
"""

import jax
import numpy as np
import pytest

from gpirt_tpu.models import GPIRTConfig, make_constants
from gpirt_tpu.parallel.distributed import (
    global_chain_mesh,
    initialize_distributed,
    pooled_ess_multihost,
    run_chains_multihost,
)

from test_sampler import sim_2pl, binary_thresholds, default_priors


@pytest.fixture(scope="module")
def setup():
    _, y = sim_2pl(0, n=8, m=6)
    H, n, m = y.shape
    config = GPIRTConfig(n=n, m=m, horizon=H, C=2, dtype="float64", grid_size=101)
    consts = make_constants(config, **default_priors(n, m))
    return y, np.linspace(-2, 2, n)[None], binary_thresholds(m), consts, config


class TestMultihost:
    def test_initialize_noop_single_process(self):
        assert initialize_distributed() == jax.process_count() == 1

    def test_global_mesh_spans_all_devices(self):
        mesh = global_chain_mesh()
        assert mesh.devices.size == jax.device_count() == 8

    def test_run_chains_multihost_matches_run_chains(self, setup):
        from gpirt_tpu.parallel.chains import chain_keys, run_chains

        y, ti, thr, consts, config = setup
        kw = dict(sample_iterations=6, burn_iterations=2)
        mesh = global_chain_mesh()
        dist = run_chains_multihost(
            5, 16, y, ti, thr, consts, config, mesh=mesh, **kw
        )
        import jax.numpy as jnp

        plain = run_chains(
            chain_keys(5, 16), jnp.asarray(y), ti, thr, consts, config,
            mesh=mesh, **kw,
        )
        np.testing.assert_array_equal(
            np.asarray(dist["theta"]), np.asarray(plain["theta"])
        )

    def test_per_chain_inits_land_on_owning_shards(self, setup):
        y, _, thr, consts, config = setup
        rng = np.random.default_rng(0)
        ti = np.stack([rng.permutation(np.linspace(-2, 2, 8))[None]
                       for _ in range(16)])
        draws = run_chains_multihost(
            1, 16, y, ti, thr, consts, config,
            sample_iterations=3, burn_iterations=1,
        )
        assert np.asarray(draws["theta"]).shape[0] == 16
        # distinct inits -> distinct chains
        th = np.asarray(draws["theta"])[:, -1]
        assert len({tuple(np.round(c.ravel(), 6)) for c in th}) > 1

    def test_pooled_ess_device_side(self, setup):
        y, ti, thr, consts, config = setup
        draws = run_chains_multihost(
            2, 8, y, ti, thr, consts, config,
            sample_iterations=20, burn_iterations=2,
        )
        ess = np.asarray(pooled_ess_multihost(draws["theta"][:, :, 0]))
        assert ess.shape == (8,)
        assert np.all(ess > 0)

    def test_indivisible_chains_rejected(self, setup):
        y, ti, thr, consts, config = setup
        with pytest.raises(ValueError, match="divide"):
            run_chains_multihost(
                1, 12, y, ti, thr, consts, config,
                sample_iterations=2, burn_iterations=0,
            )
