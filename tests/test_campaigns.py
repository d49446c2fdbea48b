"""Campaign-replicated estimation (gpirt_tpu.campaigns, smc batched)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gpirt_tpu.campaigns import campaign_schedule, gpirt_campaigns
from gpirt_tpu.models.config import GPIRTConfig, make_constants
from gpirt_tpu.parallel.chains import chain_keys, run_chains_chunked
from gpirt_tpu.parallel.smc import anneal_init, anneal_init_batched


def _setup(n=10, m=6, C=3, N=101, seed=0):
    config = GPIRTConfig(n=n, m=m, horizon=1, C=C, grid_size=N,
                         dtype="float64", f_method="conjugate")
    consts = make_constants(
        config,
        beta_prior_means=np.zeros((3, m)),
        beta_prior_sds=np.full((3, m), 1.5),
        theta_prior_means=np.zeros((2, n)),
        theta_prior_sds=np.zeros((2, n)),
    )
    rng = np.random.default_rng(seed)
    theta = np.linspace(-1.5, 1.5, n)
    disc = rng.standard_normal(m)
    p = 1 / (1 + np.exp(-np.outer(theta, disc)))
    u = rng.random((n, m))
    y = np.ones((1, n, m), np.int32)
    y[0][u < p] = 2
    y[0][u < p * 0.3] = 3
    thr = np.tile(np.array([-np.inf, -0.4, 0.6, np.inf]), (1, m, 1))
    return config, consts, jnp.asarray(y), thr


def _stack_keys(seed, B, K):
    return jnp.stack([chain_keys(seed + b * K, K) for b in range(B)])


class TestBatchedAnneal:
    @pytest.mark.slow
    def test_batched_equals_solo_per_campaign(self):
        """Campaign b of the batched program must equal a solo anneal_init
        run from the same keys (weight math, resample decisions and lane
        states are campaign-local by construction). Tolerance is
        compile-level float associativity only: the vmapped batch compiles
        with an extra leading dim, so XLA fuses the lane math differently
        (measured ~2e-14 relative in float64)."""
        config, consts, y, thr = _setup()
        B, K = 3, 6
        keys = _stack_keys(11, B, K)
        ti = np.zeros((1, config.n))

        st_b, info_b = anneal_init_batched(
            keys, y, ti, thr, consts, config, n_steps=24, max_temp=16.0)

        for b in range(B):
            st_s, info_s = anneal_init(
                keys[b], y, ti, thr, consts, config,
                n_steps=24, max_temp=16.0)
            for leaf_b, leaf_s in zip(
                    jax.tree_util.tree_leaves(st_b),
                    jax.tree_util.tree_leaves(st_s)):
                np.testing.assert_allclose(
                    np.asarray(leaf_b, np.float64)[b],
                    np.asarray(leaf_s, np.float64),
                    rtol=1e-10, atol=1e-12)
            np.testing.assert_allclose(
                info_b["weight_ess"][b], info_s["weight_ess"],
                rtol=1e-10, atol=1e-12)
            assert info_b["n_resamples"][b] == info_s["n_resamples"]
            np.testing.assert_allclose(
                info_b["final_weight_ess"][b], info_s["final_weight_ess"],
                rtol=1e-12)

    def test_campaign_mesh_matches_unsharded(self):
        """Campaigns sharded over a device mesh equal the single-device
        batch (embarrassingly parallel — no collectives to reorder)."""
        config, consts, y, thr = _setup()
        B, K = 4, 4
        keys = _stack_keys(3, B, K)
        ti = np.zeros((1, config.n))
        mesh = Mesh(np.array(jax.devices()[:4]), ("campaigns",))

        st_u, info_u = anneal_init_batched(
            keys, y, ti, thr, consts, config, n_steps=16, max_temp=8.0)
        st_s, info_s = anneal_init_batched(
            keys, y, ti, thr, consts, config, n_steps=16, max_temp=8.0,
            mesh=mesh)
        for lu, ls in zip(jax.tree_util.tree_leaves(st_u),
                          jax.tree_util.tree_leaves(st_s)):
            np.testing.assert_allclose(np.asarray(lu), np.asarray(ls),
                                       rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(info_u["final_weight_ess"],
                                   info_s["final_weight_ess"], rtol=1e-9)

    def test_validation(self):
        config, consts, y, thr = _setup()
        keys = _stack_keys(0, 3, 4)
        mesh = Mesh(np.array(jax.devices()[:4]), ("campaigns",))
        with pytest.raises(ValueError, match="divide"):
            anneal_init_batched(keys, y, np.zeros((1, config.n)), thr,
                                consts, config, n_steps=8, mesh=mesh)
        with pytest.raises(ValueError, match="no axis"):
            anneal_init_batched(keys, y, np.zeros((1, config.n)), thr,
                                consts, config, n_steps=8, mesh=mesh,
                                campaign_axis="chains")


class TestCampaignSampling:
    @pytest.mark.slow
    def test_flat_lanes_equal_solo_campaign(self):
        """The flattened (B*K)-lane sampling run reproduces each campaign's
        solo run exactly: lane keys are per-chain, so batching cannot mix
        campaigns."""
        config, consts, y, thr = _setup()
        B, K = 2, 4
        keys = _stack_keys(21, B, K)
        ti = np.zeros((1, config.n))
        st, _ = anneal_init_batched(keys, y, ti, thr, consts, config,
                                    n_steps=12, max_temp=8.0)
        flat = jax.tree_util.tree_map(
            lambda a: a.reshape((B * K,) + a.shape[2:]), st)
        d_all = run_chains_chunked(
            keys.reshape((B * K,)), y, ti, thr, consts, config,
            sample_iterations=5, burn_iterations=3, initial_states=flat)
        for b in range(B):
            st_b = jax.tree_util.tree_map(lambda a: a[b], st)
            d_b = run_chains_chunked(
                keys[b], y, ti, thr, consts, config,
                sample_iterations=5, burn_iterations=3, initial_states=st_b)
            np.testing.assert_array_equal(
                np.asarray(d_all["theta"])[b * K:(b + 1) * K],
                np.asarray(d_b["theta"]))


class TestGpirtCampaigns:
    def _binary_data(self, n=12, m=8, seed=0):
        """Voteview-coded roll-call matrix: 1 = yea, 6 = nay, 9 = missing."""
        rng = np.random.default_rng(seed)
        theta = np.linspace(-2, 2, n)
        p = 1 / (1 + np.exp(-np.outer(theta, rng.standard_normal(m))))
        data = np.where(rng.random((n, m)) < p, 1.0, 6.0)
        data[rng.random((n, m)) < 0.1] = 9.0
        # avoid unanimity drops
        data[0] = 6.0
        data[-1] = 1.0
        return data

    def test_end_to_end_shapes_and_estimator(self):
        data = self._binary_data()
        R, K, S = 3, 4, 6
        out = gpirt_campaigns(
            data, n_campaigns=R, n_chains=K, sample_iterations=S,
            burn_iterations=2, smc_steps=10, smc_max_temp=8.0,
            SEED=7, dtype="float64", grid_size=101, verbose=False)
        n = data.shape[0]
        assert out["theta_mean"].shape == (n, 1)
        assert out["theta_se"].shape == (n, 1)
        assert out["campaign_means"].shape == (R, n, 1)
        assert out["ess_campaign"].shape == (n, 1)
        assert np.all(np.isfinite(out["theta_mean"]))
        assert np.all(out["theta_se"] >= 0)
        assert np.isfinite(out["ess_campaign_median"])
        assert out["pooled_ess_per_campaign"].shape == (R,)
        assert out["final_weight_ess"].shape == (R,)
        assert out["draws"]["theta"].shape == (R, K, S, n, 1)
        assert out["draws"]["ll"].shape == (R, K, S)
        # the replicated SE must satisfy the defining identity
        cm = np.moveaxis(out["campaign_means"], 0, 0)  # (R, n, 1)
        np.testing.assert_allclose(
            out["theta_se"], np.sqrt(cm.var(axis=0, ddof=1) / R), rtol=1e-12)
        # binary default schedule resolves to the newton kernel
        assert out["schedule"]["threshold_method"] == "newton"

    @pytest.mark.slow
    def test_campaigns_are_seed_reproducible(self):
        data = self._binary_data()
        kw = dict(n_campaigns=2, n_chains=3, sample_iterations=4,
                  burn_iterations=2, smc_steps=8, smc_max_temp=8.0,
                  SEED=3, dtype="float64", grid_size=101, verbose=False)
        a = gpirt_campaigns(data, **kw)
        b = gpirt_campaigns(data, **kw)
        np.testing.assert_array_equal(a["theta_mean"], b["theta_mean"])
        np.testing.assert_array_equal(a["draws"]["theta"],
                                      b["draws"]["theta"])

    def test_rejects_single_campaign(self):
        with pytest.raises(ValueError, match="n_campaigns"):
            gpirt_campaigns(self._binary_data(), n_campaigns=1,
                            verbose=False)

    def test_schedule_defaults(self):
        s2 = campaign_schedule(2)
        s5 = campaign_schedule(5)
        assert s2["threshold_method"] == "newton"
        assert s5["threshold_method"] == "ess"
        assert s2["smc_steps"] == 160 and s2["burn_iterations"] == 25

    @pytest.mark.slow
    def test_campaign_mesh_end_to_end(self):
        data = self._binary_data()
        mesh = Mesh(np.array(jax.devices()[:2]), ("campaigns",))
        kw = dict(n_campaigns=2, n_chains=4, sample_iterations=4,
                  burn_iterations=2, smc_steps=8, smc_max_temp=8.0,
                  SEED=5, dtype="float64", grid_size=101, verbose=False)
        a = gpirt_campaigns(data, **kw)
        b = gpirt_campaigns(data, mesh=mesh, **kw)
        np.testing.assert_allclose(a["theta_mean"], b["theta_mean"],
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(a["theta_se"], b["theta_se"],
                                   rtol=1e-8, atol=1e-12)
