"""Multi-chain shard_map tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpirt_tpu.models import GPIRTConfig, make_constants
from gpirt_tpu.parallel import run_chains, make_chain_mesh, chain_keys
from gpirt_tpu.utils.diagnostics import split_rhat, effective_sample_size

from test_sampler import sim_2pl, binary_thresholds, default_priors


def _setup(n=16, m=6, seed=0):
    theta_true, y = sim_2pl(seed, n=n, m=m)
    H, n, m = y.shape
    config = GPIRTConfig(n=n, m=m, horizon=H, C=2, dtype="float64")
    consts = make_constants(config, **default_priors(n, m))
    theta_init = np.linspace(-2, 2, n)[None]
    return y, theta_init, binary_thresholds(m), consts, config


class TestChains:
    def test_vmap_chains_differ(self):
        y, ti, thr, consts, config = _setup()
        keys = chain_keys(1, 4)
        draws = run_chains(
            keys, jnp.asarray(y), ti, thr, consts, config,
            sample_iterations=10, burn_iterations=0,
        )
        t = np.asarray(draws["theta"])  # (K, S, H, n)
        assert t.shape[:2] == (4, 10)
        # different keys -> different trajectories
        assert not np.allclose(t[0], t[1])

    def test_sharded_matches_unsharded(self):
        y, ti, thr, consts, config = _setup()
        keys = chain_keys(3, 8)
        mesh = make_chain_mesh(8)
        a = run_chains(keys, jnp.asarray(y), ti, thr, consts, config,
                       sample_iterations=5, burn_iterations=0)
        b = run_chains(keys, jnp.asarray(y), ti, thr, consts, config,
                       sample_iterations=5, burn_iterations=0, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(a["theta"]), np.asarray(b["theta"]), rtol=1e-8, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(a["ll"]), np.asarray(b["ll"]), rtol=1e-8
        )

    def test_uneven_chains_raise(self):
        y, ti, thr, consts, config = _setup()
        keys = chain_keys(0, 6)
        mesh = make_chain_mesh(4)
        import pytest
        with pytest.raises(ValueError):
            run_chains(keys, jnp.asarray(y), ti, thr, consts, config,
                       sample_iterations=2, burn_iterations=0, mesh=mesh)


class TestDiagnostics:
    def test_rhat_iid_near_one(self):
        rng = np.random.default_rng(0)
        draws = rng.standard_normal((4, 500, 3))
        rh = split_rhat(draws)
        assert np.all(rh < 1.05)

    def test_rhat_detects_nonmixing(self):
        rng = np.random.default_rng(1)
        draws = rng.standard_normal((4, 500, 1)) + np.arange(4)[:, None, None] * 3
        assert split_rhat(draws)[0] > 2.0

    def test_ess_iid(self):
        rng = np.random.default_rng(2)
        draws = rng.standard_normal((2, 2000, 2))
        ess = effective_sample_size(draws)
        assert np.all(ess > 2000), ess  # ~4000 for iid

    def test_ess_autocorrelated(self):
        rng = np.random.default_rng(3)
        S = 4000
        rho = 0.9
        x = np.zeros((1, S, 1))
        e = rng.standard_normal(S)
        for t in range(1, S):
            x[0, t, 0] = rho * x[0, t - 1, 0] + e[t]
        ess = effective_sample_size(x)[0]
        # AR(1): ESS ~ S * (1-rho)/(1+rho) ~ S/19
        assert S / 40 < ess < S / 8, ess

    def test_pooled_chain_ess(self):
        """ESS pooled across chains should scale ~linearly in chains."""
        rng = np.random.default_rng(4)
        one = rng.standard_normal((1, 1000, 1))
        many = rng.standard_normal((8, 1000, 1))
        r = effective_sample_size(many)[0] / effective_sample_size(one)[0]
        assert 5 < r < 12, r


class TestChunkedChains:
    @pytest.mark.slow
    def test_chunked_matches_unchunked(self):
        from gpirt_tpu.parallel import run_chains_chunked

        y, ti, thr, consts, config = _setup(n=10, m=5)
        keys = chain_keys(1, 3)
        kw = dict(sample_iterations=7, burn_iterations=2, thin=2)
        a = run_chains(keys, jnp.asarray(y), ti, thr, consts, config, **kw)
        b = run_chains_chunked(keys, jnp.asarray(y), ti, thr, consts, config,
                               chunk_iterations=4, **kw)
        np.testing.assert_array_equal(np.asarray(a["theta"]), b["theta"])
        np.testing.assert_allclose(np.asarray(a["ll"]), b["ll"], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(a["beta"]), b["beta"], rtol=1e-12)

    @pytest.mark.slow
    def test_chunked_sharded_matches_unsharded(self):
        """The chunked driver's shard_map path (mesh=) reproduces the
        single-device chunked run (same key schedule; shard_map vs vmap
        compile differently, so f64 associativity tolerance only)."""
        from gpirt_tpu.parallel import run_chains_chunked

        y, ti, thr, consts, config = _setup(n=10, m=5)
        keys = chain_keys(5, 8)
        mesh = make_chain_mesh(8)
        kw = dict(sample_iterations=6, burn_iterations=2, thin=2,
                  chunk_iterations=4)
        a = run_chains_chunked(keys, jnp.asarray(y), ti, thr, consts, config,
                               **kw)
        b = run_chains_chunked(keys, jnp.asarray(y), ti, thr, consts, config,
                               mesh=mesh, **kw)
        np.testing.assert_allclose(np.asarray(a["theta"]),
                                   np.asarray(b["theta"]),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(a["ll"]), np.asarray(b["ll"]),
                                   rtol=1e-8)

    def test_chunked_uneven_chains_raise(self):
        from gpirt_tpu.parallel import run_chains_chunked
        import pytest

        y, ti, thr, consts, config = _setup(n=8, m=4)
        keys = chain_keys(0, 6)
        mesh = make_chain_mesh(4)
        with pytest.raises(ValueError, match="divide evenly"):
            run_chains_chunked(keys, jnp.asarray(y), ti, thr, consts, config,
                               sample_iterations=2, burn_iterations=0,
                               mesh=mesh)


class TestAlignedChunking:
    """aligned_records_chunk: burn rides the records program (one compiled
    sweep program for the whole run) with an identical key schedule."""

    def test_helper_picks_common_divisor(self):
        from gpirt_tpu.parallel.chains import aligned_records_chunk

        # bench shape: burn 100, 500 records, thin 1, cap 250 -> rc=100
        assert aligned_records_chunk(100, 500, 1, 250) == 100
        # no burn: any rc dividing samples, largest <= cap
        assert aligned_records_chunk(0, 500, 1, 250) == 250
        # thin 2: windows are rc*2 sweeps
        rc = aligned_records_chunk(100, 50, 2, 100)
        assert rc is not None and 100 % (rc * 2) == 0 and 50 % rc == 0
        # tiny runs fall below the floor -> fallback
        assert aligned_records_chunk(2, 7, 2, 4) is None
        # coprime schedules -> fallback
        assert aligned_records_chunk(97, 499, 1, 250) is None

    def test_aligned_matches_unchunked(self):
        from gpirt_tpu.parallel import run_chains_chunked

        y, ti, thr, consts, config = _setup(n=8, m=4)
        keys = chain_keys(2, 2)
        kw = dict(sample_iterations=100, burn_iterations=50, thin=1)
        a = run_chains(keys, jnp.asarray(y), ti, thr, consts, config, **kw)
        # chunk 50 -> rc=50: burn = 1 records window, sampling = 2
        b = run_chains_chunked(keys, jnp.asarray(y), ti, thr, consts, config,
                               chunk_iterations=50, **kw)
        np.testing.assert_array_equal(np.asarray(a["theta"]), b["theta"])
        np.testing.assert_allclose(np.asarray(a["ll"]), b["ll"], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(a["beta"]), b["beta"],
                                   rtol=1e-12)

    def test_aligned_checkpoint_resume_mixed_chunks(self, tmp_path):
        """Interrupt under one aligned chunking, resume under another: the
        absolute-iteration key schedule makes the draws identical."""
        import os
        from gpirt_tpu.utils.checkpoint import (
            CheckpointManager, run_chains_checkpointed,
        )

        y, ti, thr, consts, config = _setup(n=8, m=4)
        keys = chain_keys(3, 2)
        kw = dict(sample_iterations=50, burn_iterations=50, thin=1)
        full = run_chains_checkpointed(
            keys, jnp.asarray(y), ti, thr, consts, config,
            manager=CheckpointManager(os.path.join(tmp_path, "full.npz")),
            checkpoint_every=50, **kw,
        )
        mgr = CheckpointManager(os.path.join(tmp_path, "ck.npz"))
        run_chains_checkpointed(
            keys, jnp.asarray(y), ti, thr, consts, config, manager=mgr,
            checkpoint_every=50,
            sample_iterations=25, burn_iterations=50, thin=1,
        )
        resumed = run_chains_checkpointed(
            keys, jnp.asarray(y), ti, thr, consts, config, manager=mgr,
            checkpoint_every=50, **kw,
        )
        np.testing.assert_array_equal(full["theta"], resumed["theta"])
        np.testing.assert_array_equal(full["ll"], resumed["ll"])


class TestRicherDiagnostics:
    def test_rank_rhat_iid_near_one(self):
        from gpirt_tpu.utils.diagnostics import rank_normalized_rhat

        rng = np.random.default_rng(0)
        x = rng.standard_normal((4, 500, 3))
        assert np.all(rank_normalized_rhat(x) < 1.02)

    def test_rank_rhat_detects_scale_mismatch(self):
        """Chains agreeing in mean but not scale: plain split-Rhat is blind
        (location-based), the folded rank statistic is not — the case the
        rank-normalized diagnostic exists for (Vehtari et al. 2021)."""
        from gpirt_tpu.utils.diagnostics import rank_normalized_rhat, split_rhat

        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 600, 1))
        x[2:] *= 4.0  # same mean, 4x the scale
        assert np.all(split_rhat(x) < 1.05)  # blind
        assert np.all(rank_normalized_rhat(x) > 1.15)  # caught

    def test_tail_ess_slower_than_bulk_for_sticky_tails(self):
        from gpirt_tpu.utils.diagnostics import tail_ess, effective_sample_size

        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 2000, 1))
        te = tail_ess(x)
        bulk = effective_sample_size(x)
        assert 0.2 * bulk[0] < te[0] <= 1.5 * bulk[0]  # iid: same order
        # AR(1) with heavy persistence only in the tails via a slow regime
        z = rng.standard_normal((2, 2000, 1))
        for s in range(1, 2000):
            z[:, s] = 0.98 * z[:, s - 1] + 0.2 * z[:, s]
        assert tail_ess(z)[0] < 0.2 * z.shape[1] * 2

    def test_basin_clusters_splits_groups(self):
        from gpirt_tpu.utils.diagnostics import basin_clusters

        rng = np.random.default_rng(3)
        base_a = np.linspace(-2, 2, 30)
        base_b = np.tanh(np.linspace(-2, 2, 30)) * 2.5  # warped variant
        means = np.stack(
            [base_a + 0.02 * rng.standard_normal(30) for _ in range(5)]
            + [base_b + 0.02 * rng.standard_normal(30) for _ in range(3)]
        )
        # reflection must not create spurious clusters
        means[1] *= -1
        out = basin_clusters(means, corr_threshold=0.995)
        assert out["n_clusters"] == 2
        assert sorted(out["sizes"]) == [3, 5]
        assert (out["labels"][:5] == out["labels"][0]).all()
        assert (out["labels"][5:] == out["labels"][5]).all()
        # one basin -> one cluster
        one = basin_clusters(means[:5], corr_threshold=0.995)
        assert one["n_clusters"] == 1

    def test_summarize_has_new_keys(self):
        from gpirt_tpu.utils.diagnostics import summarize

        x = np.random.default_rng(4).standard_normal((2, 200, 2))
        s = summarize(x)
        for k in ("ess_tail_min", "rhat_rank_max", "ess_median", "rhat_max"):
            assert k in s and np.isfinite(s[k])
