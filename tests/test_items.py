"""Item-axis model parallelism (parallel/items.py) on the 8-device CPU mesh.

The item-sharded sweep's only cross-shard coupling is the theta-table psum
(+ the scalar ll psum); everything else is the same per-item code running
on item slices. The tests therefore split into:

  * exactness of the coupled part — the sharded draw_theta must reproduce
    the unsharded draw bit-for-bit-in-distribution (same key, psum'd table
    equal to the full-m table up to summation order; f64 makes the
    Gumbel-argmax insensitive to that reordering);
  * end-to-end shape/recovery checks of the full sharded driver on a 2-D
    (chains x items) mesh, including that the replicated theta trajectory
    is consistent with a correct sampler (recovers simulated truth).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gpirt_tpu.models import GPIRTConfig, make_constants
from gpirt_tpu.models.gibbs import (
    GPIRTState,
    compute_mu_star,
    draw_theta,
    init_state,
    theta_from_indices,
)
from gpirt_tpu.parallel.items import (
    consts_item_specs,
    make_item_mesh,
    run_chains_itemsharded,
)
from gpirt_tpu.parallel import chain_keys

from test_sampler import sim_2pl, binary_thresholds, default_priors

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _setup(n=16, m=8, seed=0):
    theta_true, y = sim_2pl(seed, n=n, m=m)
    H, n, m = y.shape
    config = GPIRTConfig(n=n, m=m, horizon=H, C=2, dtype="float64")
    consts = make_constants(config, **default_priors(n, m))
    theta_init = np.linspace(-2, 2, n)[None]
    return theta_true, jnp.asarray(y), theta_init, binary_thresholds(m), \
        consts, config


def _state_specs(item_axis):
    return GPIRTState(
        theta_idx=P(),
        f=P(None, None, item_axis),
        beta=P(None, None, item_axis),
        thresholds=P(None, item_axis, None),
        fstar=P(None, None, item_axis),
    )


class TestDrawThetaSharded:
    def test_matches_unsharded_bitwise_in_f64(self):
        """The coupled block: items-sharded draw_theta == unsharded, same key.

        The psum'd partial tables equal the full-m contraction up to float
        summation order; in f64 at these scales the Gumbel-argmax result is
        insensitive to that reordering, so the drawn theta_idx must match
        EXACTLY."""
        _, y, ti, thr, consts, config = _setup()
        state = init_state(jax.random.key(5), jnp.asarray(ti), jnp.asarray(thr),
                           y, consts, config)
        mu_star = compute_mu_star(consts, state.beta)
        key = jax.random.key(11)

        ref = draw_theta(key, state, mu_star, y, consts, config)

        mesh = Mesh(np.asarray(jax.devices()), ("items",))
        fn = shard_map(
            lambda s, ms, yy, cc: draw_theta(key, s, ms, yy, cc, config,
                                             None, "items"),
            mesh=mesh,
            in_specs=(_state_specs("items"), P(None, None, "items"),
                      P(None, None, "items"), consts_item_specs(consts, "items")),
            out_specs=P(),
            check_vma=False,
        )
        got = jax.jit(fn)(state, mu_star, y, consts)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_gp_regime_sharded(self):
        """The GP time-prior regime's session scan under item sharding."""
        rng = np.random.default_rng(3)
        H, n, m = 4, 10, 8
        y = rng.integers(1, 3, size=(H, n, m)).astype(np.int32)
        config = GPIRTConfig(n=n, m=m, horizon=H, C=2, dtype="float64",
                             theta_ls=1.5)
        assert config.theta_regime == "GP"
        consts = make_constants(config, **default_priors(n, m))
        ti = np.tile(np.linspace(-2, 2, n)[None], (H, 1))
        thr = binary_thresholds(m, H)
        yj = jnp.asarray(y)
        state = init_state(jax.random.key(5), jnp.asarray(ti),
                           jnp.asarray(thr), yj, consts, config)
        mu_star = compute_mu_star(consts, state.beta)
        key = jax.random.key(7)
        ref = draw_theta(key, state, mu_star, yj, consts, config)
        mesh = Mesh(np.asarray(jax.devices()), ("items",))
        fn = shard_map(
            lambda s, ms, yy, cc: draw_theta(key, s, ms, yy, cc, config,
                                             None, "items"),
            mesh=mesh,
            in_specs=(_state_specs("items"), P(None, None, "items"),
                      P(None, None, "items"), consts_item_specs(consts, "items")),
            out_specs=P(),
            check_vma=False,
        )
        got = jax.jit(fn)(state, mu_star, yj, consts)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestItemShardedDriver:
    @pytest.mark.slow
    def test_shapes_and_recovery_2d_mesh(self):
        theta_true, y, ti, thr, consts, config = _setup(n=24, m=16)
        mesh = make_item_mesh(4, 2)  # (chains=2, items=4)
        keys = chain_keys(1, 4)
        draws = run_chains_itemsharded(
            keys, y, ti, thr, consts, config,
            sample_iterations=150, burn_iterations=50, mesh=mesh,
        )
        H, n, m = y.shape
        assert draws["theta"].shape == (4, 150, H, n)
        assert draws["beta"].shape == (4, 150, H, 3, m)
        assert draws["threshold"].shape == (4, 150, H, m, 3)
        assert draws["ll"].shape == (4, 150)
        ll = np.asarray(draws["ll"])
        assert np.all(np.isfinite(ll))
        # posterior mean recovers simulated truth (chains sign-aligned)
        t = np.asarray(draws["theta"])[:, :, 0]  # (K, S, n)
        ch = t.mean(axis=1)  # (K, n)
        sign = np.sign(ch @ theta_true)[:, None]
        sign[sign == 0] = 1
        pooled = (ch * sign).mean(axis=0)
        r = np.corrcoef(pooled, theta_true)[0, 1]
        assert r > 0.9, r

    def test_items_only_mesh_and_stores(self):
        _, y, ti, thr, consts, config = _setup(n=12, m=8)
        mesh = Mesh(np.asarray(jax.devices()), ("items",))
        keys = chain_keys(2, 2)
        draws = run_chains_itemsharded(
            keys, y, ti, thr, consts, config,
            sample_iterations=5, burn_iterations=0, mesh=mesh,
            store_f=True, store_fstar=True,
        )
        H, n, m = y.shape
        assert draws["f"].shape == (2, 5, H, n, m)
        assert draws["fstar"].shape == (2, 5, H, config.grid_size, m)
        assert np.all(np.isfinite(np.asarray(draws["fstar"])))

    @pytest.mark.slow
    def test_chunked_driver_matches_monolithic(self):
        """run_chains_chunked(mesh, item_axis=...) — the bounded-execution
        production path — reproduces the monolithic item-sharded driver
        (identical absolute-iteration key schedule; f64 associativity
        tolerance across the two compilations)."""
        from gpirt_tpu.parallel.chains import run_chains_chunked

        _, y, ti, thr, consts, config = _setup(n=8, m=8)
        import dataclasses
        config = dataclasses.replace(config, f_method="conjugate")
        mesh = make_item_mesh(4, n_chain_shards=2)
        keys = chain_keys(3, 4)
        kw = dict(sample_iterations=5, burn_iterations=2, thin=1)
        a = run_chains_itemsharded(keys, y, ti, thr, consts, config,
                                   mesh=mesh, **kw)
        b = run_chains_chunked(keys, y, ti, thr, consts, config,
                               mesh=mesh, item_axis="items",
                               chunk_iterations=4, **kw)
        np.testing.assert_allclose(np.asarray(a["theta"]),
                                   np.asarray(b["theta"]),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(a["ll"]), np.asarray(b["ll"]),
                                   rtol=1e-8)

    def test_uneven_items_raise(self):
        _, y, ti, thr, consts, config = _setup(n=12, m=6)  # 6 % 8 != 0
        mesh = Mesh(np.asarray(jax.devices()), ("items",))
        with pytest.raises(ValueError):
            run_chains_itemsharded(
                chain_keys(0, 1), y, ti, thr, consts, config,
                sample_iterations=1, burn_iterations=0, mesh=mesh,
            )

    def test_api_item_axis(self):
        """gpirt_mcmc(mesh=..., item_axis=...) end to end."""
        from gpirt_tpu.api import gpirt_mcmc

        theta_true, y, _, _, _, _ = _setup(n=12, m=8)
        mesh = make_item_mesh(4, 2)
        out = gpirt_mcmc(
            np.asarray(y[0], float), sample_iterations=10, burn_iterations=5,
            CHAIN=2, vote_codes=None, dtype="float64", verbose=False,
            mesh=mesh, item_axis="items",
        )
        assert len(out) == 2
        assert out[0]["theta"].shape == (10, 12, 1)
        assert out[0]["beta"].shape == (10, 3, 8, 1)
        assert np.all(np.isfinite(out[0]["ll"]))

    def test_api_item_axis_validation(self):
        from gpirt_tpu.api import gpirt_mcmc

        _, y, _, _, _, _ = _setup(n=12, m=8)
        with pytest.raises(ValueError):  # no mesh
            gpirt_mcmc(np.asarray(y[0], float), sample_iterations=1,
                       burn_iterations=0, vote_codes=None, verbose=False,
                       item_axis="items")
        mesh = make_item_mesh(4, 2)
        with pytest.raises(ValueError):  # checkpointing combination
            gpirt_mcmc(np.asarray(y[0], float), sample_iterations=1,
                       burn_iterations=0, vote_codes=None, verbose=False,
                       mesh=mesh, item_axis="items",
                       checkpoint_path="/tmp/nope")

    def test_smc_item_sharded_pipeline(self):
        """The FULL default pipeline on a 2-D mesh: item-sharded SMC
        annealing feeding item-sharded sampling (anneal_init(item_axis=...)
        -> run_chains_itemsharded(initial_states=...)), via gpirt_mcmc."""
        from gpirt_tpu.api import gpirt_mcmc

        _, y, _, _, _, _ = _setup(n=12, m=8)
        mesh = make_item_mesh(4, 2)
        out = gpirt_mcmc(
            np.asarray(y[0], float), sample_iterations=8, burn_iterations=2,
            CHAIN=4, vote_codes=None, dtype="float64", verbose=False,
            mesh=mesh, item_axis="items", smc_steps=6, smc_max_temp=8.0,
        )
        assert len(out) == 4
        assert out[0]["theta"].shape == (8, 12, 1)
        assert all(np.all(np.isfinite(d["ll"])) for d in out)

    def test_non_conjugate_raises(self):
        _, y, ti, thr, consts, config = _setup(n=12, m=8)
        config = GPIRTConfig(n=config.n, m=config.m, horizon=config.horizon,
                             C=2, dtype="float64", f_method="grid")
        mesh = Mesh(np.asarray(jax.devices()), ("items",))
        with pytest.raises(NotImplementedError):
            run_chains_itemsharded(
                chain_keys(0, 1), y, ti, thr, consts, config,
                sample_iterations=1, burn_iterations=0, mesh=mesh,
            )


class TestAffineSharded:
    """Collective affine (theta, beta) moves under item sharding: both the
    sharded and unsharded evaluations use the SAME dense (n, n) orbit math
    (theta_idx is full-n on every item shard); the only difference is the
    psum completion of the per-item quadratic-form and beta-prior sums, so
    outputs match to float64 summation order — theta_idx exactly."""

    @pytest.mark.slow
    def test_moves_match_unsharded(self):
        import dataclasses
        from gpirt_tpu.models.gibbs import affine_theta_moves

        _, y, ti, thr, consts, config = _setup(n=16, m=8)
        config = dataclasses.replace(config, affine_rounds=4,
                                     affine_shift_max=3)
        H, n, m = y.shape
        rng = np.random.default_rng(7)
        idx = jnp.asarray(rng.integers(20, config.grid_size - 20, (H, n)),
                          jnp.int32)
        z = jnp.asarray(rng.normal(size=(H, n, m)))
        beta = jnp.asarray(0.3 * rng.normal(size=(H, 3, m)))
        key = jax.random.key(4)
        ref_idx, ref_beta = affine_theta_moves(key, idx, z, beta, consts,
                                               config)

        mesh = Mesh(np.asarray(jax.devices()), ("items",))
        fn = shard_map(
            lambda i, zz, bb, cc: affine_theta_moves(
                key, i, zz, bb, cc, config, item_axis="items"),
            mesh=mesh,
            in_specs=(P(), P(None, None, "items"), P(None, None, "items"),
                      consts_item_specs(consts, "items")),
            out_specs=(P(), P(None, None, "items")),
            check_vma=False,
        )
        got_idx, got_beta = jax.jit(fn)(idx, z, beta, consts)
        np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))
        np.testing.assert_allclose(np.asarray(got_beta), np.asarray(ref_beta),
                                   rtol=1e-12, atol=1e-14)

    def test_driver_runs_with_affine(self):
        """The item-sharded driver end-to-end with affine moves enabled
        (formerly a NotImplementedError)."""
        import dataclasses

        _, y, ti, thr, consts, config = _setup(n=16, m=8)
        config = dataclasses.replace(config, affine_rounds=1,
                                     affine_shift_max=1)
        mesh = make_item_mesh(4, n_chain_shards=2)
        draws = run_chains_itemsharded(
            chain_keys(3, 4), y, ti, thr, consts, config,
            sample_iterations=6, burn_iterations=2, mesh=mesh,
        )
        H, n, m = y.shape
        assert draws["theta"].shape == (4, 6, H, n)
        assert np.all(np.isfinite(np.asarray(draws["ll"])))
