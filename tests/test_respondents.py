"""Respondent-axis model parallelism (parallel/respondents.py) on the
8-device CPU mesh.

The respondent-sharded sweep's cross-shard couplings are the psum-completed
sufficient statistics of the per-item conditional draws (fstar's rank-(q+3)
projections, beta's 3x3 regression stats, each cutpoint ESS round's lane
totals, the collapsed draw's z-box extrema). The tests split into:

  * exactness of each coupled block — run under shard_map with the SAME
    replicated key, the psum'd statistics equal the unsharded reductions up
    to float summation order, so in f64 the drawn beta/thresholds (and the
    deterministic lowrank_bsolve) must match the unsharded call to ~1e-12;
  * replication invariants — beta/thresholds/fstar must come out IDENTICAL
    on every respondent shard (the design's correctness precondition);
  * end-to-end shape/recovery checks of the full sharded driver on 2-D
    (chains x respondents) and 3-D (chains x items x respondents) meshes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gpirt_tpu.models import GPIRTConfig, make_constants
from gpirt_tpu.models.gibbs import (
    GPIRTState,
    draw_beta_conjugate,
    draw_threshold,
    draw_threshold_collapsed,
    init_state,
    lowrank_bsolve,
    theta_from_indices,
)
from gpirt_tpu.parallel.respondents import (
    consts_mesh_specs,
    make_respondent_mesh,
    run_chains_respondentsharded,
)
from gpirt_tpu.parallel import chain_keys

from test_sampler import sim_2pl, binary_thresholds, default_priors

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _setup(n=16, m=8, seed=0, C=2):
    from gpirt_tpu.api import default_thresholds

    theta_true, y = sim_2pl(seed, n=n, m=m)
    if C > 2:
        rng = np.random.default_rng(seed + 1)
        y = np.where(np.asarray(y) > 0,
                     rng.integers(1, C + 1, size=np.asarray(y).shape),
                     0).astype(np.int32)
    H, n, m = np.asarray(y).shape
    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float64")
    consts = make_constants(config, **default_priors(n, m))
    theta_init = np.linspace(-2, 2, n)[None]
    thr = binary_thresholds(m) if C == 2 else default_thresholds(C, m, H)
    return theta_true, jnp.asarray(np.asarray(y)), theta_init, thr, consts, \
        config


RAX = "respondents"


def _resp_mesh():
    return Mesh(np.asarray(jax.devices()), (RAX,))


class TestLowrankBsolvePsum:
    def test_matches_unsharded(self):
        """The capacitance solve with psum'd U^T-contractions equals the
        full-n solve (f64; summation-order differences only)."""
        _, y, ti, thr, consts, config = _setup(n=24, m=8)
        H, n, m = y.shape
        rng = np.random.default_rng(0)
        idx = jnp.asarray(rng.integers(0, config.grid_size, size=(H, n)),
                          jnp.int32)
        r = jnp.asarray(rng.normal(size=(H, n, m)))
        x_ref, ld_ref = lowrank_bsolve(idx, consts, r)

        mesh = _resp_mesh()
        fn = shard_map(
            lambda i, rr, cc: lowrank_bsolve(i, cc, rr, psum_axis=RAX),
            mesh=mesh,
            in_specs=(P(None, RAX), P(None, RAX, None),
                      consts_mesh_specs(consts, None, RAX)),
            out_specs=(P(None, RAX, None), P()),
            check_vma=False,
        )
        x, ld = jax.jit(fn)(idx, r, consts)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_ref),
                                   rtol=1e-12)


class TestDrawBetaSharded:
    def test_matches_unsharded(self):
        """Replicated key + psum'd regression stats -> the sharded beta draw
        equals the unsharded draw to summation order."""
        _, y, ti, thr, consts, config = _setup(n=24, m=8)
        H, n, m = y.shape
        rng = np.random.default_rng(1)
        theta = jnp.asarray(rng.normal(size=(H, n)))
        zmf = jnp.asarray(rng.normal(size=(H, n, m)))
        key = jax.random.key(3)
        ref = draw_beta_conjugate(key, theta, zmf, consts, config)

        mesh = _resp_mesh()
        fn = shard_map(
            lambda t, z, cc: draw_beta_conjugate(key, t, z, cc, config,
                                                 respondent_axis=RAX),
            mesh=mesh,
            in_specs=(P(None, RAX), P(None, RAX, None),
                      consts_mesh_specs(consts, None, RAX)),
            out_specs=P(),
            check_vma=False,
        )
        got = jax.jit(fn)(theta, zmf, consts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-8, atol=1e-10)


class TestDrawThresholdSharded:
    @pytest.mark.parametrize("C", [2, 4])
    def test_ess_matches_unsharded(self, C):
        """Replicated key + psum'd lane log-likelihoods -> identical ESS
        accept decisions -> identical cutpoints (binary twophase and C>2
        one-hot paths)."""
        _, y, ti, thr, consts, config = _setup(n=24, m=8, C=C)
        H, n, m = y.shape
        rng = np.random.default_rng(2)
        f = jnp.asarray(rng.normal(size=(H, n, m)))
        mu = jnp.asarray(0.1 * rng.normal(size=(H, n, m)))
        thr = jnp.asarray(thr)
        key = jax.random.key(7)
        ref = draw_threshold(key, thr, f, mu, y, config)

        mesh = _resp_mesh()
        fn = shard_map(
            lambda ff, mm, yy: draw_threshold(key, thr, ff, mm, yy, config,
                                              psum_axis=RAX),
            mesh=mesh,
            in_specs=(P(None, RAX, None), P(None, RAX, None),
                      P(None, RAX, None)),
            out_specs=P(),
            check_vma=False,
        )
        got = jax.jit(fn)(f, mu, y)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)

    @pytest.mark.parametrize("C", [2, 4])
    def test_newton_matches_unsharded(self, C):
        """Replicated key + psum'd Newton data sums -> identical proposals
        and accept decisions -> identical cutpoints (binary scalar kernel
        and the ordinal joint delta-space kernel)."""
        import dataclasses
        _, y, ti, thr, consts, config = _setup(n=24, m=8, C=C)
        config = dataclasses.replace(config, threshold_method="newton")
        H, n, m = y.shape
        rng = np.random.default_rng(2)
        f = jnp.asarray(rng.normal(size=(H, n, m)))
        mu = jnp.asarray(0.1 * rng.normal(size=(H, n, m)))
        thr = jnp.asarray(thr)
        key = jax.random.key(7)
        ref = draw_threshold(key, thr, f, mu, y, config)

        mesh = _resp_mesh()
        fn = shard_map(
            lambda ff, mm, yy: draw_threshold(key, thr, ff, mm, yy, config,
                                              psum_axis=RAX),
            mesh=mesh,
            in_specs=(P(None, RAX, None), P(None, RAX, None),
                      P(None, RAX, None)),
            out_specs=P(),
            check_vma=False,
        )
        got = jax.jit(fn)(f, mu, y)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)

    def test_collapsed_matches_unsharded(self):
        """The z-box extrema pool exactly via pmax/pmin."""
        _, y, ti, thr, consts, config = _setup(n=24, m=8)
        H, n, m = y.shape
        rng = np.random.default_rng(4)
        # synthetic z consistent with y's categories around the cutpoint 0
        z = jnp.asarray(np.where(np.asarray(y) == 2,
                                 np.abs(rng.normal(size=(H, n, m))) + 0.01,
                                 -np.abs(rng.normal(size=(H, n, m))) - 0.01))
        thr = jnp.asarray(thr)
        key = jax.random.key(9)
        ref = draw_threshold_collapsed(key, thr, z, y, config)

        mesh = _resp_mesh()
        fn = shard_map(
            lambda zz, yy: draw_threshold_collapsed(key, thr, zz, yy, config,
                                                    respondent_axis=RAX),
            mesh=mesh,
            in_specs=(P(None, RAX, None), P(None, RAX, None)),
            out_specs=P(),
            check_vma=False,
        )
        got = jax.jit(fn)(z, y)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12, atol=0)


class TestReplicationInvariant:
    def test_fstar_beta_thresholds_identical_across_shards(self):
        """After full sweeps under respondent sharding, the replicated
        leaves must be bit-consistent on every shard (the correctness
        precondition of the whole design)."""
        from gpirt_tpu.models.gibbs import gibbs_sweep

        _, y, ti, thr, consts, config = _setup(n=24, m=8)
        mesh = _resp_mesh()
        tij = jnp.asarray(ti, config.jdtype)
        thrj = jnp.asarray(thr, config.jdtype)

        def body(yy, ti_loc, cc):
            k = jax.random.key(0)
            s = init_state(k, ti_loc, thrj, yy, cc, config)
            for it in range(3):
                s, ll = gibbs_sweep(s, jax.random.fold_in(k, it), yy, cc,
                                    config, respondent_axis=RAX)
            # max abs deviation of the replicated leaves across shards —
            # must be exactly zero. NOTE: measured via all_gather (raw
            # bytes), NOT |v - pmean(v)|: summing P identical values is
            # tree-shape-dependent, so pmean(v) != v by an ulp even when
            # every shard agrees.
            def dev(v):
                g = jax.lax.all_gather(v, RAX)
                return jnp.max(jnp.abs(g - g[0]))
            return dev(s.fstar), dev(s.beta), dev(s.thresholds[:, :, 1:-1]), ll

        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(None, RAX, None), P(None, RAX),
                      consts_mesh_specs(consts, None, RAX)),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        d_fstar, d_beta, d_thr, ll = jax.jit(fn)(y, tij, consts)
        assert float(d_fstar) == 0.0
        assert float(d_beta) == 0.0
        assert float(d_thr) == 0.0
        assert np.isfinite(float(ll))


def test_psum_rank_consistent():
    """Canary for the sharded sweeps' replication precondition: ``psum``
    must hand BITWISE-identical results to every participant (the sharded
    designs re-derive replicated state from psum'd statistics on every
    shard; see the note above _HI in models/gibbs.py). If a backend ever
    violates this, the decision-feeding psums must switch to all_gather +
    a fixed-order local sum."""
    mesh = _resp_mesh()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8 * 13, 7)))

    def body(xl):
        s = jax.lax.psum(jnp.einsum("nk,nl->kl", xl, xl), RAX)
        g = jax.lax.all_gather(s, RAX)
        return jnp.max(jnp.abs(g - g[0]))

    fn = jax.jit(shard_map(body, mesh=mesh, in_specs=(P(RAX, None),),
                           out_specs=P(), check_vma=False))
    assert float(fn(x)) == 0.0


class TestRespondentShardedDriver:
    @pytest.mark.slow
    def test_shapes_and_recovery_2d_mesh(self):
        theta_true, y, ti, thr, consts, config = _setup(n=32, m=24)
        mesh = make_respondent_mesh(4, n_chain_shards=2)
        keys = chain_keys(1, 4)
        draws = run_chains_respondentsharded(
            keys, y, ti, thr, consts, config,
            sample_iterations=150, burn_iterations=50, mesh=mesh,
        )
        H, n, m = y.shape
        assert draws["theta"].shape == (4, 150, H, n)
        assert draws["beta"].shape == (4, 150, H, 3, m)
        assert draws["threshold"].shape == (4, 150, H, m, 3)
        assert draws["ll"].shape == (4, 150)
        assert np.all(np.isfinite(np.asarray(draws["ll"])))
        t = np.asarray(draws["theta"])[:, :, 0]  # (K, S, n)
        ch = t.mean(axis=1)  # (K, n)
        sign = np.sign(ch @ theta_true)[:, None]
        sign[sign == 0] = 1
        pooled = (ch * sign).mean(axis=0)
        r = np.corrcoef(pooled, theta_true)[0, 1]
        # measured: unsharded run_chains on this config lands at r ~ 0.80-0.89
        # (m = 24 items bounds the information); the bar checks the sharded
        # sampler is in the same band, not that the data is more informative
        assert r > 0.85, r

    @pytest.mark.slow
    def test_3d_mesh_chains_items_respondents(self):
        theta_true, y, ti, thr, consts, config = _setup(n=24, m=16)
        mesh = make_respondent_mesh(2, n_chain_shards=2, n_item_shards=2)
        keys = chain_keys(3, 2)
        draws = run_chains_respondentsharded(
            keys, y, ti, thr, consts, config,
            sample_iterations=100, burn_iterations=30, mesh=mesh,
            item_axis="items", store_f=True, store_fstar=True,
        )
        H, n, m = y.shape
        assert draws["theta"].shape == (2, 100, H, n)
        assert draws["beta"].shape == (2, 100, H, 3, m)
        assert draws["f"].shape == (2, 100, H, n, m)
        assert draws["fstar"].shape == (2, 100, H, config.grid_size, m)
        assert np.all(np.isfinite(np.asarray(draws["ll"])))
        t = np.asarray(draws["theta"])[:, :, 0]
        ch = t.mean(axis=1)
        sign = np.sign(ch @ theta_true)[:, None]
        sign[sign == 0] = 1
        pooled = (ch * sign).mean(axis=0)
        r = np.corrcoef(pooled, theta_true)[0, 1]
        assert r > 0.8, r

    def test_uneven_respondents_raise(self):
        _, y, ti, thr, consts, config = _setup(n=12, m=8)  # 12 % 8 != 0
        mesh = _resp_mesh()
        with pytest.raises(ValueError):
            run_chains_respondentsharded(
                chain_keys(0, 1), y, ti, thr, consts, config,
                sample_iterations=1, burn_iterations=0, mesh=mesh,
            )

    def test_non_conjugate_raises(self):
        _, y, ti, thr, consts, config = _setup(n=16, m=8)
        config = GPIRTConfig(n=config.n, m=config.m, horizon=config.horizon,
                             C=2, dtype="float64", f_method="grid")
        mesh = _resp_mesh()
        with pytest.raises(NotImplementedError):
            run_chains_respondentsharded(
                chain_keys(0, 1), y, ti, thr, consts, config,
                sample_iterations=1, burn_iterations=0, mesh=mesh,
            )


class TestAPI:
    def test_api_respondent_axis(self):
        """gpirt_mcmc(mesh=..., respondent_axis=...) end to end."""
        from gpirt_tpu.api import gpirt_mcmc

        _, y, _, _, _, _ = _setup(n=16, m=8)
        mesh = make_respondent_mesh(4, n_chain_shards=2)
        out = gpirt_mcmc(
            np.asarray(y[0], float), sample_iterations=10, burn_iterations=5,
            CHAIN=2, vote_codes=None, dtype="float64", verbose=False,
            mesh=mesh, respondent_axis="respondents",
        )
        assert len(out) == 2
        assert out[0]["theta"].shape == (10, 16, 1)
        assert out[0]["beta"].shape == (10, 3, 8, 1)
        assert np.all(np.isfinite(out[0]["ll"]))

    def test_api_respondent_axis_validation(self):
        from gpirt_tpu.api import gpirt_mcmc

        _, y, _, _, _, _ = _setup(n=16, m=8)
        with pytest.raises(ValueError):  # no mesh
            gpirt_mcmc(np.asarray(y[0], float), sample_iterations=1,
                       burn_iterations=0, vote_codes=None, verbose=False,
                       respondent_axis="respondents")
        mesh = make_respondent_mesh(4, n_chain_shards=2)
        with pytest.raises(ValueError):  # checkpointing combination
            gpirt_mcmc(np.asarray(y[0], float), sample_iterations=1,
                       burn_iterations=0, vote_codes=None, verbose=False,
                       mesh=mesh, respondent_axis="respondents",
                       checkpoint_path="/tmp/nope")

    def test_smc_respondent_sharded_pipeline(self):
        """The FULL default pipeline on a 2-D (chains x respondents) mesh:
        respondent-sharded SMC annealing feeding respondent-sharded sampling
        (anneal_init(respondent_axis=...) ->
        run_chains_respondentsharded(initial_states=...)), via gpirt_mcmc."""
        from gpirt_tpu.api import gpirt_mcmc

        _, y, _, _, _, _ = _setup(n=16, m=8)
        mesh = make_respondent_mesh(4, n_chain_shards=2)
        out = gpirt_mcmc(
            np.asarray(y[0], float), sample_iterations=8, burn_iterations=2,
            CHAIN=4, vote_codes=None, dtype="float64", verbose=False,
            mesh=mesh, respondent_axis="respondents", smc_steps=6,
            smc_max_temp=8.0,
        )
        assert len(out) == 4
        assert out[0]["theta"].shape == (8, 16, 1)
        assert all(np.all(np.isfinite(d["ll"])) for d in out)


class TestAnnealRespondentSharded:
    @pytest.mark.slow
    def test_respondent_only_mesh(self):
        """anneal_init on a mesh with NO chain axis (model-only sharding:
        lanes replicated per respondent shard, ax=None inside _programs),
        states feeding the respondent-sharded driver."""
        from gpirt_tpu.parallel.smc import anneal_init

        theta_true, y, ti, thr, consts, config = _setup(n=32, m=24)
        mesh = _resp_mesh()
        keys = chain_keys(7, 4)
        states, info = anneal_init(
            keys, y, ti, thr, consts, config, n_steps=8, max_temp=8.0,
            mesh=mesh, respondent_axis=RAX,
        )
        H, n, m = y.shape
        assert states.theta_idx.shape == (4, H, n)
        assert states.fstar.shape == (4, H, config.grid_size, m)
        assert np.isfinite(info["final_weight_ess"])
        assert info["final_weight_ess"] >= 1.0

        draws = run_chains_respondentsharded(
            keys, y, ti, thr, consts, config,
            sample_iterations=10, burn_iterations=0, mesh=mesh,
            initial_states=states,
        )
        assert draws["theta"].shape == (4, 10, H, n)
        assert np.all(np.isfinite(np.asarray(draws["ll"])))

    def test_3d_mesh_anneal(self):
        """anneal_init on the full 3-D chains x items x respondents mesh."""
        from gpirt_tpu.parallel.smc import anneal_init

        _, y, ti, thr, consts, config = _setup(n=24, m=16)
        mesh = make_respondent_mesh(2, n_chain_shards=2, n_item_shards=2)
        keys = chain_keys(9, 4)
        states, info = anneal_init(
            keys, y, ti, thr, consts, config, n_steps=8, max_temp=8.0,
            mesh=mesh, item_axis="items", respondent_axis=RAX,
        )
        H, n, m = y.shape
        assert states.theta_idx.shape == (4, H, n)
        assert states.beta.shape == (4, H, 3, m)
        assert np.isfinite(info["final_weight_ess"])
        draws = run_chains_respondentsharded(
            keys, y, ti, thr, consts, config,
            sample_iterations=10, burn_iterations=0, mesh=mesh,
            item_axis="items", initial_states=states,
        )
        assert draws["theta"].shape == (4, 10, H, n)
        assert np.all(np.isfinite(np.asarray(draws["ll"])))

    def test_uneven_respondents_raise(self):
        from gpirt_tpu.parallel.smc import anneal_init

        _, y, ti, thr, consts, config = _setup(n=12, m=8)  # 12 % 8 != 0
        with pytest.raises(ValueError, match="divide"):
            anneal_init(chain_keys(0, 4), y, ti, thr, consts, config,
                        n_steps=4, max_temp=4.0, mesh=_resp_mesh(),
                        respondent_axis=RAX)


class TestAffineSharded:
    """Collective affine (theta, beta) moves under respondent sharding.

    Sharded, the z-marginal runs through the rank-(q+3) capacitance path
    (_lowrank_quad_parts / _shift_orbit_lowrank, psum-complete); unsharded
    it uses the dense (n, n) Woodbury factors. The two agree to the
    eigenbasis truncation (~1e-10 relative, test_affine.py
    test_lowrank_bsolve_matches_dense), so with a fixed key every MH
    proposal and accept decision matches and the integer theta_idx outputs
    must be identical (a ratio landing within ~1e-8 of the log-uniform
    would flip — probability ~0 and deterministic per seed)."""

    @pytest.mark.slow
    def test_moves_match_unsharded(self):
        import dataclasses
        from gpirt_tpu.models.gibbs import affine_theta_moves

        _, y, ti, thr, consts, config = _setup(n=24, m=8)
        config = dataclasses.replace(config, affine_rounds=4,
                                     affine_shift_max=3)
        H, n, m = y.shape
        rng = np.random.default_rng(5)
        idx = jnp.asarray(rng.integers(20, config.grid_size - 20, (H, n)),
                          jnp.int32)
        z = jnp.asarray(rng.normal(size=(H, n, m)))
        beta = jnp.asarray(0.3 * rng.normal(size=(H, 3, m)))
        key = jax.random.key(3)
        ref_idx, ref_beta = affine_theta_moves(key, idx, z, beta, consts,
                                               config)

        mesh = _resp_mesh()
        fn = shard_map(
            lambda i, zz, bb, cc: affine_theta_moves(
                key, i, zz, bb, cc, config, respondent_axis=RAX),
            mesh=mesh,
            in_specs=(P(None, RAX), P(None, RAX, None), P(),
                      consts_mesh_specs(consts, None, RAX)),
            out_specs=(P(None, RAX), P()),
            check_vma=False,
        )
        got_idx, got_beta = jax.jit(fn)(idx, z, beta, consts)
        np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))
        np.testing.assert_allclose(np.asarray(got_beta), np.asarray(ref_beta),
                                   rtol=1e-10, atol=1e-12)

    @pytest.mark.slow
    def test_moves_match_unsharded_2d_mesh(self):
        """Items x respondents: p psums over both axes, q over items only,
        the shift orbit over both — decisions must still be global."""
        import dataclasses
        from gpirt_tpu.models.gibbs import affine_theta_moves

        _, y, ti, thr, consts, config = _setup(n=16, m=8)
        config = dataclasses.replace(config, affine_rounds=3,
                                     affine_shift_max=2)
        H, n, m = y.shape
        rng = np.random.default_rng(11)
        idx = jnp.asarray(rng.integers(25, config.grid_size - 25, (H, n)),
                          jnp.int32)
        z = jnp.asarray(rng.normal(size=(H, n, m)))
        beta = jnp.asarray(0.3 * rng.normal(size=(H, 3, m)))
        key = jax.random.key(6)
        ref_idx, ref_beta = affine_theta_moves(key, idx, z, beta, consts,
                                               config)

        IAX = "items"
        mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), (IAX, RAX))
        fn = shard_map(
            lambda i, zz, bb, cc: affine_theta_moves(
                key, i, zz, bb, cc, config, item_axis=IAX,
                respondent_axis=RAX),
            mesh=mesh,
            in_specs=(P(None, RAX), P(None, RAX, IAX), P(None, None, IAX),
                      consts_mesh_specs(consts, IAX, RAX)),
            out_specs=(P(None, RAX), P(None, None, IAX)),
            check_vma=False,
        )
        got_idx, got_beta = jax.jit(fn)(idx, z, beta, consts)
        np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))
        np.testing.assert_allclose(np.asarray(got_beta), np.asarray(ref_beta),
                                   rtol=1e-10, atol=1e-12)

    def test_sweep_with_affine_replication_invariant(self):
        """Full sweeps with both affine moves ON under respondent sharding:
        the replicated leaves stay bit-consistent across shards (the
        affine moves update theta_idx rows locally but beta globally, so a
        key-discipline slip would desynchronize beta immediately)."""
        import dataclasses
        from gpirt_tpu.models.gibbs import gibbs_sweep

        _, y, ti, thr, consts, config = _setup(n=24, m=8)
        config = dataclasses.replace(config, affine_rounds=2,
                                     affine_shift_max=2)
        mesh = _resp_mesh()
        tij = jnp.asarray(ti, config.jdtype)
        thrj = jnp.asarray(thr, config.jdtype)

        def body(yy, ti_loc, cc):
            k = jax.random.key(0)
            s = init_state(k, ti_loc, thrj, yy, cc, config)
            for it in range(3):
                s, ll = gibbs_sweep(s, jax.random.fold_in(k, it), yy, cc,
                                    config, respondent_axis=RAX)

            def dev(v):
                g = jax.lax.all_gather(v, RAX)
                return jnp.max(jnp.abs(g - g[0]))
            return dev(s.fstar), dev(s.beta), dev(s.thresholds[:, :, 1:-1]), ll

        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(None, RAX, None), P(None, RAX),
                      consts_mesh_specs(consts, None, RAX)),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        d_fstar, d_beta, d_thr, ll = jax.jit(fn)(y, tij, consts)
        assert float(d_fstar) == 0.0
        assert float(d_beta) == 0.0
        assert float(d_thr) == 0.0
        assert np.isfinite(float(ll))
