"""Unit tests for the collective affine theta moves (gibbs.affine_theta_moves).

Distributional exactness is covered by the Geweke suite (test_geweke.py runs
the conjugate sampler with affine_rounds > 0 in CST/RDM/GP regimes); these
tests pin the move mechanics: proposal-interval correctness, grid-range
safety, and config validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpirt_tpu.models.config import GPIRTConfig, make_constants
from gpirt_tpu.models.gibbs import (
    _dilation_interval_logq,
    _z_marginal_parts,
    _z_marginal_delta,
    affine_theta_moves,
)


def _setup(n=7, m=4, H=1, C=2, N=101, **kw):
    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                         dtype="float64", f_method="conjugate", **kw)
    consts = make_constants(
        config,
        beta_prior_means=np.zeros((3, m)),
        beta_prior_sds=np.full((3, m), 1.5),
        theta_prior_means=np.zeros((2, n)),
        theta_prior_sds=np.zeros((2, n)),
    )
    return config, consts


class TestDilationInterval:
    def test_forward_interval_contains_realized_factor(self):
        """For idx' = round(cen + a (idx - cen)), the proposal interval must
        contain a (log q finite), and its endpoints must reproduce idx'."""
        rng = np.random.default_rng(0)
        N, cen, sd = 101, 50.0, 0.1
        for _ in range(50):
            idx = rng.integers(5, N - 5, size=8)
            a = float(np.exp(rng.normal(0, sd)))
            d = idx.astype(float) - cen
            idxp = np.clip(np.round(cen + a * d), 0, N - 1).astype(int)
            if (np.round(cen + a * d) != idxp).any():
                continue  # clipped proposals are rejected by the move itself
            dp = idxp.astype(float) - cen
            lq = float(_dilation_interval_logq(jnp.asarray(d), jnp.asarray(dp), sd))
            assert np.isfinite(lq), (idx, a)
            assert lq <= 0.0 + 1e-9

    def test_collapse_onto_center_is_irreversible(self):
        """dp = 0 with d != 0 cannot be reversed: log q(reverse) = -inf."""
        d = jnp.asarray([4.0, -3.0, 0.0])
        dp = jnp.asarray([0.0, 0.0, 0.0])
        # reverse direction: from dp (all-center) back out to d
        lq_rev = float(_dilation_interval_logq(dp, d, 0.1))
        assert lq_rev == -np.inf

    def test_delta_matches_direct_difference(self):
        config, consts = _setup()
        key = jax.random.key(0)
        z = jax.random.normal(key, (1, 7, 4), jnp.float64)
        beta = 0.3 * jax.random.normal(jax.random.key(1), (1, 3, 4), jnp.float64)
        idx0 = jnp.asarray(np.random.default_rng(2).integers(20, 80, (1, 7)),
                           jnp.int32)
        idx1 = jnp.clip(idx0 + 7, 0, 100)
        p0 = _z_marginal_parts(idx0, z, beta, consts, config)
        p1 = _z_marginal_parts(idx1, z, beta, consts, config)
        d01 = float(_z_marginal_delta(p1, p0))
        d10 = float(_z_marginal_delta(p0, p1))
        np.testing.assert_allclose(d01, -d10, rtol=1e-10)

    def test_lowrank_bsolve_matches_dense(self):
        """(K + T I)^{-1} r and logdet via the rank-(q+3) eigenbasis path
        match the dense float64 computation."""
        from gpirt_tpu.models.gibbs import lowrank_bsolve
        from gpirt_tpu.ops.kernels import icc_gram_np

        config, consts = _setup(n=9, N=101)
        rng = np.random.default_rng(3)
        idx = jnp.asarray(rng.integers(0, 101, (1, 9)), jnp.int32)
        r = jnp.asarray(rng.standard_normal((1, 9, 5)))
        for T in (None, 2.5):
            x, logdet = lowrank_bsolve(idx, consts, r, temp=T)
            grid = np.asarray(consts.grid)
            th = grid[np.asarray(idx)[0]]
            B = icc_gram_np(th, th, np.full(3, 1.5)) + (T or 1.0) * np.eye(9)
            np.testing.assert_allclose(
                np.asarray(x)[0], np.linalg.solve(B, np.asarray(r)[0]),
                rtol=1e-6, atol=1e-8,
            )
            np.testing.assert_allclose(
                float(logdet[0]), np.linalg.slogdet(B)[1], rtol=1e-8
            )

    def test_woodbury_matches_dense(self):
        """B^{-1} r and logdet B from the rank-3 split match the dense
        K + I computation in float64."""
        from gpirt_tpu.models.gibbs import woodbury_factors, woodbury_solve
        from gpirt_tpu.ops.kernels import icc_gram_np

        config, consts = _setup(n=9, N=101)
        rng = np.random.default_rng(7)
        idx = jnp.asarray(rng.integers(0, 101, (1, 9)), jnp.int32)
        r = jnp.asarray(rng.standard_normal((1, 9, 5)))
        wb = woodbury_factors(idx, consts)
        got = np.asarray(woodbury_solve(wb, r))[0]

        grid = np.asarray(consts.grid)
        th = grid[np.asarray(idx)[0]]
        B = icc_gram_np(th, th, np.full(3, 1.5)) + np.eye(9)
        want = np.linalg.solve(B, np.asarray(r)[0])
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(
            float(wb.logdet[0]), np.linalg.slogdet(B)[1], rtol=1e-10
        )


class TestAffineMoves:
    def test_output_stays_on_grid(self):
        config, consts = _setup()
        key = jax.random.key(3)
        z = jax.random.normal(key, (1, 7, 4), jnp.float64)
        beta = jnp.zeros((1, 3, 4), jnp.float64)
        idx = jnp.asarray([[0, 10, 40, 50, 60, 90, 100]], jnp.int32)
        out, beta_out = affine_theta_moves(
            jax.random.key(4), idx, z, beta, consts, config
        )
        assert out.shape == idx.shape
        assert beta_out.shape == beta.shape
        assert int(out.min()) >= 0 and int(out.max()) <= 100

    def test_moves_traverse_scale(self):
        """From a compressed start, the moves should expand theta toward the
        z-preferred scale within a few rounds (the mixing rationale)."""
        config, consts = _setup(n=20, m=30, N=201)
        # z generated from a WIDE configuration
        rng = np.random.default_rng(5)
        true_theta = np.linspace(-2, 2, 20)
        grid = np.asarray(consts.grid)
        from gpirt_tpu.ops.kernels import icc_gram_np
        K = icc_gram_np(true_theta, true_theta, np.full(3, 1.5))
        f = np.linalg.cholesky(K + 1e-8 * np.eye(20)) @ rng.standard_normal((20, 30))
        z = jnp.asarray((f + rng.standard_normal((20, 30)))[None])
        beta = jnp.zeros((1, 3, 30), jnp.float64)
        # compressed start: everyone near the center
        start = jnp.asarray(
            100 + np.round(10 * true_theta / 2).astype(int)
        )[None].astype(jnp.int32)
        cfg = GPIRTConfig(n=20, m=30, horizon=1, C=2, grid_size=201,
                          dtype="float64", f_method="conjugate",
                          affine_rounds=50, affine_dilate_sd=0.1)
        out, _ = affine_theta_moves(jax.random.key(6), start, z, beta, consts, cfg)
        spread0 = float(jnp.std(consts.grid[start]))
        spread1 = float(jnp.std(consts.grid[out]))
        assert spread1 > 1.5 * spread0, (spread0, spread1)


class TestConfigValidation:
    def test_mix_subsweeps_zero_rejected(self):
        with pytest.raises(ValueError, match="mix_subsweeps"):
            GPIRTConfig(n=5, m=3, mix_subsweeps=0)

    def test_affine_rounds_negative_rejected(self):
        with pytest.raises(ValueError, match="affine_rounds"):
            GPIRTConfig(n=5, m=3, affine_rounds=-1)

    def test_bad_proposal_scales_rejected(self):
        with pytest.raises(ValueError, match="affine"):
            GPIRTConfig(n=5, m=3, affine_rounds=2, affine_dilate_sd=0.0)

    def test_dims_validated(self):
        with pytest.raises(ValueError):
            GPIRTConfig(n=0, m=3)
        with pytest.raises(ValueError):
            GPIRTConfig(n=5, m=3, C=1)
