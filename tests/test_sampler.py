"""End-to-end sampler tests on simulated data (SURVEY.md section 7.2 slice).

The reference has no sampler tests at all; the oracle here is simulated
ground truth (the roxygen 2PL example, R/gpirtMCMC.R:59-96) plus internal
consistency checks (schedule math, fstar methods agreeing in distribution).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpirt_tpu.models import (
    GPIRTConfig,
    make_constants,
    run_chain,
    sample_schedule,
    memory_estimate_mb,
)
from gpirt_tpu.models.gibbs import init_state, gibbs_sweep


def default_priors(n, m):
    return dict(
        beta_prior_means=np.zeros((3, m)),
        beta_prior_sds=np.full((3, m), 3.0),
        theta_prior_means=np.zeros((2, n)),
        theta_prior_sds=np.zeros((2, n)),
    )


def sim_2pl(seed, n=40, m=12, missing=0.0):
    """Standard 2PL binary responses (reference roxygen example)."""
    rng = np.random.default_rng(seed)
    theta = np.linspace(-3, 3, n)
    alpha = np.linspace(-2, 2, m)
    beta = rng.uniform(0.5, 3.0, m)
    p = 1 / (1 + np.exp(-(alpha[None] + beta[None] * theta[:, None])))
    y01 = (rng.random((n, m)) < p).astype(np.int32)
    y = y01 + 1  # categories {1, 2}
    if missing:
        y[rng.random((n, m)) < missing] = 0
    return theta, y[None]  # (H=1, n, m)


def binary_thresholds(m, H=1):
    thr = np.zeros((H, m, 3))
    thr[..., 0] = -np.inf
    thr[..., 1] = 0.0
    thr[..., 2] = np.inf
    return thr


class TestSchedule:
    def test_basic(self):
        s = sample_schedule(100, 50, 1)
        assert s == (50, 100, 1)

    def test_thin(self):
        # burn=0, sample=10, thin=3: stored at iters 0,3,6,9
        s = sample_schedule(10, 0, 3)
        assert s.pre_iterations == 0 and s.n_samples == 4

    def test_thin_offset_burn(self):
        # burn=5, thin=2, sample=4: iters 5..8, stored at 6, 8
        s = sample_schedule(4, 5, 2)
        assert s.pre_iterations == 6 and s.n_samples == 2

    def test_reference_vignette_case(self):
        s = sample_schedule(5000, 0, 1)
        assert s.n_samples == 5000

    def test_empty(self):
        s = sample_schedule(0, 10, 1)
        assert s.n_samples == 0

    def test_memory_estimate(self):
        est = memory_estimate_mb(102, 600, 1, 2, 5000, 1001,
                                 store_f=False, store_fstar=False)
        # matches the reference model: 8 * n_samples * {n, 3m, m(C+1)} bytes
        np.testing.assert_allclose(est["theta"], 5000 * 102 * 8 / 2**20)
        np.testing.assert_allclose(est["fstar"], 5000 * 1001 * 600 * 8 / 2**20)
        assert est["total"] == pytest.approx(
            est["theta"] + est["beta"] + est["threshold"]
        )


class TestEndToEnd:
    def _run(self, seed=0, iters=400, burn=100, missing=0.0, **cfg_kw):
        theta_true, y = sim_2pl(seed, missing=missing)
        H, n, m = y.shape
        config = GPIRTConfig(n=n, m=m, horizon=H, C=2, dtype="float64", **cfg_kw)
        consts = make_constants(config, **default_priors(n, m))
        # spread theta inits so iteration 0 is well-conditioned
        theta_init = np.linspace(-2, 2, n)[None]
        rng = np.random.default_rng(seed + 1)
        theta_init = rng.permutation(theta_init[0])[None]
        draws = run_chain(
            jax.random.key(seed),
            jnp.asarray(y),
            theta_init,
            binary_thresholds(m),
            consts,
            config,
            sample_iterations=iters,
            burn_iterations=burn,
        )
        return theta_true, y, draws

    @staticmethod
    def _aligned_posterior_mean(draws):
        """Posterior mean of theta after resolving the +-theta reflection
        (the GP-IRT likelihood is invariant under theta -> -theta; a
        well-mixing chain hops modes)."""
        from gpirt_tpu.utils.diagnostics import align_theta_signs

        t = np.asarray(draws["theta"])[:, 0]  # (S, n)
        return align_theta_signs(t).mean(axis=0)

    @pytest.mark.slow
    def test_theta_recovers_truth(self):
        theta_true, y, draws = self._run()
        post = self._aligned_posterior_mean(draws)
        r = np.corrcoef(post, theta_true)[0, 1]
        assert abs(r) > 0.9, r

    def test_ll_improves_and_finite(self):
        theta_true, y, draws = self._run(iters=200, burn=0)
        ll = np.asarray(draws["ll"])
        assert np.all(np.isfinite(ll))
        assert ll[50:].mean() > ll[:10].mean()

    def test_with_missing_data(self):
        """Reference-like behavior under 30% missingness.

        Uses the ESS-based grid sampler: with this much missingness the
        posterior is genuinely diffuse, and the faster-mixing conjugate
        sampler reaches that diffuse equilibrium within the test budget
        (correct, but not what this truth-adjacency check measures). Both
        samplers pass Geweke *with missing data*; this test pins the
        slower reference-like kernel to check the masked-likelihood path."""
        theta_true, y, draws = self._run(seed=3, missing=0.3, f_method="grid")
        post = self._aligned_posterior_mean(draws)
        r = np.corrcoef(post, theta_true)[0, 1]
        assert abs(r) > 0.85, r

    def test_shapes_and_store_flags(self):
        theta_true, y = sim_2pl(1, n=10, m=5)
        H, n, m = y.shape
        config = GPIRTConfig(n=n, m=m, horizon=H, C=2, dtype="float64")
        consts = make_constants(config, **default_priors(n, m))
        draws = run_chain(
            jax.random.key(0), jnp.asarray(y), np.linspace(-2, 2, n)[None],
            binary_thresholds(m), consts, config,
            sample_iterations=6, burn_iterations=2, thin=2,
            store_f=True, store_fstar=True,
        )
        S = draws["theta"].shape[0]
        assert S == 3  # iters 2,4,6
        assert draws["theta"].shape == (S, H, n)
        assert draws["beta"].shape == (S, H, 3, m)
        assert draws["threshold"].shape == (S, H, m, 3)
        assert draws["f"].shape == (S, H, n, m)
        assert draws["fstar"].shape == (S, H, config.grid_size, m)
        assert draws["ll"].shape == (S,)
        # thetas are snapped to the grid
        t = np.asarray(draws["theta"])
        np.testing.assert_allclose(t, np.round((t + 5) / 0.01) * 0.01 - 5, atol=1e-9)

    def test_deterministic_same_key(self):
        _, y = sim_2pl(2, n=8, m=4)
        H, n, m = y.shape
        config = GPIRTConfig(n=n, m=m, horizon=H, C=2, dtype="float64")
        consts = make_constants(config, **default_priors(n, m))
        args = (jnp.asarray(y), np.linspace(-1, 1, n)[None], binary_thresholds(m),
                consts, config)
        d1 = run_chain(jax.random.key(7), *args, sample_iterations=5, burn_iterations=0)
        d2 = run_chain(jax.random.key(7), *args, sample_iterations=5, burn_iterations=0)
        np.testing.assert_array_equal(np.asarray(d1["theta"]), np.asarray(d2["theta"]))

    def test_fstar_methods_agree_in_distribution(self):
        """Matheron-rule fstar and reference-style posterior-chol fstar draw
        from the same conditional law: with the state held fixed, their
        empirical means and sds on the grid must coincide."""
        from gpirt_tpu.models.config import make_constants as mk
        from gpirt_tpu.models.gibbs import (
            theta_chol, snap_indices, _fstar_matheron, _fstar_chol,
        )

        n, m, H, N = 15, 4, 1, 101
        config = GPIRTConfig(n=n, m=m, horizon=H, C=2, dtype="float64", grid_size=N)
        consts = mk(config, **default_priors(n, m))
        rng = np.random.default_rng(0)
        theta = np.sort(rng.uniform(-3, 3, n))[None]
        idx = snap_indices(jnp.asarray(theta), config)
        L = theta_chol(idx, consts, config)
        z = rng.standard_normal((n, m))
        f = jnp.asarray((np.asarray(L[0]) @ z)[None])

        S = 3000
        keys = jax.random.split(jax.random.key(1), S)
        outs = {}
        fns = {
            "matheron": lambda k: _fstar_matheron(k, f, idx, consts, config),
            "chol": lambda k: _fstar_chol(k, f, idx, L, consts, config),
        }
        for name, fn in fns.items():
            draws = jax.vmap(fn)(keys)
            outs[name] = np.asarray(draws[:, 0])  # (S, N, m)
        a, b = outs["matheron"], outs["chol"]
        mean_scale = np.abs(b.mean(0)).max() + 1.0
        assert np.abs(a.mean(0) - b.mean(0)).max() / mean_scale < 0.02
        assert np.abs(a.std(0) - b.std(0)).max() / (b.std(0).max() + 1.0) < 0.05
        # at observed theta locations the draw must be pinned near f
        at_obs = np.asarray(
            jnp.take_along_axis(jnp.asarray(a), np.asarray(idx[0])[None, :, None] * jnp.ones((S, 1, 1), jnp.int32), axis=1)
        )
        resid = at_obs - np.asarray(f[0])[None]
        assert np.abs(resid).max() < 0.05, np.abs(resid).max()


class TestThetaExactness:
    """The authoritative theta-update correctness test: compare each method's
    stationary distribution against brute-force enumeration of the exact
    conditional posterior on the grid (H=2 GP regime, n=1, fixed fstar).

    Expected: the grid-Gibbs method is exact (TV ~ MC error); the reference's
    ESS-then-snap update carries a small discretization bias (it snaps a
    continuous ESS draw to the grid rather than targeting the grid-restricted
    conditional), which we bound rather than hide."""

    def _setup(self):
        from gpirt_tpu.models.config import GPIRTConfig as Cfg, make_constants as mk
        from gpirt_tpu.models.gibbs import GPIRTState, _theta_ll_table
        from gpirt_tpu.ops.kernels import time_gram_np

        n, m, H, N = 1, 6, 2, 51
        config = Cfg(n=n, m=m, horizon=H, C=2, dtype="float64", grid_size=N,
                     theta_ls=2.0)
        consts = mk(config, np.zeros((3, m)), np.full((3, m), 3.0),
                    np.zeros((2, n)), np.zeros((2, n)))
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.integers(1, 3, (H, n, m)), jnp.int32)
        thr = binary_thresholds(m, H)
        fstar = jnp.asarray(rng.standard_normal((H, N, m)) * 2)
        state = GPIRTState(
            theta_idx=jnp.full((H, n), N // 2, jnp.int32),
            f=jnp.zeros((H, n, m)), beta=jnp.zeros((H, 3, m)),
            thresholds=jnp.asarray(thr), fstar=fstar,
        )
        mu_star = jnp.zeros((H, N, m))

        table = np.asarray(_theta_ll_table(fstar, mu_star, y, jnp.asarray(thr), 2))
        Kt = time_gram_np(np.arange(H, dtype=float), np.arange(H, dtype=float),
                          1.0, 2.0, np.zeros(2)) + config.jitter * np.eye(H)
        Prec = np.linalg.inv(Kt)
        grid = np.asarray(consts.grid)
        G0, G1 = np.meshgrid(grid, grid, indexing="ij")
        logj = (
            -(Prec[0, 0] * G0**2 + 2 * Prec[0, 1] * G0 * G1 + Prec[1, 1] * G1**2) / 2
            + table[0][:, 0][:, None] + table[1][:, 0][None, :]
        )
        pj = np.exp(logj - logj.max())
        pj /= pj.sum()
        return config, consts, state, mu_star, y, grid, pj

    def _run_method(self, fn, config, consts, state, mu_star, y, iters=6000):
        def step(idx, k):
            return fn(k, state._replace(theta_idx=idx), mu_star, y, consts, config)

        def scan_step(idx, k):
            idx = step(idx, k)
            return idx, idx

        keys = jax.random.split(jax.random.key(1), iters)
        _, hist = jax.jit(lambda i0, ks: jax.lax.scan(scan_step, i0, ks))(
            state.theta_idx, keys
        )
        return np.asarray(hist[500:])  # (S, H, n)

    @pytest.mark.parametrize("method,tv_bound", [("grid", 0.03), ("ess", 0.12)])
    def test_stationary_matches_enumeration(self, method, tv_bound):
        from gpirt_tpu.models.gibbs import _draw_theta_grid, _draw_theta_ess

        config, consts, state, mu_star, y, grid, pj = self._setup()
        fn = _draw_theta_grid if method == "grid" else _draw_theta_ess
        hist = self._run_method(fn, config, consts, state, mu_star, y)
        N = grid.size
        h0 = np.bincount(hist[:, 0, 0], minlength=N) / hist.shape[0]
        h1 = np.bincount(hist[:, 1, 0], minlength=N) / hist.shape[0]
        tv0 = 0.5 * np.abs(h0 - pj.sum(1)).sum()
        tv1 = 0.5 * np.abs(h1 - pj.sum(0)).sum()
        assert tv0 < tv_bound and tv1 < tv_bound, (method, tv0, tv1)
        if method == "grid":
            # grid must be strictly exact (well under the ess bias)
            assert tv0 < 0.03 and tv1 < 0.03


class TestOrdinal:
    @pytest.mark.slow
    def test_ordinal_recovery(self):
        """Ordinal data (C=4) with graded-response structure."""
        rng = np.random.default_rng(10)
        n, m, C = 40, 10, 4
        theta = np.linspace(-2.5, 2.5, n)
        disc = rng.uniform(1.0, 2.5, m)
        g = disc[None] * theta[:, None]
        cuts = np.array([-1.5, 0.0, 1.5])
        z = g + rng.standard_normal((n, m))
        y = (1 + (z[:, :, None] > cuts[None, None]).sum(-1)).astype(np.int32)
        yc = y[None]

        config = GPIRTConfig(n=n, m=m, horizon=1, C=C, dtype="float64")
        consts = make_constants(config, **default_priors(n, m))
        thr = np.zeros((1, m, C + 1))
        thr[..., 0] = -np.inf
        thr[..., -1] = np.inf
        from scipy import stats as st
        for i in range(1, C):
            thr[..., i] = st.norm.ppf(i / C)
        draws = run_chain(
            jax.random.key(11), jnp.asarray(yc), np.linspace(-2, 2, n)[None],
            thr, consts, config, sample_iterations=400, burn_iterations=100,
        )
        post = TestEndToEnd._aligned_posterior_mean(draws)
        r = np.corrcoef(post, theta)[0, 1]
        assert abs(r) > 0.9, r
        # cutpoints stay ordered
        t = np.asarray(draws["threshold"])[:, 0]  # (S, m, C+1)
        assert np.all(np.diff(t[..., 1:-1], axis=-1) > 0)


class TestThetaExactnessRDM:
    """Enumeration exactness in the RDM regime (independent theta per
    session): each (i, h) conditional is prior x table, checkable in closed
    form."""

    def test_grid_matches_enumeration(self):
        from gpirt_tpu.models.config import GPIRTConfig as Cfg, make_constants as mk
        from gpirt_tpu.models.gibbs import (
            GPIRTState, _theta_ll_table, _draw_theta_grid,
        )

        n, m, H, N = 1, 5, 2, 41
        config = Cfg(n=n, m=m, horizon=H, C=2, dtype="float64", grid_size=N,
                     theta_ls=0.05)
        assert config.theta_regime == "RDM"
        consts = mk(config, np.zeros((3, m)), np.full((3, m), 3.0),
                    np.zeros((2, n)), np.zeros((2, n)))
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.integers(1, 3, (H, n, m)), jnp.int32)
        thr = binary_thresholds(m, H)
        fstar = jnp.asarray(rng.standard_normal((H, N, m)) * 2)
        state = GPIRTState(
            theta_idx=jnp.full((H, n), N // 2, jnp.int32),
            f=jnp.zeros((H, n, m)), beta=jnp.zeros((H, 3, m)),
            thresholds=jnp.asarray(thr), fstar=fstar,
        )
        mu_star = jnp.zeros((H, N, m))

        # exact per-(i,h) marginal: prior N(0, 1 + sd^2) x likelihood table
        table = np.asarray(_theta_ll_table(fstar, mu_star, y, jnp.asarray(thr), 2))
        grid = np.asarray(consts.grid)
        exact = []
        for h in range(H):
            logp = -0.5 * grid**2 / 1.0 + table[h][:, 0]
            p = np.exp(logp - logp.max())
            exact.append(p / p.sum())

        # RDM grid draws are iid across calls given fixed state
        S = 8000
        keys = jax.random.split(jax.random.key(0), S)
        draws = jax.vmap(
            lambda k: _draw_theta_grid(k, state, mu_star, y, consts, config)
        )(keys)  # (S, H, n)
        d = np.asarray(draws)[:, :, 0]
        for h in range(H):
            hist = np.bincount(d[:, h], minlength=N) / S
            tv = 0.5 * np.abs(hist - exact[h]).sum()
            assert tv < 0.03, (h, tv)


class TestFstarConstantIRF:
    """Correctness of the 100-inducing-point constant-IRF prediction path
    (reference src/draw-fstar.cpp:58-125), VERDICT r2: implemented but never
    executed by any test.

    Exactness construction: with theta placed EXACTLY on the inducing
    lattice (inducing = linspace(min theta, max theta, p), so p points that
    coincide with distinct theta values), the linear interpolation is the
    identity and the Matheron-ized draw reduces to the exact stacked-GP
    conditional  f* | f  =  K_{*I}(K_II + jitter I)^{-1} f_I  + pathwise
    residual — checkable in closed form against the master grid Gram.
    """

    def _setup(self):
        from gpirt_tpu.models.config import make_constants as mk

        n, m, H, N, p = 3, 4, 2, 61, 6
        config = GPIRTConfig(n=n, m=m, horizon=H, C=2, grid_size=N,
                             dtype="float64", constant_IRF=True,
                             n_inducing=p, f_method="grid")
        consts = mk(config, np.zeros((3, m)), np.full((3, m), 1.5),
                    np.zeros((2, n)), np.zeros((2, n)))
        # theta values (-5, -3, -1, 1, 3, 5) = linspace(-5, 5, 6) exactly:
        # grid step 10/60, so indices 0, 12, ..., 60
        idx = jnp.asarray([[0, 12, 24], [36, 48, 60]], jnp.int32)  # (H, n)
        rng = np.random.default_rng(3)
        f = jnp.asarray(rng.standard_normal((H, n, m)))
        return config, consts, idx, f

    def test_matches_exact_stacked_conditional(self):
        from gpirt_tpu.models.gibbs import _fstar_constant_irf
        from gpirt_tpu.ops.kernels import icc_gram_np

        config, consts, idx, f = self._setup()
        H, n, m = f.shape
        N, p = config.grid_size, config.n_inducing

        S = 4000
        draws = jax.vmap(
            lambda k: _fstar_constant_irf(k, f, idx, consts, config)
        )(jax.random.split(jax.random.key(0), S))  # (S, H, N, m)
        d = np.asarray(draws)
        # all horizons share ONE set of IRFs
        np.testing.assert_array_equal(d[:, 0], d[:, 1])

        # exact conditional from the grid Gram (f64 host)
        grid = np.asarray(consts.grid)
        sds = np.full(3, 1.5)
        ind_idx = np.asarray([0, 12, 24, 36, 48, 60])
        K = icc_gram_np(grid, grid, sds)
        Kj = K + config.jitter * np.eye(N)  # ustar's nugget (L_grid)
        KII = K[np.ix_(ind_idx, ind_idx)] + config.jitter * np.eye(p)
        M = K[:, ind_idx] @ np.linalg.inv(KII)  # (N, p)
        # f at the inducing points in sorted-theta order == flattened f
        # (theta_all = [-5,-3,-1,1,3,5] is already sorted)
        f_I = np.asarray(f).reshape(H * n, m)
        mean_exact = M @ f_I  # (N, m)
        cov_exact = Kj - M @ Kj[ind_idx] - Kj[:, ind_idx] @ M.T \
            + M @ Kj[np.ix_(ind_idx, ind_idx)] @ M.T
        var_exact = np.clip(np.diag(cov_exact), 0, None)

        mean_hat = d[:, 0].mean(axis=0)  # (N, m)
        se = np.sqrt(var_exact / S)[:, None] + 1e-12
        zmax = np.abs((mean_hat - mean_exact) / se).max()
        assert zmax < 5.5, zmax
        # variance profile (checked where it is not pinned ~0 at theta sites)
        var_hat = d[:, 0].var(axis=0).mean(axis=1)  # (N,)
        big = var_exact > 0.05
        assert np.allclose(var_hat[big], var_exact[big], rtol=0.25), (
            np.abs(var_hat[big] / var_exact[big] - 1).max()
        )
        # at the conditioning sites the draw reproduces f (zero variance up
        # to the nugget)
        np.testing.assert_allclose(
            d[:, 0][:, ind_idx, :].std(axis=0).max(), 0.0, atol=0.01
        )

    @pytest.mark.slow
    def test_two_stage_constant_irf_end_to_end(self):
        """The reference's constant-IRF two-stage pipeline runs end to end:
        stacked (n*H) draw_f ESS (src/draw-f.cpp:84-138) + inducing-point
        fstar, shared cutpoints across horizons."""
        rng = np.random.default_rng(5)
        n, m, H = 16, 14, 2
        theta = np.linspace(-2, 2, n)
        disc = rng.uniform(0.8, 2.0, m)
        p = 1 / (1 + np.exp(-disc[None] * theta[:, None]))
        y = (rng.random((H, n, m)) < p[None]).astype(np.int32) + 1
        config = GPIRTConfig(n=n, m=m, horizon=H, C=2, grid_size=61,
                             dtype="float64", constant_IRF=True,
                             n_inducing=20, f_method="two_stage")
        consts = make_constants(config, **default_priors(n, m))
        draws = run_chain(
            jax.random.key(2), jnp.asarray(y),
            np.broadcast_to(theta[None], (H, n)), binary_thresholds(m, H),
            consts, config, sample_iterations=150, burn_iterations=50,
            store_f=True, store_fstar=True,
        )
        for k, v in draws.items():
            a = np.asarray(v)
            if k == "threshold":
                a = a[..., 1:-1]  # endpoints are +-inf by construction
            assert np.all(np.isfinite(a)), k
        # constant-IRF invariants: one IRF set + one cutpoint vector
        fs = np.asarray(draws["fstar"])  # (S, H, N, m)
        np.testing.assert_array_equal(fs[:, 0], fs[:, 1])
        thr = np.asarray(draws["threshold"])
        np.testing.assert_array_equal(thr[:, 0], thr[:, 1])
        # theta still tracks truth at this easy SNR
        post = np.asarray(draws["theta"]).mean(axis=0)[0]
        r = np.corrcoef(post, theta)[0, 1]
        assert abs(r) > 0.8, r


class TestCollapsedThreshold:
    def test_binary_exact_truncnorm(self):
        """draw_threshold_collapsed at C=2 draws t_1 EXACTLY from N(0,1)
        truncated to (max z_{y=1}, min z_{y=2}) — checked against the closed
        form through scipy.stats.truncnorm, including pooling across
        horizons under constant_IRF and a missing-cell column."""
        from scipy import stats as st
        from gpirt_tpu.models.gibbs import draw_threshold_collapsed

        rng = np.random.default_rng(11)
        n, m, H = 10, 3, 2
        config = GPIRTConfig(n=n, m=m, horizon=H, C=2, dtype="float64",
                             grid_size=41, theta_ls=100.0,
                             f_method="conjugate")
        y = rng.integers(1, 3, (H, n, m)).astype(np.int32)
        y[:, :3, 0] = 0  # missing cells must not constrain the box
        z = rng.standard_normal((H, n, m))
        # make z consistent with SOME cutpoint: z_{y=1} < 0 <= z_{y=2}
        z = np.where(y == 1, -np.abs(z), np.abs(z))
        thr = np.zeros((H, m, 3))
        thr[..., 0], thr[..., 1], thr[..., 2] = -np.inf, 0.0, np.inf
        yj, zj, thrj = jnp.asarray(y), jnp.asarray(z), jnp.asarray(thr)

        S = 6000
        out = jax.vmap(
            lambda k: draw_threshold_collapsed(k, thrj, zj, yj, config)
        )(jax.random.split(jax.random.key(0), S))
        t1 = np.asarray(out)[:, :, :, 1]  # (S, H, m)

        obs = y > 0
        lo = np.where((y == 1) & obs, z, -np.inf).max(axis=1)  # (H, m)
        hi = np.where((y == 2) & obs, z, np.inf).min(axis=1)
        for h in range(H):
            for j in range(m):
                a, b = lo[h, j], hi[h, j]
                d = st.truncnorm(a, b)
                ks = st.kstest(t1[:, h, j], d.cdf).statistic
                assert ks < 0.03, (h, j, ks)
                assert np.all(t1[:, h, j] >= a) and np.all(t1[:, h, j] < b)

        # constant_IRF pools the box across horizons and shares the vector
        # constant_IRF box-pooling (the function only reads
        # config.constant_IRF; conjugate x constant_IRF is rejected by the
        # config, so the direct-call test uses the grid-resolved config)
        config_c = GPIRTConfig(n=n, m=m, horizon=H, C=2, dtype="float64",
                               grid_size=41, theta_ls=100.0,
                               constant_IRF=True)
        out_c = jax.vmap(
            lambda k: draw_threshold_collapsed(k, thrj, zj, yj, config_c)
        )(jax.random.split(jax.random.key(1), S))
        t1c = np.asarray(out_c)[:, :, :, 1]
        np.testing.assert_array_equal(t1c[:, 0], t1c[:, 1])
        lo_p, hi_p = lo.max(axis=0), hi.min(axis=0)
        for j in range(m):
            ks = st.kstest(t1c[:, 0, j],
                           st.truncnorm(lo_p[j], hi_p[j]).cdf).statistic
            assert ks < 0.03, (j, ks)


class TestInterleavedThreshold:
    """threshold_method='interleave': a deterministic cyclic schedule of the
    two validated cutpoint kernels (y-marginal ESS on iterations with
    i % k == 0, collapsed z-box draw otherwise). Each component is
    distribution-tested on its own (the binary Geweke oracle for collapsed,
    the C=3 oracles + scalar-reference tests for the ESS update), and any
    deterministic schedule of invariant kernels is invariant — so the test
    burden here is the DISPATCH: the interleave sweep must reproduce the
    pure-method sweep bitwise on both phases of the cycle."""

    def _mk(self, threshold_method, k=3):
        n, m = 12, 5
        config = GPIRTConfig(n=n, m=m, C=2, dtype="float64", grid_size=41,
                             f_method="conjugate",
                             threshold_method=threshold_method,
                             threshold_ess_every=k)
        consts = make_constants(config, **default_priors(n, m))
        _, y = sim_2pl(3, n=n, m=m, missing=0.1)
        thr = binary_thresholds(m)
        state = init_state(jax.random.key(2), np.linspace(-2, 2, n)[None],
                           thr, jnp.asarray(y), consts, config)
        return config, consts, jnp.asarray(y), state

    @pytest.mark.slow
    def test_dispatch_matches_components(self):
        config_i, consts, y, state = self._mk("interleave", k=3)
        config_e, _, _, _ = self._mk("ess")
        config_c, _, _, _ = self._mk("collapsed")
        key = jax.random.key(9)

        def thr_of(cfg, it):
            out, _ = jax.jit(
                lambda s: gibbs_sweep(s, key, y, consts, cfg, iteration=it)
            )(state)
            return np.asarray(out.thresholds)

        t_ess, t_col = thr_of(config_e, 0), thr_of(config_c, 0)
        # the two kernels produce grossly different draws here, so matching
        # one of them identifies which branch ran
        fin = np.isfinite(t_ess)
        assert np.abs(t_ess[fin] - t_col[fin]).max() > 1e-3
        for it in range(4):
            want = t_ess if it % 3 == 0 else t_col
            np.testing.assert_allclose(thr_of(config_i, it), want,
                                       rtol=1e-10, atol=1e-12,
                                       err_msg=f"iteration {it}")

    def test_traced_iteration_in_scan(self):
        """The interleave runs under lax.scan with a traced iteration index
        (the chunked-driver shape) and stays finite."""
        config, consts, y, state = self._mk("interleave", k=2)
        key = jax.random.key(4)

        def body(s, it):
            s, ll = gibbs_sweep(s, jax.random.fold_in(key, it), y, consts,
                                config, iteration=it)
            return s, ll

        _, lls = jax.jit(
            lambda s: jax.lax.scan(body, s, jnp.arange(6))
        )(state)
        assert np.isfinite(np.asarray(lls)).all()

    def test_validation(self):
        with pytest.raises(ValueError, match="interleave"):
            GPIRTConfig(n=4, m=3, f_method="grid",
                        threshold_method="interleave")
        with pytest.raises(ValueError, match="threshold_ess_every"):
            GPIRTConfig(n=4, m=3, f_method="conjugate",
                        threshold_method="interleave", threshold_ess_every=0)
        cfg = GPIRTConfig(n=4, m=3, f_method="conjugate",
                          threshold_method="interleave")
        assert cfg.resolved_threshold_method == "interleave"


class TestThresholdShift:
    def test_likelihood_invariant_and_gaussian(self):
        """draw_threshold_shift moves along the likelihood-null direction:
        the ordinal ll must be EXACTLY unchanged (up to float) when mu is
        shifted with the cutpoints, and the delta marginal must be the
        closed-form Gaussian from the delta-space/intercept priors."""
        from scipy import stats as st
        from gpirt_tpu.models.gibbs import draw_threshold_shift, compute_mu
        from gpirt_tpu.models.config import make_constants
        from gpirt_tpu.ops.likelihood import ordinal_ll_terms

        rng = np.random.default_rng(3)
        n, m, H, C = 12, 4, 2, 3
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float64",
                             grid_size=41, theta_ls=1.0,
                             threshold_shift=True)
        consts = make_constants(
            config,
            beta_prior_means=np.zeros((3, m)),
            beta_prior_sds=np.asarray([[2.0, 3.0, 1.0, 0.5]] * 3),
            theta_prior_means=np.zeros((2, n)),
            theta_prior_sds=np.zeros((2, n)),
        )
        y = rng.integers(0, C + 1, (H, n, m)).astype(np.int32)
        theta = jnp.asarray(rng.normal(size=(H, n)))
        beta = jnp.asarray(rng.normal(size=(H, 3, m)))
        f = jnp.asarray(rng.normal(size=(H, n, m)))
        from gpirt_tpu.ops.likelihood import delta_to_threshold
        thr = delta_to_threshold(jnp.asarray(rng.normal(size=(H, m, C - 1))))
        mu = compute_mu(theta, beta)
        ll0 = ordinal_ll_terms(f + mu, jnp.asarray(y), thr)

        S = 4000
        outs = jax.vmap(
            lambda k: draw_threshold_shift(k, thr, beta, consts, config)
        )(jax.random.split(jax.random.key(0), S))
        thr_s, beta_s, delta_s = outs

        # (a) exact likelihood invariance for every draw (spot-check 16)
        for s in range(0, S, S // 16):
            mu_s = compute_mu(theta, beta_s[s])
            ll_s = ordinal_ll_terms(f + mu_s, jnp.asarray(y), thr_s[s])
            np.testing.assert_allclose(np.asarray(ll_s), np.asarray(ll0),
                                       rtol=0, atol=1e-9)
        # (b) gaps between cutpoints unchanged; endpoints stay infinite
        gaps0 = np.diff(np.asarray(thr)[..., 1:-1], axis=-1)
        gaps_s = np.diff(np.asarray(thr_s)[..., 1:-1], axis=-1)
        np.testing.assert_allclose(gaps_s, np.broadcast_to(gaps0, gaps_s.shape),
                                   atol=1e-12)
        assert np.all(np.isneginf(np.asarray(thr_s)[..., 0]))
        assert np.all(np.isposinf(np.asarray(thr_s)[..., -1]))
        # (c) delta marginal matches the closed-form Gaussian per lane
        t1 = np.asarray(thr)[..., 1]
        b0 = np.asarray(beta)[:, 0, :]
        s0sq = np.asarray(consts.beta_prior_sds)[0] ** 2 + 1e-6
        prec = 1.0 + 1.0 / s0sq
        mean = -(t1 + b0 / s0sq) / prec
        sd = 1.0 / np.sqrt(prec)
        d = np.asarray(delta_s)  # (S, H, m)
        for h in range(H):
            for j in range(m):
                ks = st.kstest(d[:, h, j],
                               st.norm(mean[h, j], sd[j]).cdf).statistic
                assert ks < 0.035, (h, j, ks)
        # (d) intercept moved with the cutpoints
        np.testing.assert_allclose(
            np.asarray(beta_s)[:, :, 0, :], b0[None] + d, atol=1e-12)
