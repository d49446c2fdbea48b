"""Kernel-level numerics vs closed forms (SURVEY.md section 4 test pyramid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from gpirt_tpu.ops import (
    icc_gram,
    time_gram,
    ordinal_ll,
    ordinal_ll_terms,
    delta_to_threshold,
    threshold_to_delta,
    ess_update,
    chol_with_jitter,
    tri_solve,
    double_solve,
    host_cholesky_f64,
)


def ref_icc_gram(x1, x2, sds):
    """Direct loop port of the reference kernel semantics (test oracle)."""
    out = np.zeros((len(x1), len(x2)))
    for i, a in enumerate(x1):
        for j, b in enumerate(x2):
            out[i, j] = (
                np.exp(-0.5 * (a - b) ** 2)
                + a * sds[1] ** 2 * b
                + sds[0] ** 2
                + (a * sds[2] * b) ** 2
            )
    return out


def ref_time_gram(t1, t2, os, ls, sds, kernel):
    out = np.zeros((len(t1), len(t2)))
    for i, a in enumerate(t1):
        for j, b in enumerate(t2):
            d = abs(a - b)
            if kernel == "Matern":
                core = os**2 * (1 + np.sqrt(5) * d / ls + 5 * d * d / (3 * ls * ls))
                core *= np.exp(-np.sqrt(5) * d / ls)
            else:
                core = os**2 * np.exp(-d * d / (ls * ls))
            out[i, j] = core + a * sds[1] ** 2 * b + sds[0] ** 2
    return out


class TestGrams:
    def test_icc_gram_matches_closed_form(self):
        rng = np.random.default_rng(0)
        x1 = rng.normal(size=7)
        x2 = rng.normal(size=5)
        sds = np.array([3.0, 3.0, 3.0])
        got = icc_gram(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(sds))
        np.testing.assert_allclose(got, ref_icc_gram(x1, x2, sds), rtol=1e-12)

    def test_icc_gram_symmetric_psd(self):
        x = jnp.linspace(-5, 5, 50)
        G = icc_gram(x, x, jnp.array([3.0, 3.0, 3.0]))
        np.testing.assert_allclose(G, G.T, rtol=1e-12)
        evals = np.linalg.eigvalsh(np.asarray(G))
        assert evals.min() > -1e-8

    def test_icc_gram_batched(self):
        rng = np.random.default_rng(1)
        xb = jnp.asarray(rng.normal(size=(3, 6)))
        sds = jnp.array([1.0, 2.0, 0.5])
        got = icc_gram(xb, xb, sds)
        assert got.shape == (3, 6, 6)
        for h in range(3):
            np.testing.assert_allclose(
                got[h], ref_icc_gram(np.asarray(xb[h]), np.asarray(xb[h]), np.asarray(sds))
            )

    @pytest.mark.parametrize("kernel", ["Matern", "RBF"])
    def test_time_gram(self, kernel):
        t = np.arange(6.0)
        sds = np.array([0.7, 0.3])
        got = time_gram(jnp.asarray(t), jnp.asarray(t), 1.3, 2.5, jnp.asarray(sds), kernel)
        np.testing.assert_allclose(
            got, ref_time_gram(t, t, 1.3, 2.5, sds, kernel), rtol=1e-12
        )

    def test_time_gram_bad_kernel(self):
        with pytest.raises(ValueError):
            time_gram(jnp.arange(3.0), jnp.arange(3.0), 1.0, 1.0, jnp.zeros(2), "nope")


class TestLikelihood:
    def test_matches_scalar_reference(self):
        """Dense-masked ll == reference ll_bar_sparse over observed entries."""
        rng = np.random.default_rng(2)
        n, m, C = 11, 7, 4
        f = rng.normal(size=(n, m))
        mu = rng.normal(size=(n, m))
        y = rng.integers(1, C + 1, size=(n, m)).astype(np.int32)
        y[rng.random(size=(n, m)) < 0.3] = 0  # missing
        cuts = np.sort(rng.normal(size=(m, C - 1)), axis=1)
        thresholds = np.concatenate(
            [np.full((m, 1), -np.inf), cuts, np.full((m, 1), np.inf)], axis=1
        )
        got = ordinal_ll(jnp.asarray(f + mu), jnp.asarray(y), jnp.asarray(thresholds))

        want = 0.0
        for i in range(n):
            for j in range(m):
                if y[i, j] == 0:
                    continue
                c = y[i, j]
                g = f[i, j] + mu[i, j]
                p = stats.norm.cdf(thresholds[j, c] - g) - stats.norm.cdf(
                    thresholds[j, c - 1] - g
                )
                want += np.log(p + 1e-6)
        np.testing.assert_allclose(float(got), want, rtol=1e-10)

    def test_missing_contributes_zero(self):
        y = jnp.zeros((3, 2), jnp.int32)
        thr = jnp.asarray([[-jnp.inf, 0.0, jnp.inf]] * 2)
        terms = ordinal_ll_terms(jnp.ones((3, 2)), y, thr)
        np.testing.assert_array_equal(np.asarray(terms), 0.0)

    def test_binary_categories(self):
        # binary recoded to {1,2}: P(2) = Phi(g - t1)
        thr = jnp.asarray([[-jnp.inf, 0.5, jnp.inf]])
        g = jnp.asarray([[0.9]])
        y = jnp.asarray([[2]], jnp.int32)
        got = ordinal_ll(g, y, thr)
        want = np.log(1 - stats.norm.cdf(0.5 - 0.9) + 1e-6)
        np.testing.assert_allclose(float(got), want, rtol=1e-10)

    def test_binary_fast_path_bitwise_matches_generic(self):
        """The C=2 one-Phi fast path is float64-bitwise-equal to the
        generic two-bound path (clamped +-1e30 endpoints saturate Phi to
        exactly 0/1)."""
        from gpirt_tpu.ops.likelihood import cutpoint_bounds, ll_terms_from_bounds

        rng = np.random.default_rng(7)
        n, m = 23, 17
        g = jnp.asarray(rng.normal(size=(n, m)) * 3.0)
        y = jnp.asarray(rng.integers(1, 3, size=(n, m)), jnp.int32)
        y = jnp.where(jnp.asarray(rng.random(size=(n, m)) < 0.25), 0, y)
        t1 = rng.normal(size=(m, 1))
        thr = jnp.asarray(
            np.concatenate([np.full((m, 1), -np.inf), t1, np.full((m, 1), np.inf)], axis=1)
        )
        for inv_s in (None, jnp.asarray(0.37)):
            fast = ordinal_ll_terms(g, y, thr, inv_s=inv_s)
            z_lo, z_hi, mask = cutpoint_bounds(y, thr)
            generic = ll_terms_from_bounds(g, z_lo, z_hi, mask, inv_s=inv_s)
            np.testing.assert_array_equal(np.asarray(fast), np.asarray(generic))


class TestDeltaTransforms:
    @pytest.mark.parametrize("C", [2, 3, 5, 9])
    def test_roundtrip(self, C):
        rng = np.random.default_rng(3)
        deltas = jnp.asarray(rng.normal(size=(4, C - 1)))
        thr = delta_to_threshold(deltas)
        assert thr.shape == (4, C + 1)
        assert np.all(np.isneginf(np.asarray(thr[..., 0])))
        assert np.all(np.isposinf(np.asarray(thr[..., -1])))
        # monotone
        finite = np.asarray(thr[..., 1:-1])
        assert np.all(np.diff(finite, axis=-1) > 0)
        back = threshold_to_delta(thr)
        np.testing.assert_allclose(back, deltas, rtol=1e-10)

    def test_matches_reference_construction(self):
        # t1 = d0; t2 = t1 + exp(d1); t3 = t2 + exp(d2)
        d = jnp.asarray([0.3, -1.0, 0.5])
        thr = np.asarray(delta_to_threshold(d))
        np.testing.assert_allclose(thr[1], 0.3)
        np.testing.assert_allclose(thr[2], 0.3 + np.exp(-1.0))
        np.testing.assert_allclose(thr[3], 0.3 + np.exp(-1.0) + np.exp(0.5))


class TestLinalg:
    def test_batched_chol_and_solves(self):
        rng = np.random.default_rng(4)
        A = rng.normal(size=(3, 8, 8))
        gram = A @ np.swapaxes(A, -1, -2) + 8 * np.eye(8)
        L = chol_with_jitter(jnp.asarray(gram), 1e-6)
        np.testing.assert_allclose(
            np.asarray(L @ jnp.swapaxes(L, -1, -2)), gram + 1e-6 * np.eye(8), rtol=1e-9
        )
        b = jnp.asarray(rng.normal(size=(3, 8, 2)))
        x = double_solve(L, b)
        np.testing.assert_allclose(
            np.asarray(jnp.asarray(gram + 1e-6 * np.eye(8)) @ x), np.asarray(b), rtol=1e-7
        )
        w = tri_solve(L, b)
        np.testing.assert_allclose(np.asarray(L @ w), np.asarray(b), rtol=1e-8)

    def test_host_cholesky_f64(self):
        x = np.linspace(-5, 5, 200)
        d = x[:, None] - x[None, :]
        gram = np.exp(-0.5 * d * d)  # very ill-conditioned
        L = host_cholesky_f64(gram, 1e-6, dtype=np.float64)
        np.testing.assert_allclose(L @ L.T, gram + 1e-6 * np.eye(200), atol=1e-10)


class TestESS:
    @staticmethod
    def _run_chain(key, x0, loglik, iters, transform=None):
        def step(x, k):
            k1, k2 = jax.random.split(k)
            nu = jax.random.normal(k1, x.shape, x.dtype)
            x = ess_update(k2, x, nu, loglik, transform=transform)
            return x, x

        keys = jax.random.split(key, iters)
        _, hist = jax.jit(lambda x, ks: jax.lax.scan(step, x, ks))(x0, keys)
        return np.asarray(hist)

    def test_gaussian_conjugate_posterior(self):
        """ESS with N(0,1) prior and N(2, .5^2) likelihood -> N(1.6, 0.2)."""
        mu_l, sd_l = 2.0, 0.5

        def loglik(x):
            return -0.5 * jnp.sum((x - mu_l) ** 2, -1) / sd_l**2

        hist = self._run_chain(jax.random.key(0), jnp.zeros((512, 1)), loglik, 3000)
        d = hist[500:].ravel()
        post_mean = mu_l / (sd_l**2 + 1)  # precision-weighted: 8/5
        post_var = 1 / (1 + 1 / sd_l**2)
        assert abs(d.mean() - post_mean) < 0.02, d.mean()
        assert abs(d.var() - post_var) < 0.02, d.var()

    def test_zero_likelihood_samples_prior(self):
        """ll == 0 => ESS leaves the prior invariant (prior sampling)."""

        def loglik(x):
            return jnp.zeros(x.shape[:-1], x.dtype)

        hist = self._run_chain(jax.random.key(1), jnp.zeros((2048, 2)), loglik, 200)
        d = hist[-1]
        assert abs(d.mean()) < 0.05
        assert abs(d.var() - 1.0) < 0.08

    def test_transform_is_respected(self):
        def loglik(x):
            return jnp.zeros(x.shape[:-1], x.dtype)

        clamp = lambda v: jnp.clip(v, -0.5, 0.5)
        hist = self._run_chain(
            jax.random.key(2), jnp.zeros((64, 3)), loglik, 20, transform=clamp
        )
        assert np.all(np.abs(hist[-1]) <= 0.5)

    def test_deterministic_under_same_key(self):
        def loglik(x):
            return -0.5 * jnp.sum(x**2, -1)

        key = jax.random.key(3)
        nu = jax.random.normal(jax.random.key(4), (8, 2))
        x = jnp.ones((8, 2))
        a = ess_update(key, x, nu, loglik)
        b = ess_update(key, x, nu, loglik)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPallasThresholdESS:
    def _replica(self, key, t1, nu, g, sgn, obs, c, rounds):
        """Pure-JAX replica consuming the kernel's exact uniform stream —
        proves the in-kernel shrink loop implements ess_update's update."""
        import jax
        _TWO_PI = 6.283185307179586
        L = t1.shape[0]
        dt = g.dtype
        k_u, k_eps, k_loop = jax.random.split(key, 3)
        logu = jnp.log(jax.random.uniform(k_u, (L,), dtype=dt))
        eps = jax.random.uniform(k_eps, (L,), dtype=dt, maxval=_TWO_PI)
        rs = jax.random.uniform(k_loop, (rounds, L), dtype=dt)

        def ll(t):
            x = sgn * (t[None, :] - g) * c
            # the kernel's polynomial erf, not lax.erf
            from gpirt_tpu.ops.pallas_threshold import _erf
            p = 0.5 * (1.0 + _erf(x))
            return jnp.sum(jnp.log(p + 1e-6) * obs, axis=0)

        log_y = ll(t1) + logu
        eps_min, eps_max = eps - _TWO_PI, jnp.full((L,), _TWO_PI, dt)
        x_out = t1
        active = np.ones(L, bool)
        for r in range(rounds):
            if not active.any():
                break
            prop = t1 * jnp.cos(eps) + nu * jnp.sin(eps)
            accept = np.asarray(ll(prop) > log_y)
            newly = active & accept
            x_out = jnp.where(jnp.asarray(newly), prop, x_out)
            still = active & ~accept
            e = np.asarray(eps)
            eps_min = jnp.where(jnp.asarray(still) & (eps < 0), eps, eps_min)
            eps_max = jnp.where(jnp.asarray(still) & (eps >= 0), eps, eps_max)
            eps = jnp.where(jnp.asarray(still),
                            eps_min + rs[r] * (eps_max - eps_min), eps)
            active = still
        return x_out

    def test_kernel_equals_replica(self):
        from gpirt_tpu.ops.pallas_threshold import (
            binary_threshold_ess_pallas, PALLAS_THRESHOLD_ROUNDS,
        )

        rng = np.random.default_rng(3)
        n, L = 37, 130  # unaligned on purpose
        g = jnp.asarray(rng.standard_normal((n, L)), jnp.float32)
        sgn = jnp.asarray(np.sign(rng.standard_normal((n, L))), jnp.float32)
        obs = jnp.asarray(rng.random((n, L)) > 0.3, jnp.float32)
        t1 = jnp.asarray(rng.standard_normal(L), jnp.float32)
        nu = jnp.asarray(rng.standard_normal(L), jnp.float32)
        c = 0.7071067811865476
        key = jax.random.key(11)
        got = binary_threshold_ess_pallas(key, t1, nu, g, sgn, obs, c,
                                          interpret=True)
        want = self._replica(key, t1, nu, g, sgn, obs, c,
                             PALLAS_THRESHOLD_ROUNDS)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        # the update must move most lanes (sanity against identity bail)
        moved = np.mean(np.asarray(got) != np.asarray(t1))
        assert moved > 0.8, moved
