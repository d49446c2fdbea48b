"""Parallel-tempering correctness (gpirt_tpu.parallel.tempering).

The per-lane tempered kernels are covered by the tempered Geweke oracle
(test_geweke.py::TestGewekeTempered). These tests cover the pieces Geweke
cannot see: the swap move (cold-lane marginal must remain the T = 1
posterior) and the driver mechanics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpirt_tpu.models.config import GPIRTConfig, make_constants
from gpirt_tpu.models.gibbs import gibbs_sweep, init_state, theta_from_indices
from gpirt_tpu.parallel.chains import chain_keys
from gpirt_tpu.parallel.tempering import run_tempered_chains, temperature_ladder


def _setup(n=8, m=5, C=3, N=61, seed=0):
    config = GPIRTConfig(n=n, m=m, horizon=1, C=C, grid_size=N,
                         dtype="float64", f_method="conjugate",
                         affine_shift_max=5)
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


def test_ladder():
    t = temperature_ladder(4, 27.0)
    np.testing.assert_allclose(t, [1, 3, 9, 27], rtol=1e-12)
    assert temperature_ladder(1, 5.0).tolist() == [1.0]


@pytest.mark.slow
def test_cold_marginal_matches_vanilla():
    """Reflection-invariant posterior moments from the tempered ensemble's
    cold lanes must agree with a long vanilla run within MC error."""
    config, consts, y, thr = _setup()
    n = config.n

    # vanilla: one long chain
    st = init_state(jax.random.key(10), jnp.zeros((1, n)),
                    jnp.asarray(thr, jnp.float64), y, consts, config)

    @jax.jit
    def step(st, key):
        st, ll = gibbs_sweep(st, key, y, consts, config)
        th = theta_from_indices(st.theta_idx, consts)
        return st, jnp.stack([jnp.mean(th * th), jnp.std(th),
                              jnp.mean(jnp.abs(th)), ll])

    _, van = jax.lax.scan(step, st, jax.random.split(jax.random.key(11), 9000))
    van = np.asarray(van)[1500:]

    # tempered: 2 groups x 3 temps
    d = run_tempered_chains(
        chain_keys(20, 2), y, np.zeros((1, n)), thr, consts, config,
        sample_iterations=4000, burn_iterations=1500, n_temps=3, max_temp=4.0,
        chunk_iterations=2000,
    )
    th = np.asarray(d["theta"])  # (2, S, 1, n)
    pt = np.stack([
        (th * th).mean(axis=(2, 3)),
        th.std(axis=3).mean(axis=2),
        np.abs(th).mean(axis=(2, 3)),
        np.asarray(d["ll"]),
    ], axis=-1).reshape(-1, 4)

    assert np.asarray(d["swap_rate"]).min() > 0.01, d["swap_rate"]

    def bm_var(x, B=50):
        nb = len(x) // B
        bm = x[: nb * B].reshape(nb, B).mean(axis=1)
        return bm.var(ddof=1) / nb

    fails = []
    for j, name in enumerate(["th2", "sd", "absth", "ll"]):
        zv = (van[:, j].mean() - pt[:, j].mean()) / np.sqrt(
            bm_var(van[:, j]) + bm_var(pt[:, j]) + 1e-12
        )
        if abs(zv) > 5.0:
            fails.append((name, float(zv), float(van[:, j].mean()),
                          float(pt[:, j].mean())))
    assert not fails, fails


def test_non_conjugate_rejected():
    config, consts, y, thr = _setup()
    bad = GPIRTConfig(n=config.n, m=config.m, horizon=1, C=config.C,
                      grid_size=config.grid_size, dtype="float64",
                      f_method="grid")
    with pytest.raises(NotImplementedError):
        run_tempered_chains(
            chain_keys(0, 2), y, np.zeros((1, config.n)), thr, consts, bad,
            sample_iterations=2, burn_iterations=1, n_temps=2, max_temp=2.0,
        )


def test_single_temp_matches_untempered_semantics():
    """n_temps=1 tempered run must produce the same draws as the plain
    chunked driver (same key schedule is NOT guaranteed across drivers, so
    compare distributionally-trivial invariants: shapes and finiteness)."""
    config, consts, y, thr = _setup()
    d = run_tempered_chains(
        chain_keys(3, 2), y, np.zeros((1, config.n)), thr, consts, config,
        sample_iterations=20, burn_iterations=5, n_temps=1, max_temp=1.0,
        chunk_iterations=10,
    )
    assert d["theta"].shape == (2, 20, 1, config.n)
    assert bool(np.isfinite(np.asarray(d["theta"])).all())
    assert bool(np.isfinite(np.asarray(d["ll"])).all())


@pytest.mark.slow
def test_mesh_sharded_matches_unsharded():
    """Tempered ensembles shard by WHOLE groups over the device mesh
    (ROADMAP r2 item 5): swaps are group-local and the swap-uniform stream
    is replicated, so the sharded run must equal the single-device run to
    reduction-order rounding — with zero collectives during sampling."""
    import jax
    from jax.sharding import Mesh
    from gpirt_tpu.parallel.tempering import run_tempered_chains
    from gpirt_tpu.parallel.chains import chain_keys

    config, consts, y, thr = _setup()
    keys = chain_keys(3, 8)  # G=8 groups over 8 devices
    kw = dict(sample_iterations=6, burn_iterations=2, thin=1,
              n_temps=2, max_temp=4.0, swap_every=1)
    mesh = Mesh(np.array(jax.devices()), ("chains",))
    a = run_tempered_chains(keys, y, np.zeros((1, config.n)), thr, consts,
                            config, **kw)
    b = run_tempered_chains(keys, y, np.zeros((1, config.n)), thr, consts,
                            config, mesh=mesh, **kw)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-9, atol=1e-9, err_msg=k)


def test_mesh_indivisible_groups_rejected():
    import jax
    from jax.sharding import Mesh
    from gpirt_tpu.parallel.tempering import run_tempered_chains
    from gpirt_tpu.parallel.chains import chain_keys

    config, consts, y, thr = _setup()
    mesh = Mesh(np.array(jax.devices()), ("chains",))
    with pytest.raises(ValueError, match="divide"):
        run_tempered_chains(chain_keys(0, 6), y, np.zeros((1, config.n)),
                            thr, consts, config, sample_iterations=2,
                            burn_iterations=0, n_temps=2, mesh=mesh)


# ---------------------------------------------------------------------------
# item-sharded tempering (2-D groups x items mesh)
# ---------------------------------------------------------------------------


def _setup_items(n=8, m=6, C=3, N=61, seed=0):
    """Like _setup but with the affine moves OFF (mesh-sharded sweeps
    reject them) and an item count divisible by 2 shards."""
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


def test_item_sharded_swap_replication():
    """Under item sharding, the lane states' replicated leaves (theta_idx)
    and the swap decisions must be bit-consistent on every item shard after
    tempered sweeps WITH swap phases (the psum'd cross-temperature lls feed
    the accept comparisons)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from gpirt_tpu.parallel.items import consts_item_specs
    from gpirt_tpu.parallel.tempering import _tempered_sweep

    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    config, consts, y, thr = _setup_items()
    G, L = 1, 4
    K = G * L
    mesh = Mesh(np.array(jax.devices()[:2]), ("items",))
    temps = jnp.asarray(np.tile(temperature_ladder(L, 8.0), G))
    k_init = jax.random.split(jax.random.key(0), K)
    k_run = jax.random.split(jax.random.key(1), K)
    k_swap = jax.random.key(2)

    def body(yy, cc, thr_loc):
        states = jax.vmap(
            lambda k: init_state(k, jnp.zeros((1, config.n)),
                                 thr_loc, yy, cc, config)
        )(k_init)
        acc_tot = jnp.zeros((K,), jnp.int32)
        for i in range(4):
            states, ll, acc = _tempered_sweep(
                states, i, k_run, temps, k_swap, 1, G, L, yy, cc, config,
                axis=None, item_axis="items",
            )
            acc_tot = acc_tot + acc.astype(jnp.int32)

        def dev(v):  # max abs deviation across item shards (raw gather)
            g = jax.lax.all_gather(v, "items")
            return jnp.max(jnp.abs(g - g[0]))

        return (dev(states.theta_idx), dev(ll), dev(acc_tot),
                jnp.sum(acc_tot))

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None, "items"), consts_item_specs(consts, "items"),
                  P(None, "items", None)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    ))
    d_idx, d_ll, d_acc, n_acc = fn(y, consts, jnp.asarray(thr, jnp.float64))
    assert float(d_idx) == 0.0
    assert float(d_ll) == 0.0
    assert float(d_acc) == 0.0
    assert int(n_acc) > 0  # swaps actually exercised


@pytest.mark.slow
def test_item_sharded_tempered_driver():
    """Full 2-D (groups x items) tempered run: shapes, finiteness, swap
    diagnostics, and a sane cold chain."""
    from gpirt_tpu.parallel.items import make_item_mesh

    config, consts, y, thr = _setup_items()
    mesh = make_item_mesh(n_item_shards=2, n_chain_shards=4)
    d = run_tempered_chains(
        chain_keys(5, 4), y, np.zeros((1, config.n)), thr, consts, config,
        sample_iterations=40, burn_iterations=10, n_temps=2, max_temp=4.0,
        chunk_iterations=25, mesh=mesh, item_axis="items",
        store_f=True, store_fstar=True,
    )
    assert d["theta"].shape == (4, 40, 1, config.n)
    assert d["beta"].shape == (4, 40, 1, 3, config.m)
    assert d["f"].shape == (4, 40, 1, config.n, config.m)
    assert d["fstar"].shape == (4, 40, 1, config.grid_size, config.m)
    assert bool(np.isfinite(np.asarray(d["theta"])).all())
    assert bool(np.isfinite(np.asarray(d["ll"])).all())
    assert d["swap_rate"].shape == (1,)


def test_item_sharded_tempered_validation():
    from gpirt_tpu.parallel.items import make_item_mesh

    config, consts, y, thr = _setup_items(m=5)  # 5 % 2 != 0
    mesh = make_item_mesh(n_item_shards=2, n_chain_shards=2)
    with pytest.raises(ValueError, match="divide"):
        run_tempered_chains(
            chain_keys(0, 2), y, np.zeros((1, config.n)), thr, consts,
            config, sample_iterations=2, burn_iterations=0, n_temps=2,
            mesh=mesh, item_axis="items",
        )


# ---------------------------------------------------------------------------
# respondent-sharded tempering (2-D groups x respondents / full 3-D mesh)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_respondent_sharded_swap_replication():
    """Under respondent sharding, the lane states' replicated leaves (beta,
    thresholds) and the swap decisions must be bit-consistent on every
    respondent shard after tempered sweeps WITH swap phases (the psum'd
    cross-temperature lls feed the accept comparisons)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from gpirt_tpu.parallel.respondents import consts_mesh_specs
    from gpirt_tpu.parallel.tempering import _tempered_sweep

    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    config, consts, y, thr = _setup_items()
    G, L = 1, 4
    K = G * L
    RAX = "respondents"
    mesh = Mesh(np.array(jax.devices()[:2]), (RAX,))
    temps = jnp.asarray(np.tile(temperature_ladder(L, 8.0), G))
    k_init = jax.random.split(jax.random.key(0), K)
    k_run = jax.random.split(jax.random.key(1), K)
    k_swap = jax.random.key(2)

    def body(yy, cc, ti_loc):
        states = jax.vmap(
            lambda k: init_state(k, ti_loc, jnp.asarray(thr, jnp.float64),
                                 yy, cc, config)
        )(k_init)
        acc_tot = jnp.zeros((K,), jnp.int32)
        for i in range(10):
            states, ll, acc = _tempered_sweep(
                states, i, k_run, temps, k_swap, 1, G, L, yy, cc, config,
                axis=None, item_axis=None, respondent_axis=RAX,
            )
            acc_tot = acc_tot + acc.astype(jnp.int32)

        def dev(v):  # max abs deviation across respondent shards
            g = jax.lax.all_gather(v, RAX)
            return jnp.max(jnp.abs(g - g[0]))

        # interior cutpoints only: the +-inf endpoint columns would give
        # inf - inf = NaN in the deviation even when bit-identical
        return (dev(states.beta), dev(states.thresholds[..., 1:-1]), dev(ll),
                dev(acc_tot), jnp.sum(acc_tot))

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(None, RAX, None), consts_mesh_specs(consts, None, RAX),
                  P(None, RAX)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    ))
    d_beta, d_thr, d_ll, d_acc, n_acc = fn(
        y, consts, jnp.zeros((1, config.n))
    )
    assert float(d_beta) == 0.0
    assert float(d_thr) == 0.0
    assert float(d_ll) == 0.0
    assert float(d_acc) == 0.0
    assert int(n_acc) > 0  # swaps actually exercised


@pytest.mark.slow
def test_respondent_sharded_tempered_driver():
    """Full 2-D (groups x respondents) tempered run: shapes, finiteness,
    swap diagnostics."""
    from gpirt_tpu.parallel.respondents import make_respondent_mesh

    config, consts, y, thr = _setup_items()
    mesh = make_respondent_mesh(2, n_chain_shards=4)
    d = run_tempered_chains(
        chain_keys(5, 4), y, np.zeros((1, config.n)), thr, consts, config,
        sample_iterations=40, burn_iterations=10, n_temps=2, max_temp=4.0,
        chunk_iterations=25, mesh=mesh, respondent_axis="respondents",
        store_f=True,
    )
    assert d["theta"].shape == (4, 40, 1, config.n)
    assert d["beta"].shape == (4, 40, 1, 3, config.m)
    assert d["f"].shape == (4, 40, 1, config.n, config.m)
    assert bool(np.isfinite(np.asarray(d["theta"])).all())
    assert bool(np.isfinite(np.asarray(d["ll"])).all())
    assert d["swap_rate"].shape == (1,)


def test_tempered_3d_mesh():
    """Tempering on the full 3-D chains x items x respondents mesh."""
    from gpirt_tpu.parallel.respondents import make_respondent_mesh

    config, consts, y, thr = _setup_items()
    mesh = make_respondent_mesh(2, n_chain_shards=2, n_item_shards=2)
    d = run_tempered_chains(
        chain_keys(11, 2), y, np.zeros((1, config.n)), thr, consts, config,
        sample_iterations=20, burn_iterations=5, n_temps=2, max_temp=4.0,
        mesh=mesh, item_axis="items", respondent_axis="respondents",
    )
    assert d["theta"].shape == (2, 20, 1, config.n)
    assert d["beta"].shape == (2, 20, 1, 3, config.m)
    assert bool(np.isfinite(np.asarray(d["ll"])).all())


def test_respondent_sharded_tempered_validation():
    from gpirt_tpu.parallel.respondents import make_respondent_mesh

    config, consts, y, thr = _setup_items(n=7)  # 7 % 2 != 0
    mesh = make_respondent_mesh(2, n_chain_shards=2)
    with pytest.raises(ValueError, match="divide"):
        run_tempered_chains(
            chain_keys(0, 2), y, np.zeros((1, config.n)), thr, consts,
            config, sample_iterations=2, burn_iterations=0, n_temps=2,
            mesh=mesh, respondent_axis="respondents",
        )


@pytest.mark.slow
def test_api_tempered_respondent_axis():
    """gpirt_mcmc(n_temps=..., mesh=..., respondent_axis=...) end to end."""
    from gpirt_tpu.api import gpirt_mcmc
    from gpirt_tpu.parallel.respondents import make_respondent_mesh

    rng = np.random.default_rng(0)
    yraw = rng.integers(1, 3, size=(12, 8)).astype(float)
    mesh = make_respondent_mesh(2, n_chain_shards=2)
    out = gpirt_mcmc(
        yraw, sample_iterations=10, burn_iterations=5, CHAIN=2,
        vote_codes=None, dtype="float64", verbose=False,
        n_temps=2, max_temp=4.0, mesh=mesh,
        respondent_axis="respondents",
    )
    assert len(out) == 2
    assert out[0]["theta"].shape == (10, 12, 1)
    assert np.all(np.isfinite(out[0]["ll"]))
    assert "swap_rate" in out[0]


def test_api_tempered_item_axis():
    """gpirt_mcmc(n_temps=..., mesh=..., item_axis=...) end to end."""
    from gpirt_tpu.api import gpirt_mcmc
    from gpirt_tpu.parallel.items import make_item_mesh

    rng = np.random.default_rng(0)
    yraw = rng.integers(1, 3, size=(12, 8)).astype(float)
    mesh = make_item_mesh(n_item_shards=2, n_chain_shards=2)
    out = gpirt_mcmc(
        yraw, sample_iterations=10, burn_iterations=5, CHAIN=2,
        vote_codes=None, dtype="float64", verbose=False,
        n_temps=2, max_temp=4.0, mesh=mesh, item_axis="items",
    )
    assert len(out) == 2
    assert out[0]["theta"].shape == (10, 12, 1)
    assert out[0]["beta"].shape == (10, 3, 8, 1)
    assert np.all(np.isfinite(out[0]["ll"]))
    assert "swap_rate" in out[0]
