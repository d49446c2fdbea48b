"""On-chip A/B: threshold_backend "xla" (two-phase compacted ESS) vs
"pallas" (whole shrink loop VMEM-resident, ops/pallas_threshold.py).

VERDICT r3 item 3. Three gates, in order:
  1. numerics: the TPU-compiled kernel equals the interpret-mode run of
     the same kernel (same uniform stream) within f32 slack;
  2. statistics: 400-sweep senate chains under each backend land on the
     same posterior cutpoint/theta means (backends use DIFFERENT uniform
     streams by design, so the gate is distributional, not bitwise);
  3. speed: full gibbs_sweep wall at 64 senate chains, per backend.

Prints JSON lines; keep-or-kill is decided on gate 3 conditional on 1-2.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpirt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gpirt_tpu.api import default_thresholds
    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.models.gibbs import gibbs_sweep, init_state
    from gpirt_tpu.utils.datasets import senate116_response_matrix
    from gpirt_tpu.utils.profiling import fetch_sync
    from gpirt_tpu.utils.response import encode_categories

    rm, _, _ = senate116_response_matrix()
    y, C, _ = encode_categories(np.asarray(rm))
    H, n, m = y.shape
    yj = jnp.asarray(y)
    K = 64

    # ---- gate 1: compiled kernel == interpret kernel, senate shapes ----
    from gpirt_tpu.ops.pallas_threshold import binary_threshold_ess_pallas

    rng = np.random.default_rng(5)
    L = H * m
    g = jnp.asarray(rng.standard_normal((n, L)), jnp.float32)
    sgn = jnp.asarray(np.sign(rng.standard_normal((n, L))), jnp.float32)
    obs = jnp.asarray(rng.random((n, L)) > 0.3, jnp.float32)
    t1 = jnp.asarray(rng.standard_normal(L), jnp.float32)
    nu = jnp.asarray(rng.standard_normal(L), jnp.float32)
    key = jax.random.key(11)
    c = 0.7071067811865476
    got = np.asarray(binary_threshold_ess_pallas(key, t1, nu, g, sgn, obs, c))
    want = np.asarray(binary_threshold_ess_pallas(key, t1, nu, g, sgn, obs, c,
                                                  interpret=True))
    err = float(np.max(np.abs(got - want)))
    print(json.dumps({"gate": "numerics", "max_abs_err": err,
                      "ok": bool(err < 3e-5)}), flush=True)

    # vmapped (the production shape: 64 chains)
    kv = jax.random.split(jax.random.key(7), K)
    gv = jnp.asarray(rng.standard_normal((K, n, L)), jnp.float32)
    tv = jnp.asarray(rng.standard_normal((K, L)), jnp.float32)
    nv = jnp.asarray(rng.standard_normal((K, L)), jnp.float32)
    vm = jax.vmap(binary_threshold_ess_pallas,
                  in_axes=(0, 0, 0, 0, None, None, None))
    got_v = np.asarray(vm(kv, tv, nv, gv, sgn, obs, c))
    want_v = np.stack([
        np.asarray(binary_threshold_ess_pallas(kv[i], tv[i], nv[i], gv[i],
                                               sgn, obs, c, interpret=True))
        for i in range(4)
    ])
    err_v = float(np.max(np.abs(got_v[:4] - want_v)))
    print(json.dumps({"gate": "numerics_vmap", "max_abs_err": err_v,
                      "ok": bool(err_v < 3e-5)}), flush=True)

    # ---- shared sweep setup ----
    consts_kw = dict(
        beta_prior_means=np.zeros((3, m)),
        beta_prior_sds=np.full((3, m), 3.0),
        theta_prior_means=np.zeros((2, n)),
        theta_prior_sds=np.zeros((2, n)),
    )
    thr = default_thresholds(C, m, H)
    theta_init = np.stack(
        [rng.permutation(np.linspace(-2, 2, n))[None] for _ in range(K)]
    )

    results = {}
    for backend in ("xla", "pallas"):
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float32",
                             jitter=1e-4, threshold_backend=backend)
        consts = make_constants(config, **consts_kw)
        keys = jax.vmap(
            lambda s: jax.random.key(s, impl=config.resolved_prng_impl)
        )(jnp.arange(1000, 1000 + K, dtype=jnp.uint32))

        st0 = jax.jit(jax.vmap(
            lambda k, ti: init_state(k, ti, thr, yj, consts, config),
        ))(keys, jnp.asarray(theta_init, jnp.float32))

        def block(state, kr, count):
            def body(carry, j):
                carry, _ = gibbs_sweep(
                    carry, jax.random.fold_in(kr, j), yj, consts, config,
                    iteration=j)
                return carry, None
            return jax.lax.scan(body, state, jnp.arange(count))[0]

        adv = jax.jit(jax.vmap(lambda s, k: block(s, k, 50)))
        t0 = time.time()
        st = adv(st0, keys)
        fetch_sync(st)
        compile_wall = time.time() - t0
        t0 = time.time()
        reps = 4
        for _ in range(reps):
            st = adv(st, keys)
        fetch_sync(st)
        wall = (time.time() - t0) / (reps * 50)
        # posterior means after 400 sweeps (the 200 above + 200 more)
        st = adv(adv(st, keys), keys)
        thr_mean = float(jnp.mean(st.thresholds[:, :, :, 1]))
        thr_sd = float(jnp.std(jnp.mean(st.thresholds[:, :, :, 1],
                                        axis=(1, 2))))
        results[backend] = dict(sweep_ms=wall * 1e3, compile_s=compile_wall,
                                thr_mean=thr_mean, thr_sd_between=thr_sd)
        print(json.dumps({"gate": "speed", "backend": backend,
                          **results[backend]}), flush=True)

    d = results["xla"]["thr_mean"] - results["pallas"]["thr_mean"]
    pooled_se = (results["xla"]["thr_sd_between"] ** 2 / K
                 + results["pallas"]["thr_sd_between"] ** 2 / K) ** 0.5
    print(json.dumps({
        "gate": "stats",
        "thr_mean_diff": d,
        "z": d / max(pooled_se, 1e-12),
        "speedup_sweep": results["xla"]["sweep_ms"]
        / results["pallas"]["sweep_ms"],
    }), flush=True)


if __name__ == "__main__":
    main()
