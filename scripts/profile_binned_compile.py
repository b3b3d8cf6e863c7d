"""Where does the binned path's cold compile go? (VERDICT r3 item 3)

Compiles each stage of the T=2^19 binned forward separately and reports
wall time. Run with a COLD cache (TCNN_COLD=1 disables the persistent
cache) to see true compile costs.

Usage: python -u scripts/profile_binned_compile.py [repack|bin|gather|combine|fwd|trainstep ...]
"""
import os
import sys
import time

import jax

if os.environ.get("TCNN_COLD") != "1":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import tcnn_tpu as tc
from tcnn_tpu.ops.pallas import binned_kernel as bk

B = 1 << int(os.environ.get("TCNN_LOG2_B", "18"))
LOG2_T = int(os.environ.get("TCNN_LOG2_T", "19"))  # tiny values: CI smoke
ITERS = int(os.environ.get("TCNN_PROF_ITERS", "20"))


def main():
    cfg = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": LOG2_T, "base_resolution": 16,
            "per_level_scale": 2.0,
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }
    m = tc.create_from_config(2, 3, cfg)
    enc = m.network.encoding
    split = enc._binned_split()
    bp = split.binned
    print(f"binned: NL={bp.n_levels} S={bp.s} rb={bp.r_blocks} cap={bp.cap} "
          f"nt={bp.nt}", flush=True)
    rng = np.random.default_rng(0)
    n_suf = enc.n_params - split.n_prefix_params
    p_suf = jnp.asarray(rng.uniform(-1e-4, 1e-4, n_suf), jnp.float32)
    params = jnp.asarray(rng.uniform(-1e-4, 1e-4, enc.n_params), jnp.float32)
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)

    def bench(name, fn, *args):
        t0 = time.time()
        r = jax.jit(fn)(*args)
        jax.tree.leaves(r)[0].block_until_ready()
        print(f"{name}: compile+run {time.time()-t0:.1f} s", flush=True)

    for w in sys.argv[1:] or ["repack", "bin", "gather", "combine", "fwd"]:
        if w == "repack":
            bench("repack", lambda p: bk.repack_binned(bp, p), p_suf)
        elif w == "bin":
            bench("bin(A)", lambda xx: bk._bin_call(bp, xx), x)
        elif w == "gather":
            tbl = jax.jit(lambda p: bk.repack_binned(bp, p))(p_suf)
            sh, sl, rk, _ = jax.jit(lambda xx: bk._bin_call(bp, xx))(x)
            bench("gather(B)",
                  lambda s1, s2, t: bk._gather_call(bp, s1, s2, t),
                  sh, sl, tbl)
        elif w == "combine":
            tbl = jax.jit(lambda p: bk.repack_binned(bp, p))(p_suf)
            sh, sl, rk, _ = jax.jit(lambda xx: bk._bin_call(bp, xx))(x)
            feats = jax.jit(
                lambda s1, s2, t: bk._gather_call(bp, s1, s2, t)
            )(sh, sl, tbl)
            bench("combine(C)",
                  lambda xx, r, f: bk._combine_call(bp, xx, r, f),
                  x, rk, feats)
        elif w == "fwd":
            bench("full fwd (split)",
                  lambda p, xx: bk.grid_encode_split(split, p, xx),
                  params, x)
        elif w == "trainstep":
            tr = m.trainer
            t = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)
            bench("full train step",
                  lambda s, xx, tt: tr.train_step_fn(s, xx, tt),
                  tr.state, x, t)
        elif w == "aloop":
            # A_LOOP sweep (VERDICT r3 item 3): compile + runtime per
            # level-loop mode, for kernel A alone AND the full binned
            # forward (A+gather+combine+dense prefix - the user-facing
            # cold-compile number). Each mode traces a distinct program,
            # so the persistent cache can't mask the comparison.
            targets = [
                ("binA", lambda xx: bk._bin_call(bp, xx),
                 lambda out: out[3]),
                ("fullfwd",
                 lambda xx: bk.grid_encode_split(split, params, xx),
                 lambda out: out),
            ]
            for tname, tfn, sync in targets:
                ref = None
                for mode in ("off", "transpose", "lane"):
                    bk.A_LOOP = mode
                    try:
                        t0 = time.time()
                        fn = jax.jit(tfn)
                        out = fn(x)
                        np.asarray(sync(out)).reshape(-1)[:1]  # axon-safe
                        tc_s = time.time() - t0
                        t0 = time.time()
                        iters = ITERS
                        for _ in range(iters):
                            out = fn(x)
                        np.asarray(sync(out)).reshape(-1)[:1]
                        dt = (time.time() - t0) / iters
                        print(f"{tname} A_LOOP={mode}: compile {tc_s:.1f} s,"
                              f" run {dt*1e3:.2f} ms", flush=True)
                        cur = np.asarray(sync(out))
                        if ref is None:
                            ref = cur
                        else:
                            print(f"  parity vs off: "
                                  f"{np.array_equal(ref, cur)}", flush=True)
                    except Exception as e:  # noqa: BLE001 - Mosaic may say no
                        print(f"{tname} A_LOOP={mode}: FAILED "
                              f"{type(e).__name__}: {str(e)[:200]}",
                              flush=True)
                bk.A_LOOP = "off"


if __name__ == "__main__":
    main()
