"""Binned-path tuning sweep (TODO #1): kernel A (bin/rank/placement) is
~28 ms of the ~85 ms T=2^19 train step. Sweeps the plan knobs that change
A's shape - superblock count S (with r_blocks = t_rows/(S*128) adjusting)
and batch tile nt - measuring A alone first (cheap compiles), then the
full forward at the best A schedule.

cap follows the plan rule (2*lam + 16, lam = G/S) so overflow odds stay
in the documented Poisson class; S is bounded by the bf16 slot-index
limit (r_blocks <= 256) and the [G, S] one-hot width.

Run on the bench chip: python -u scripts/sweep_binned_a.py
"""
import dataclasses
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import tcnn_tpu as tc
from tcnn_tpu.ops.pallas import binned_kernel as bk

B = 1 << 18
LANE = 128


def timeit(fn, *args, iters=20):
    t0 = time.time()
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    return (time.perf_counter() - t0 - 0.03) / iters, compile_s


def variant_plan(bp0, s=None, nt=None):
    """A BinnedPlan with adjusted (s, nt); returns None if the shape rules
    (r_blocks <= 256, G % 256 == 0) reject the combination."""
    s = s or bp0.s
    nt = nt or bp0.nt
    t_rows = bp0.t_rows
    if t_rows % (s * LANE) != 0:
        return None
    rb = t_rows // (s * LANE)
    if rb < 1 or rb > 256:
        return None
    c = bp0.sub.n_corners
    g = c * nt
    if g % 256 != 0:
        return None
    lam = max(g // s, 1)
    cap = min(2 * lam + 16, 127)
    return dataclasses.replace(bp0, s=s, r_blocks=rb, cap=cap, nt=nt)


def main():
    cfg = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 19, "base_resolution": 16,
            "per_level_scale": 2.0,
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }
    m = tc.create_from_config(2, 3, cfg)
    enc = m.network.encoding
    split = enc._binned_split()
    bp0 = split.binned
    print(f"base plan: NL={bp0.n_levels} S={bp0.s} rb={bp0.r_blocks} "
          f"cap={bp0.cap} nt={bp0.nt}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(B, 2)), jnp.float32)

    best = (1e9, None)
    for s in (64, 128, 256, 512):
        for nt in (256, 512, 1024):
            bp = variant_plan(bp0, s=s, nt=nt)
            if bp is None:
                print(f"A s={s:4d} nt={nt:5d}: rejected by shape rules")
                continue
            try:
                dt, cs = timeit(
                    jax.jit(lambda xx, b=bp: bk._bin_call(b, xx)), x
                )
                print(f"A s={s:4d} nt={nt:5d} cap={bp.cap:3d}: "
                      f"{dt*1e3:7.2f} ms (compile {cs:.0f}s)", flush=True)
                best = min(best, (dt, bp))
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"A s={s:4d} nt={nt:5d}: FAILED {type(e).__name__}")
    if best[1] is None:
        print("no valid A config"); return
    bp = best[1]
    print(f"-> best A: s={bp.s} nt={bp.nt} ({best[0]*1e3:.2f} ms)")

    # full forward at base vs best-A plan (C/P/B' shapes follow the plan)
    for tag, bpx in (("base", bp0), ("bestA", bp)):
        sp = dataclasses.replace(split, binned=bpx)
        params = jnp.asarray(
            rng.uniform(-1e-4, 1e-4, enc.n_params), jnp.float32
        )
        try:
            dt, cs = timeit(
                jax.jit(lambda p, xx, s=sp: bk.grid_encode_split(s, p, xx)),
                params, x, iters=10,
            )
            print(f"fwd [{tag:5s}]: {dt*1e3:7.2f} ms (compile {cs:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"fwd [{tag:5s}]: FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
