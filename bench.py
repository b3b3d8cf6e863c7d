#!/usr/bin/env python
"""Benchmark: mlp_learning_an_image training throughput (config_hash).

The reference headline: RTX 4090 trains the default config (HashGrid
L16/F2/T2^15/base16/s1.5 + FFMLP 64x2, RelativeL2, Adam, batch 2^18) at
~1000 steps/s = ~2.62e8 trained samples/s (README.md:75, BASELINE.md).

This benchmark mirrors the reference protocol (bench_ours.cu:188-332):
random-uniform coordinate batches sampled from the image each step, mean
training throughput after warmup. Batch generation + bilinear image sampling
+ the full training step run inside ONE jitted program, the TPU analog of
the reference's CUDA-graph-captured step.

Prints one JSON line:
    {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _wait_for_tpu(max_wait_s: float = 1800.0) -> None:
    """The axon sitecustomize blocks at `import jax` while the TPU tunnel
    is down; probe in a SUBPROCESS (killable) until the tunnel answers so
    a transient outage doesn't turn the bench into a silent hang."""
    deadline = time.time() + max_wait_s
    while True:
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=90, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if time.time() > deadline:
                # importing jax now would block forever inside the axon
                # sitecustomize - fail fast and visibly instead
                sys.stderr.write("# TPU tunnel unreachable; aborting\n")
                sys.exit(1)
            sys.stderr.write("# waiting for TPU tunnel...\n")
            time.sleep(30)


if os.environ.get("JAX_PLATFORMS", "") == "axon":
    _wait_for_tpu()

import jax

# persistent compilation cache: the Pallas-heavy step compiles once per
# machine instead of once per process (~40%+ of first-run wall time)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc
from tcnn_tpu.utils.image import (
    build_quad_table_packed,
    load_image,
    sample_image_quad_packed,
    synthetic_image,
)

BASELINE_SAMPLES_PER_SEC = 1000.0 * (1 << 18)  # RTX 4090, README.md:75
REFERENCE_IMAGE = "/root/reference/data/images/albert.jpg"

# env overrides exist for CI smoke runs on CPU (tests/test_bench_smoke.py);
# the driver's TPU invocation uses the defaults
LOG2_BATCH = int(os.environ.get("TCNN_BENCH_LOG2_BATCH", "18"))
BATCH_SIZE = 1 << LOG2_BATCH
WARMUP_STEPS = int(os.environ.get("TCNN_BENCH_WARMUP", "100"))
TIMED_STEPS = int(os.environ.get("TCNN_BENCH_STEPS", "500"))


def _schedule_context():
    """The fused-kernel scheduling knobs in effect at report time (the
    autotune winners on TPU, module defaults otherwise)."""
    from tcnn_tpu.ops.pallas import train_kernel as tk

    return {
        "pick_variant": tk.PICK_VARIANT,
        "fused_tile_div": tk.FUSED_TILE_DIV,
        "recompute_masks": tk.RECOMPUTE_MASKS,
        "infer_variant": tk.INFER_VARIANT or tk.PICK_VARIANT,
        "infer_tile": tk.INFER_TILE,
        "vt_lomask": tk.VT_LOMASK,
        "vt_fl": tk.VT_FL,
    }


def main():
    if os.path.exists(REFERENCE_IMAGE):
        image = load_image(REFERENCE_IMAGE)
    else:
        image = synthetic_image(1024, 1024)

    config_path = os.path.join(os.path.dirname(__file__), "data", "config_hash.json")
    config = tc.load_config(config_path)
    model = tc.create_from_config(2, 3, config)
    trainer = model.trainer

    h, w = image.shape[:2]
    # u32-packed quad table: the target gather is per-element-cost bound
    # on TPU, and the reference's texture is 8-bit anyway (u8 packing is
    # the reference protocol; exact for load_image outputs)
    quad = jax.jit(build_quad_table_packed)(jnp.asarray(image))

    # ---- fused-kernel knob autotune (TPU only) -----------------------------
    # The fused train kernel has three scheduling knobs (tile divisor,
    # recompute-masks, pick variant - train_kernel.py:50-70) whose best
    # setting is chip/config-dependent. Try a short list of candidates on
    # the real step and keep the fastest; compiles land in the persistent
    # cache so repeat runs pay nothing. TCNN_BENCH_AUTOTUNE=0 disables.
    autotune = os.environ.get("TCNN_BENCH_AUTOTUNE", "1")
    # wall-clock budget for ALL autotune candidates combined (cold compiles
    # are 35-100 s each on TPU); once spent, remaining candidates are
    # skipped and the best-so-far wins. Warm persistent-cache runs never
    # come close to the budget.
    tune_budget = float(os.environ.get("TCNN_BENCH_AUTOTUNE_BUDGET", "1500"))
    tune_spent = [0.0]

    def _tune_skip(label):
        if tune_spent[0] > tune_budget:
            sys.stderr.write(f"# autotune budget spent; skipping {label}\n")
            return True
        return False

    from tcnn_tpu.ops.pallas import train_kernel as tk
    from tcnn_tpu.ops.pallas.schedule import (
        Schedule,
        load_schedule,
        model_schedule_key,
        save_schedule,
    )

    sched_key = model_schedule_key(model.network)
    device_kind = jax.devices()[0].device_kind
    # a prior run's autotune winners persist next to the compilation cache;
    # a repeat bench on the same chip applies them and skips tuning
    # entirely (TCNN_BENCH_AUTOTUNE=force re-tunes and overwrites)
    stored = (
        load_schedule(device_kind, sched_key) if autotune == "1" else None
    )
    if stored is not None:
        tk.RECOMPUTE_MASKS = stored.recompute_masks
        tk.FUSED_TILE_DIV = stored.fused_tile_div
        tk.PICK_VARIANT = stored.pick_variant
        tk.INFER_VARIANT = stored.infer_variant
        tk.INFER_TILE = stored.infer_tile
        tk.VT_LOMASK = stored.vt_lomask
        tk.VT_FL = stored.vt_fl
        sys.stderr.write(
            f"# schedule: persisted winners for {device_kind} | {sched_key}\n"
        )

    if stored is None and autotune != "0" and (
        jax.default_backend() == "tpu" or autotune == "force"
    ):
        candidates = [
            # r5 winner: vt + lazy masks + f-on-lanes packing
            (False, 2, "vt", "bcast", True),
            (False, 2, "vt", "bcast", False),  # r4 winner (no fl)
            (False, 2, "vt", "mm", False),  # all-levels mask matmul
            (False, 4, "vt", "bcast", True),   # vt tile 256
            (False, 4, "v3b", "mm", False),  # round-3 winner (MXU pick)
            (False, 4, "base", "mm", False),  # round-2 production schedule
        ]
        x_tune = jax.random.uniform(jax.random.PRNGKey(3), (BATCH_SIZE, 2))
        t_tune = sample_image_quad_packed(quad, h, w, x_tune)
        best = None
        for knobs in candidates:
            if _tune_skip(f"train {knobs}"):
                continue
            (tk.RECOMPUTE_MASKS, tk.FUSED_TILE_DIV, tk.PICK_VARIANT,
             tk.VT_LOMASK, tk.VT_FL) = knobs
            t_cand = time.time()
            try:
                st = jax.tree.map(jnp.copy, trainer.state)
                fn = jax.jit(trainer.train_step_fn)
                st, lv = fn(st, x_tune, t_tune)  # compile + settle
                np.asarray(lv)
                t0 = time.time()
                for _ in range(10):
                    st, lv = fn(st, x_tune, t_tune)
                np.asarray(lv)
                dt = (time.time() - t0) / 10
                sys.stderr.write(
                    f"# autotune {knobs}: {dt*1e3:.2f} ms/step\n"
                )
                if best is None or dt < best[0]:
                    best = (dt, knobs)
            except Exception as e:  # noqa: BLE001 - OOM/compile fail: skip
                sys.stderr.write(
                    f"# autotune {knobs}: skipped "
                    f"({type(e).__name__}: {str(e).splitlines()[0][:80]})\n"
                )
            tune_spent[0] += time.time() - t_cand
        (tk.RECOMPUTE_MASKS, tk.FUSED_TILE_DIV, tk.PICK_VARIANT,
         tk.VT_LOMASK, tk.VT_FL) = (
            best[1] if best else (False, 4, "base", "bcast", True)
        )
        sys.stderr.write(f"# autotune picked {best[1] if best else 'default'}\n")
    train_schedule = _schedule_context()  # before the inference re-tune

    # SCAN_STEPS steps per dispatch: the analog of the reference's CUDA
    # graph (trainer.h:176-183) - one launch covers many steps, so the
    # per-dispatch host/tunnel overhead (~4 ms measured) doesn't taint the
    # throughput measurement. NOTE: quad must be a jit ARGUMENT (a closed-
    # over 48 MB constant overflows the axon compile request).
    SCAN_STEPS = min(10, max(1, TIMED_STEPS))

    def multi_step(state, key, quad_arg):
        def bench_step(carry, _):
            st, k0 = carry
            k0, k = jax.random.split(k0)
            xy = jax.random.uniform(k, (BATCH_SIZE, 2))
            rgb = sample_image_quad_packed(quad_arg, h, w, xy)
            st, loss = trainer.train_step_fn(st, xy, rgb)
            return (st, k0), loss

        (state, key), losses = jax.lax.scan(
            bench_step, (state, key), None, length=SCAN_STEPS
        )
        return state, key, losses[-1]

    _step = jax.jit(multi_step, donate_argnums=(0,))
    step = lambda state, key: _step(state, key, quad)

    state = trainer.state
    # batch-coordinate RNG: the reference generates per-step uniforms with
    # curand (bench_ours.cu:188-332); the TPU analog is the hardware-backed
    # RBG generator - same protocol, none of threefry's per-step ALU cost.
    # TCNN_BENCH_RNG=threefry restores the portable generator.
    rng_impl = os.environ.get(
        "TCNN_BENCH_RNG",
        "rbg" if jax.default_backend() == "tpu" else "threefry2x32",
    )
    key = jax.random.key(1337, impl=rng_impl)

    t_compile = time.time()
    state, key, loss = step(state, key)
    jax.block_until_ready(loss)
    compile_s = time.time() - t_compile

    for _ in range(WARMUP_STEPS // SCAN_STEPS):
        state, key, loss = step(state, key)
    jax.block_until_ready(loss)
    np.asarray(loss)  # real sync (block_until_ready is unreliable on axon)

    timed_iters = max(1, TIMED_STEPS // SCAN_STEPS)
    t0 = time.time()
    for _ in range(timed_iters):
        state, key, loss = step(state, key)
    np.asarray(loss)
    dt = time.time() - t0

    steps_per_sec = timed_iters * SCAN_STEPS / dt
    samples_per_sec = steps_per_sec * BATCH_SIZE
    final_loss = float(loss)

    # inference throughput (same protocol: jitted forward, trimmed fp32 out)
    xy_inf = jax.random.uniform(jax.random.PRNGKey(7), (BATCH_SIZE, 2))
    trainer.state = state

    # the forward-only kernel's best pick variant can differ from the train
    # winner (no scatter, different VMEM envelope): quick re-tune through
    # the dedicated INFER_VARIANT knob so the train winner stays intact.
    # The trainer's jit cache keys on the knob, so each variant traces
    # cleanly.
    if stored is None and autotune != "0" and (
        jax.default_backend() == "tpu" or autotune == "force"
    ):

        def time_inf():
            out = trainer.inference(xy_inf)
            np.asarray(out[:1, :1])
            t0 = time.time()
            for _ in range(10):
                out = trainer.inference(xy_inf)
            np.asarray(out[:1, :1])
            return (time.time() - t0) / 10

        best_inf = None
        for variant in ("vt", "cwend", "v3b"):
            if _tune_skip(f"inf {variant}"):
                continue
            tk.INFER_VARIANT = variant
            t_cand = time.time()
            try:
                dt = time_inf()
                sys.stderr.write(f"# autotune-inf {variant}: {dt*1e3:.2f} ms\n")
                if best_inf is None or dt < best_inf[0]:
                    best_inf = (dt, variant)
            except Exception as e:  # noqa: BLE001 - OOM/compile fail: skip
                sys.stderr.write(
                    f"# autotune-inf {variant}: skipped "
                    f"({type(e).__name__}: {str(e).splitlines()[0][:80]})\n"
                )
            tune_spent[0] += time.time() - t_cand
        tk.INFER_VARIANT = best_inf[1] if best_inf else "base"
        # tile sweep for the winning variant (forward-only kernel is
        # VMEM-light; tiles off the train-shared plan tile can win).
        # Larger tiles are excluded on measurement: 2048 fails at runtime
        # and 4096's Mosaic compile hung >12 min on the bench chip (r3
        # probe) - re-enable per device kind if a future chip/toolchain
        # lifts that.
        best_tile = (best_inf[0] if best_inf else 1e9, 0)
        for tile in (512, 256):
            if _tune_skip(f"inf tile={tile}"):
                continue
            tk.INFER_TILE = tile
            t_cand = time.time()
            try:
                dt = time_inf()
                sys.stderr.write(f"# autotune-inf tile={tile}: {dt*1e3:.2f} ms\n")
                if dt < best_tile[0]:
                    best_tile = (dt, tile)
            except Exception as e:  # noqa: BLE001
                sys.stderr.write(
                    f"# autotune-inf tile={tile}: skipped "
                    f"({type(e).__name__}: {str(e).splitlines()[0][:80]})\n"
                )
            tune_spent[0] += time.time() - t_cand
        tk.INFER_TILE = best_tile[1]
        # persist the winners: the next bench (or user process) on this
        # chip applies them and skips tuning entirely
        save_schedule(
            device_kind,
            sched_key,
            Schedule(
                recompute_masks=tk.RECOMPUTE_MASKS,
                fused_tile_div=tk.FUSED_TILE_DIV,
                pick_variant=tk.PICK_VARIANT,
                infer_variant=tk.INFER_VARIANT,
                infer_tile=tk.INFER_TILE,
                vt_lomask=tk.VT_LOMASK,
                vt_fl=tk.VT_FL,
            ),
        )
        sys.stderr.write(f"# schedule: persisted for {device_kind} | {sched_key}\n")

    xy = xy_inf
    out = trainer.inference(xy)  # builds the jit + prepared-operand cache
    jax.block_until_ready(out)
    from tcnn_tpu.ops.pallas.train_kernel import (
        fused_forward_prepared,
        prepare_forward,
        supported_infer,
    )

    # The scan loop dispatches the fused Pallas forward directly, so it
    # must apply the same TPU-backend gate Trainer.inference does (the
    # CPU smoke run takes the eager-Trainer branch below).
    if jax.default_backend() == "tpu" and supported_infer(model.network):
        # SCAN_STEPS forwards per dispatch, like the train loop: the
        # reference's inference launches cost ~us (bench_ours.cu), the
        # axon tunnel's per-dispatch overhead is ~2 ms - amortize it out
        # of the measurement. Same op as Trainer.inference's fused path
        # (prepared operands, trimmed fp32 out); iterations chain.
        prep = jax.jit(lambda p: prepare_forward(model.network, p))(
            trainer.inference_params
        )
        nd = model.network.n_output_dims

        def multi_inf(xy0, pr):
            def body(xy_c, _):
                o = fused_forward_prepared(model.network, pr, xy_c)[
                    :, :nd
                ].astype(jnp.float32)
                return xy0 + o[:, :2] * 1e-30, o[-1, -1]

            xy_fin, os_ = jax.lax.scan(body, xy0, None, length=SCAN_STEPS)
            return xy_fin, os_[-1]

        _minf = jax.jit(multi_inf)
        xy_c, dep = _minf(xy_inf, prep)
        np.asarray(dep)
        inf_iters = max(1, TIMED_STEPS // SCAN_STEPS)
        t0 = time.time()
        for _ in range(inf_iters):
            xy_c, dep = _minf(xy_c, prep)
        np.asarray(dep)
        inf_samples_per_sec = (
            inf_iters * SCAN_STEPS * BATCH_SIZE / (time.time() - t0)
        )
    else:
        t0 = time.time()
        for _ in range(TIMED_STEPS):
            out = trainer.inference(xy)
            # chain iterations (defeats transport-level result caching)
            xy = xy_inf + out[:, :2] * 1e-30
        jax.block_until_ready(out)
        np.asarray(out[:1, :1])
        inf_samples_per_sec = TIMED_STEPS * BATCH_SIZE / (time.time() - t0)

    sys.stderr.write(
        f"# device={jax.devices()[0].device_kind} compile={compile_s:.1f}s "
        f"steps/s={steps_per_sec:.1f} final_loss={final_loss:.3e} "
        f"inference_samples/s={inf_samples_per_sec:.3e}\n"
    )
    print(
        json.dumps(
            {
                # the batch is env-overridable for CI smoke; the label must
                # say what was actually measured
                "metric": f"image_train_throughput_config_hash_b2^{LOG2_BATCH}",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 4),
                "context": {
                    "inference_samples_per_sec": round(inf_samples_per_sec, 1),
                    "final_loss": final_loss,
                    # what the on-chip autotune picked (receipts for PERF.md);
                    # train captured before the inference re-tune overwrites
                    # the shared knobs
                    "train_schedule": train_schedule,
                    "inference_schedule": _schedule_context(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
