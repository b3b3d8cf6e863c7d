"""Persistent fused-kernel schedules, keyed by (device kind, model plan).

The fused kernels (train_kernel.py) have scheduling knobs - batch-tile
divisor, recompute-masks, lane-pick variant, inference tile - whose best
setting is chip- and model-dependent. bench.py autotunes them on the real
chip; this module persists the winners next to the XLA compilation cache
so later processes (and later bench runs) skip re-tuning, the same way the
compilation cache skips recompiling. The reference has no analog (CUDA
occupancy makes these choices in hardware); on TPU the schedule is a
software decision, so it gets the same durability as the compiled code.

A `Schedule` can also be attached per-Trainer (Trainer.schedule), removing
the round-3 wart where INFER_TILE was a process-global tuned for one model
(train_kernel.supported_infer docstring): two models in one process each
carry their own knobs.
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile


@dataclasses.dataclass(frozen=True)
class Schedule:
    """One model's fused-kernel scheduling knobs. Defaults mirror the
    train_kernel module defaults (the portable safe choices)."""

    recompute_masks: bool = False
    fused_tile_div: int = 4
    pick_variant: str = "vt"
    #: pick variant for the forward-only kernel ("" = pick_variant): the
    #: inference kernel has no scatter, so its best variant can differ
    infer_variant: str = ""
    #: batch tile for the forward-only kernel (0 = plan.batch_tile)
    infer_tile: int = 0
    #: vt lane-mask build form ("mm" = all-levels expansion matmul,
    #: "bcast" = per-level transient build; see train_kernel.VT_LOMASK)
    vt_lomask: str = "bcast"
    #: vt f-on-lanes table packing (half the gather-candidate traffic at
    #: F=2; see train_kernel.VT_FL)
    vt_fl: bool = True

    def as_tuple(self):
        return (
            self.recompute_masks,
            self.fused_tile_div,
            self.pick_variant,
            self.infer_variant,
            self.infer_tile,
            self.vt_lomask,
            self.vt_fl,
        )

    def to_json(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_json(cls, data: dict) -> "Schedule":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in fields})


def model_schedule_key(model) -> str | None:
    """Stable identity of the fused-kernel problem: the grid plan's level
    structure + the MLP shape. Returns None for non-fused-shaped models."""
    from .train_kernel import _fused_plan_for

    plan = _fused_plan_for(model)
    if plan is None:
        return None
    mlp = model.network
    return (
        f"L{plan.n_levels}f{plan.f}h{plan.h_total}c{plan.n_corners}"
        f"bt{plan.batch_tile}"
        f"_mlp{mlp.input_width}x{mlp.n_neurons}x{mlp.n_hidden_layers}"
        f"x{mlp.padded_output_width}"
    )


def _store_path() -> str:
    """Next to the XLA compilation cache when one is configured, else a
    user-level cache dir."""
    import jax

    cache_dir = jax.config.jax_compilation_cache_dir
    if cache_dir:
        return os.path.join(cache_dir, "tcnn_schedules.json")
    base = os.environ.get(
        "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
    )
    return os.path.join(base, "tcnn_tpu", "schedules.json")


def _read_store(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def load_schedule(device_kind: str, key: str | None) -> Schedule | None:
    """The persisted schedule for (device_kind, key), or None."""
    if key is None:
        return None
    entry = _read_store(_store_path()).get(f"{device_kind}|{key}")
    return Schedule.from_json(entry) if entry else None


def save_schedule(device_kind: str, key: str | None, sched: Schedule) -> None:
    """Persist (last-wins per entry). The read-modify-write runs under an
    exclusive flock on a sidecar lock file so two concurrent bench runs
    saving different (device, model) entries can't drop each other's; the
    replace itself is atomic so readers never see a torn file."""
    if key is None:
        return
    path = _store_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path + ".lock", "w") as lock:
        try:
            import fcntl

            fcntl.flock(lock, fcntl.LOCK_EX)
        except (ImportError, OSError):
            pass  # no flock (non-POSIX): degrade to last-writer-wins
        store = _read_store(path)
        store[f"{device_kind}|{key}"] = sched.to_json()
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(store, f, indent=1)
            os.replace(tmp, path)
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
