"""Checkpoint / resume via Orbax.

The reference delegates checkpointing to the nerfstudio Trainer
(steps_per_save=15000 -> config.yml + ckpt, restored by eval_setup for
every downstream stage — reference dn_splatter/dn_config.py:25,
export_mesh.py:133; see SURVEY.md §5). Here the padded, statically-shaped
store means a checkpoint is a plain pytree of fixed-size arrays — no
dynamic-shape surgery on restore, and any mesh/render/eval stage can
restore it single- or multi-chip.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np
import orbax.checkpoint as ocp

from fusionsense_tpu.gaussians.adc import RefineStats
from fusionsense_tpu.gaussians.store import GaussianState
from fusionsense_tpu.train.optim import AdamState


def _adam_tree(opt: AdamState) -> dict:
    return {"m": opt.m, "v": opt.v, "acc": opt.acc, "counts": opt.counts}


def _adam_from_tree(o: dict) -> AdamState:
    return AdamState(m=o["m"], v=o["v"], acc=o["acc"], counts=o["counts"])


def _to_pytree(gaussians, opt, stats, step: int, cam_state=None) -> dict:
    tree = {
        "gaussians": dict(gaussians),
        "opt": _adam_tree(opt),
        "stats": dict(stats),
        "step": np.asarray(step, np.int64),
    }
    if cam_state is not None:
        deltas, cam_opt = cam_state
        tree["cam"] = {"deltas": deltas, "opt": _adam_tree(cam_opt)}
    return tree


def save_checkpoint(path, gaussians: GaussianState, opt: AdamState,
                    stats: RefineStats, step: int,
                    extra: Optional[dict] = None, cam_state=None):
    """cam_state, when given, is the trainer's (deltas, AdamState) camera
    optimizer pair — the reference checkpoints its camera optimizer inside
    the nerfstudio pipeline state the same way (SURVEY.md §5
    checkpoint/resume); dropping it on resume silently discards the
    learned pose corrections."""
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_pytree(gaussians, opt, stats, step, cam_state),
                   force=True)
    if extra is not None:
        with open(path.parent / f"{path.name}.meta.json", "w") as f:
            json.dump(extra, f, indent=2, default=str)


def load_checkpoint_full(path):
    """Returns (gaussians, opt, stats, step, cam_state | None, meta | None).

    cam_state is the (deltas, AdamState) camera-optimizer pair when the
    checkpoint carries one; meta is the sidecar meta.json dict when
    present (host-side trainer policy state: tile_capacity, cover_tiles)."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    g = GaussianState(**tree["gaussians"])
    # restore boolean masks (orbax may round-trip bools as loaded dtype)
    g = g.replace(alive=np.asarray(g.alive).astype(bool),
                  frozen=np.asarray(g.frozen).astype(bool))
    opt = _adam_from_tree(tree["opt"])
    stats = RefineStats(**tree["stats"])
    cam_state = None
    if "cam" in tree:
        cam_state = (tree["cam"]["deltas"],
                     _adam_from_tree(tree["cam"]["opt"]))
    meta = None
    meta_path = path.parent / f"{path.name}.meta.json"
    if meta_path.exists():
        with open(meta_path) as f:
            meta = json.load(f)
    return g, opt, stats, int(tree["step"]), cam_state, meta


def load_checkpoint(path) -> tuple[GaussianState, AdamState, RefineStats, int]:
    g, opt, stats, step, _, _ = load_checkpoint_full(path)
    return g, opt, stats, step


def load_for_inference(path):
    """Checkpoint -> (gaussians, step, cam_state) ready to render/export.

    Re-applies the binary-opacity snap when the checkpoint was trained
    with binary opacities (meta sidecar flag): the reference re-applies
    its logit surgery in get_outputs even at eval (dn_model.py:493-503),
    so a checkpoint saved inside a reset-margin window — or by older code
    whose binarization lived in the forward instead of param surgery —
    still renders binarized. Snapping already-snapped logits ({0, 1}) is
    the identity, so this is a no-op for ordinary checkpoints."""
    import jax.numpy as jnp

    g, _, _, step, cam_state, meta = load_checkpoint_full(path)
    if meta and meta.get("binary_opacities"):
        thr = float(meta.get("binary_opacity_threshold", 0.9))
        logits = jnp.asarray(g.logit_opacities)
        g = g.replace(logit_opacities=jnp.where(logits >= thr, 1.0, 0.0))
    return g, step, cam_state


def save_trainer_state(trainer, path):
    """Shared full-fidelity save used by Trainer.save AND
    ShardedTrainer.save — one format, so a run can move between single-
    and multi-chip."""
    save_checkpoint(
        path, trainer.gaussians, trainer.opt, trainer.stats, trainer.step,
        cam_state=trainer.cam_state,
        extra={"tile_capacity": trainer.tile_capacity,
               "cover_tiles": trainer.cover_tiles,
               "binary_opacities": trainer.cfg.model.binary_opacities,
               "binary_opacity_threshold":
                   trainer.cfg.model.binary_opacity_threshold,
               "history": trainer.history[-5:]})


def restore_trainer_state(trainer, path):
    """Shared restore core: loads model/opt/stats/step + camera-optimizer
    + adaptive policy state into `trainer`. Callers apply their own
    post-load hook (render-prefix recompact / ZeRO-1 re-pin)."""
    import jax.numpy as jnp

    g, opt, stats, step, cam_state, meta = load_checkpoint_full(path)
    assert g.capacity <= trainer.max_capacity, (
        f"checkpoint capacity {g.capacity} exceeds configured "
        f"max {trainer.max_capacity}")
    trainer.gaussians, trainer.opt, trainer.stats = g, opt, stats
    trainer.step = step
    if cam_state is not None:
        nv = int(np.asarray(cam_state[0]).shape[0])
        assert nv == trainer.num_views, (
            f"checkpoint has {nv} camera deltas, scene has "
            f"{trainer.num_views} views")
        trainer.cam_state = (jnp.asarray(cam_state[0]), cam_state[1])
    if meta:
        if meta.get("tile_capacity"):
            trainer.tile_capacity = int(meta["tile_capacity"])
        if meta.get("cover_tiles"):
            trainer.cover_tiles = int(meta["cover_tiles"])
    return trainer
