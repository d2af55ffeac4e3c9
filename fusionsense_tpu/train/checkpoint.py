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


def _to_pytree(gaussians, opt, stats, step: int) -> dict:
    return {
        "gaussians": dict(gaussians),
        "opt": {"m": opt.m, "v": opt.v, "acc": opt.acc, "counts": opt.counts},
        "stats": dict(stats),
        "step": np.asarray(step, np.int64),
    }


def save_checkpoint(path, gaussians: GaussianState, opt: AdamState,
                    stats: RefineStats, step: int, extra: Optional[dict] = None):
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_pytree(gaussians, opt, stats, step), force=True)
    if extra is not None:
        with open(path.parent / f"{path.name}.meta.json", "w") as f:
            json.dump(extra, f, indent=2, default=str)


def load_checkpoint(path) -> tuple[GaussianState, AdamState, RefineStats, int]:
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    g = GaussianState(**tree["gaussians"])
    # restore boolean masks (orbax may round-trip bools as loaded dtype)
    g = g.replace(alive=np.asarray(g.alive).astype(bool),
                  frozen=np.asarray(g.frozen).astype(bool))
    o = tree["opt"]
    opt = AdamState(m=o["m"], v=o["v"], acc=o["acc"], counts=o["counts"])
    stats = RefineStats(**tree["stats"])
    return g, opt, stats, int(tree["step"])
