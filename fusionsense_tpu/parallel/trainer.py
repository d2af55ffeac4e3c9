"""Multi-chip training loop: the full Trainer semantics under a device mesh.

Integrates the SPMD train step (parallel/sharded.py) with the ADC
refinement, capacity bucketing, and history logging of the single-device
Trainer (train/trainer.py) — the end-to-end multi-chip path the reference
only gestures at with its DDP wrapper (reference
dn_splatter/dn_pipeline.py:161-167; SURVEY.md §7.2 M7).

Refinement and capacity resizing run as ordinary jitted programs on the
sharded arrays: outside shard_map, XLA GSPMD inserts the collectives that
the slot-permutation surgery needs, and ZeRO-1 optimizer shards are pinned
back to their `data`-axis layout afterwards.
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fusionsense_tpu.config import ExperimentConfig
from fusionsense_tpu.core.cameras import Camera
from fusionsense_tpu.gaussians.adc import init_stats, refine
from fusionsense_tpu.gaussians.resize import pick_capacity, resize_train_state
from fusionsense_tpu.gaussians.store import GaussianState
from fusionsense_tpu.parallel.sharded import make_sharded_train_chunk
from fusionsense_tpu.train.optim import AdamState, init_adam
from fusionsense_tpu.train.trainer import TrainData


class ShardedTrainer:
    """Trainer.run semantics on a jax.sharding.Mesh (data x tile x gauss)."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        camera: Camera,
        data: TrainData,
        gaussians: GaussianState,
        mesh: Mesh,
        scene_scale: float = 1.0,
        adam_groups: Optional[dict] = None,
        shard_optimizer: bool = False,
    ):
        self.cfg = cfg
        self.camera = camera
        self.data = data
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        self.shard_optimizer = shard_optimizer and self.n_data > 1
        if self.shard_optimizer:
            assert gaussians.capacity % self.n_data == 0, (
                "ZeRO-1 needs capacity divisible by the data axis")
        self.gaussians = gaussians
        self.opt = init_adam(gaussians.params())
        self.stats = init_stats(gaussians.capacity)
        self.num_views = data.images.shape[0]
        self.step = 0
        self.history: list[dict] = []
        self.max_capacity = gaussians.capacity
        self.auto_capacity = cfg.train.auto_capacity

        self._chunk, self._opt_spec = make_sharded_train_chunk(
            cfg, camera, data, mesh, adam_groups,
            shard_optimizer=self.shard_optimizer)
        self._refine = jax.jit(
            lambda g, o, st, seed, step: refine(
                g, o, st, jax.random.PRNGKey(seed), cfg.train.adc, step,
                scene_scale=scene_scale))
        if self.shard_optimizer:
            self.opt = self._pin_opt(self.opt)

    def _pin_opt(self, opt: AdamState) -> AdamState:
        """Place ZeRO-1 moment shards on their data-axis layout."""
        def put(x, spec):
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return AdamState(
            m={k: put(v, self._opt_spec.m[k]) for k, v in opt.m.items()},
            v={k: put(v, self._opt_spec.v[k]) for k, v in opt.v.items()},
            acc={k: put(v, self._opt_spec.acc[k]) for k, v in opt.acc.items()},
            counts={k: put(v, P()) for k, v in opt.counts.items()},
        )

    def _cam_indices(self, n: int) -> np.ndarray:
        """(n, n_data) sequential camera schedule: each data shard walks the
        view list with a stride offset (the multi-camera generalization of
        the reference's sequential datamanager order)."""
        base = np.arange(self.step, self.step + n, dtype=np.int32)[:, None]
        off = np.arange(self.n_data, dtype=np.int32)[None, :]
        return (base * self.n_data + off) % self.num_views

    def run(self, iterations: Optional[int] = None, log=print):
        cfg = self.cfg
        total = iterations if iterations is not None else cfg.train.iterations
        adc = cfg.train.adc
        t0 = time.time()
        while self.step < total:
            n = min(cfg.train.scan_chunk, total - self.step)
            next_refine = (
                (self.step - adc.warmup) // adc.refine_every + 1
            ) * adc.refine_every + adc.warmup
            if self.step < adc.warmup:
                next_refine = adc.warmup
            n = max(1, min(n, next_refine - self.step))

            g, o, s, metrics = self._chunk(
                self.gaussians, self.opt, self.stats,
                np.int32(self.step), self._cam_indices(n))
            self.gaussians, self.opt, self.stats = g, o, s
            self.step += n

            if (self.step >= adc.warmup and self.step < adc.stop_split_at
                    and (self.step - adc.warmup) % adc.refine_every == 0):
                seed = np.uint32(cfg.train.seed * 1_000_003 + self.step)
                self.gaussians, self.opt, self.stats, _ = self._refine(
                    self.gaussians, self.opt, self.stats, seed,
                    np.int32(self.step))
                if self.shard_optimizer:
                    self.opt = self._pin_opt(self.opt)

            if self.step % cfg.train.log_every == 0 or self.step >= total:
                loss_h, psnr_h, n_alive = jax.device_get(
                    (metrics["loss"][-1], metrics["psnr"][-1],
                     self.gaussians.num_alive))
                rec = {
                    "step": self.step,
                    "loss": float(loss_h),
                    "psnr": float(psnr_h),
                    "num_gaussians": int(n_alive),
                    "capacity": self.gaussians.capacity,
                    "elapsed_s": time.time() - t0,
                }
                if self.auto_capacity:
                    cap = pick_capacity(int(n_alive), self.gaussians.capacity,
                                        self.max_capacity,
                                        minimum=min(1024, self.max_capacity))
                    if cap != self.gaussians.capacity and (
                            not self.shard_optimizer
                            or cap % self.n_data == 0):
                        self.gaussians, self.opt, self.stats = (
                            resize_train_state(self.gaussians, self.opt,
                                               self.stats, new_capacity=cap))
                        if self.shard_optimizer:
                            self.opt = self._pin_opt(self.opt)
                self.history.append(rec)
                if log:
                    log(f"step {rec['step']:6d}  loss {rec['loss']:.4f}  "
                        f"psnr {rec['psnr']:.2f}  n {rec['num_gaussians']}")
        return self.history
