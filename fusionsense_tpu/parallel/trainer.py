"""Multi-chip training loop: the full Trainer semantics under a device mesh.

Integrates the SPMD train step (parallel/sharded.py) with the ADC
refinement, capacity bucketing, camera optimizer, auto tile capacity,
touch/hull/high-grad callbacks, checkpointing, image logging, and history
logging of the single-device Trainer (train/trainer.py) — the end-to-end
multi-chip path the reference only gestures at with its DDP wrapper
(reference dn_splatter/dn_pipeline.py:161-167; SURVEY.md §7.2 M7).

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
from fusionsense_tpu.gaussians.resize import (
    compact_train_state, pick_capacity, render_bucket, resize_train_state,
)
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
        extra_callbacks: Optional[list] = None,
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
        self.extra_callbacks = extra_callbacks or []
        self.checkpoint_dir = None
        self.image_log_dir = None
        self._debug_render = None
        self._adam_groups = adam_groups
        nv = data.images.shape[0]
        z6 = jnp.zeros((nv, 6))
        self.cam_state = (z6, init_adam({"cam_delta": z6}))
        self.tile_capacity = cfg.model.rasterize.tile_capacity
        cap_tiles = cfg.model.rasterize.max_tiles_per_gaussian
        self.cover_tiles = (min(4, cap_tiles)
                            if cfg.train.auto_cover_window else cap_tiles)
        self._grid_tiles = (-(-camera.width // cfg.model.rasterize.tile_size)
                            * -(-camera.height
                                // cfg.model.rasterize.tile_size))
        self._chunk_cache: dict = {}
        self._opt_spec = None
        self.render_n = None
        if cfg.train.render_prefix:
            self._recompact(int(jax.device_get(gaussians.num_alive)),
                            pin=False)
        _ = self._train_chunk          # build the initial chunk + opt spec
        self._refine = jax.jit(
            lambda g, o, st, seed, step: refine(
                g, o, st, jax.random.PRNGKey(seed), cfg.train.adc, step,
                scene_scale=scene_scale))
        if self.shard_optimizer:
            self.opt = self._pin_opt(self.opt)

    @property
    def _train_chunk(self):
        key = (self.gaussians.capacity, self.render_n, self.tile_capacity,
               self.cover_tiles)
        fn = self._chunk_cache.get(key)
        if fn is None:
            fn, self._opt_spec = make_sharded_train_chunk(
                self.cfg, self.camera, self.data, self.mesh,
                self._adam_groups, shard_optimizer=self.shard_optimizer,
                tile_capacity=self.tile_capacity,
                cover_tiles=self.cover_tiles, render_n=self.render_n)
            self._chunk_cache[key] = fn
        return fn

    def _recompact(self, n_alive: int, pin: bool = True):
        """Alive-first compaction + render-bucket pick, same hysteresis
        as the single-device trainer (train/trainer.py _recompact), plus:
        the bucket is rounded up to a gauss-axis multiple (the depth-slice
        decomposition splits the prefix across the gauss axis) and the
        ZeRO-1 moment shards are re-pinned after the slot permutation."""
        self.gaussians, self.opt, self.stats = compact_train_state(
            self.gaussians, self.opt, self.stats)
        want = render_bucket(n_alive, self.gaussians.capacity)
        n_gauss = self.mesh.shape.get("gauss", 1)
        want = min(-(-want // n_gauss) * n_gauss, self.gaussians.capacity)
        if (self.render_n is None or want > self.render_n
                or want * 1.5 <= self.render_n
                or want == self.gaussians.capacity):
            self.render_n = want
        else:
            self.render_n = min(self.render_n, self.gaussians.capacity)
        if pin and self.shard_optimizer:
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

    def _maybe_bump_tile_capacity(self, overflow: int):
        """Same keep-nearest-K starvation policy as the single-device
        trainer (train/trainer.py _maybe_bump_tile_capacity)."""
        tc = self.cfg.train
        # flat backend: the direct pair-budget resize subsumes the ladder
        if (not tc.auto_tile_capacity
                or self.cfg.model.rasterize.backend == "flat"):
            return
        budget = self._grid_tiles * self.tile_capacity
        if overflow <= tc.tile_overflow_frac * budget:
            return
        if self.tile_capacity >= tc.max_tile_capacity:
            return
        want = int(self.tile_capacity * 1.5)
        want = -(-want // 128) * 128
        self.tile_capacity = min(want, tc.max_tile_capacity)

    def _maybe_resize_pair_budget(self, used: int):
        """Same direct budget sizing as the single-device trainer
        (train/trainer.py _maybe_resize_pair_budget), per-shard tiles."""
        tc = self.cfg.train
        if (self.cfg.model.rasterize.backend != "flat"
                or not tc.auto_tile_capacity or used <= 0):
            return
        n_tile = self.mesh.shape.get("tile", 1)
        t_loc = -(-self._grid_tiles // n_tile)
        target = -(-used * 5 // (4 * t_loc) // 64) * 64
        target = max(64, min(target, tc.max_tile_capacity))
        if target > self.tile_capacity:
            self.tile_capacity = target
        elif target * 2 <= self.tile_capacity:
            self.tile_capacity = target

    def _maybe_adjust_cover_window(self, trunc_by_win):
        """Same truncation-telemetry window policy as the single-device
        trainer (train/trainer.py _maybe_adjust_cover_window)."""
        import math as _math

        tc = self.cfg.train
        if not tc.auto_cover_window:
            return
        cap_tiles = self.cfg.model.rasterize.max_tiles_per_gaussian
        # tolerance scales with the RENDER population, like the
        # single-device policy: against a large capacity bucket with a
        # small live population the capacity-based tolerance would let the
        # window shrink while dropping visible splats from whole tiles
        pop = self.render_n or self.gaussians.capacity
        tol = tc.cover_trunc_frac * pop
        cur_w = max(1, int(_math.isqrt(self.cover_tiles)))
        w_max = min(5, max(1, int(_math.isqrt(cap_tiles))))
        want_w = w_max
        for w in range(1, w_max + 1):
            if trunc_by_win[w - 1] <= (tol if w >= cur_w else 0.5 * tol):
                want_w = w
                break
        if want_w != cur_w:
            self.cover_tiles = want_w * want_w

    def _cam_indices(self, n: int) -> np.ndarray:
        """(n, n_data) sequential camera schedule: each data shard walks the
        view list with a stride offset (the multi-camera generalization of
        the reference's sequential datamanager order)."""
        base = np.arange(self.step, self.step + n, dtype=np.int32)[:, None]
        off = np.arange(self.n_data, dtype=np.int32)[None, :]
        return (base * self.n_data + off) % self.num_views

    def save(self, path):
        """Same full-fidelity checkpoint as Trainer.save — the format is
        shared, so a run can move between single- and multi-chip."""
        from fusionsense_tpu.train.checkpoint import save_trainer_state

        save_trainer_state(self, path)

    def restore(self, path):
        """Resume from a Trainer/ShardedTrainer checkpoint; ZeRO-1 moment
        shards are re-pinned to their data-axis layout after the load."""
        from fusionsense_tpu.train.checkpoint import restore_trainer_state

        restore_trainer_state(self, path)
        if self.shard_optimizer:
            assert self.gaussians.capacity % self.n_data == 0, (
                "ZeRO-1 resume needs checkpoint capacity divisible by the "
                "data axis")
        if self.cfg.train.render_prefix:
            self._recompact(int(jax.device_get(self.gaussians.num_alive)),
                            pin=False)
        _ = self._train_chunk          # (re)build chunk + opt spec
        if self.shard_optimizer:
            self.opt = self._pin_opt(self.opt)
        return self

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

            g, o, cs, s, metrics = self._train_chunk(
                self.gaussians, self.opt, self.cam_state, self.stats,
                np.int32(self.step), self._cam_indices(n))
            self.gaussians, self.opt, self.cam_state, self.stats = g, o, cs, s
            self.step += n
            # cumulative counter across chunks (a log boundary only sees
            # the LAST chunk's metrics): one async device add per chunk
            nf_c = jnp.sum(metrics["nonfinite"])
            self._nf_acc = (nf_c if getattr(self, "_nf_acc", None) is None
                            else self._nf_acc + nf_c)

            mutated = False
            if (self.step >= adc.warmup and self.step < adc.stop_split_at
                    and (self.step - adc.warmup) % adc.refine_every == 0):
                seed = np.uint32(cfg.train.seed * 1_000_003 + self.step)
                self.gaussians, self.opt, self.stats, _ = self._refine(
                    self.gaussians, self.opt, self.stats, seed,
                    np.int32(self.step))
                mutated = True
            for cb in self.extra_callbacks:
                # same protocol as Trainer.extra_callbacks: truthy return
                # = the store/optimizer was mutated
                mutated |= bool(cb(self))
            if mutated and cfg.train.render_prefix:
                # the prefix must track the population every time it can
                # change (alive slots past render_n never rasterize);
                # _recompact re-pins the ZeRO shards itself
                self._recompact(int(jax.device_get(self.gaussians.num_alive)))
            elif mutated and self.shard_optimizer:
                self.opt = self._pin_opt(self.opt)

            if (self.image_log_dir is not None
                    and self.step % cfg.train.log_every == 0):
                self._dump_debug_grid()

            if (self.checkpoint_dir is not None
                    and self.step % cfg.train.steps_per_save == 0):
                self.save(f"{self.checkpoint_dir}/ckpt_{self.step}")

            if self.step % cfg.train.log_every == 0 or self.step >= total:
                (loss_h, psnr_h, ovf_h, tbw_h, pu_h, nf_h,
                 n_alive) = jax.device_get(
                    (metrics["loss"][-1], metrics["psnr"][-1],
                     metrics["overflow"][-1], metrics["trunc_by_win"][-1],
                     metrics["pairs_used"][-1], self._nf_acc,
                     self.gaussians.num_alive))
                self._nf_acc = None
                if int(nf_h) and log:
                    log(f"WARNING: skipped {int(nf_h)} non-finite step(s) "
                        f"since the last log (now at step {self.step})")
                rec = {
                    "step": self.step,
                    "loss": float(loss_h),
                    "psnr": float(psnr_h),
                    "num_gaussians": int(n_alive),
                    "tile_overflow": int(ovf_h),
                    "nonfinite_steps": int(nf_h),
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
                # render-prefix upkeep piggybacks on the same host sync
                if cfg.train.render_prefix:
                    self._recompact(int(n_alive))
                self._maybe_bump_tile_capacity(int(ovf_h))
                self._maybe_resize_pair_budget(int(pu_h))
                self._maybe_adjust_cover_window(tbw_h)
                self.history.append(rec)
                if log:
                    log(f"step {rec['step']:6d}  loss {rec['loss']:.4f}  "
                        f"psnr {rec['psnr']:.2f}  n {rec['num_gaussians']}")
        return self.history

    def _dump_debug_grid(self):
        """GT | rgb | depth | normal strip — same artifact as the
        single-device trainer's log_images dump."""
        from pathlib import Path

        from PIL import Image

        if self._debug_render is None:
            from fusionsense_tpu.eval.evaluator import make_render_fn

            self._debug_render = make_render_fn(
                self.cfg.model.rasterize, self.camera)
        i = self.step % self.num_views
        out = self._debug_render(self.gaussians, np.int32(i))
        gt = np.asarray(self.data.images[i])
        rgb = np.clip(np.asarray(out.rgb), 0, 1)
        d = np.asarray(out.depth)
        d = (d - d.min()) / max(d.max() - d.min(), 1e-8)
        depth = np.stack([d] * 3, -1)
        normal = np.asarray(out.normal) * 0.5 + 0.5
        grid = np.concatenate([gt, rgb, depth, np.clip(normal, 0, 1)], axis=1)
        path = Path(self.image_log_dir)
        path.mkdir(parents=True, exist_ok=True)
        Image.fromarray((grid * 255).astype(np.uint8)).save(
            path / f"step_{self.step:06d}.png")
