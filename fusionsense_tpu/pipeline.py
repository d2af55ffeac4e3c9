"""End-to-end reconstruction pipeline: the reference's Module 1 / Module 3
orchestrator, in-process.

The reference shells out through subprocess chains (reference
scripts/train.py:274-327: select frames -> visual hull -> Metric3D depth ->
pcd init -> DSINE normals -> ns-train -> gs-mesh -> eval, across two conda
envs). Here every stage is a library call in one process; foundation-model
priors (depth/normal/masks) are ingested from files produced by any
external model, with built-in fallbacks (normals-from-depth, sensor depth).

Stages:
 1. parse transforms.json (+ optional split writing)
 2. visual hull from masks                 [priors.visual_hull]
 3. seed pcd from depths + hull            [priors.pcd_init]
 4. train with ADC + touch anchoring + hull/touch pruning callbacks
 5. high-gradient export for active touch  [touch_select.high_grad]
 6. mesh extraction (tsdf / level-set / poisson / marching / gaussians)
 7. evaluation (render metrics + optional chamfer)
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.config import ExperimentConfig
from fusionsense_tpu.data.dataparser import (
    DataParserConfig, load_train_data, parse_transforms,
)
from fusionsense_tpu.gaussians.init import init_from_points
from fusionsense_tpu.gaussians.touch import (
    add_touch_patches, hull_prune, touch_prune,
)
from fusionsense_tpu.train.trainer import TrainData, Trainer
from fusionsense_tpu.utils.ply import write_ply


@dataclasses.dataclass
class PipelineConfig:
    data: DataParserConfig = dataclasses.field(default_factory=DataParserConfig)
    experiment: ExperimentConfig = dataclasses.field(
        default_factory=ExperimentConfig)
    gel_scale: float = 6.34e-5
    run_visual_hull: bool = True
    run_hull_pruning: bool = True
    high_grad_export: bool = True
    output_dir: str = "outputs"
    viewer: bool = False          # serve the live WebGL splat viewer
    viewer_port: int = 7007
    # multi-chip: "data=2,tile=2,gauss=2"-style axis spec; None = single
    # device. Training then runs on a jax.sharding.Mesh via ShardedTrainer
    # (the reference's DDP slot, dn_pipeline.py:161-167, generalized).
    device_mesh: Optional[str] = None
    shard_optimizer: bool = True  # ZeRO-1 over the data axis when meshed
    # resume mid-training from a Trainer.save checkpoint (the reference
    # resumes via nerfstudio's load_dir/eval_setup)
    resume: Optional[str] = None


class ReconstructionPipeline:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.out = Path(cfg.output_dir)
        self.out.mkdir(parents=True, exist_ok=True)
        self.scene = parse_transforms(cfg.data)
        self.camera, self.data = load_train_data(self.scene, cfg.data, "train")
        self.hull_points: Optional[np.ndarray] = None
        self.trainer: Optional[Trainer] = None

    def _register_artifact(self, key: str, path):
        """Patch transforms.json so later runs reuse a generated prior
        (reference set_transforms_and_configs, scripts/train.py:105-112
        writes ply_file_path/object_pc_path the same way)."""
        import json

        tj = Path(self.cfg.data.data_dir) / "transforms.json"
        try:
            with open(tj) as f:
                meta = json.load(f)
            meta[key] = str(Path(path).absolute())
            with open(tj, "w") as f:
                json.dump(meta, f)
        except OSError:
            pass  # read-only datasets keep artifacts in output_dir only

    # ---------------------------------------------------------- priors ----
    def build_priors(self):
        cfg = self.cfg
        scene = self.scene
        if scene.hull_points is not None:
            self.hull_points = np.asarray(scene.hull_points)
        elif cfg.run_visual_hull and self.data.masks is not None:
            from fusionsense_tpu.priors.visual_hull import visual_hull

            self.hull_points = visual_hull(self.data.masks, self.camera)
            # artifacts are stored in CAPTURE coordinates: the dataparser
            # re-applies the scene normalization on load
            write_ply(self.out / "foreground_pcd.ply",
                      self.scene.untransform_points(self.hull_points))
            self._register_artifact("object_pc_path",
                                    self.out / "foreground_pcd.ply")

        if scene.seed_points is not None:
            pts = jnp.asarray(scene.seed_points)
            rgb = jnp.asarray(
                scene.seed_colors if scene.seed_colors is not None
                else np.full((len(pts), 3), 0.5, np.float32))
            normals = (jnp.asarray(scene.seed_normals)
                       if scene.seed_normals is not None else None)
        else:
            depth_src = (self.data.sensor_depths
                         if self.data.sensor_depths is not None
                         else self.data.mono_depths)
            assert depth_src is not None, (
                "need seed pcd (ply_file_path) or depth maps to initialize")
            from fusionsense_tpu.priors.pcd_init import seed_pcd_from_depths

            pts_np, rgb_np = seed_pcd_from_depths(
                depth_src, self.data.images, self.camera,
                hull_points=self.hull_points)
            write_ply(self.out / "merged_pcd.ply",
                      self.scene.untransform_points(pts_np), colors=rgb_np)
            self._register_artifact("ply_file_path",
                                    self.out / "merged_pcd.ply")
            pts, rgb, normals = jnp.asarray(pts_np), jnp.asarray(rgb_np), None
        return pts, rgb, normals

    # ----------------------------------------------------------- train ----
    def train(self, log=print):
        cfg = self.cfg
        ec = cfg.experiment
        pts, rgb, normals = self.build_priors()
        capacity = ec.model.capacity
        if pts.shape[0] > capacity // 2:
            stride = pts.shape[0] // (capacity // 2) + 1
            pts, rgb = pts[::stride], rgb[::stride]
            normals = normals[::stride] if normals is not None else None
        gaussians = init_from_points(
            pts, rgb, capacity=capacity, sh_degree=ec.model.sh_degree,
            seed_normals=normals, init_opacity=ec.model.init_opacity)

        callbacks = []
        state = {"touch_added": False, "high_grad_done": False}
        hull_j = (jnp.asarray(self.hull_points)
                  if self.hull_points is not None and len(self.hull_points)
                  else None)
        boxes_ref = {}

        if hull_j is not None and cfg.run_hull_pruning:
            prune_j = jax.jit(lambda g: hull_prune(g, hull_j))

            def hull_cb(tr):
                if tr.step >= ec.train.adc.warmup:
                    tr.gaussians = prune_j(tr.gaussians)
                    return True
                return False
            callbacks.append(hull_cb)

        if self.scene.touch_patches:
            def touch_cb(tr):
                if (not state["touch_added"]
                        and tr.step >= ec.train.add_touch_at):
                    tr.gaussians, tr.opt, boxes_ref["boxes"] = (
                        add_touch_patches(
                            tr.gaussians, tr.opt, self.scene.touch_patches,
                            gel_scale=cfg.gel_scale,
                            scene_scale=self.scene.scale))
                    state["touch_added"] = True
                    return True
                elif state["touch_added"]:
                    tr.gaussians = touch_prune(tr.gaussians,
                                               boxes_ref["boxes"])
                    return True
                return False
            callbacks.append(touch_cb)

        if cfg.high_grad_export:
            def high_grad_cb(tr):
                target = ec.train.adc.stop_split_at - 500
                if not state["high_grad_done"] and tr.step >= target:
                    from fusionsense_tpu.touch_select.high_grad import (
                        export_high_grad_pcd,
                    )

                    n = export_high_grad_pcd(
                        self.out / "high_grad_pts.pcd", tr.gaussians,
                        tr.stats, self.hull_points,
                        untransform=self.scene.untransform_points)
                    state["high_grad_done"] = True
                    if log:
                        log(f"high-grad export: {n} points")
            callbacks.append(high_grad_cb)

        if cfg.viewer:
            from fusionsense_tpu.viewer import (
                SplatViewerServer, ViewerCallback,
            )

            self.viewer_server = SplatViewerServer(port=cfg.viewer_port)
            callbacks.append(ViewerCallback(self.viewer_server))
            if log:
                log(f"live viewer at {self.viewer_server.url}")

        if cfg.device_mesh:
            from fusionsense_tpu.parallel.mesh import make_mesh
            from fusionsense_tpu.parallel.trainer import ShardedTrainer

            axes = dict(kv.split("=") for kv in cfg.device_mesh.split(","))
            axes = {k.strip(): int(v) for k, v in axes.items()}
            n_dev = 1
            for v in axes.values():
                n_dev *= v
            mesh = make_mesh(n_dev, **axes)
            shard_opt = (cfg.shard_optimizer
                         and capacity % axes.get("data", 1) == 0)
            self.trainer = ShardedTrainer(
                ec, self.camera, self.data, gaussians, mesh,
                scene_scale=1.0, extra_callbacks=callbacks,
                shard_optimizer=shard_opt)
        else:
            self.trainer = Trainer(ec, self.camera, self.data, gaussians,
                                   scene_scale=1.0,
                                   extra_callbacks=callbacks)
        self.trainer.checkpoint_dir = str(self.out)
        self.trainer.image_log_dir = str(self.out / "log_images")
        if cfg.resume:
            self.trainer.restore(cfg.resume)
            # touch patches live in the checkpoint as frozen Gaussians —
            # the add-once callback must not anchor them a second time, but
            # the recurring intruder prune still needs its boxes
            if (self.scene.touch_patches
                    and bool(np.asarray(self.trainer.gaussians.frozen).any())):
                from fusionsense_tpu.gaussians.touch import TouchBoxes

                state["touch_added"] = True
                boxes_ref["boxes"] = TouchBoxes.from_patches(
                    self.scene.touch_patches)
            if log:
                log(f"resumed from {cfg.resume} at step {self.trainer.step}")
        hist = self.trainer.run(log=log)
        self.trainer.save(self.out / f"ckpt_{self.trainer.step}")
        return hist

    def _render_rcfg(self):
        """Rasterize config for post-training renders: start from the
        trainer's adaptively-grown pair budget, not the config's initial
        one — a flat-backend budget that grew during training would
        otherwise silently drop whole trailing tiles from eval images and
        mesh depth renders (make_render_fn additionally auto-grows on
        overflow as a backstop)."""
        import dataclasses

        rc = self.cfg.experiment.model.rasterize
        grown = getattr(self.trainer, "tile_capacity", rc.tile_capacity)
        if grown > rc.tile_capacity:
            rc = dataclasses.replace(rc, tile_capacity=grown)
        return rc

    # ------------------------------------------------------------ mesh ----
    def extract_mesh(self, method: str = "tsdf", **kw):
        from fusionsense_tpu.mesh_export import extract

        assert self.trainer is not None, "train first"
        deltas = (self.trainer.cam_state[0]
                  if self.cfg.experiment.train.camera_opt else None)
        return extract(
            method, self.trainer.gaussians, self.camera,
            rasterize_cfg=self._render_rcfg(),
            out_dir=self.out, untransform=self.scene.untransform_points,
            hull_points=self.hull_points, cam_deltas=deltas, **kw)

    # ------------------------------------------------------------ eval ----
    def evaluate(self, split: str = "train"):
        from fusionsense_tpu.eval.evaluator import evaluate

        assert self.trainer is not None, "train first"
        cam, data = ((self.camera, self.data) if split == "train"
                     else load_train_data(self.scene, self.cfg.data, split))
        # train-split eval uses the optimized camera poses (reference:
        # nerfstudio restores its camera optimizer through eval_setup)
        deltas = (self.trainer.cam_state[0]
                  if split == "train"
                  and self.cfg.experiment.train.camera_opt else None)
        res = evaluate(self.trainer.gaussians, cam, data,
                       self._render_rcfg(),
                       cam_deltas=deltas)
        with open(self.out / "metrics.json", "w") as f:
            json.dump(res, f, indent=2)
        return res
