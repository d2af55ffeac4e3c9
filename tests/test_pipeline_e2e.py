"""Full-pipeline integration: disk fixture -> priors -> train -> mesh -> eval.

The CPU analog of the reference's end-to-end run (SURVEY.md §3.1 step
sequence), on the synthetic sphere capture.
"""
import numpy as np
import pytest

from fusionsense_tpu.config import (
    ExperimentConfig, LossConfig, ModelConfig, TrainConfig,
)
from fusionsense_tpu.data.dataparser import DataParserConfig
from fusionsense_tpu.data.fixture import write_synthetic_scene
from fusionsense_tpu.gaussians.adc import ADCConfig
from fusionsense_tpu.pipeline import PipelineConfig, ReconstructionPipeline
from fusionsense_tpu.render.rasterize import RasterizeConfig


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    return write_synthetic_scene(d, n_views=5, width=96, height=72,
                                 with_touches=True)


def make_cfg(scene_dir, out_dir, touches=False, iters=120):
    rcfg = RasterizeConfig(tile_size=16, tile_capacity=128,
                           max_tiles_per_gaussian=16, tile_chunk=16,
                           sh_degree=1)
    return PipelineConfig(
        data=DataParserConfig(data_dir=str(scene_dir), load_touches=touches),
        experiment=ExperimentConfig(
            model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=2048,
                              binary_opacities=False, sh_degree_interval=50),
            train=TrainConfig(
                iterations=iters, scan_chunk=40, add_touch_at=40,
                adc=ADCConfig(warmup=40, refine_every=40,
                              stop_split_at=iters - 20,
                              reset_alpha_every=1000)),
            loss=LossConfig(normal_lambda=0.1, sensor_depth_lambda=0.2,
                            smooth_lambda=0.01, flatness_lambda=0.01,
                            mono_depth_lambda=0.0),
        ),
        output_dir=str(out_dir),
    )


@pytest.mark.slow   # fast coverage: test_real_capture.test_blob_smoke
def test_pipeline_trains_and_extracts(scene_dir, tmp_path):
    cfg = make_cfg(scene_dir, tmp_path / "out")
    pipe = ReconstructionPipeline(cfg)
    assert pipe.data.images.shape[0] == 4          # train split
    assert pipe.data.sensor_depths is not None
    assert pipe.data.normals is not None
    assert pipe.data.masks is not None

    hist = pipe.train(log=None)
    assert np.isfinite(hist[-1]["loss"])
    assert (tmp_path / "out" / f"ckpt_{pipe.trainer.step}").exists()
    # visual hull ran from masks
    assert pipe.hull_points is not None and len(pipe.hull_points) > 50
    # high-grad export fired
    assert (tmp_path / "out" / "high_grad_pts.pcd").exists()

    # mesh extraction (fast methods)
    verts, faces, path = pipe.extract_mesh("tsdf", resolution=64)
    assert path.exists() and len(verts) > 100
    r = np.linalg.norm(pipe_scene_points(pipe, verts), axis=-1)
    assert abs(np.median(r) - 0.4) < 0.08

    verts2, faces2, _ = pipe.extract_mesh("gaussians",
                                          resolution=64)
    assert len(verts2) > 100

    res = pipe.evaluate("train")
    assert res["mean"]["psnr"] > 15
    assert (tmp_path / "out" / "metrics.json").exists()


def pipe_scene_points(pipe, verts):
    """Meshes are saved in capture coords; map back to scene coords."""
    return (verts + pipe.scene.translate) * pipe.scene.scale


@pytest.mark.slow   # fast coverage: test_real_capture.test_blob_smoke
def test_pipeline_with_touches(scene_dir, tmp_path):
    cfg = make_cfg(scene_dir, tmp_path / "out_touch", touches=True, iters=80)
    pipe = ReconstructionPipeline(cfg)
    assert pipe.scene.touch_patches and len(pipe.scene.touch_patches) == 1
    pipe.train(log=None)
    import jax.numpy as jnp

    n_frozen = int(jnp.sum(pipe.trainer.gaussians.frozen))
    assert n_frozen > 0, "touch patch was not anchored"
    # anchored gaussians near the +x pole of the sphere (scene coords)
    means = np.asarray(pipe.trainer.gaussians.means)[
        np.asarray(pipe.trainer.gaussians.frozen)]
    centers = means.mean(0)
    expected = (np.array([0.4, 0, 0]) + pipe.scene.translate) * pipe.scene.scale
    assert np.linalg.norm(centers - expected) < 0.1 * pipe.scene.scale


def test_pipeline_artifacts_roundtrip(scene_dir, tmp_path):
    """Artifacts registered in transforms.json load back consistently: a
    second pipeline run must see the seed pcd at the same scene coords."""
    import json
    import shutil

    import jax.numpy as jnp

    from fusionsense_tpu.data.dataparser import parse_transforms

    # isolated copy (the pipeline patches transforms.json in place)
    sd = tmp_path / "scene_copy"
    shutil.copytree(scene_dir, sd)
    with open(sd / "transforms.json") as f:
        meta = json.load(f)
    meta.pop("ply_file_path", None)   # force pcd-init path
    with open(sd / "transforms.json", "w") as f:
        json.dump(meta, f)

    cfg = make_cfg(sd, tmp_path / "out_art", iters=40)
    pipe = ReconstructionPipeline(cfg)
    pts_run1, _, _ = pipe.build_priors()

    scene2 = parse_transforms(cfg.data)
    assert scene2.seed_points is not None, "artifact not registered"
    assert scene2.hull_points is not None
    # loaded-back seed pcd lands at the same scene coordinates
    a = np.sort(np.asarray(pts_run1), axis=0)
    b = np.sort(np.asarray(scene2.seed_points), axis=0)
    np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.slow   # fast coverage: test_checkpoint trainer-level resume
def test_pipeline_resume_with_touches(scene_dir, tmp_path):
    """Interrupt after the touch patches anchored, resume via
    PipelineConfig.resume: the add-once callback must NOT anchor a second
    copy, the recurring intruder prune keeps its boxes, and camera/policy
    state carries over (reference: nerfstudio load_dir resume)."""
    import dataclasses

    import jax.numpy as jnp

    cfg = make_cfg(scene_dir, tmp_path / "out_r", touches=True, iters=80)
    # run the normal train() but stop at 60 of 80 iterations by
    # temporarily lowering the schedule
    cfg60 = dataclasses.replace(
        cfg, experiment=dataclasses.replace(
            cfg.experiment, train=dataclasses.replace(
                cfg.experiment.train, iterations=60)))
    pipe60 = ReconstructionPipeline(cfg60)
    pipe60.train(log=None)
    n_frozen_mid = int(jnp.sum(pipe60.trainer.gaussians.frozen))
    assert n_frozen_mid > 0
    ckpt = tmp_path / "out_r" / "ckpt_mid"
    pipe60.trainer.save(ckpt)

    cfg_resume = dataclasses.replace(cfg, resume=str(ckpt))
    pipe2 = ReconstructionPipeline(cfg_resume)
    pipe2.train(log=None)
    assert pipe2.trainer.step == 80
    n_frozen_end = int(jnp.sum(pipe2.trainer.gaussians.frozen))
    assert n_frozen_end == n_frozen_mid, (
        "resume re-anchored the touch patches: "
        f"{n_frozen_mid} -> {n_frozen_end}")
    assert np.isfinite(pipe2.trainer.history[-1]["loss"])
