"""Whole-split evaluation: render every view, average the metric battery.

The analog of the reference's big eval
(reference dn_splatter/dn_pipeline.py:171-533
get_average_eval_image_metrics: per-image PSNR/SSIM/LPIPS + depth/normal
metrics + fps). Rendering is one jitted function re-used across views;
throughput (fps, Mpix/s) is measured on the steady-state renders.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.core.cameras import Camera
from fusionsense_tpu.eval import metrics as M
from fusionsense_tpu.gaussians.store import GaussianState, activated
from fusionsense_tpu.render.rasterize import (
    RasterizeConfig, gaussian_flat_normals, rasterize,
)


MAX_RENDER_PAIR_BUDGET = 16384


def make_render_fn(cfg: RasterizeConfig, camera: Camera,
                   cam_deltas=None,
                   max_budget: int = MAX_RENDER_PAIR_BUDGET):
    """View renderer: (gaussians, cam_idx) -> RenderOutputs.

    cam_deltas: optional (V, 6) SE3 pose corrections from the trainer's
    camera optimizer — applied exactly as in training, so eval on train
    views uses the OPTIMIZED poses (the reference's eval_setup restores
    its camera optimizer the same way; nerfstudio camera_opt consumed at
    reference dn_model.py:488).

    Flat backend: the pair budget auto-grows on overflow. Training's
    adaptive budget protects training renders, but inference-style renders
    (eval, TSDF/level-set meshing, video) would otherwise silently drop
    whole trailing tiles whenever the scene outgrew cfg.tile_capacity —
    measured ~9 dB of GT corruption on the bench scene. Each growth
    recompiles once and sticks for subsequent views."""
    import dataclasses

    deltas = None if cam_deltas is None else jnp.asarray(cam_deltas)

    def build(rcfg):
        @jax.jit
        def render(gaussians: GaussianState, cam_idx):
            # binary opacities need no special handling: the trainer's
            # logit-space surgery (store.binary_opacity_surgery) means the
            # stored params already carry the binarized values
            means, quats, scales, op, colors = activated(gaussians)
            cam_i = camera.index(cam_idx)
            if deltas is not None:
                from fusionsense_tpu.core.transforms import apply_se3_delta

                cam_i = cam_i.replace(
                    viewmat=apply_se3_delta(cam_i.viewmat, deltas[cam_idx]))
            normals = gaussian_flat_normals(quats, scales, means,
                                            cam_i.origin)
            return rasterize(means, quats, scales, op, colors, cam_i, rcfg,
                             normals=normals)

        return render

    if cfg.backend != "flat":
        return build(cfg)

    state = {"budget": cfg.tile_capacity, "fn": build(cfg)}

    def render_retry(gaussians: GaussianState, cam_idx):
        out = state["fn"](gaussians, cam_idx)
        while int(out.overflow) > 0 and state["budget"] < max_budget:
            state["budget"] = min(state["budget"] * 2, max_budget)
            state["fn"] = build(
                dataclasses.replace(cfg, tile_capacity=state["budget"]))
            out = state["fn"](gaussians, cam_idx)
        return out

    return render_retry


def evaluate(
    gaussians: GaussianState,
    camera: Camera,            # batched over eval views
    data,                      # TrainData for the eval split
    cfg: RasterizeConfig,
    measure_fps: bool = True,
    cam_deltas=None,
) -> dict:
    render = make_render_fn(cfg, camera, cam_deltas=cam_deltas)
    V = data.images.shape[0]

    from fusionsense_tpu.eval import lpips as _lpips

    use_lpips = _lpips.available()
    per_view = []
    outs = []
    for i in range(V):
        out = render(gaussians, jnp.asarray(i))
        outs.append(out)
        m = M.rgb_metrics(out.rgb, data.images[i],
                          None if data.masks is None else data.masks[i])
        if use_lpips:
            m["lpips"] = _lpips.lpips(np.asarray(out.rgb),
                                      np.asarray(data.images[i]))
        if data.sensor_depths is not None:
            dm = None if data.masks is None else data.masks[i]
            m.update({f"depth_{k}": v for k, v in
                      M.depth_metrics(out.depth, data.sensor_depths[i],
                                      mask=dm).items()})
        if data.normals is not None:
            mask = data.masks[i] if data.masks is not None else (
                data.sensor_depths[i] > 1e-4 if data.sensor_depths is not None
                else None)
            m.update({f"normal_{k}": v for k, v in
                      M.normal_metrics(out.normal, data.normals[i], mask).items()})
        per_view.append({k: float(v) for k, v in m.items()})

    agg = {k: float(np.mean([pv[k] for pv in per_view]))
           for k in per_view[0]}

    if measure_fps:
        jax.block_until_ready(outs[-1].rgb)
        t0 = time.time()
        reps = max(3, min(10, V))
        for i in range(reps):
            out = render(gaussians, jnp.asarray(i % V))
        jax.block_until_ready(out.rgb)
        dt = (time.time() - t0) / reps
        agg["fps"] = 1.0 / dt
        agg["mpix_per_s"] = camera.width * camera.height / dt / 1e6
    agg["num_gaussians"] = int(gaussians.num_alive)
    return {"mean": agg, "per_view": per_view}
