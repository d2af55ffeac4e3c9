"""fs-eval: render-quality + chamfer evaluation from a checkpoint.

CLI-surface equivalent of the reference's ns-eval shellout + masked
rendering eval + chamfer eval (reference eval_utils/rendering_evaluation.py,
mask_rendering_eval.py, chamfer_evaluation.py).
"""
from __future__ import annotations

import argparse
import json


def build_parser():
    p = argparse.ArgumentParser("fs-eval", description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="train", choices=["train", "val", "test"])
    p.add_argument("--output-path", default="metrics.json")
    p.add_argument("--gt-mesh", default=None,
                   help="CAD ground-truth .ply for chamfer eval")
    p.add_argument("--gt-mesh-unit", type=float, default=1e-3,
                   help="scale of GT mesh units to meters (mm default)")
    p.add_argument("--pred-mesh", default=None,
                   help="extracted mesh/pcd .ply to compare (capture coords)")
    p.add_argument("--backend", choices=["jax", "pallas", "flat"],
                   default="jax")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from fusionsense_tpu.data.dataparser import (
        DataParserConfig, load_train_data, parse_transforms,
    )
    from fusionsense_tpu.eval.evaluator import evaluate
    from fusionsense_tpu.render.rasterize import RasterizeConfig
    from fusionsense_tpu.train.checkpoint import load_for_inference

    gaussians, step, cam_state = load_for_inference(args.checkpoint)
    dcfg = DataParserConfig(data_dir=args.data)
    scene = parse_transforms(dcfg)
    camera, data = load_train_data(scene, dcfg, args.split)
    # optimized camera poses apply only to the split they were learned on
    deltas = None
    if cam_state is not None and args.split == "train":
        import numpy as _np

        d = _np.asarray(cam_state[0])
        if d.shape[0] == data.images.shape[0] and _np.any(d != 0):
            deltas = d
    res = evaluate(gaussians, camera, data,
                   RasterizeConfig(backend=args.backend),
                   cam_deltas=deltas)
    res["step"] = step

    if args.gt_mesh and args.pred_mesh:
        from fusionsense_tpu.eval.chamfer import chamfer_eval
        from fusionsense_tpu.utils.ply import read_ply

        gt = read_ply(args.gt_mesh)["points"]
        pred = read_ply(args.pred_mesh)["points"]
        # per-touch-site local chamfer when the capture has tactile data
        # (reference touch_CD_eval reads gelsight_transform.json centers,
        # eval_utils/chamfer_evaluation.py:101-114)
        centers = None
        if scene.touch_patches:
            import numpy as _np

            centers = _np.stack(
                [p.bbox_center for p in scene.touch_patches])
        res["chamfer"] = chamfer_eval(pred, gt,
                                      gt_unit_scale=args.gt_mesh_unit,
                                      touch_centers=centers)

    with open(args.output_path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res["mean"], indent=2))


if __name__ == "__main__":
    main()
