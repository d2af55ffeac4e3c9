"""fs-viewer: serve a trained model (or a live training run) in the
embedded WebGL splat viewer.

The reference's viewer is nerfstudio/viser (`vis="viewer+wandb"`,
dn_config.py:76-77); this serves the same purpose with zero dependencies:

  fs-viewer --ply outputs/scene/splat.ply          # a 3DGS PLY export
  fs-viewer --checkpoint outputs/scene/ckpt_15000  # an orbax checkpoint
  fs-train ... --viewer                            # live while training
"""
from __future__ import annotations

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser("fs-viewer")
    ap.add_argument("--ply", help="3DGS splat PLY to serve")
    ap.add_argument("--checkpoint", help="orbax checkpoint dir to serve")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7007)
    ap.add_argument("--max-splats", type=int, default=400_000)
    args = ap.parse_args(argv)

    from fusionsense_tpu.viewer import SplatViewerServer

    if args.ply:
        from fusionsense_tpu.gaussians.io import import_splat_ply

        state = import_splat_ply(args.ply)
    elif args.checkpoint:
        from fusionsense_tpu.train.checkpoint import load_for_inference

        state, *_ = load_for_inference(args.checkpoint)
    else:
        ap.error("need --ply or --checkpoint")

    srv = SplatViewerServer(args.host, args.port)
    srv.update_from_state(state, step=0, max_splats=args.max_splats)
    print(f"viewing {int(srv._state['num_splats'])} splats at {srv.url}")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.close()


if __name__ == "__main__":
    main()
