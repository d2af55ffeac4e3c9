"""Single dataclass config tree for the whole framework.

Replaces the reference's four config layers (python-module experiment config,
GSReconstructionConfig CLI flattening, nerfstudio/tyro method specs, GLIP
yacs — see SURVEY.md §5 config/flag system) with one frozen dataclass tree.
Defaults reproduce the reference experiment schedule
(reference configs/config.py:3-11 and dn_splatter/dn_config.py:14-143).
"""
from __future__ import annotations

import dataclasses

from fusionsense_tpu.gaussians.adc import ADCConfig
from fusionsense_tpu.render.rasterize import RasterizeConfig


@dataclasses.dataclass(frozen=True)
class LossConfig:
    ssim_lambda: float = 0.2            # splatfacto main-loss mix
    depth_loss: str = "EdgeAwareLogL1"  # {MSE,L1,LogL1,HuberL1,EdgeAwareLogL1}
    sensor_depth_lambda: float = 0.2    # reference configs/config.py:10
    mono_depth_lambda: float = 0.2
    depth_tolerance: float = 0.1        # ignore |err| below this (meters)
    smooth_lambda: float = 0.1          # depth TV / edge-aware TV
    use_depth_smooth_edge_aware: bool = True
    normal_lambda: float = 0.4          # reference configs/config.py:11
    normal_supervision: str = "mono"    # "mono" | "depth" (pseudo-normals)
    use_normal_tv: bool = True
    use_normal_cosine: bool = False
    flatness_lambda: float = 1.0        # 2D-Gaussian min-scale loss
    sparse_lambda: float = 0.0          # opacity entropy (optional)
    touch_normal_lambda: float = 1.0    # reference dn_model.py:137
    sdf_lambda: float = 0.0             # SuGaR sdf loss (dn_model.py:838-882)
    sdf_samples: int = 1024


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    sh_degree: int = 3
    sh_degree_interval: int = 1000      # activate one SH band per interval
    rasterize: RasterizeConfig = RasterizeConfig()
    binary_opacities: bool = True       # reference configs/config.py (on)
    # LOGIT-space snap threshold + post-reset skip margin (reference
    # dn_model.py:94-96 binary_opacities_threshold=0.9, :495 margin=200);
    # semantics: gaussians/store.py binary_opacity_surgery
    binary_opacity_threshold: float = 0.9
    binary_opacity_margin: int = 200
    background: tuple = (0.0, 0.0, 0.0)
    init_opacity: float = 0.1
    capacity: int = 2 ** 18             # padded Gaussian slots


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    iterations: int = 15_000            # reference configs/config.py:3
    adc: ADCConfig = ADCConfig()
    add_touch_at: int = 1000            # reference configs/config.py:7
    seed: int = 0
    steps_per_save: int = 15_000
    log_every: int = 100
    scan_chunk: int = 100               # steps fused into one device dispatch
    auto_capacity: bool = True          # power-of-two capacity bucketing
    render_prefix: bool = True          # rasterize only the alive-first
    #   compacted [0, render_n) prefix (resize.compact_train_state)
    auto_tile_capacity: bool = True     # grow rasterizer K when tile
    #   overflow starves pixels (keep-nearest-K drops whole sub-regions
    #   once a tile overcommits; see render/binning.py)
    max_tile_capacity: int = 2048   # K-sweep on the bench scene: 2048 is
    #   quality-saturated (3000-step PSNR 36.44 vs 35.96 at 4096) at half
    #   the step cost
    tile_overflow_frac: float = 0.02    # bump K when dropped pairs exceed
    #   this fraction of T*K
    auto_cover_window: bool = True      # size the per-Gaussian tile-cover
    #   window from truncation telemetry: the binning sort population is
    #   render_n * window, so a 2x2 window halves the sort vs 3x3 when the
    #   splats are small enough (they are, after ADC splits settle)
    cover_trunc_frac: float = 1e-3      # accept a window whose truncated
    #   pairs stay under this fraction of the render population
    bin_refresh_steps: int = 0          # flat backend: >0 caches each
    #   view's tile binning in the scan carry and reuses it on later
    #   visits until it is >= this many STEPS old (sequential cameras
    #   visit a view every V steps, so refresh=2V rebins every 2nd visit;
    #   any value <= V is exact per-visit binning). Reusing steps pay a
    #   ~1 MB dynamic-slice instead of the sort/segment pass; compositing
    #   always uses CURRENT projected values (the table gather is fresh),
    #   only the pair SELECTION is stale. 0 = bin per step (exact). The
    #   cache is chunk-local, so ADC refines / compactions (which permute
    #   slots) can never corrupt it.
    camera_opt: bool = False            # optimize SE3 camera deltas
    camera_opt_lr: float = 1e-3         # reference dn_config camera_opt lr
    camera_opt_every_k: int = 100       # grad accumulation (dn_config.py:29)


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()
    loss: LossConfig = LossConfig()
    output_dir: str = "outputs"
    experiment_name: str = "default"
