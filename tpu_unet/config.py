"""Typed configuration with per-dataset presets.

Replaces the reference's scattered hard-coded constants (SURVEY.md §5.6):
batch/epochs (``main_main.py:136-137``), per-dataset crop (``main_main.py:150-153``),
elastic alpha/sigma (``main_main.py:175``), optimizer/scheduler constants
(``trainer.py:30-31``), loss hyperparameters w0/sigma^2 (``functions.py:29-30``),
paper goal thresholds (``trainer.py:18-26``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from tpu_unet.core.geometry import input_size_compute


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """U-Net architecture knobs.

    skip_variant:
      'paper'  — skips captured before max-pool, center-cropped to the decoder
                 size (Ronneberger et al. Fig. 1). Default.
      'parity' — skips captured after max-pool and zero-padded up, reproducing
                 the reference as implemented (``network.py:129-192``,
                 SURVEY.md §2.1 deviation note).
    init_scheme:
      'paper'  — He-normal, std = sqrt(2 / (k^2 * fan_in)).
      'parity' — the reference's scheme as written: first conv std = sqrt(2),
                 all others std = 2 / sqrt(N) (operator-precedence quirk,
                 ``network.py:70-105``), with torch-default uniform biases.
    """

    in_channels: int = 1
    num_classes: int = 2
    base_width: int = 64
    width_mult: int = 1          # BASELINE config 5 uses 2 (wider bf16 U-Net)
    depth: int = 4
    skip_variant: str = "paper"
    init_scheme: str = "paper"
    compute_dtype: str = "float32"   # 'bfloat16' for the wide/perf configs
    param_dtype: str = "float32"
    remat: bool = False          # jax.checkpoint the encoder levels
    # 'xla' (default): native XLA convolutions (autodiff-capable).
    # 'pallas': fused conv+bias+ReLU Pallas tiles for the 3x3 convs (custom
    # VJP: Pallas forward, XLA transposed-conv backward — trainable); same
    # parameter tree, so checkpoints interop.
    conv_impl: str = "xla"
    # Upconv (2x2 stride-2 ConvTranspose) implementation. The kernel windows
    # never overlap, so it is exactly one matmul + depth-to-space: 'matmul'
    # computes [B*H*W, Cin] @ [Cin, 4*Cout] and reshuffles. Measured on
    # hardware (results/r2/shootout.txt): lax.conv_transpose ('xla', default)
    # is FASTER at all four serving shapes — 'matmul' is kept as the
    # documented alternative. Identical math and parameter tree
    # (tests/test_model.py).
    upconv_impl: str = "xla"
    # Decoder first convs: conv(concat(skip, up)) == conv(skip, W_s) +
    # conv(up, W_u); the split form never materializes the concat tensor
    # (HBM traffic win at full resolution). Same parameter tree.
    split_concat_conv: bool = True
    # Backward-pass backend for the 3x3 convs (ops/conv_bwd.py): 'xla'
    # (default, plain autodiff) or 'mm'/'auto' (im2col-matmul gradients).
    # Measured-negative e2e (results/r3/train_bwd_ab.txt, one session):
    # xla 65.9 ms/step vs auto 73.4 / mm 86.4 — the per-layer wgrad
    # pathology that motivated the matmul form (bwd_probe2.txt, enc1 wgrads
    # 7-21 ms) was a degraded-window artifact (bwd_probe3.txt re-measured
    # the same layers at 0.35 ms), and inside the fused step graph XLA's
    # scheduling beats the patch-materializing matmuls. Kept as the tested
    # research path.
    conv_bwd: str = "xla"
    # Phase-packed (space-to-depth) level 0 (ops/phase.py): run the level-0
    # convs as 2x2 convs over the 2x2 phase decomposition — 4x the channels
    # (full 128 MXU lanes) for 16/9 the FLOPs. The parameter tree stays the
    # canonical 3x3/2x2 form (kernels are packed inside the forward,
    # differentiably), so checkpoints interoperate and the flag is a pure
    # execution choice for BOTH training and inference. The serving engine
    # has its own int8 phase path (infer/quant.py phase_level0).
    phase_level0: bool = False

    @property
    def widths(self) -> Tuple[int, ...]:
        return tuple(self.base_width * self.width_mult * 2 ** i for i in range(self.depth + 1))


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """On-device augmentation pipeline (reference host pipeline: ``data.py:93-137``)."""

    crop: int = 388              # 196 for PhC (``main_main.py:150-153``)
    elastic_alpha: float = 200.0  # ``main_main.py:175``
    elastic_sigma: float = 10.0
    rotate_step_deg: int = 30    # rotation angles = k * 30° (``data.py:115``)
    crop_grid_skip: int = 10     # candidate-crop stride (``data.py:35``)
    crop_fg_lo: float = 0.1      # fg-fraction gate (``data.py:74``)
    crop_fg_hi: float = 0.9
    crop_pdf_loc: float = 0.5    # norm.pdf(x, loc, scale) crop weighting (``data.py:77``)
    crop_pdf_scale: float = 0.05
    # True: rotation + elastic compose into ONE bilinear gather (TPU-fast,
    # ~2x augment speedup; interpolation of the composite instead of
    # bilinear-of-bilinear). False: two-stage warps like the reference chain.
    fused_warp: bool = True
    # Rotation interpolation order: 1 bilinear (default), 3 cubic B-spline —
    # the reference's scipy.rotate default (``data.py:116-117``). With
    # fused_warp the composite single gather uses the cubic kernel; without,
    # the rotate stage alone does (reference chain: cubic rotate, bilinear
    # elastic). A/B convergence measurement: results/r2/rotation_ab.md.
    rotate_order: int = 1

    @property
    def input_size(self) -> int:
        return input_size_compute(self.crop)[1]


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Weighted per-pixel BCE + weight-map generation (SURVEY.md §2.8-2.9)."""

    weight_mode: str = "class_balance"   # 'distance' (HeLa) | 'class_balance'
    w0: float = 20.0             # ``functions.py:29``
    sigma2: float = 25.0         # ``functions.py:30``
    max_objects: int = 32        # static bound for per-object EDT planes
    # 'intended': each pixel weighted by its own sample's map.
    # 'parity'  : reproduce the reference's broadcast accident (weight [B,H,W]
    #             consumed as [1,B,H,W] against logits [B,2,H,W]; only valid
    #             when batch == num_classes == 2; SURVEY.md §2.9).
    weight_broadcast: str = "intended"


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """SGD + ReduceLROnPlateau, constants from ``trainer.py:30-31``."""

    lr: float = 1e-4
    momentum: float = 0.99
    plateau_factor: float = 0.1
    plateau_patience: int = 30
    plateau_threshold: float = 1e-3
    plateau_threshold_mode: str = "rel"
    plateau_eps: float = 1e-7


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 2          # ``main_main.py:136``
    epochs: int = 500            # ``main_main.py:137``
    val_fraction: float = 0.2    # fold mode (``main_main.py:128``)
    seed: int = 0
    checkpoint_every: int = 25   # '_latest' cadence (``trainer.py:217``)
    # Min epochs between 'best' saves (1 = reference parity: save every
    # improvement, ``trainer.py:139-146``). On remote-tunnel backends each
    # save's 248 MB device->host fetch stalls the compute stream ~25 s, so
    # improvement streaks at ~1 s/epoch train faster with e.g. 10.
    best_save_min_interval: int = 1
    # Goal-triggered early stopping — the reference's *intended* when_to_stop
    # semantics (``trainer.py:18-28, 185-214``; dead code there via the
    # ``is``-comparison bug, SURVEY.md §2.9): when the paper-goal metric is
    # crossed, save the goal checkpoint and stop after `goal_patience` more
    # epochs. Off by default (reference shipped behavior: save, keep going).
    stop_on_goal: bool = False
    goal_patience: int = 0
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """One of the three paper workloads (``main_main.py:64-66``, ``trainer.py:18-26``)."""

    name: str
    crop: int
    metric: str                  # 'iou' | 'pixel_error'
    weight_mode: str             # 'distance' | 'class_balance'
    goal: float                  # paper target (early-save threshold)
    goal_direction: str          # 'max' (IoU) | 'min' (pixel error)
    is_isbi: bool = False

    def augment(self) -> AugmentConfig:
        return AugmentConfig(crop=self.crop)

    def loss(self, **overrides) -> LossConfig:
        return LossConfig(weight_mode=self.weight_mode, **overrides)


DATASETS = {
    # DIC-HeLa: distance-transform weight maps, IoU, paper target 0.7756.
    "DIC-C2DH-HeLa": DatasetConfig(
        name="DIC-C2DH-HeLa", crop=388, metric="iou",
        weight_mode="distance", goal=0.7756, goal_direction="max",
    ),
    # ISBI2012 EM stack: class-balance weights, pixel error, paper 0.0611.
    "ISBI2012": DatasetConfig(
        name="ISBI2012", crop=388, metric="pixel_error",
        weight_mode="class_balance", goal=0.0611, goal_direction="min",
        is_isbi=True,
    ),
    # PhC-U373: class-balance weights, IoU, paper target 0.9203.
    "PhC-C2DH-U373": DatasetConfig(
        name="PhC-C2DH-U373", crop=196, metric="iou",
        weight_mode="class_balance", goal=0.9203, goal_direction="max",
    ),
}


@dataclasses.dataclass(frozen=True)
class Config:
    """Top-level run configuration (one object replaces the reference's
    argparse + hard-coded constants, ``main_main.py:59-153``)."""

    dataset: str = "DIC-C2DH-HeLa"
    mode: str = "TRAINING"
    folds: Optional[int] = None
    network: Optional[str] = None
    seed: int = 0
    start_from: Optional[int] = None
    skip_fold: int = 0
    data_dir: str = "data"
    out_dir: str = "models"
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def dataset_config(self) -> DatasetConfig:
        return DATASETS[self.dataset]
