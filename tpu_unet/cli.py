"""Command-line interface, preserving the reference's 7-flag contract
(``main_main.py:59-94``): -m/--mode, -d/--dataset, -f/--folds, -n/--network,
-s/--seed, -sf/--start_from, -sk/--skip_fold — plus TPU-native extras
(--synthetic fixture data, width multiplier, bf16, skip/init variants, tile
size, epochs).

Orchestration mirrors ``main_main.py:171-284``: TRAINING either trains on the
full set (validating against the gold-truth frames of the same sequences,
``main_main.py:194``) or runs seeded cross-validation folds; TESTING restores
a checkpoint and runs the evaluation driver with prediction export.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpu-unet",
        description="TPU-native U-Net (Ronneberger et al. 2015) training/evaluation",
    )
    p.add_argument("-m", "--mode", required=True, choices=["TRAINING", "TESTING"])
    p.add_argument("-d", "--dataset", required=True,
                   choices=["DIC-C2DH-HeLa", "ISBI2012", "PhC-C2DH-U373", "synthetic"])
    p.add_argument("-f", "--folds", type=int, default=None,
                   help="cross-validation folds (<=5); omit to train on everything")
    p.add_argument("-n", "--network", type=str, default=None,
                   help="checkpoint directory to test (TESTING) or warm-start from")
    p.add_argument("-s", "--seed", type=int, default=0)
    p.add_argument("-sf", "--start_from", action="store_true", default=False,
                   help="resume from the latest checkpoint in the run directory")
    p.add_argument("-sk", "--skip_fold", type=int, default=0)
    # TPU-native extras
    p.add_argument("--data-dir", default="data")
    p.add_argument("--out-dir", default="models")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="use the deterministic synthetic fixture dataset")
    p.add_argument("--download", action="store_true",
                   help="fetch CTC/ISBI archives if missing (needs network)")
    p.add_argument("--width-mult", type=int, default=1)
    p.add_argument("--base-width", type=int, default=64)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    # default None so the .pth testing path can tell "user chose paper"
    # apart from "unset" (reference checkpoints need parity geometry).
    p.add_argument("--skip-variant", default=None, choices=["paper", "parity"])
    p.add_argument("--init", default="paper", choices=["paper", "parity"])
    def tile_out_arg(v):
        """int ('516') or rectangular strip 'HxW' ('2372x1188')."""
        if "x" in v:
            h, w = v.split("x")
            return (int(h), int(w))
        return int(v)

    p.add_argument("--tile-out", type=tile_out_arg, default=None,
                   help="overlap-tile output size for TESTING: an int, or "
                        "HxW for rectangular strip tiles (default: whole "
                        "image)")
    p.add_argument("--quant", default=None,
                   choices=["int8", "int8-phase", "int4", "int4-phase"],
                   help="TESTING: serve through the post-training-quantized "
                        "forward (TPU serving path). 'int8' = +32%% "
                        "measured; '-phase' variants run level 0 "
                        "phase-packed (ops/phase.py); 'int4' variants run "
                        "every cin>=128 conv outside level 0 w4a4 (~2x the "
                        "int8 MXU rate) — a lower-precision tier with its "
                        "own measured IoU gate (tests/test_quant.py)")
    p.add_argument("--phase-level0", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="run level 0 of the TRAINABLE model phase-packed "
                        "(ModelConfig.phase_level0; same parameter tree, "
                        "checkpoint-compatible) — the TPU training "
                        "formulation, default ON: measured 21.43 vs 15.19 "
                        "steps/s (+41%%) same-session on v5e "
                        "(results/r3/phase_train_ab.txt); "
                        "--no-phase-level0 restores the canonical layout")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation-cache directory "
                        "(default: $TPU_UNET_COMPILE_CACHE or "
                        "~/.cache/tpu_unet/jax_cache). Measured 16.3s -> "
                        "1.6s cross-process compile on the v5e backend "
                        "(results/r5/cache_probe_run2.txt); makes -sf "
                        "resume-after-preemption recompile from disk in "
                        "seconds. --no-compile-cache disables")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="disable the persistent compilation cache")
    p.add_argument("--nan-check", action="store_true")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the JAX backend (default: environment choice)")
    return p


def _load_data(args, ds_cfg):
    from tpu_unet.data import (
        load_ctc_test,
        load_ctc_training,
        load_isbi_training,
        synthetic_dataset,
    )

    if args.synthetic or args.dataset == "synthetic":
        crop = ds_cfg.crop if args.dataset != "synthetic" else 196
        # fixture images must cover the crop window (HeLa/ISBI crop is 388)
        side = max(256, crop + 60)
        # n=10: with the reference's per-fold rotation by samp_val
        # (main_main.py:239-240) an n=8/val 0.2 fixture makes fold 4's split
        # identical to fold 0's (4*2 = 0 mod 8, witnessed bit-identical in
        # results/r4/README.md); 10 gives five distinct 5-fold splits.
        train = synthetic_dataset(n_images=10, h=side, w=side, n_cells=5,
                                  crop=crop, seed=args.seed)
        return train, train
    root = os.path.join(args.data_dir, f"{args.dataset}-training")
    if not os.path.isdir(root):
        if args.download:
            from tpu_unet.data.download import download_all
            download_all(args.data_dir)
        else:
            sys.exit(
                f"dataset directory {root} not found; pass --download (needs "
                f"network) or --synthetic for the fixture dataset")
    if ds_cfg.is_isbi:
        train = load_isbi_training(root, crop=ds_cfg.crop)
        test = load_isbi_training(root, crop=ds_cfg.crop)
    else:
        train = load_ctc_training(root, crop=ds_cfg.crop)
        test = load_ctc_test(root)
    return train, test


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)
    if args.folds is not None and args.folds > 5:
        sys.exit("Input a FOLDS value below 5")  # main_main.py:124-125

    if args.platform == "cpu":
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    if not args.no_compile_cache:
        from tpu_unet.utils.cache import enable_persistent_compilation_cache
        enable_persistent_compilation_cache(args.compile_cache)

    from tpu_unet.config import (
        DATASETS,
        DatasetConfig,
        ModelConfig,
        TrainConfig,
    )

    if args.dataset == "synthetic":
        ds_cfg = DatasetConfig(name="synthetic", crop=196, metric="iou",
                               weight_mode="class_balance", goal=0.999,
                               goal_direction="max")
    else:
        ds_cfg = DATASETS[args.dataset]

    model_cfg = ModelConfig(
        base_width=args.base_width, width_mult=args.width_mult,
        skip_variant=args.skip_variant or "paper", init_scheme=args.init,
        compute_dtype=args.dtype, phase_level0=args.phase_level0,
    )
    train_kwargs = {}
    if args.batch_size:
        train_kwargs["batch_size"] = args.batch_size
    train_cfg = TrainConfig(seed=args.seed, **train_kwargs)
    epochs = args.epochs

    if not args.quiet:
        print("tpu-unet — TPU-native U-Net (capabilities of nsirons/DL-unet)")
        print(f"Mode: {args.mode}   Dataset: {args.dataset}   Seed: {args.seed}")

    if args.mode == "TRAINING":
        from tpu_unet.train import Trainer
        from tpu_unet.train.folds import fold_splits, subset

        train_data, test_data = _load_data(args, ds_cfg)

        if args.folds is None:
            out_dir = os.path.join(args.out_dir, ds_cfg.name, "all")
            trainer = Trainer(ds_cfg, model_cfg=model_cfg, train_cfg=train_cfg,
                              out_dir=out_dir, verbose=not args.quiet,
                              nan_check=args.nan_check)
            trainer.fit(train_data, test_data, epochs=epochs,
                        resume=args.start_from)
        else:
            for fold, tr_idx, va_idx in fold_splits(
                    len(train_data), args.folds, args.seed,
                    train_cfg.val_fraction):
                if fold < args.skip_fold:
                    if not args.quiet:
                        print(f"Skipping fold {fold}")
                    continue
                out_dir = os.path.join(args.out_dir, ds_cfg.name, f"fold{fold}")
                trainer = Trainer(ds_cfg, model_cfg=model_cfg,
                                  train_cfg=train_cfg, out_dir=out_dir,
                                  verbose=not args.quiet,
                                  nan_check=args.nan_check)
                trainer.fit(subset(train_data, tr_idx),
                            subset(train_data, va_idx),
                            epochs=epochs, resume=args.start_from)
        return 0

    # TESTING (main_main.py:259-284)
    if args.network is None:
        sys.exit("Input a network path when calling the script")  # :264
    import jax

    from tpu_unet.infer import evaluate
    from tpu_unet.models import UNet
    from tpu_unet.train.checkpoint import Checkpointer
    from tpu_unet.train.trainer import Trainer, TrainState

    _, test_data = _load_data(args, ds_cfg)

    if args.network.endswith(".pth"):
        # Reference torch checkpoint: convert on the fly (convert.py). The
        # reference trained with the as-implemented skip geometry, so parity
        # is the default here; an explicit --skip-variant wins.
        import jax.numpy as jnp

        from tpu_unet.convert import load_torch_checkpoint
        from tpu_unet.infer import evaluate as _evaluate
        from tpu_unet.models import UNet as _UNet

        params = jax.tree.map(jnp.asarray, load_torch_checkpoint(args.network))
        model = _UNet(ModelConfig(
            skip_variant=args.skip_variant or "parity",
            width_mult=args.width_mult, base_width=args.base_width,
            compute_dtype=args.dtype))
        output_dir = args.network[:-4] + "_test"
        _evaluate(model, params, test_data, output_dir=output_dir,
                  tile_out=args.tile_out, verbose=not args.quiet,
                  quant=args.quant)
        return 0

    # Self-describing checkpoints: prefer the model config stored at save time
    # (a width/variant mismatch otherwise dies in a flax shape error).
    import json
    hs_path = os.path.join(os.path.abspath(args.network), "host_state.json")
    if os.path.exists(hs_path):
        with open(hs_path) as f:
            stored = json.load(f).get("model_cfg")
        if stored:
            # Preserve the SHAPE-bearing stored fields, but keep the user's
            # pure execution choices: phase_level0 changes no parameter
            # shapes (kernels are packed inside the forward), so the flag
            # must survive the stored-config override.
            stored["phase_level0"] = args.phase_level0
            model_cfg = ModelConfig(**stored)
    trainer = Trainer(ds_cfg, model_cfg=model_cfg, train_cfg=train_cfg,
                      out_dir=os.path.dirname(args.network) or ".",
                      verbose=not args.quiet)
    template = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = Checkpointer(os.path.dirname(os.path.abspath(args.network)))
    tag = os.path.basename(args.network.rstrip("/"))
    restored, _ = ckpt.restore(tag, template)
    state = TrainState(*restored)
    output_dir = args.network.rstrip("/") + "_test"
    evaluate(trainer.model, state.params, test_data, output_dir=output_dir,
             tile_out=args.tile_out, verbose=not args.quiet, quant=args.quant)
    return 0


if __name__ == "__main__":
    sys.exit(main())
