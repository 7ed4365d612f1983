"""tpu_unet — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
nsirons/DL-unet (the TU Delft reproduction of Ronneberger et al. 2015).

Layering (see SURVEY.md §7):
  core/      geometry (valid-conv size arithmetic, overlap-tile planning)
  ops/       device kernels: warps, padding, EDT, connected components, morphology,
             Pallas fused conv tiles
  models/    the Flax U-Net (paper-correct and reference-parity skip/init variants)
  data/      host ingest (CTC / ISBI layouts), GT preprocessing, on-device augmentation
  losses/    weight maps (distance-transform / class-balance), weighted BCE, IoU / PE
  train/     jitted train step, SGD+momentum, ReduceLROnPlateau port, checkpoints,
             progress-file writer, fold orchestration
  infer/     overlap-tile inference engine, evaluation driver, prediction export
  parallel/  device mesh, data-parallel sharding, spatial halo-exchange convolution
  utils/     profiling, logging, debug flags
"""

__version__ = "0.1.0"
