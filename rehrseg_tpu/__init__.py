"""REHRSeg-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
Resource-Efficient High-Resolution 3D MRI segmentation.

Re-designed from scratch with the capabilities of the reference REHRSeg
pipeline (zhiyuns/REHRSeg): self-supervised super-resolution (WDSR + FLAVR),
uncertainty-aware SR (UASR), and structural knowledge distillation into an
nnUNet-style segmentation network — all expressed as functional JAX programs
compiled by XLA for TPU, with data/spatial parallelism over `jax.sharding.Mesh`.

Package layout:
  utils/     pad/crop, patch math, timers
  io/        NIfTI + HDF5 volume I/O (pure Python, no nibabel/SimpleITK)
  ops/       numerics: B-spline resize (as matmuls), SLR slice-profile blur,
             gaussian importance maps, pixel shuffle, FBA
  models/    flax.linen models: WDSR, FLAVR UNet_3D_3D (+UASR), SegModel,
             Distiller
  losses     segmentation/SR losses (Dice/CE/BCEDice/uncertainty)
  data/      host-side datasets + augmentation pipeline
  infer/     jitted gaussian sliding-window engine with batched mirror TTA
  train/     optax trainers, orbax checkpoints, torch-weight import
  parallel/  mesh + sharding helpers
  pipeline   3-stage orchestrator (train_all.py equivalent)
"""

__version__ = "0.1.0"
