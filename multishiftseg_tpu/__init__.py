"""multishiftseg_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for robust semantic
segmentation under multiple distribution shifts.

A from-scratch rebuild of the capabilities of gaozhitong/MultiShiftSeg (NeurIPS 2024):
pixel-level OOD detection + domain generalization for road-scene segmentation.

Subpackages
-----------
core     typed config tree, mesh/sharding setup, checkpointing, logging.
ops      TPU compute primitives: bilinear resize, point sampling, multi-scale
         deformable attention (XLA reference + Pallas kernel), fused score ops.
models   flax models: WideResNet-38 DeepLabV3+ w/ OOD head; ResNet-50 / Swin
         backbones; MSDeformAttn pixel decoder; GMA transformer decoder;
         MaskFormer meta-architecture.
losses   Relative Contrastive Loss, Hungarian matcher, set criterion.
data     host-side dataset readers + paired augmentation pipeline.
evals    OOD metrics (AUROC/AUPRC/FPR95) + segmentation metrics (mIoU).
train    jitted train/eval steps, two-stage fine-tuning trainers.
convert  PyTorch checkpoint -> JAX pytree converters.
"""

__version__ = "0.1.0"
