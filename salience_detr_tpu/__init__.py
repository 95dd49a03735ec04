"""salience-detr-tpu: a TPU-native (JAX/XLA/Pallas/pjit) object-detection framework.

Re-implements the full capability surface of Salience-DETR (CVPR 2024) as
statically-shaped XLA programs: two-stage deformable-DETR detection with
hierarchical salience token filtering, contrastive denoising training,
on-device Hungarian matching, and GSPMD data parallelism.
"""

__version__ = "0.1.0"
