"""TPU-native framework for label-efficient volumetric ICH segmentation.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
antoine-spahr/Label-Efficient-Volumetric-Deep-Semantic-Segmentation-of-ICH:

- 2D / 3D U-Net semantic segmentation of intracranial hemorrhage in head CT,
  with patient-level k-fold evaluation (slice + volumetric Dice).
- Full-volume sliding-window inference with Gaussian-weighted patch blending
  as a single jitted on-device scan.
- Self-supervised pretraining for label efficiency: context restoration,
  global/local InfoNCE contrastive, classification pretraining.
- Anomaly detection suite: inpainting GAN (SN-PatchGAN), autoencoder, FCDD,
  and the inpainting-based anomaly detector.

Layout:
    ich_tpu.utils     config / registry / rng / logging
    ich_tpu.ops       device ops: CT preprocessing, transforms, losses,
                      metrics, sliding-window inference
    ich_tpu.models    flax network definitions
    ich_tpu.parallel  mesh + sharding utilities
    ich_tpu.train     trainers (functional cores + host loops), checkpoints
    ich_tpu.data      NIfTI/DICOM decode, dataset indexes, synthetic data
"""

__version__ = "0.1.0"
