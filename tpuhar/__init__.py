"""tpuhar — a TPU-native (JAX / XLA / Pallas / pjit) framework for cross-modal
IMU↔video contrastive pretraining, HAR classification, few-shot evaluation, and OOD
scoring.

Brand-new implementation of the capabilities of
``YOUNESELBOUKNIFY/CrossModal-IMU-Video-OOD-HAR`` (see SURVEY.md), designed TPU-first:
static shapes, fused on-device featurization, bf16 MXU compute, mesh-sharded training
and batched inference.
"""

__version__ = "0.1.0"

from .config import CONFIG, Config  # noqa: F401
