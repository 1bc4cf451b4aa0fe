"""clip_calibration_tpu — TPU-native open-vocabulary CLIP calibration.

A ground-up JAX/XLA/Pallas framework with the capabilities of
ml-stat-Sustech/CLIP_Calibration (ICML 2024 "Open-Vocabulary Calibration for
Fine-tuned CLIP"): parameter-efficient prompt-learning trainers over frozen
CLIP backbones, post-hoc confidence calibrators including Distance-Aware
Calibration (DAC), and calibration metrics (ECE/MCE/ACE/PIECE) — designed
TPU-first: bf16 MXU compute, jit-compiled train/eval steps, SPMD sharding
over a jax.sharding.Mesh, and Pallas kernels on the hot encode/scoring paths.
"""

__version__ = "0.1.0"
