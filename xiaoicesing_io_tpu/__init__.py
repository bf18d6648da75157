"""xiaoicesing_io_tpu — a TPU-native singing-voice-synthesis framework.

A from-scratch JAX/XLA/Pallas re-design of the DiffSinger (OpenVPI) stack:
linguistic encoders, diffusion/rectified-flow acoustic + variance models,
NSF-HiFiGAN vocoding, offline binarization, multi-host data-parallel training
over a `jax.sharding.Mesh`, and deployment export.

Reference capability surface: /root/reference (OpenVPI DiffSinger fork).
"""

__version__ = "0.1.0"
