"""libra_tpu: a TPU-native (JAX/XLA/Pallas) multimodal LLM framework with the
capabilities of Libra ("Building Decoupled Vision System on Large Language
Models", ICML 2024). Built from scratch for TPU: SPMD over device meshes,
functional transforms, static shapes, Pallas kernels on the hot paths."""

__version__ = "0.1.0"

from libra_tpu.config import CLIPVisionConfig, LibraConfig, VQGANConfig

__all__ = ["LibraConfig", "CLIPVisionConfig", "VQGANConfig"]
