"""COMBO-AVS on TPU: a TPU-native JAX/XLA/Pallas audio-visual segmentation
framework with the capabilities of yannqi/COMBO-AVS (CVPR 2024)."""

__version__ = "0.1.0"

from combo_avs_tpu.config import CfgNode, get_cfg, setup_cfg  # noqa: F401
