"""MaskFormerHead: pixel decoder + (late) AV fusion + transformer predictor.

Mirrors the reference head (ref: models/modeling/meta_arch/mask_former_head.py:
95-159): run the pixel decoder; when FUSION_STEP == "late", fuse ONLY the
stride-4 `mask_features` map with the audio vector (keyed "res2" for
convenience, ref :147), transform the fused audio with the 128->4096->4096->
{256|128} MLP, then run the masked-attention predictor over the 3 multi-scale
maps with the fused mask features and audio-conditioned queries.
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

import combo_avs_tpu.models.fpn_decoder  # noqa: F401  (registers FPN decoders)
from combo_avs_tpu.models.fusion import AudioMLP, AVFuse
from combo_avs_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
from combo_avs_tpu.models.transformer_decoder import MultiScaleMaskedTransformerDecoder
from combo_avs_tpu.utils.registry import SEM_SEG_HEADS_REGISTRY


class MaskFormerHead(nn.Module):
    num_classes: int
    conv_dim: int = 256
    mask_dim: int = 256
    transformer_in_features: Sequence[str] = ("res3", "res4", "res5")
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    enc_layers: int = 6
    # predictor
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    pre_norm: bool = False
    enforce_input_project: bool = False
    queries_fuse_type: str = "add"
    audio_out_dim: int = 256
    use_cosine_loss: bool = True
    # fusion
    fusion_step: str = "late"  # "early" fusion happens in the meta-arch
    fused_type: str = "MHA-B"
    audio_dim: int = 128
    pixel_decoder_name: str = "MSDeformAttnPixelDecoder"
    deterministic: bool = True
    # encoder scan unroll factor; 0 = fully unroll (bench FLOP-costing twin)
    scan_unroll: int = 1
    # pixel-decoder remat policy ("" | "save_deform"); see pixel_decoder.py
    remat_policy: str = "save_deform"

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], audio_feature: jnp.ndarray):
        if self.pixel_decoder_name == "MSDeformAttnPixelDecoder":
            pixel_decoder = MSDeformAttnPixelDecoder(
                conv_dim=self.conv_dim,
                mask_dim=self.mask_dim,
                transformer_in_features=tuple(self.transformer_in_features),
                in_features=tuple(self.in_features),
                enc_layers=self.enc_layers,
                n_heads=self.nheads,
                scan_unroll=self.scan_unroll,
                remat_policy=self.remat_policy,
                name="pixel_decoder",
            )
        else:
            pixel_decoder = SEM_SEG_HEADS_REGISTRY.get(self.pixel_decoder_name)(
                conv_dim=self.conv_dim,
                mask_dim=self.mask_dim,
                in_features=tuple(self.in_features),
                name="pixel_decoder",
            )
        mask_features, _, multi_scale_features = pixel_decoder(features)

        if self.fusion_step == "late":
            fused = AVFuse(
                fused_type=self.fused_type,
                audio_dim=self.audio_dim,
                fused_backbone=("res2",),
                fused_backbone_dim=(self.mask_dim,),
                deterministic=self.deterministic,
                name="fusion_module",
            )({"res2": mask_features}, audio_feature)
            mask_features = fused["visual"]["res2"]
            audio_feature = AudioMLP(self.audio_out_dim, name="audio_transformation")(
                fused["audio"]
            )

        return MultiScaleMaskedTransformerDecoder(
            num_classes=self.num_classes,
            hidden_dim=self.hidden_dim,
            num_queries=self.num_queries,
            nheads=self.nheads,
            dim_feedforward=self.dim_feedforward,
            dec_layers=self.dec_layers,
            pre_norm=self.pre_norm,
            mask_dim=self.mask_dim,
            enforce_input_project=self.enforce_input_project,
            queries_fuse_type=self.queries_fuse_type,
            audio_out_dim=self.audio_out_dim,
            use_cosine_loss=self.use_cosine_loss,
            in_channels=self.conv_dim,
            name="predictor",
        )(multi_scale_features, audio_feature, mask_features)
