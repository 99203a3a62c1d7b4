"""MaskFormer meta-architecture (the full COMBO-AVS model).

Mirrors the reference `MaskFormer` (ref: models/maskformer_model.py:28-480)
redesigned for static shapes:

* input is a batch dict of stacked arrays (`images [B, T, H, W, 3]`,
  `audio_log_mel [B, T, 96, 64]`, optional `pre_masks`), not a list of
  per-video dicts; frames flatten into a [B*T] batch (ref :315-323),
* pixel mean/std normalization (ref :324-325),
* frozen VGGish audio embedding under stop_gradient (ref :327-329),
* the Siam-Encoder Module: a SECOND copy of the visual backbone encodes the
  Maskige and injects per-stage SE-gated features additively
  (ref :143-153, :337-352),
* early or late AV fusion (ref :354-363),
* `semantic_inference`: softmax(cls)[..:-1] x sigmoid(mask) einsum
  (ref :460-471).

AVSS temporal raggedness (5- vs 10-frame videos) is handled by batching
homogeneous frame counts (static T per compiled graph) plus temporal weight
masks consumed by the criterion — never by dynamic indexing (ref :330-331
does a boolean index; here padded frames are masked instead).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from combo_avs_tpu.models.fusion import AudioMLP, AVFuse
from combo_avs_tpu.models.head import MaskFormerHead
from combo_avs_tpu.models.layers import SqueezeExcite
from combo_avs_tpu.models.pvtv2 import PVTv2
from combo_avs_tpu.models.resnet import ResNet
from combo_avs_tpu.models.vggish import VGGish

PIXEL_MEAN = (123.675, 116.280, 103.530)
PIXEL_STD = (58.395, 57.120, 57.375)


class MaskFormer(nn.Module):
    # backbone
    backbone_name: str = "build_resnet_backbone"
    # head
    num_classes: int = 2
    num_queries: int = 100
    hidden_dim: int = 256
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    enc_layers: int = 6
    mask_dim: int = 256
    conv_dim: int = 256
    pre_norm: bool = False
    enforce_input_project: bool = False
    # fusion
    fusion_step: str = "late"
    fused_type: str = "MHA-B"
    audio_dim: int = 128
    fused_backbone: Sequence[str] = ("res2",)
    fused_backbone_dim: Sequence[int] = (256,)
    queries_fuse_type: str = "add"
    audio_out_dim: int = 256
    use_cosine_loss: bool = True
    pixel_decoder_name: str = "MSDeformAttnPixelDecoder"
    # SEM / pre-SAM
    use_pre_sam: bool = True
    pre_sam_dim: Sequence[int] = (256, 512, 1024, 2048)
    # reduced-depth PVT for tests/dryruns; (3, 6, 40, 3) is the B5 parity arch
    pvt_depths: Sequence[int] = (3, 6, 40, 3)
    # misc
    pixel_mean: Tuple[float, ...] = PIXEL_MEAN
    pixel_std: Tuple[float, ...] = PIXEL_STD
    deterministic: bool = True
    # MODEL.AUDIO.FREEZE_AUDIO_EXTRACTOR (ref: maskformer_model.py:157-162 —
    # the reference freezes conditionally; all shipped configs freeze)
    freeze_audio: bool = True
    # dryrun/test-only knob: scales the (frozen) VGGish tower width
    vggish_width: float = 1.0
    # scan unroll factor for the PVT stages and the pixel-decoder encoder;
    # 0 = fully unroll (bench.py lowers such a twin to count FLOPs — XLA
    # cost_analysis counts a rolled scan body once)
    scan_unroll: int = 1
    # pixel-decoder remat policy ("" | "save_deform"); see pixel_decoder.py
    remat_policy: str = "save_deform"

    def _build_backbone(self, name: str):
        if self.backbone_name == "build_resnet_backbone":
            return ResNet(depth=50, name=name)
        if self.backbone_name == "build_pvtv2_b5_backbone":
            return PVTv2(depths=tuple(self.pvt_depths),
                         deterministic=self.deterministic,
                         scan_unroll=self.scan_unroll, name=name)
        if self.backbone_name == "tiny_resnet":
            # one bottleneck per stage, 8x narrower: NOT a reference config —
            # exists so the multichip dryrun compiles the full SEM/fusion/
            # head/criterion graph within a 1-CPU-core budget
            return ResNet(depth=10, stem_out_channels=8, res2_out_channels=32,
                          name=name)
        raise ValueError(f"unknown backbone {self.backbone_name!r}")

    def _normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        if not jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(jnp.float32)  # uint8 loader batches, cast on device
        mean = jnp.asarray(self.pixel_mean, x.dtype)
        std = jnp.asarray(self.pixel_std, x.dtype)
        return (x - mean) / std

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # [B, T, H, W, 3] raw RGB (0-255)
        audio_log_mel: jnp.ndarray,  # [B, T, 96, 64]
        pre_masks: Optional[jnp.ndarray] = None,  # [B, T, H, W, 3] Maskige RGB
        vid_temporal_mask: Optional[jnp.ndarray] = None,  # [B, T] float
    ) -> Dict[str, object]:
        B, T, H, W, _ = images.shape
        frames = self._normalize(images.reshape(B * T, H, W, 3))

        # audio tower; frozen by default (ref :327-329 runs VGGish under
        # no_grad when MODEL.AUDIO.FREEZE_AUDIO_EXTRACTOR)
        mel = audio_log_mel.reshape(B * T, 96, 64, 1)
        audio_feature = VGGish(width_mult=self.vggish_width, name="audio_backbone")(mel)
        if self.freeze_audio:
            audio_feature = jax.lax.stop_gradient(audio_feature)
        audio_feature = audio_feature[:, None, :]  # [B*T, 1, 128]
        if vid_temporal_mask is not None:
            audio_feature = audio_feature * vid_temporal_mask.reshape(B * T, 1, 1)

        features = self._build_backbone("backbone")(frames)

        if self.use_pre_sam:
            assert pre_masks is not None, "pre_masks required when use_pre_sam"
            maskige = self._normalize(pre_masks.reshape(B * T, H, W, 3))
            pre_feats = self._build_backbone("pre_sam_backbone")(maskige)
            for i, key in enumerate(sorted(features.keys())):
                gate = SqueezeExcite(self.pre_sam_dim[i], name=f"scale_factor{i}")(
                    pre_feats[key]
                )
                features[key] = features[key] + gate * pre_feats[key]

        if self.fusion_step == "early":
            fused = AVFuse(
                fused_type=self.fused_type,
                audio_dim=self.audio_dim,
                fused_backbone=tuple(self.fused_backbone),
                fused_backbone_dim=tuple(self.fused_backbone_dim),
                deterministic=self.deterministic,
                name="fusion_module",
            )(features, audio_feature)
            features = fused["visual"]
            audio_feature = AudioMLP(self.audio_out_dim, name="audio_transformation")(
                fused["audio"]
            )

        outputs = MaskFormerHead(
            num_classes=self.num_classes,
            conv_dim=self.conv_dim,
            mask_dim=self.mask_dim,
            enc_layers=self.enc_layers,
            hidden_dim=self.hidden_dim,
            num_queries=self.num_queries,
            nheads=self.nheads,
            dim_feedforward=self.dim_feedforward,
            dec_layers=self.dec_layers,
            pre_norm=self.pre_norm,
            enforce_input_project=self.enforce_input_project,
            queries_fuse_type=self.queries_fuse_type,
            audio_out_dim=self.audio_out_dim,
            use_cosine_loss=self.use_cosine_loss,
            fusion_step=self.fusion_step,
            fused_type=self.fused_type,
            audio_dim=self.audio_dim,
            pixel_decoder_name=self.pixel_decoder_name,
            deterministic=self.deterministic,
            scan_unroll=self.scan_unroll,
            remat_policy=self.remat_policy,
            name="sem_seg_head",
        )(features, audio_feature)
        return outputs


def semantic_inference(
    mask_cls: jnp.ndarray,  # [N, Q, C+1]
    mask_pred: jnp.ndarray,  # [N, Q, h, w]
    out_size: Optional[Tuple[int, int]] = None,
    temporal_mask: Optional[jnp.ndarray] = None,  # [N]
) -> jnp.ndarray:
    """softmax(cls) x sigmoid(mask) semantic maps, optionally upsampled
    (ref: maskformer_model.py:397-402,460-471). Returns [N, C, H, W] float32.

    The [N, Q, H, W] upsampled-mask intermediate dominates eval HBM traffic
    (Q=100 at 224^2 is 400 MB fp32 per 20-frame batch); it is kept in the
    input dtype (bf16 on the production eval path) and only the Q-contracted
    [N, C, H, W] output is fp32. Measured alternatives that do NOT pay on
    v5e (scripts/exp_eval_secondary.py, r4): a fused Pallas kernel that skips
    the HBM intermediate entirely (`ops/seminf_pallas.py`, 0.87x — per-query
    MXU ops too small) and explicit einsum resizes (0.71x) — XLA's native
    resize lowering wins, so this stays the production form."""
    cls = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)[..., :-1]
    if out_size is not None:
        N, Q = mask_pred.shape[:2]
        mask_pred = jax.image.resize(mask_pred, (N, Q, *out_size), "bilinear")
    sem = jnp.einsum("nqc,nqhw->nchw", cls, jax.nn.sigmoid(mask_pred),
                     preferred_element_type=jnp.float32)
    if temporal_mask is not None:
        sem = sem * temporal_mask[:, None, None, None]
    return sem.astype(jnp.float32)


def build_model(cfg, deterministic: bool = True) -> MaskFormer:
    """Construct the meta-architecture from a config tree
    (same key surface as ref: maskformer_model.py:101-272 from_config)."""
    m = cfg.MODEL
    # ref: maskformer_model.py:168-171 hardcodes 256 (== HIDDEN_DIM in every
    # shipped config) for add-fusion and 128 for dim-concat; using HIDDEN_DIM
    # keeps the add path consistent for reduced-size test configs
    audio_out_dim = (
        128 if m.FUSE_CONFIG.QUERIES_FUSE_TYPE == "dim" else m.MASK_FORMER.HIDDEN_DIM
    )
    return MaskFormer(
        backbone_name=m.BACKBONE.NAME,
        num_classes=m.SEM_SEG_HEAD.NUM_CLASSES,
        num_queries=m.MASK_FORMER.NUM_OBJECT_QUERIES,
        hidden_dim=m.MASK_FORMER.HIDDEN_DIM,
        nheads=m.MASK_FORMER.NHEADS,
        dim_feedforward=m.MASK_FORMER.DIM_FEEDFORWARD,
        dec_layers=m.MASK_FORMER.DEC_LAYERS - 1,
        enc_layers=m.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS,
        mask_dim=m.SEM_SEG_HEAD.MASK_DIM,
        conv_dim=m.SEM_SEG_HEAD.CONVS_DIM,
        pre_norm=m.MASK_FORMER.PRE_NORM,
        enforce_input_project=m.MASK_FORMER.ENFORCE_INPUT_PROJ,
        fusion_step=m.FUSE_CONFIG.FUSION_STEP,
        fused_type=m.FUSE_CONFIG.TYPE,
        audio_dim=m.FUSE_CONFIG.AUDIO_DIM,
        fused_backbone=tuple(m.FUSE_CONFIG.FUSED_BACKBONE),
        fused_backbone_dim=tuple(m.FUSE_CONFIG.FUSED_BACKBONE_DIM),
        queries_fuse_type=m.FUSE_CONFIG.QUERIES_FUSE_TYPE,
        audio_out_dim=audio_out_dim,
        use_cosine_loss=m.MASK_FORMER.COSINE_WEIGHT > 0,
        pixel_decoder_name=m.SEM_SEG_HEAD.PIXEL_DECODER_NAME,
        use_pre_sam=m.PRE_SAM.USE_PRE_SAM,
        pre_sam_dim=tuple(m.PRE_SAM.PRE_SAM_DIM),
        pixel_mean=tuple(m.PIXEL_MEAN),
        pixel_std=tuple(m.PIXEL_STD),
        deterministic=deterministic,
        freeze_audio=m.AUDIO.FREEZE_AUDIO_EXTRACTOR,
        vggish_width=m.AUDIO.get("WIDTH_MULT", 1.0),
        remat_policy=m.MASK_FORMER.get("REMAT_POLICY", "save_deform"),
    )
