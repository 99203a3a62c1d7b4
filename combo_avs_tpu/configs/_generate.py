"""Generate the preset YAML config matrix.

Mirrors the reference's 24-config layout (ref: configs/{avs_s4,avs_ms3,avs_ss}/
{R50,PVT}-*-SemanticSegmentation.yaml + COMBO_*.yaml + Test variants) with the
same hyperparameters, expressed in this repo's (identical) key surface.

Run: python -m combo_avs_tpu.configs._generate
"""

import os

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))

BENCHES = {
    "avs_s4": dict(
        ds="avss4", max_iter=90000, eval_period=5000, classes=2,
        mapper="avss4_semantic", frames=5, amp=False, tag="AVSS4", test_bs=2,
    ),
    "avs_ms3": dict(
        ds="avsms3", max_iter=20000, eval_period=400, classes=2,
        mapper="avsms3_semantic", frames=5, amp=False, tag="AVSMS3",
    ),
    "avs_ss": dict(
        ds="avss", max_iter=90000, eval_period=5000, classes=71,
        mapper="avss_semantic", frames=10, amp=True, tag="AVSS",
    ),
}

BACKBONES = {
    "r50": dict(
        name="build_resnet_backbone",
        weights="pretrained/detectron2/R-50.pkl",
        pre_sam_dim=[256, 512, 1024, 2048],
        extra=lambda: {
            "RESNETS": {
                "DEPTH": 50,
                "STEM_OUT_CHANNELS": 64,
                "STRIDE_IN_1X1": False,
                "OUT_FEATURES": ["res2", "res3", "res4", "res5"],
            }
        },
        combo_prefix="COMBO_R50",
        base_prefix="R50",
    ),
    "pvt": dict(
        name="build_pvtv2_b5_backbone",
        weights="pretrained/detectron2/d2_pvt_v2_b5.pkl",
        pre_sam_dim=[64, 128, 320, 512],
        extra=lambda: {"PVT": {"OUT_FEATURES": ["res2", "res3", "res4", "res5"]}},
        combo_prefix="COMBO_PVTV2B5",
        base_prefix="PVT",
    ),
}


def base_cfg(bench, bb, test=False):
    b, k = BENCHES[bench], BACKBONES[bb]
    cfg = {
        "MODEL": {
            "BACKBONE": {"FREEZE_AT": 0, "NAME": k["name"]},
            "AUDIO": {
                "FREEZE_AUDIO_EXTRACTOR": True,
                "PRETRAINED_VGGISH_MODEL_PATH": "pretrained/vggish-10086976.pth",
                "PREPROCESS_AUDIO_TO_LOG_MEL": False,
                "POSTPROCESS_LOG_MEL_WITH_PCA": False,
                "PRETRAINED_PCA_PARAMS_PATH": "pretrained/vggish_pca_params-970ea276.pth",
            },
            "WEIGHTS": k["weights"],
            "PIXEL_MEAN": [123.675, 116.280, 103.530],
            "PIXEL_STD": [58.395, 57.120, 57.375],
            **k["extra"](),
        },
        "DATASETS": {
            "TRAIN": f'("{b["ds"]}_sem_seg_train",)',
            "TEST": f'("{b["ds"]}_sem_seg_{"test" if test else "val"}",)',
        },
        "SOLVER": {
            "IMS_PER_BATCH": b.get("test_bs", 8) if test else 8,
            "BASE_LR": 0.0001,
            "MAX_ITER": b["max_iter"],
            "WARMUP_FACTOR": 1.0,
            "WARMUP_ITERS": 0,
            "WEIGHT_DECAY": 0.05,
            "OPTIMIZER": "ADAMW",
            "LR_SCHEDULER_NAME": "WarmupPolyLR",
            "BACKBONE_MULTIPLIER": 0.1,
            "CLIP_GRADIENTS": {
                "ENABLED": True,
                "CLIP_TYPE": "full_model",
                "CLIP_VALUE": 0.01,
                "NORM_TYPE": 2.0,
            },
            "AMP": {"ENABLED": b["amp"]},
        },
        "INPUT": {
            "AUGMENTATION": True,
            "MIN_SIZE_TRAIN": [int(x * 0.1 * 224) for x in range(5, 21)],
            "MIN_SIZE_TRAIN_SAMPLING": "choice",
            "MIN_SIZE_TEST": 224,
            "MAX_SIZE_TRAIN": 896,
            "MAX_SIZE_TEST": 896,
            "CROP": {
                "ENABLED": True,
                "TYPE": "absolute",
                "SIZE": "(224, 224)",
                "SINGLE_CATEGORY_MAX_AREA": 1.0,
            },
            "COLOR_AUG_SSD": True,
            "SIZE_DIVISIBILITY": 224,
            "FORMAT": "RGB",
            "DATASET_MAPPER_NAME": b["mapper"],
        },
        "TEST": {
            "EVAL_PERIOD": b["eval_period"],
            "AUG": {
                "ENABLED": False,
                "MIN_SIZES": [128, 224, 384],
                "MAX_SIZE": 1536,
                "FLIP": True,
            },
        },
        "DATALOADER": {"FILTER_EMPTY_ANNOTATIONS": True, "NUM_WORKERS": 8},
        "VERSION": 2,
    }
    return cfg


def combo_cfg(bench, bb, base_name, test=False):
    b, k = BENCHES[bench], BACKBONES[bb]
    return {
        "_BASE_": base_name,
        "OUTPUT_DIR": f'checkpoints/{bench}/{k["combo_prefix"]}_bs8_{b["max_iter"] // 1000}k',
        "MODEL": {
            "FUSE_CONFIG": {
                "FUSION_STEP": "late",
                "TYPE": "MHA-B",
                "AUDIO_DIM": 128,
                "FUSED_BACKBONE": ["res2"],
                "FUSED_BACKBONE_DIM": [256],
                "NUM_FRAMES": b["frames"],
                "QUERIES_FUSE_TYPE": "add",
            },
            "PRE_SAM": {
                "USE_PRE_SAM": True,
                "PRE_SAM_DIM": k["pre_sam_dim"],
                "PRE_SAM_FEATURE_SIZE": [56, 28, 14, 7],
            },
            "META_ARCHITECTURE": "MaskFormer",
            "SEM_SEG_HEAD": {
                "NAME": "MaskFormerHead",
                "IGNORE_VALUE": 255,
                "NUM_CLASSES": b["classes"],
                "LOSS_WEIGHT": 1.0,
                "CONVS_DIM": 256,
                "MASK_DIM": 256,
                "NORM": "GN",
                "PIXEL_DECODER_NAME": "MSDeformAttnPixelDecoder",
                "IN_FEATURES": ["res2", "res3", "res4", "res5"],
                "DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES": ["res3", "res4", "res5"],
                "COMMON_STRIDE": 4,
                "TRANSFORMER_ENC_LAYERS": 6,
            },
            "MASK_FORMER": {
                "TRANSFORMER_DECODER_NAME": "MultiScaleMaskedTransformerDecoder",
                "TRANSFORMER_IN_FEATURE": "multi_scale_pixel_decoder",
                "DEEP_SUPERVISION": True,
                "NO_OBJECT_WEIGHT": 0.1,
                "CLASS_WEIGHT": 2.0,
                "MASK_WEIGHT": 5.0,
                "DICE_WEIGHT": 5.0,
                "COSINE_WEIGHT": 10.0,
                "HIDDEN_DIM": 256,
                "NUM_OBJECT_QUERIES": 100,
                "NHEADS": 8,
                "DROPOUT": 0.0,
                "DIM_FEEDFORWARD": 2048,
                "ENC_LAYERS": 0,
                "PRE_NORM": False,
                "ENFORCE_INPUT_PROJ": False,
                "SIZE_DIVISIBILITY": 32,
                "DEC_LAYERS": 10,
                "TRAIN_NUM_POINTS": 12544,
                "OVERSAMPLE_RATIO": 3.0,
                "IMPORTANCE_SAMPLE_RATIO": 0.75,
                "TEST": {
                    "SEMANTIC_ON": True,
                    "INSTANCE_ON": False,
                    "PANOPTIC_ON": False,
                    "OVERLAP_THRESHOLD": 0.8,
                    "OBJECT_MASK_THRESHOLD": 0.8,
                },
            },
        },
    }


def main():
    for bench, b in BENCHES.items():
        d = os.path.join(HERE, bench)
        os.makedirs(d, exist_ok=True)
        kiters = f'bs8_{b["max_iter"] // 1000}k'
        for bb, k in BACKBONES.items():
            base = f'{k["base_prefix"]}-{b["tag"]}-SemanticSegmentation.yaml'
            tbase = f'Test-{base}'
            files = {
                base: base_cfg(bench, bb, test=False),
                tbase: base_cfg(bench, bb, test=True),
                f'{k["combo_prefix"]}_{kiters}.yaml': combo_cfg(bench, bb, base),
                f'Test_{k["combo_prefix"]}_{kiters}.yaml': combo_cfg(bench, bb, tbase, test=True),
            }
            for name, cfg in files.items():
                with open(os.path.join(d, name), "w") as f:
                    yaml.safe_dump(cfg, f, sort_keys=False)
    print("wrote configs under", HERE)


if __name__ == "__main__":
    main()
