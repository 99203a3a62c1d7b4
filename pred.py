#!/usr/bin/env python
"""Evaluation CLI (the reference's pred.py, ref: pred.py:130-238): load the
best checkpoint from OUTPUT_DIR and evaluate every cfg.DATASETS.TEST split,
dispatching the AVSS evaluator for `avss_*` datasets (ref: pred.py:171-174).

Usage:
  python pred.py --config-file combo_avs_tpu/configs/avs_s4/Test_COMBO_R50_bs8_90k.yaml \
      [--checkpoint path] [--datasets-root ...]
"""

import argparse
import logging
import os
import sys


def parse_args():
    p = argparse.ArgumentParser(description="COMBO-AVS TPU evaluation")
    p.add_argument("--config-file", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="orbax dir (default OUTPUT_DIR/model_best) or torch .pth")
    p.add_argument("--num-devices", type=int, default=None)
    p.add_argument(
        "--datasets-root",
        default=os.environ.get("DETECTRON2_DATASETS", os.environ.get("AVS_DATASETS", "AVS_dataset")),
    )
    p.add_argument("--max-videos", type=int, default=None)
    p.add_argument("--save-vis", action="store_true",
                   help="dump colored prediction masks to OUTPUT_DIR/vis/<dataset>")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from train_net import setup

    cfg = setup(args)

    from combo_avs_tpu.train import checkpoint as ck
    from combo_avs_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, n_devices=args.num_devices)
    ckpt = args.checkpoint or os.path.join(cfg.OUTPUT_DIR, "model_best")

    if ckpt.endswith((".pth", ".pkl")) and os.path.exists(ckpt):
        # a published torch COMBO checkpoint: convert in place
        sd = ck.load_torch_file(ckpt)
        backbone = "resnet" if cfg.MODEL.BACKBONE.NAME == "build_resnet_backbone" else "pvt"
        variables = ck.convert_combo_checkpoint(
            sd, backbone=backbone,
            dec_layers=cfg.MODEL.MASK_FORMER.DEC_LAYERS - 1,
            enc_layers=cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS,
        )
        import jax

        from combo_avs_tpu.train.optim import build_optimizer
        from combo_avs_tpu.train.train_step import create_train_state

        batch = trainer._sample_batch()
        init_vars = trainer._init_variables(batch, jax.random.PRNGKey(0))
        optimizer, _ = build_optimizer(cfg, init_vars["params"])
        state = create_train_state(
            trainer.model, optimizer, batch, jax.random.PRNGKey(0), variables=init_vars
        )
        trainer.state = state.replace(
            params=variables["params"], frozen=variables.get("frozen", {})
        )
        logging.getLogger("COMBO").info("Loaded torch checkpoint %s", ckpt)
    elif os.path.isdir(ckpt):
        trainer.state = ck.load_checkpoint(ckpt, trainer._abstract_state())
        logging.getLogger("COMBO").info("Loaded checkpoint %s", ckpt)
    else:
        raise FileNotFoundError(f"no checkpoint at {ckpt}")

    from combo_avs_tpu.train.trainer import verify_results

    all_results = {}
    last = None
    for dataset in cfg.DATASETS.TEST:
        vis_dir = (os.path.join(cfg.OUTPUT_DIR, "vis", dataset)
                   if args.save_vis else None)
        last = trainer.test(dataset, max_videos=args.max_videos, vis_dir=vis_dir)
        all_results[dataset] = last["sem_seg"]
        print(dataset, last["sem_seg"])
    # ref: pred.py:222 — EXPECTED_RESULTS tasks key into the single-dataset
    # result ("sem_seg") or, for multi-dataset runs, into {dataset: metrics}
    verify_results(cfg, last if len(cfg.DATASETS.TEST) == 1 else all_results)
    return all_results


if __name__ == "__main__":
    sys.exit(main() and 0)
