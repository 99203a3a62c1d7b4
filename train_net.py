#!/usr/bin/env python
"""Training CLI (the reference's train_net.py, ref: train_net.py:231-291).

Usage:
  python train_net.py --config-file combo_avs_tpu/configs/avs_s4/COMBO_R50_bs8_90k.yaml \
      [--eval-only] [--resume] [--datasets-root $AVS_DATASETS] [opts KEY VALUE ...]

Device parallelism comes from the single jax mesh over all local chips (and
all hosts when launched under `jax.distributed`), replacing the reference's
`launch(..., num_gpus)` process spawning.
"""

import argparse
import logging
import os
import sys


def parse_args():
    p = argparse.ArgumentParser(description="COMBO-AVS TPU training")
    p.add_argument("--config-file", required=True)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-devices", type=int, default=None)
    # multi-host launch (replaces the reference's --num-machines /
    # --machine-rank / --dist-url, ref: train_net.py:284-291); on TPU pods
    # jax.distributed auto-discovers the coordinator and these can be omitted
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address host:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument(
        "--datasets-root",
        default=os.environ.get("DETECTRON2_DATASETS", os.environ.get("AVS_DATASETS", "AVS_dataset")),
    )
    p.add_argument("--max-iter", type=int, default=None, help="override SOLVER.MAX_ITER")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def setup(args):
    from combo_avs_tpu.config import setup_cfg
    from combo_avs_tpu.data.catalogs import register_all

    cfg = setup_cfg(args.config_file, args.opts or None)
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s COMBO] %(message)s",
        datefmt="%m/%d %H:%M:%S",
    )
    register_all(args.datasets_root, use_pre_sam=cfg.MODEL.PRE_SAM.USE_PRE_SAM)
    return cfg


def load_pretrained(cfg, trainer):
    """Initialize from MODEL.WEIGHTS + the VGGish .pth, with the siamese
    fan-out of the backbone weights (ref: README.md:49-62)."""
    from combo_avs_tpu.train import checkpoint as ck

    import jax

    from combo_avs_tpu.train.optim import build_optimizer
    from combo_avs_tpu.train.train_step import create_train_state

    batch = trainer._sample_batch()
    init_vars = trainer._init_variables(batch, jax.random.PRNGKey(0))
    optimizer, _ = build_optimizer(trainer.cfg, init_vars["params"])
    state = create_train_state(
        trainer.model, optimizer, batch, jax.random.PRNGKey(0), variables=init_vars
    )
    params = jax.device_get(state.params)
    frozen = jax.device_get(state.frozen)

    weights = cfg.MODEL.WEIGHTS
    if weights and os.path.exists(weights):
        sd = ck.load_torch_file(weights)
        if cfg.MODEL.BACKBONE.NAME == "build_resnet_backbone":
            bp, bf, pp, pf = ck.fan_out_siamese(ck.convert_resnet(sd))
            params["backbone"], frozen["backbone"] = bp, bf
            if cfg.MODEL.PRE_SAM.USE_PRE_SAM:
                params["pre_sam_backbone"], frozen["pre_sam_backbone"] = pp, pf
        else:
            bp = ck.convert_pvt(sd)
            params["backbone"] = bp
            if cfg.MODEL.PRE_SAM.USE_PRE_SAM:
                import copy

                params["pre_sam_backbone"] = copy.deepcopy(bp)
        logging.getLogger("COMBO").info("Loaded backbone weights from %s", weights)

    vggish = cfg.MODEL.AUDIO.PRETRAINED_VGGISH_MODEL_PATH
    if cfg.MODEL.AUDIO.FREEZE_AUDIO_EXTRACTOR and vggish and os.path.exists(vggish):
        params["audio_backbone"] = ck.convert_vggish(ck.load_torch_file(vggish))
        logging.getLogger("COMBO").info("Loaded VGGish weights from %s", vggish)

    trainer.state = state.replace(params=params, frozen=frozen)


def main():
    args = parse_args()
    if args.coordinator or args.num_processes:
        from combo_avs_tpu.parallel.distributed import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)
    cfg = setup(args)

    from combo_avs_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, n_devices=args.num_devices)
    if args.eval_only:
        trainer.resume_or_load(resume=True)
        if trainer.state is None:
            load_pretrained(cfg, trainer)
        results = trainer.test()
        from combo_avs_tpu.train.trainer import verify_results

        verify_results(cfg, results)  # ref: train_net.py:262
        print(results)
        return results

    trainer.resume_or_load(resume=args.resume)
    if trainer.state is None:
        load_pretrained(cfg, trainer)
    trainer.train(max_iter=args.max_iter)


if __name__ == "__main__":
    sys.exit(main() and 0)
