"""Jitted, mesh-sharded train / eval steps.

The reference's hot loop (ref: train_net.py + d2 DefaultTrainer.run_step:
forward -> backward -> DDP all-reduce -> clip -> adamw step) becomes ONE
jitted function over the global batch: XLA inserts the gradient all-reduce
from the sharding annotations, and the full-model clip + AdamW run fused
on-device. Batch arrays are sharded on the "data" mesh axis; parameters and
optimizer state are replicated.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from combo_avs_tpu.losses.criterion import SetCriterion, total_loss
from combo_avs_tpu.models.meta_arch import semantic_inference


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    frozen: Any
    opt_state: Any


def create_train_state(
    model, optimizer, sample_batch: Dict, key, variables: Optional[Dict] = None
) -> TrainState:
    """Pass `variables` to reuse an existing init (model.init compiles the
    whole forward graph — doing it twice doubles cold-start time)."""
    if variables is None:
        variables = model.init(
            {"params": key, "dropout": jax.random.fold_in(key, 1)},
            sample_batch["images"],
            sample_batch["audio_log_mel"],
            sample_batch.get("pre_masks"),
            sample_batch.get("vid_temporal_mask"),
        )
    params = variables["params"]
    frozen = variables.get("frozen", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        frozen=frozen,
        opt_state=optimizer.init(params),
    )


def _flatten_targets(batch: Dict) -> Dict:
    """[B, T, ...] target arrays -> [B*T, ...] frame-major targets."""
    lab = batch["labels"]
    B, T, K = lab.shape
    return {
        "labels": lab.reshape(B * T, K),
        "masks": batch["masks"].reshape(B * T, K, *batch["masks"].shape[3:]),
        "valid": batch["valid"].reshape(B * T, K),
    }



def _cast_tree(tree, dtype=jnp.bfloat16):
    """Cast every float32 leaf (params/frozen/activations) to `dtype`."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree
    )


def _model_inputs(batch: Dict, dtype=jnp.float32):
    """The four model inputs cast ON DEVICE to the compute dtype.

    The loader ships images/Maskiges as uint8 and GT masks as bool (exactly
    representable — see data/mappers.py), cutting host->device bytes ~4x;
    the cast to f32/bf16 happens here inside the jitted step. bf16 also
    fixes AMP-in-name-only: with f32 inputs and bf16 params flax promotes
    every layer back to f32, so the forward never actually ran in bf16."""

    def cast(x):
        return None if x is None else x.astype(dtype)

    return (cast(batch["images"]), cast(batch["audio_log_mel"]),
            cast(batch.get("pre_masks")), cast(batch.get("vid_temporal_mask")))


def make_train_step(
    model,
    criterion: SetCriterion,
    weight_dict: Dict[str, float],
    optimizer: optax.GradientTransformation,
    amp: bool = False,
    donate: bool = True,
) -> Callable:
    """amp=True casts params + activations to bfloat16 for the forward pass
    (the reference's AVSS AMP regime, ref: configs/avs_ss/
    R50-AVSS-SemanticSegmentation.yaml:44); master params, loss math and the
    optimizer stay float32. bf16 needs no loss scaling (fp32-range exponent).
    Note: the reference pins its pixel decoder to fp32 under AMP
    (ref: msdeformattn.py:315 autocast(enabled=False)); here the Pallas
    deformable kernel accumulates in fp32 regardless of input dtype."""

    def train_step(state: TrainState, batch: Dict, key):
        kd, km = jax.random.split(jax.random.fold_in(key, state.step))

        def loss_fn(params):
            fwd_params = _cast_tree(params) if amp else params
            fwd_frozen = _cast_tree(state.frozen) if amp else state.frozen
            images, mel, pre, vid = _model_inputs(
                batch, jnp.bfloat16 if amp else jnp.float32)
            outputs = model.apply(
                {"params": fwd_params, "frozen": fwd_frozen},
                images, mel, pre, vid,
                rngs={"dropout": kd},
            )
            if amp:
                outputs = jax.tree.map(
                    lambda x: x.astype(jnp.float32)
                    if hasattr(x, "dtype") and x.dtype == jnp.bfloat16
                    else x,
                    outputs,
                )
            targets = _flatten_targets(batch)
            fw = batch.get("gt_temporal_mask")
            fw = None if fw is None else fw.reshape(-1)
            losses = criterion(km, outputs, targets, frame_weight=fw)
            return total_loss(losses, weight_dict), losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = {"total_loss": loss, **losses}
        return new_state, metrics

    # donate the input state: params/opt_state buffers are reused in place
    # (halves the steady-state HBM footprint of the update)
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_tta_eval_step(model, scales, flip: bool, out_size,
                       bf16: bool = False) -> Callable:
    """Multi-scale + horizontal-flip test-time augmentation.

    The reference exposes TEST.AUG.{ENABLED,MIN_SIZES,FLIP} and calls
    Trainer.test_with_TTA (ref: train_net.py:259-260) but never defines it —
    enabling the flag crashes there. Here it works: each scale (must be
    divisible by 32) re-runs the forward on resized inputs, semantic
    probability maps are produced at `out_size`, flipped variants are
    unflipped, and everything is averaged (d2 SemanticSegmentorWithTTA
    semantics). One jitted graph holds all scale/flip branches."""
    for s in scales:
        if s % 32:
            raise ValueError(
                f"TEST.AUG.MIN_SIZES entries must be divisible by 32 (the "
                f"backbone stride), got {s} in {list(scales)}")

    def _resize_frames(x, s):
        # x [B, T, H, W, C]
        B, T, H, W, C = x.shape
        if (H, W) == (s, s):
            return x
        return jax.image.resize(x, (B, T, s, s, C), "bilinear")

    def eval_step(params, frozen, batch: Dict):
        if bf16:
            params = _cast_tree(params)
            frozen = _cast_tree(frozen)
        images0, mel, pre0, vid = _model_inputs(
            batch, jnp.bfloat16 if bf16 else jnp.float32)
        vt = None if vid is None else vid.reshape(-1)
        acc = None
        n = 0
        for s in scales:
            for do_flip in ((False, True) if flip else (False,)):
                imgs = _resize_frames(images0, s)
                pre = None if pre0 is None else _resize_frames(pre0, s)
                if do_flip:
                    imgs = imgs[:, :, :, ::-1]
                    pre = None if pre is None else pre[:, :, :, ::-1]
                outputs = model.apply(
                    {"params": params, "frozen": frozen},
                    imgs, mel, pre, vid,
                )
                sem = semantic_inference(
                    outputs["pred_logits"], outputs["pred_masks"],
                    out_size=out_size, temporal_mask=vt,
                )  # [N, C, H, W]
                if do_flip:
                    sem = sem[..., ::-1]
                acc = sem if acc is None else acc + sem
                n += 1
        return acc / n

    return jax.jit(eval_step)


def make_eval_step(model, out_size, bf16: bool = False) -> Callable:
    """Returns per-frame semantic probability maps [B*T, C, H, W].

    bf16=True runs the whole forward in bfloat16 (params, activations and
    inputs; the Pallas deformable kernel still accumulates fp32) — the
    TPU-native production inference path. `semantic_inference` (softmax x
    sigmoid + upsample) stays fp32."""

    def eval_step(params, frozen, batch: Dict):
        if bf16:
            params = _cast_tree(params)
            frozen = _cast_tree(frozen)
        images, mel, pre, vid = _model_inputs(
            batch, jnp.bfloat16 if bf16 else jnp.float32)
        outputs = model.apply(
            {"params": params, "frozen": frozen}, images, mel, pre, vid,
        )
        # bf16 outputs feed semantic_inference directly: the mask upsample
        # stays bf16 (half the HBM traffic) and the result comes back fp32
        vt = None if vid is None else vid.reshape(-1)
        return semantic_inference(
            outputs["pred_logits"], outputs["pred_masks"], out_size=out_size,
            temporal_mask=vt,
        )

    return jax.jit(eval_step)
