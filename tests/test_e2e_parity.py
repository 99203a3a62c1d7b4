"""Full-model end-to-end parity: random-init torch COMBO (reference graph +
reference state-dict naming) -> convert_combo_checkpoint -> MaskFormer.apply
must reproduce pred_logits / pred_masks.

This is the offline stand-in for the 81.7-mIoU bit-faithfulness target
(BASELINE.md): it validates the converter AND the full wiring (SEM gates,
late fusion, audio-conditioned queries, masked-attention decoder) end to end
— not just structurally (ref: models/maskformer_model.py:274-441)."""

import jax
import numpy as np
import torch

from combo_avs_tpu.models.meta_arch import MaskFormer
from combo_avs_tpu.train.checkpoint import convert_combo_checkpoint
from torch_combo import ComboTorch, randomize

ENC, DEC, Q = 2, 2, 5


def test_full_model_parity_via_converter():
    tm = randomize(ComboTorch(num_queries=Q, enc_layers=ENC, dec_layers=DEC))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    rng = np.random.RandomState(0)
    B, T, S = 1, 1, 64
    images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)
    mel = rng.randn(B, T, 96, 64).astype(np.float32)
    pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)

    model = MaskFormer(dec_layers=DEC, enc_layers=ENC, num_queries=Q)
    init_vars = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images, mel, pre)
    )
    variables = convert_combo_checkpoint(sd, backbone="resnet",
                                         dec_layers=DEC, enc_layers=ENC)

    # converted tree must be structurally identical to a fresh init
    want = jax.tree.structure(init_vars)
    got = jax.tree.structure(variables)
    assert want == got, f"structure mismatch:\n{want}\nvs\n{got}"
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(init_vars)[0][:10],
        jax.tree_util.tree_flatten_with_path(variables)[0][:10],
    ):
        assert a.shape == np.asarray(b).shape, (pa, a.shape, np.asarray(b).shape)

    out = jax.jit(model.apply)(variables, images, mel, pre)

    with torch.no_grad():
        tout = tm(
            torch.from_numpy(images[0].transpose(0, 3, 1, 2)),
            torch.from_numpy(mel.reshape(B * T, 1, 96, 64)),
            torch.from_numpy(pre[0].transpose(0, 3, 1, 2)),
        )

    ref_logits = tout["pred_logits"].numpy()
    ref_masks = tout["pred_masks"].numpy()
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), ref_logits, atol=5e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), ref_masks, atol=5e-3, rtol=1e-3
    )
    # aux outputs (per-layer heads) agree too — all DEC of them
    assert len(out["aux_outputs"]) == len(tout["aux_outputs"]) == DEC
    for a, b in zip(out["aux_outputs"], tout["aux_outputs"]):
        np.testing.assert_allclose(
            np.asarray(a["pred_masks"]), b["pred_masks"].numpy(),
            atol=5e-3, rtol=1e-3,
        )
    # middles (cosine-loss inputs): 1 (queries) + DEC-1
    assert len(out["middles_attn_mask"]) == len(tout["middles_attn_mask"]) == DEC


def test_full_model_parity_float64():
    """Converter parity at float64 (VERDICT r3 #8): tight enough to expose
    systematic converter drift that 5e-3-at-fp32 on random weights could
    hide. Both sides start from the SAME fp32 weights, exactly cast to f64,
    so any residual is converter-mapping or model-math error.

    Tolerance is 1e-4 (50x tighter than the fp32 test), not 1e-6: both
    implementations compute positional-encoding/reference-point constants
    in float32 by design (position_encoding.py, pixel_decoder.py:157-158 —
    matching the reference's fp32 buffers), and those ~1e-7 constant
    differences amplify to ~4e-5 at the logits through 2 decoder layers.
    Converter drift (a wrong scale/transpose/rename) produces errors orders
    of magnitude past this."""
    tm = randomize(ComboTorch(num_queries=Q, enc_layers=ENC, dec_layers=DEC))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tm = tm.double()

    rng = np.random.RandomState(2)
    B, T, S = 1, 1, 64
    images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float64)
    mel = rng.randn(B, T, 96, 64).astype(np.float64)
    pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float64)

    model = MaskFormer(dec_layers=DEC, enc_layers=ENC, num_queries=Q)
    variables = convert_combo_checkpoint(sd, backbone="resnet",
                                         dec_layers=DEC, enc_layers=ENC)
    variables = jax.tree.map(lambda x: np.asarray(x, np.float64), variables)
    with jax.enable_x64(True):
        out = jax.jit(model.apply)(variables, images, mel, pre)
        out = jax.tree.map(np.asarray, out)

    with torch.no_grad():
        tout = tm(
            torch.from_numpy(images[0].transpose(0, 3, 1, 2)),
            torch.from_numpy(mel.reshape(B * T, 1, 96, 64)),
            torch.from_numpy(pre[0].transpose(0, 3, 1, 2)),
        )
    np.testing.assert_allclose(
        out["pred_logits"], tout["pred_logits"].numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        out["pred_masks"], tout["pred_masks"].numpy(), atol=1e-4, rtol=1e-4
    )


def test_full_model_parity_via_converter_pvt():
    """Same e2e converter check through the PVTv2 path: true B5 channel
    widths (64/128/320/512, heads 1/2/5/8, sr 8/4/2/1), reduced depths
    (1,2,1,1) so the scan-stacking order of convert_pvt is exercised
    (ref: avs_tools/convert_pvt_model_to_d2.py:28-36 +
    models/modeling/backbone/pvtv2.py:391-409)."""
    DEPTHS = (1, 2, 1, 1)
    tm = randomize(ComboTorch(num_queries=Q, enc_layers=ENC, dec_layers=DEC,
                              backbone="pvt", pvt_depths=DEPTHS))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    rng = np.random.RandomState(1)
    B, T, S = 1, 1, 64
    images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)
    mel = rng.randn(B, T, 96, 64).astype(np.float32)
    pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)

    model = MaskFormer(
        backbone_name="build_pvtv2_b5_backbone", pvt_depths=DEPTHS,
        pre_sam_dim=(64, 128, 320, 512),
        dec_layers=DEC, enc_layers=ENC, num_queries=Q,
    )
    init_vars = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images, mel, pre)
    )
    variables = convert_combo_checkpoint(sd, backbone="pvt",
                                         dec_layers=DEC, enc_layers=ENC)
    want = jax.tree.structure(init_vars)
    got = jax.tree.structure(variables)
    assert want == got, f"structure mismatch:\n{want}\nvs\n{got}"

    out = jax.jit(model.apply)(variables, images, mel, pre)
    with torch.no_grad():
        tout = tm(
            torch.from_numpy(images[0].transpose(0, 3, 1, 2)),
            torch.from_numpy(mel.reshape(B * T, 1, 96, 64)),
            torch.from_numpy(pre[0].transpose(0, 3, 1, 2)),
        )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), tout["pred_logits"].numpy(),
        atol=5e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), tout["pred_masks"].numpy(),
        atol=5e-3, rtol=1e-3,
    )
