import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from combo_avs_tpu.models.transformer_decoder import (
    MultiheadAttention,
    MultiScaleMaskedTransformerDecoder,
)

B, Q, C, M = 2, 5, 16, 4


def test_mha_matches_torch():
    torch.manual_seed(0)
    tm = nn.MultiheadAttention(C, M, dropout=0.0, batch_first=True).eval()
    rng = np.random.RandomState(0)
    q = rng.randn(B, Q, C).astype(np.float32)
    k = rng.randn(B, 7, C).astype(np.float32)
    v = rng.randn(B, 7, C).astype(np.float32)
    mask = rng.rand(B, M, Q, 7) > 0.7  # True = blocked
    # keep at least one allowed key per row
    mask[..., 0] = False

    m = MultiheadAttention(C, M)
    params = {
        "in_proj_weight": tm.in_proj_weight.detach().numpy(),
        "in_proj_bias": tm.in_proj_bias.detach().numpy(),
        "out_proj": {
            "kernel": tm.out_proj.weight.detach().numpy().T,
            "bias": tm.out_proj.bias.detach().numpy(),
        },
    }
    ours = m.apply({"params": params}, q, k, v, jnp.asarray(mask))

    tmask = torch.from_numpy(mask.reshape(B * M, Q, 7))
    ref, _ = tm(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        attn_mask=tmask, need_weights=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=1e-5, rtol=1e-5)

    # unmasked path too
    ours2 = m.apply({"params": params}, q, k, v, None)
    ref2, _ = tm(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), need_weights=False)
    np.testing.assert_allclose(np.asarray(ours2), ref2.detach().numpy(), atol=1e-5, rtol=1e-5)


def _decoder_inputs(num_queries=6, hidden=32, mask_dim=24):
    rng = np.random.RandomState(1)
    ms = [
        rng.randn(B, 2, 2, hidden).astype(np.float32),
        rng.randn(B, 4, 4, hidden).astype(np.float32),
        rng.randn(B, 8, 8, hidden).astype(np.float32),
    ]
    audio = rng.randn(B, 1, hidden).astype(np.float32)
    mask_features = rng.randn(B, 16, 16, mask_dim).astype(np.float32)
    return ms, audio, mask_features


def test_decoder_output_structure():
    ms, audio, mf = _decoder_inputs()
    dec = MultiScaleMaskedTransformerDecoder(
        num_classes=2, hidden_dim=32, num_queries=6, nheads=4,
        dim_feedforward=64, dec_layers=4, mask_dim=24, audio_out_dim=32,
    )
    variables = dec.init(jax.random.PRNGKey(0), ms, audio, mf)
    out = jax.jit(lambda v: dec.apply(v, ms, audio, mf))(variables)
    assert out["pred_logits"].shape == (B, 6, 3)
    assert out["pred_masks"].shape == (B, 6, 16, 16)
    # aux outputs: one per layer incl. the learnable-query prediction
    assert len(out["aux_outputs"]) == 4
    # middle masks: all layers except the last -> 1 (queries) + 3
    assert len(out["middles_attn_mask"]) == 4
    for mm in out["middles_attn_mask"]:
        assert mm.shape == (B, 6, 16 * 16)


def test_decoder_queries_fuse_types():
    ms, audio, mf = _decoder_inputs()
    for t, audio_dim in [("add", 32), ("dim", 8), ("all", 32), ("none", 32)]:
        dec = MultiScaleMaskedTransformerDecoder(
            num_classes=2, hidden_dim=32, num_queries=6, nheads=4,
            dim_feedforward=64, dec_layers=2, mask_dim=24,
            queries_fuse_type=t, audio_out_dim=audio_dim,
        )
        a = audio[..., :audio_dim]
        variables = dec.init(jax.random.PRNGKey(0), ms, a, mf)
        out = dec.apply(variables, ms, a, mf)
        assert out["pred_masks"].shape == (B, 6, 16, 16)
        if t == "dim":
            assert variables["params"]["query_feat"].shape == (6, 32 - 8)


def test_decoder_gradients_flow_and_attn_mask_detached():
    ms, audio, mf = _decoder_inputs()
    dec = MultiScaleMaskedTransformerDecoder(
        num_classes=2, hidden_dim=32, num_queries=6, nheads=4,
        dim_feedforward=64, dec_layers=3, mask_dim=24, audio_out_dim=32,
    )
    variables = dec.init(jax.random.PRNGKey(0), ms, audio, mf)

    def loss(v, a):
        out = dec.apply(v, ms, a, mf)
        return (out["pred_masks"] ** 2).mean() + (out["pred_logits"] ** 2).mean()

    gv, ga = jax.grad(loss, argnums=(0, 1))(variables, audio)
    total = sum(float(np.abs(x).sum()) for x in jax.tree.leaves(gv["params"]))
    assert np.isfinite(total) and total > 0
    # audio-conditioned queries: gradient must reach the audio features
    assert float(np.abs(np.asarray(ga)).sum()) > 0


def test_attn_mask_downsample_matches_torch_interpolate():
    """The prediction-heads attention-mask downsample must match
    F.interpolate(mode="bilinear", align_corners=False) — which does NOT
    antialias — before the sigmoid<0.5 threshold
    (ref: transformer_decoder.py:502-507)."""
    rng = np.random.RandomState(3)
    masks = rng.randn(B, Q, 16, 16).astype(np.float32) * 3.0
    for th, tw in [(2, 2), (4, 4), (8, 8)]:
        ours = jax.image.resize(
            jnp.asarray(masks), (B, Q, th, tw), "bilinear", antialias=False
        )
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(masks), size=(th, tw), mode="bilinear",
            align_corners=False,
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)
        # thresholded attention masks agree exactly
        np.testing.assert_array_equal(
            np.asarray(jax.nn.sigmoid(ours) < 0.5), 1.0 / (1.0 + np.exp(-ref)) < 0.5
        )
