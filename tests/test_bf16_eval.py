"""bf16 inference parity: the production eval path (make_eval_step(bf16=True))
must produce semantic maps and metrics within bf16 tolerances of fp32.

The reference evaluates fp32 only; bf16 eval is the TPU-native production
path (MXU-native dtype, 2x HBM bandwidth), so its numerical drift is gated
here at bf16-appropriate tolerances."""

import jax
import numpy as np

from combo_avs_tpu.evaluation.evaluator import SemSegEvaluator
from combo_avs_tpu.models.meta_arch import MaskFormer
from combo_avs_tpu.train.train_step import make_eval_step


def test_bf16_eval_matches_fp32():
    m = MaskFormer(dec_layers=2, enc_layers=1, num_queries=5)
    rng = np.random.RandomState(0)
    B, T, S = 1, 2, 32
    batch = {
        "images": (rng.rand(B, T, S, S, 3) * 255).astype(np.float32),
        "audio_log_mel": rng.randn(B, T, 96, 64).astype(np.float32),
        "pre_masks": (rng.rand(B, T, S, S, 3) * 255).astype(np.float32),
    }
    variables = m.init(
        jax.random.PRNGKey(0), batch["images"], batch["audio_log_mel"],
        batch["pre_masks"],
    )
    params, frozen = variables["params"], variables["frozen"]

    sem32 = np.asarray(make_eval_step(m, (S, S))(params, frozen, batch))
    sem16 = np.asarray(make_eval_step(m, (S, S), bf16=True)(params, frozen, batch))
    assert sem16.dtype == np.float32  # semantic maps come back fp32
    assert sem32.shape == sem16.shape == (B * T, 2, S, S)
    # probability-space maps: bf16 has ~3 decimal digits; random-init logits
    # are small so the softmax x sigmoid stays close
    np.testing.assert_allclose(sem16, sem32, atol=0.05)

    gt = (rng.rand(B * T, S, S) > 0.5).astype(np.int32)
    ev32, ev16 = SemSegEvaluator(), SemSegEvaluator()
    ev32.process(sem32, gt)
    ev16.process(sem16, gt)
    a, b = ev32.evaluate()["sem_seg"], ev16.evaluate()["sem_seg"]
    assert abs(a["mIoU"] - b["mIoU"]) < 0.02
    assert abs(a["f_score"] - b["f_score"]) < 0.02
