"""Audio frontend + VGGish tests.

The VGGish oracle is a torch module assembled here from the published
architecture; weights are transplanted into the flax model and outputs
compared.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from combo_avs_tpu.models.audio_frontend import (
    frame,
    log_mel_spectrogram,
    mel_filterbank,
    periodic_hann,
    waveform_to_examples,
)
from combo_avs_tpu.models.vggish import VGGish


# ---------------------------------------------------------------------------
# frontend
# ---------------------------------------------------------------------------


def test_periodic_hann_differs_from_symmetric():
    w = periodic_hann(400)
    assert w.shape == (400,)
    assert w[0] == 0.0
    # periodic window is NOT symmetric-endpoint (np.hanning ends at 0)
    assert abs(w[-1]) > 1e-6
    np.testing.assert_allclose(w, 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(400) / 400), atol=1e-7)


def test_frame_shapes():
    sig = np.arange(1000, dtype=np.float32)
    f = np.asarray(frame(sig, 400, 160))
    assert f.shape == (4, 400)
    np.testing.assert_array_equal(f[1, 0], 160)
    np.testing.assert_array_equal(f[3, -1], 160 * 3 + 399)


def test_mel_filterbank_properties():
    fb = mel_filterbank(257)
    assert fb.shape == (257, 64)
    assert np.all(fb >= 0)
    assert np.all(fb[0] == 0)  # DC bin zeroed
    # each mel bin has some support; supports shift upward in frequency
    peaks = fb.argmax(axis=0)
    assert np.all(np.diff(peaks) >= 0)
    assert fb.sum() > 0


def test_log_mel_sine_peak():
    # 1 kHz sine should concentrate energy in the mel bin containing 1 kHz
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    wave = 0.5 * np.sin(2 * np.pi * 1000 * t)
    lm = np.asarray(log_mel_spectrogram(wave))
    assert lm.shape == (1 + (sr - 400) // 160, 64)
    fb = mel_filterbank(257)
    freqs = np.linspace(0, sr / 2, 257)
    expected_bin = fb[np.argmin(np.abs(freqs - 1000))].argmax()
    assert abs(int(lm.mean(0).argmax()) - int(expected_bin)) <= 1


def test_waveform_to_examples_shapes_and_resample():
    sr = 16000
    wave = np.random.RandomState(0).randn(sr * 2).astype(np.float32) * 0.1
    ex = np.asarray(waveform_to_examples(wave, sr))
    assert ex.shape == (2, 96, 64)
    # stereo + non-16k input resamples and mixes down without error
    wave2 = np.random.RandomState(1).randn(44100, 2).astype(np.float32) * 0.1
    ex2 = np.asarray(waveform_to_examples(wave2, 44100))
    assert ex2.shape[1:] == (96, 64) and ex2.shape[0] >= 1


def test_log_mel_matches_numpy_spec():
    """Independent numpy spelling of the same STFT+mel spec."""
    rng = np.random.RandomState(2)
    wave = rng.randn(16000).astype(np.float32) * 0.3
    ours = np.asarray(log_mel_spectrogram(wave))

    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(400) / 400)
    n_frames = 1 + (len(wave) - 400) // 160
    frames = np.stack([wave[i * 160 : i * 160 + 400] for i in range(n_frames)])
    spec = np.abs(np.fft.rfft(frames * win, 512))
    ref = np.log(spec @ mel_filterbank(257) + 0.01)
    # jnp rfft runs in float32 (numpy promotes to float64); log() near the
    # +0.01 offset amplifies that, so compare at float32-FFT precision.
    np.testing.assert_allclose(ours, ref, atol=2e-2)
    assert np.abs(ours - ref).mean() < 2e-3


# ---------------------------------------------------------------------------
# VGGish vs torch oracle
# ---------------------------------------------------------------------------


def _torch_vggish():
    layers, cin = [], 1
    for v in (64, "M", 128, "M", 256, 256, "M", 512, 512, "M"):
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU()]
            cin = v
    features = nn.Sequential(*layers)
    embeddings = nn.Sequential(
        nn.Linear(512 * 4 * 6, 4096), nn.ReLU(),
        nn.Linear(4096, 4096), nn.ReLU(),
        nn.Linear(4096, 128), nn.ReLU(),
    )

    class TV(nn.Module):
        def __init__(self):
            super().__init__()
            self.features, self.embeddings = features, embeddings

        def forward(self, x):
            x = self.features(x)
            x = torch.transpose(x, 1, 3)
            x = torch.transpose(x, 1, 2).contiguous()
            return self.embeddings(x.view(x.size(0), -1))

    return TV()


def test_vggish_matches_torch():
    torch.manual_seed(0)
    tm = _torch_vggish().eval()

    model = VGGish()
    x = np.random.RandomState(0).randn(3, 96, 64, 1).astype(np.float32)
    params = model.init(__import__("jax").random.PRNGKey(0), x)["params"]

    # transplant torch weights
    convs = [m for m in tm.features if isinstance(m, nn.Conv2d)]
    fcs = [m for m in tm.embeddings if isinstance(m, nn.Linear)]
    import jax

    new = dict(params)
    for i, c in enumerate(convs):
        new[f"conv{i}"] = {
            "kernel": c.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": c.bias.detach().numpy(),
        }
    for i, f in enumerate(fcs):
        new[f"fc{i}"] = {
            "kernel": f.weight.detach().numpy().T,
            "bias": f.bias.detach().numpy(),
        }

    ours = np.asarray(model.apply({"params": new}, x))
    ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().numpy()
    assert ours.shape == (3, 128)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)
