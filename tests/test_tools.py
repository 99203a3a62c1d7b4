import numpy as np
import pytest

from combo_avs_tpu.tools.maskige import ade_palette, composite_instance_masks, render_maskige
from combo_avs_tpu.tools.preprocess_audio import process_wav
from combo_avs_tpu.tools.resize_frames import crop_resize, resize


def test_composite_sorts_ascending_and_fills_zeros():
    H = W = 8
    big = np.zeros((H, W), np.uint8); big[:, :6] = 1
    small = np.zeros((H, W), np.uint8); small[:2, :2] = 1
    m = composite_instance_masks(np.stack([big, small]))
    # small mask painted first (id 1), big fills remaining zeros (id 2)
    assert m[0, 0] == 1
    assert m[4, 4] == 2
    assert m[4, 7] == 0  # uncovered stays 0


def test_render_maskige_rgb():
    masks = np.zeros((2, 16, 16), np.uint8)
    masks[0, :4] = 1
    masks[1, 8:] = 1
    rgb = render_maskige(masks, size=32)
    assert rgb.shape == (32, 32, 3)
    pal = ade_palette()
    got = {tuple(c) for c in rgb.reshape(-1, 3)}
    assert got <= {tuple(pal[i]) for i in range(3)}


def test_render_maskige_empty():
    rgb = render_maskige(np.zeros((0, 16, 16), np.uint8), size=8)
    assert rgb.shape == (8, 8, 3)
    np.testing.assert_array_equal(rgb, np.zeros_like(rgb) + ade_palette()[0])


def test_crop_resize_semantics():
    img = np.zeros((100, 200, 3), np.uint8)
    out = crop_resize(img, 64)
    assert out.shape == (64, 64, 3)
    lbl = np.random.RandomState(0).randint(0, 5, (100, 200)).astype(np.uint8)
    outl = crop_resize(lbl, 64, is_mask=True)
    assert set(np.unique(outl)) <= set(np.unique(lbl))  # NEAREST: no new values
    assert resize(img, 32).shape == (32, 32, 3)


def test_process_wav_pads(tmp_path):
    from scipy.io import wavfile

    sr = 16000
    wave = (np.sin(2 * np.pi * 440 * np.arange(2 * sr) / sr) * 16000).astype(np.int16)
    path = str(tmp_path / "audio.wav")
    wavfile.write(path, sr, wave)
    out = process_wav(path, pad_to=10)
    assert out.shape == (10, 1, 96, 64)
    assert np.abs(out[:2]).sum() > 0  # 2s -> 2 real examples
    np.testing.assert_array_equal(out[2:], 0)  # padding


def test_make_sam_mask_gated():
    from combo_avs_tpu.tools.make_sam_mask import build_generator, masks_to_array

    with pytest.raises(SystemExit):
        build_generator("nonexistent.pth", "vit_h")
    arr = masks_to_array([{"segmentation": np.ones((4, 4), bool)}])
    assert arr.shape == (1, 4, 4)
