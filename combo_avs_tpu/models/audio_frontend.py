"""Log-mel audio frontend (VGGish input convention), pure JAX.

Replicates the numpy frontend the reference uses offline to build the
`audio_log_mel` pickles every dataset ships (ref: models/modeling/
audio_backbone/torchvggish/mel_features.py:21-202, vggish_input.py:30-76,
vggish_params.py:22-35):

* 16 kHz mono waveform
* STFT: 25 ms periodic-Hann window (400 samples), 10 ms hop (160), rfft(512)
  magnitude, no centering
* 64 HTK mel bins spanning 125-7500 Hz, DC bin zeroed
* log(mel + 0.01)
* framed into non-overlapping 0.96 s examples of 96 frames -> [N, 96, 64]

Unlike the reference this is a single jittable op (XLA fuses the framing,
window multiply, FFT and mel matmul), so it can also run on-device at
training time when `MODEL.AUDIO.PREPROCESS_AUDIO_TO_LOG_MEL` is enabled.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
STFT_WINDOW_SECONDS = 0.025
STFT_HOP_SECONDS = 0.010
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_WINDOW_SECONDS = 0.96
EXAMPLE_HOP_SECONDS = 0.96

_MEL_BREAK_FREQUENCY_HERTZ = 700.0
_MEL_HIGH_FREQUENCY_Q = 1127.0


def hertz_to_mel(freq_hz):
    """HTK mel scale."""
    return _MEL_HIGH_FREQUENCY_Q * np.log1p(np.asarray(freq_hz, np.float64) / _MEL_BREAK_FREQUENCY_HERTZ)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    num_spectrogram_bins: int,
    sample_rate: int = SAMPLE_RATE,
    num_mel_bins: int = NUM_MEL_BINS,
    lower_edge_hz: float = MEL_MIN_HZ,
    upper_edge_hz: float = MEL_MAX_HZ,
) -> np.ndarray:
    """Triangular HTK mel weight matrix [num_spectrogram_bins, num_mel_bins].

    The DC bin row is zeroed, matching the reference frontend.
    """
    nyquist = sample_rate / 2.0
    linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)
    mel_freqs = hertz_to_mel(linear_freqs)
    band_edges = np.linspace(
        hertz_to_mel(lower_edge_hz), hertz_to_mel(upper_edge_hz), num_mel_bins + 2
    )
    lower, center, upper = band_edges[:-2], band_edges[1:-1], band_edges[2:]
    lower_slope = (mel_freqs[:, None] - lower[None, :]) / (center - lower)[None, :]
    upper_slope = (upper[None, :] - mel_freqs[:, None]) / (upper - center)[None, :]
    weights = np.maximum(0.0, np.minimum(lower_slope, upper_slope))
    weights[0, :] = 0.0
    return weights.astype(np.float32)


def periodic_hann(window_length: int) -> np.ndarray:
    """Periodic (DFT-even) Hann window, as the reference frontend uses
    (np.hanning is symmetric — deliberately NOT that)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi / window_length * np.arange(window_length))).astype(
        np.float32
    )


def frame(signal: jnp.ndarray, window_length: int, hop_length: int) -> jnp.ndarray:
    """Frame along axis 0 into [num_frames, window_length, ...]."""
    n = signal.shape[0]
    num_frames = 1 + int(np.floor((n - window_length) / hop_length)) if n >= window_length else 0
    idx = np.arange(window_length)[None, :] + hop_length * np.arange(num_frames)[:, None]
    return signal[idx.reshape(-1)].reshape((num_frames, window_length) + signal.shape[1:])


def stft_magnitude(
    signal: jnp.ndarray, fft_length: int, hop_length: int, window_length: int
) -> jnp.ndarray:
    frames = frame(signal, window_length, hop_length)
    window = jnp.asarray(periodic_hann(window_length))
    return jnp.abs(jnp.fft.rfft(frames * window, int(fft_length)))


def log_mel_spectrogram(waveform: jnp.ndarray, sample_rate: int = SAMPLE_RATE) -> jnp.ndarray:
    """[num_samples] float waveform -> [num_frames, 64] log-mel."""
    window_length = int(round(sample_rate * STFT_WINDOW_SECONDS))
    hop_length = int(round(sample_rate * STFT_HOP_SECONDS))
    fft_length = 2 ** int(np.ceil(np.log2(window_length)))
    spec = stft_magnitude(waveform, fft_length, hop_length, window_length)
    mel = spec @ jnp.asarray(mel_filterbank(fft_length // 2 + 1, sample_rate))
    return jnp.log(mel + LOG_OFFSET)


def waveform_to_examples(data: np.ndarray, sample_rate: int) -> jnp.ndarray:
    """Waveform -> [num_examples, 96, 64] log-mel examples.

    Multi-channel input is averaged to mono; non-16 kHz input is resampled
    (polyphase; the reference uses resampy offline — ref: vggish_input.py:30-49).
    """
    data = np.asarray(data)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if sample_rate != SAMPLE_RATE:
        from scipy.signal import resample_poly
        from math import gcd

        g = gcd(int(SAMPLE_RATE), int(sample_rate))
        data = resample_poly(data, SAMPLE_RATE // g, sample_rate // g)

    log_mel = log_mel_spectrogram(jnp.asarray(data, jnp.float32))

    frames_per_example = int(round(EXAMPLE_WINDOW_SECONDS / STFT_HOP_SECONDS))
    return frame(log_mel, frames_per_example, frames_per_example)


def wavfile_to_examples(path: str) -> jnp.ndarray:
    """Read a wav file (int16 scaled to [-1, 1]) and convert to examples."""
    try:
        import soundfile as sf

        data, sr = sf.read(path, dtype="int16")
    except ImportError:  # soundfile not in this image; scipy handles plain wavs
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        if data.dtype != np.int16:
            raise ValueError(f"expected int16 wav, got {data.dtype} in {path}")
    return waveform_to_examples(data / 32768.0, sr)
