"""Native C++ audio layer: decode parity vs scipy, resampler quality."""

import numpy as np
import pytest
from scipy.io import wavfile

from sed_tpu.io.native import native_available, read_wav_native, resample_native

pytestmark = pytest.mark.skipif(not native_available(), reason="native lib not built")


def test_native_decode_int16_matches_scipy(tmp_path):
    rng = np.random.default_rng(0)
    sig = (rng.random((4000, 2)) * 2 - 1)
    path = str(tmp_path / "i16.wav")
    wavfile.write(path, 44100, (sig * 32767).astype(np.int16))
    data, sr = read_wav_native(path)
    assert sr == 44100
    assert data.shape == (4000, 2)
    ref = (sig * 32767).astype(np.int16) / 2.0**15
    np.testing.assert_allclose(data, ref, atol=1e-7)


def test_native_decode_float32(tmp_path):
    sig = np.sin(np.linspace(0, 60, 3000)).astype(np.float32)
    path = str(tmp_path / "f32.wav")
    wavfile.write(path, 48000, sig)
    data, sr = read_wav_native(path)
    np.testing.assert_allclose(data[:, 0], sig, atol=1e-7)


def test_native_decode_int32(tmp_path):
    rng = np.random.default_rng(1)
    sig32 = (rng.random(2000) * 2 - 1)
    path = str(tmp_path / "i32.wav")
    wavfile.write(path, 16000, (sig32 * (2**31 - 1)).astype(np.int32))
    data, sr = read_wav_native(path)
    np.testing.assert_allclose(data[:, 0], (sig32 * (2**31 - 1)).astype(np.int32) / 2.0**31,
                               atol=1e-9)


def test_native_resample_tone():
    sr_in, sr_out = 16000, 48000
    t = np.arange(sr_in * 2) / sr_in
    x = np.sin(2 * np.pi * 440 * t)
    y = resample_native(x, up=3, down=1)
    assert len(y) == len(x) * 3
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    freq = np.fft.rfftfreq(len(y), 1 / sr_out)
    assert abs(freq[np.argmax(spec)] - 440) < 1.0
    # Amplitude preserved within a few percent in the passband.
    assert abs(spec.max() / (len(y) / 4) - 1.0) < 0.1


def test_native_resample_downsample_antialiases():
    sr_in = 48000
    t = np.arange(sr_in) / sr_in
    # 30 kHz tone is above the 8 kHz output Nyquist -> must be attenuated.
    x = np.sin(2 * np.pi * 30000 * t)
    y = resample_native(x, up=1, down=3)
    assert np.abs(y[100:-100]).max() < 0.02
