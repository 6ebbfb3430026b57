"""Audio I/O tests: WAV decode normalization, channel policy, resampling."""

import numpy as np
from scipy.io import wavfile

from sed_tpu.configs import AudioConfig
from sed_tpu.io.audio import read_multichannel_audio, read_wav, resample, write_wav


def test_read_wav_int16_normalization(tmp_path):
    sig = (np.sin(np.linspace(0, 40 * np.pi, 8000)) * 0.5 * 32767).astype(np.int16)
    path = str(tmp_path / "t.wav")
    wavfile.write(path, 16000, sig)
    data, sr = read_wav(path)
    assert sr == 16000
    assert data.shape == (8000, 1)
    np.testing.assert_allclose(data[:, 0], sig / 2.0**15, atol=1e-9)


def test_read_wav_float32(tmp_path):
    sig = np.sin(np.linspace(0, 40 * np.pi, 4000)).astype(np.float32)
    path = str(tmp_path / "t32.wav")
    wavfile.write(path, 8000, sig)
    data, sr = read_wav(path)
    np.testing.assert_allclose(data[:, 0], sig, atol=1e-7)


def test_channel_policy_monoize(tmp_path):
    stereo = np.stack([np.ones(1000), -np.ones(1000)], axis=1).astype(np.float32)
    path = str(tmp_path / "st.wav")
    wavfile.write(path, 48000, stereo)
    cfg = AudioConfig(audio_channels=1)
    audio = read_multichannel_audio(path, target_fs=48000, cfg=cfg)
    assert audio.shape == (1000, 1)
    np.testing.assert_allclose(audio, 0.0, atol=1e-6)  # mean of +1/-1


def test_channel_policy_repeat(tmp_path):
    mono = np.ones(500, dtype=np.float32) * 0.25
    path = str(tmp_path / "mono.wav")
    wavfile.write(path, 48000, mono)
    cfg = AudioConfig(audio_channels=2)
    audio = read_multichannel_audio(path, target_fs=48000, cfg=cfg)
    assert audio.shape == (500, 2)
    np.testing.assert_allclose(audio[:, 0], audio[:, 1])


def test_resample_tone_preserves_frequency():
    sr_in, sr_out = 16000, 48000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t)
    y = resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 1
    # Dominant FFT bin should still be 440 Hz.
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    freq = np.fft.rfftfreq(len(y), 1 / sr_out)
    assert abs(freq[np.argmax(spec)] - 440) < 2.0


def test_write_read_roundtrip(tmp_path):
    sig = (np.random.default_rng(0).random(2000) - 0.5).astype(np.float64)
    path = str(tmp_path / "rt.wav")
    write_wav(path, sig, 48000)
    data, sr = read_wav(path)
    assert sr == 48000
    np.testing.assert_allclose(data[:, 0], sig, atol=1e-4)


def test_resampler_fidelity_vs_ideal_oracle():
    """Regression (VERDICT r1 #8): resample() must stay within -120 dBFS of a
    float64 ideal band-limited oracle at 44.1->48 kHz — including near the
    transition band, where scipy's default short filter once measured
    -11.8 dBFS (see benchmarks/resampler_parity.py)."""
    sr_in, sr_out = 44100, 48000
    t_in = np.arange(sr_in * 3, dtype=np.float64) / sr_in
    t_out = np.arange(sr_out * 3, dtype=np.float64) / sr_out
    cases = [(440.0, 0.8, 0.3), (10000.0, 0.8, 1.1), (19000.0, 0.8, 2.0)]
    for f, a, p in cases:
        x = a * np.sin(2 * np.pi * f * t_in + p)
        ideal = a * np.sin(2 * np.pi * f * t_out + p)
        got = resample(x, sr_in, sr_out)
        sl = slice(sr_out, 2 * sr_out)  # exclude filter edge transients
        err_db = 20 * np.log10(np.abs(got[sl] - ideal[sl]).max() / a)
        assert err_db < -120.0, (f, err_db)


def test_resample_native_matches_scipy_path():
    """The C++ polyphase resampler and the scipy path implement the same
    filter design; outputs must agree to float32 rounding."""
    from sed_tpu.io.native import native_available, resample_native

    if not native_available():
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    x = rng.standard_normal(44100).astype(np.float32).astype(np.float64)
    a = resample(x, 44100, 48000)
    b = resample_native(x.astype(np.float32), 160, 147)
    n = min(len(a), len(b))
    np.testing.assert_allclose(a[:n], b[:n], atol=2e-5)
