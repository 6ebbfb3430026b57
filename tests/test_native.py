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


def _write_corpus(tmp_path, specs, seed=0):
    rng = np.random.default_rng(seed)
    paths = []
    for i, (sr, ch, n) in enumerate(specs):
        sig = (rng.standard_normal((n, ch)).squeeze() * 6000).astype(np.int16)
        p = str(tmp_path / f"c{i}.wav")
        wavfile.write(p, sr, sig)
        paths.append(p)
    return paths


def test_batch_loader_matches_per_file(tmp_path):
    """sed_load_multichannel_batch == the per-file read_multichannel_audio
    pipeline across channel policies (mono-ize, repeat, truncate) and rates
    (equal-rate pass-through and 44.1->48k resample), on >1 thread."""
    from sed_tpu.configs import AudioConfig
    from sed_tpu.io.audio import read_multichannel_audio
    from sed_tpu.io.native import load_multichannel_batch_native

    specs = [(48000, 1, 9000), (48000, 4, 8000), (44100, 2, 7000),
             (48000, 2, 6000)]
    paths = _write_corpus(tmp_path, specs)
    for channels in (1, 2):
        cfg = AudioConfig(audio_channels=channels)
        got = load_multichannel_batch_native(paths, channels, 48000,
                                             threads=3)
        for p, g in zip(paths, got):
            ref = read_multichannel_audio(p, 48000, cfg).astype(np.float32)
            assert g.dtype == np.float32 and g.shape == ref.shape
            # Equal-rate files agree to float32 rounding of the channel
            # mean; the resampled file additionally crosses the scipy/native
            # resampler pair, both <= -140 dBFS of the float64 oracle
            # (RESAMPLER_PARITY.json) — far inside 1e-5 on +-0.2 signals.
            np.testing.assert_allclose(g, ref, atol=1e-5)


def test_batch_loader_reports_failed_file(tmp_path):
    from sed_tpu.io.native import load_multichannel_batch_native

    paths = _write_corpus(tmp_path, [(48000, 1, 5000)])
    with pytest.raises(ValueError, match="nope.wav"):
        load_multichannel_batch_native(paths + [str(tmp_path / "nope.wav")],
                                       1, 48000, threads=2)


def test_batch_api_workers_equivalence(tmp_path):
    """read_multichannel_audio_batch: workers=0 / python threads / native
    threads all produce the same float32 waveforms."""
    from sed_tpu.configs import AudioConfig
    from sed_tpu.io.audio import read_multichannel_audio_batch

    cfg = AudioConfig(audio_channels=1)
    paths = _write_corpus(tmp_path, [(48000, 2, 8000), (44100, 1, 6000),
                                     (48000, 1, 7000)], seed=3)
    seq = read_multichannel_audio_batch(paths, 48000, cfg, workers=0)
    par = read_multichannel_audio_batch(paths, 48000, cfg, workers=3)
    assert len(seq) == len(par) == len(paths)
    for a, b in zip(seq, par):
        assert a.dtype == b.dtype == np.float32
        np.testing.assert_allclose(a, b, atol=1e-5)
