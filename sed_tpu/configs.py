"""Frozen configuration dataclasses for the TPU-native SED framework.

The reference keeps its configuration as module-level constants with derived
values computed at import time (reference: dataset/common_config.py:1-16,
dataset/spectogram/spectogram_configs.py:5-14,
dataset/waveform/waveform_configs.py:1-5).  We re-express the same constants
as immutable dataclasses whose derived fields are computed in properties, so
a config can be constructed per-run, hashed, and passed into jitted code as
static metadata.

Default values reproduce the reference exactly:
  * working_sample_rate = 48000        (common_config.py:2)
  * time_margin         = 0.33 s       (common_config.py:1)
  * frame_size          = 31680        (common_config.py:3)
  * hop_size            = 15840        (common_config.py:4)
  * frames_per_second   = 3            (common_config.py:7)
  * NFFT                = 32768        (spectogram_configs.py:5)
  * mel_bins            = 64           (spectogram_configs.py:6)
  * train_crop_size     = 30 frames    (spectogram_configs.py:10)
  * tau_sed_labels      = ('doorslam',) (common_config.py:14)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


def human_format(num: float) -> str:
    """Format a number with K/M/G suffixes (reference: utils/common.py:102-113)."""
    magnitude = 0
    num = float(num)
    while abs(num) >= 1000:
        magnitude += 1
        num /= 1000.0
    return "%.1f%s" % (num, ["", "K", "M", "G", "T", "P"][magnitude])


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Shared audio constants (reference: dataset/common_config.py)."""

    working_sample_rate: int = 48000
    time_margin: float = 0.33
    audio_channels: int = 1
    min_event_percentage_in_positive_frame: float = 0.74
    tau_sed_labels: Tuple[str, ...] = ("doorslam",)

    @property
    def frame_size(self) -> int:
        # int(48000 * 0.33 * 2) == 31680 (common_config.py:3)
        return int(self.working_sample_rate * self.time_margin * 2)

    @property
    def hop_size(self) -> int:
        return self.frame_size // 2

    @property
    def frames_per_second(self) -> int:
        return self.working_sample_rate // self.hop_size

    @property
    def classes_num(self) -> int:
        return len(self.tau_sed_labels)


@dataclasses.dataclass(frozen=True)
class SpectrogramConfig(AudioConfig):
    """Spectrogram feature constants (reference: dataset/spectogram/spectogram_configs.py)."""

    mel_bins: int = 64
    mel_min_freq: float = 20.0

    @property
    def nfft(self) -> int:
        # 2 ** ceil(log2(frame_size)) == 32768 (spectogram_configs.py:5)
        return 2 ** int(math.ceil(math.log2(self.frame_size)))

    @property
    def mel_max_freq(self) -> float:
        return self.working_sample_rate // 2

    @property
    def freq_bins(self) -> int:
        return self.nfft // 2 + 1

    @property
    def train_crop_size(self) -> int:
        # 10-second log-mel crop (spectogram_configs.py:10)
        return self.frames_per_second * 10

    @property
    def cfg_descriptor(self) -> str:
        # Cache-directory naming parity (spectogram_configs.py:13-14)
        return (
            f"Spectogram_SaR-{human_format(self.working_sample_rate)}"
            f"_FrS-{human_format(self.frame_size)}"
            f"_HoS-{human_format(self.hop_size)}"
            f"_Mel-{self.mel_bins}"
            f"_Ch-{self.audio_channels}"
        )


@dataclasses.dataclass(frozen=True)
class WaveformConfig(AudioConfig):
    """Waveform feature constants (reference: dataset/waveform/waveform_configs.py)."""

    @property
    def cfg_descriptor(self) -> str:
        return (
            f"WaveForm_SaR-{human_format(self.working_sample_rate)}"
            f"_FrS-{human_format(self.frame_size)}"
            f"_HoS-{human_format(self.hop_size)}"
            f"_Ch-{self.audio_channels}"
        )


DEFAULT_AUDIO = AudioConfig()
DEFAULT_SPECTROGRAM = SpectrogramConfig()
DEFAULT_WAVEFORM = WaveformConfig()
