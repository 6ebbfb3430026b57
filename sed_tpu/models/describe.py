"""Model descriptions: parameter counts and shape walkthroughs.

Reference: utils/common.py:116-117 (count_parameters) and the per-model
``model_description`` printers (models/spectogram_models.py:207-230,
models/waveform_models.py:73-75).
"""

from __future__ import annotations

import jax
import numpy as np

from sed_tpu.configs import SpectrogramConfig, DEFAULT_SPECTROGRAM, human_format
from sed_tpu.models.cnn import num_pools


def count_parameters(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def describe_cnn(model, params, cfg: SpectrogramConfig = DEFAULT_SPECTROGRAM) -> str:
    """Shape walkthrough on a 60 s clip (reference: spectogram_models.py:207-230)."""
    lines = ["Model description"]
    b = "b"
    w = cfg.mel_bins
    h = 60 * cfg.working_sample_rate // cfg.hop_size
    c = cfg.audio_channels
    lines.append(f"\tInput: ({b}, {c}, {h}, {w})")
    for c_out, k in model.model_config:
        h //= k
        w //= k
        lines.append(f"\tconv_block -> ({b}, {c_out}, {h}, {w})")
    last_c = model.model_config[-1][0]
    lines.append(f"\tmean(dim=3) -> ({b}, {last_c}, {h})")
    lines.append(f"\ttranspose(1,2) -> ({b}, {h}, {last_c})")
    lines.append(f"\tFC -> ({b}, {h}, {model.classes_num})")
    pools = num_pools(model.model_config)
    num_outputs = h
    h *= 2 ** pools
    frame_duration = cfg.hop_size / cfg.working_sample_rate
    lines.append(f"\tinterpolate({2 ** pools}) -> ({b}, {h}, {model.classes_num})")
    lines.append(
        f"\tModel has {num_outputs} outputs before interpolation, each stands for "
        f"{2 ** pools} frames or {2 ** pools * frame_duration:.2f}s"
    )
    lines.append(f"\tModel has {human_format(count_parameters(params))} parameters")
    return "\n".join(lines)


def describe_m5(params) -> str:
    """Reference: waveform_models.py:73-75."""
    return (
        "Waveform model:\n"
        f"\t- Model has {human_format(count_parameters(params))} parameters"
    )
