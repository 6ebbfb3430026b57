"""Exploration script: plot the log-mel spectrogram + waveform of an audio segment.

Reference: analyze_spectogram.py (hardcoded path + TkAgg there; here argparse
+ Agg so it runs headless).
"""

import argparse
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
from matplotlib import pyplot as plt  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(description="Plot a spectrogram segment")
    parser.add_argument("audio_path", type=str)
    parser.add_argument("--sec_start", type=float, default=0.0)
    parser.add_argument("--sec_end", type=float, default=None)
    parser.add_argument("--out", type=str, default="spectogram_analysis.png")
    parser.add_argument("--save_segment", type=str, default="")
    args = parser.parse_args(argv)

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.io.audio import read_multichannel_audio, write_wav
    from sed_tpu.ops.featurizer import logmel_features

    waveform = read_multichannel_audio(args.audio_path, target_fs=cfg.working_sample_rate, cfg=cfg)
    start = int(cfg.working_sample_rate * args.sec_start)
    end = int(cfg.working_sample_rate * args.sec_end) if args.sec_end else len(waveform)
    waveform = waveform[start:end]
    if args.save_segment:
        write_wav(args.save_segment, waveform[:, 0], cfg.working_sample_rate)

    feature = np.asarray(logmel_features(waveform.astype(np.float32), cfg))

    frames_num = feature.shape[1]
    tick_hop = max(1, frames_num // 20)
    xticks = np.concatenate((np.arange(0, frames_num - tick_hop, tick_hop), [frames_num]))
    xlabels = [f"{x / cfg.frames_per_second:.3f}s" for x in xticks]

    fig = plt.figure()
    ax = fig.add_subplot(211)
    ax.matshow(feature[0].T, origin="lower", cmap="jet")
    ax.set_xticks(xticks)
    ax.set_xticklabels(xlabels, rotation="vertical")
    ax.xaxis.set_ticks_position("bottom")

    ax = fig.add_subplot(212)
    signal = waveform.mean(1)
    ax.plot(range(len(signal)), signal)
    ax.get_xaxis().set_visible(False)
    ax.get_yaxis().set_visible(False)
    plt.autoscale(tight=True)
    plt.savefig(args.out)
    print(f"wrote {args.out}; feature shape {feature.shape}")


if __name__ == "__main__":
    main()
