"""Pipelined preprocessing throughput: sequential vs native-threaded loader.

preprocess_data(workers=N) runs WAV decode + channel policy + resample on
the native C++ thread pool (native/sed_native.cpp sed_load_multichannel_batch,
GIL-free), pipelined one batch ahead of the featurize+pickle consumer — so
host acquisition of file i+1 overlaps the device featurizer dispatch of
file i.  Output is identical to the sequential path (pinned byte-for-byte by
tests/test_data.py::test_preprocess_pipelined_workers_identical).

Two corpora, the two real acquisition regimes:
  * tau_like:   48 kHz 4-ch (TAU's own format) — no resample; host work is
                decode + mono mean only.
  * resample:   44.1 kHz stereo — the polyphase Kaiser resampler dominates
                host time (the regime FilmClap-style found footage hits).

NOTE on this harness: the build machine has ONE CPU core and the TPU is
behind a ~30 ms/dispatch relay, so the measurable win here is only the
decode-overlaps-device-RPC pipelining (threads add nothing on 1 core).  On a
production TPU host (many cores, sub-ms dispatch) the thread pool is the
dominant term; the JSON records nproc so the number reads in context.

Run:  python benchmarks/bench_preprocess.py            (TPU)
      SED_BENCH_DEVICE=cpu python benchmarks/bench_preprocess.py   (smoke)
Writes benchmarks/PREPROCESS_PIPELINE.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FILES = 16
SECONDS = 30.0
WORKERS = 4
REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_corpus(root, sr, channels, seed):
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    items = []
    n = int(sr * SECONDS)
    for i in range(FILES):
        sig = (rng.standard_normal((n, channels)).squeeze() * 4000).astype(
            np.int16)
        p = os.path.join(root, f"clip_{i}.wav")
        wavfile.write(p, sr, sig)
        items.append((p, np.array([2.0]), np.array([3.0]), f"clip_{i}"))
    return items


def main():
    import jax

    if os.environ.get("SED_BENCH_DEVICE") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sed_tpu.configs import DEFAULT_SPECTROGRAM as cfg
    from sed_tpu.data.preprocess import preprocess_data
    from sed_tpu.io.native import native_available

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind}); nproc={os.cpu_count()}; "
        f"native={native_available()}")

    def run_once(items, workers):
        out = tempfile.mkdtemp(prefix="bench-prep-")
        try:
            t0 = time.perf_counter()
            preprocess_data(items, os.path.join(out, "feat"),
                            os.path.join(out, "ms.pkl"), cfg=cfg,
                            plot_sample=False, workers=workers)
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(out, ignore_errors=True)

    corpora = {"tau_like_48k_4ch": (48000, 4, 0),
               "resample_44k1_2ch": (44100, 2, 1)}
    results = {}
    for name, (sr, ch, seed) in corpora.items():
        root = tempfile.mkdtemp(prefix=f"bench-prep-src-{name}-")
        try:
            items = build_corpus(root, sr, ch, seed)
            run_once(items[:2], 0)  # compile the featurizer once, off-clock
            rows = {}
            for label, workers in (("sequential", 0),
                                   (f"pipelined_w{WORKERS}", WORKERS)):
                best = min(run_once(items, workers) for _ in range(REPS))
                rows[label] = {
                    "seconds": round(best, 3),
                    "files_per_s": round(FILES / best, 2),
                    "audio_s_per_s": round(FILES * SECONDS / best, 1),
                }
                log(f"{name} {label}: {rows[label]}")
            rows["speedup"] = round(
                rows["sequential"]["seconds"]
                / rows[f"pipelined_w{WORKERS}"]["seconds"], 3)
            results[name] = rows
        finally:
            shutil.rmtree(root, ignore_errors=True)

    out = {
        "bench": "preprocess_pipeline",
        "device_kind": dev.device_kind,
        "nproc": os.cpu_count(),
        "native_loader": native_available(),
        "files": FILES,
        "clip_seconds": SECONDS,
        "workers": WORKERS,
        "reps": f"best of {REPS}",
        "corpora": results,
        "note": "workers>0 overlaps native-threaded acquisition with the "
                "device featurizer; identical output is test-pinned.  On "
                "this 1-core relay harness only the decode/dispatch overlap "
                "is visible; a multi-core direct-attached host adds the "
                "thread-pool scaling on top.",
    }
    path = os.path.join(REPO, "benchmarks", "PREPROCESS_PIPELINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    speedups = {k: v["speedup"] for k, v in results.items()}
    print(json.dumps({
        "metric": "preprocess_pipeline_speedup",
        "value": max(speedups.values()),
        "unit": "x vs sequential (best corpus)",
        "per_corpus": speedups,
    }))


if __name__ == "__main__":
    main()
