"""ctypes bindings for the native C++ audio layer (native/sed_native.cpp).

The shared library is built on demand with the repo Makefile (g++ is part of
the image; pybind11 is not, hence the plain C ABI + ctypes).  Every entry
point has a pure-Python/scipy fallback in sed_tpu.io.audio, so the framework
works with or without the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsed_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


class _SedWav(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_float)),
        ("frames", ctypes.c_int64),
        ("channels", ctypes.c_int32),
        ("sample_rate", ctypes.c_int32),
    ]


class _SedAudioOut(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_float)),
        ("frames", ctypes.c_int64),
        ("channels", ctypes.c_int32),
        ("sample_rate", ctypes.c_int32),
        ("rc", ctypes.c_int32),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.sed_read_wav.argtypes = [ctypes.c_char_p, ctypes.POINTER(_SedWav)]
        lib.sed_read_wav.restype = ctypes.c_int
        lib.sed_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.sed_mixdown.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.sed_resample_len.argtypes = [ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
        lib.sed_resample_len.restype = ctypes.c_int64
        lib.sed_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_double, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.sed_resample.restype = ctypes.c_int
        lib.sed_load_multichannel_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_double, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(_SedAudioOut),
        ]
        lib.sed_load_multichannel_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def read_wav_native(path: str):
    """Decode WAV via the C++ parser -> (float64 (frames, channels), rate)."""
    lib = _load()
    if lib is None:
        raise ImportError("native library unavailable")
    wav = _SedWav()
    rc = lib.sed_read_wav(path.encode(), ctypes.byref(wav))
    if rc != 0:
        raise ValueError(f"sed_read_wav({path}) failed with code {rc}")
    try:
        total = wav.frames * wav.channels
        arr = np.ctypeslib.as_array(wav.data, shape=(total,)).copy()
    finally:
        lib.sed_free(wav.data)
    data = arr.reshape(wav.frames, wav.channels).astype(np.float64)
    return data, int(wav.sample_rate)


def load_multichannel_batch_native(
    paths, audio_channels: int, target_fs: int | None,
    threads: int = 4,
    beta: float = 14.769656459379492,
    half_zero_crossings: int = 64,
):
    """Load many files through the full acquisition pipeline on C++ threads.

    Per file: WAV decode -> channel policy (repeat-mean / mono-mean /
    truncate, io/audio.py read_multichannel_audio semantics; reference:
    dataset/dataset_utils.py:63-86) -> per-channel polyphase resample to
    ``target_fs``.  Work is distributed over ``threads`` std::threads
    entirely outside the GIL, so decode overlaps Python/device work.

    Returns a list of float32 (frames, channels) arrays in input order.
    Raises ValueError naming the first failed file (the rest of the batch
    still loads — no partial leaks).
    """
    lib = _load()
    if lib is None:
        raise ImportError("native library unavailable")
    paths = list(paths)
    n = len(paths)
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    outs = (_SedAudioOut * n)()
    lib.sed_load_multichannel_batch(
        c_paths, n, int(audio_channels), int(target_fs or 0),
        float(beta), int(half_zero_crossings), int(threads), outs)
    arrays, first_err = [], None
    for i in range(n):
        o = outs[i]
        if o.rc != 0 or not o.data:
            if first_err is None:
                first_err = (paths[i], o.rc)
            arrays.append(None)
            continue
        try:
            total = o.frames * o.channels
            arr = np.ctypeslib.as_array(o.data, shape=(total,)).copy()
        finally:
            lib.sed_free(o.data)
        arrays.append(arr.reshape(o.frames, o.channels))
    if first_err is not None:
        raise ValueError(
            f"native batch load failed for {first_err[0]!r} "
            f"(code {first_err[1]})")
    return arrays


def resample_native(x: np.ndarray, up: int, down: int,
                    beta: float = 14.769656459379492,
                    half_zero_crossings: int = 64) -> np.ndarray:
    """Polyphase windowed-sinc resample of a 1-D float array."""
    lib = _load()
    if lib is None:
        raise ImportError("native library unavailable")
    xin = np.ascontiguousarray(x, dtype=np.float32)
    n = len(xin)
    out_len = lib.sed_resample_len(n, up, down)
    out = np.empty(out_len, dtype=np.float32)
    rc = lib.sed_resample(
        xin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, up, down,
        beta, half_zero_crossings,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"sed_resample failed with code {rc}")
    return out.astype(np.float64)
