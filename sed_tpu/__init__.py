"""TPU-native sound-event-detection framework (reference: ariel415el/SoundEventDetection-Pytorch).

Top-level API (lazily imported so ``import sed_tpu`` stays light):

  configs:    AudioConfig, SpectrogramConfig, WaveformConfig
  features:   logmel_features, logmel_features_batch, multichannel_stft,
              multichannel_complex_to_log_mel
  data:       SpectrogramDataset, WaveformDataset, preprocess_data
  models:     CnnAvgPooling, MobileNetV1, M5
  training:   train, evaluate, make_optimizer, save_checkpoint, load_checkpoint
  inference:  batch_predict_files, StreamingDetector, windowed_forward
  metrics:    calculate_metrics, f_score, event_based_metrics
  quantized:  quantize_cnn, quantized_scores, qat_init, qat_finetune,
              qat_export
  wire codec: mulaw_encode, mulaw_decode (uint8 µ-law ingest tier)
"""

__version__ = "0.1.0"

_EXPORTS = {
    "AudioConfig": "sed_tpu.configs",
    "SpectrogramConfig": "sed_tpu.configs",
    "WaveformConfig": "sed_tpu.configs",
    "logmel_features": "sed_tpu.ops.featurizer",
    "logmel_features_batch": "sed_tpu.ops.featurizer",
    "multichannel_stft": "sed_tpu.ops.featurizer",
    "multichannel_complex_to_log_mel": "sed_tpu.ops.featurizer",
    "SpectrogramDataset": "sed_tpu.data.spectrogram_dataset",
    "WaveformDataset": "sed_tpu.data.waveform_dataset",
    "preprocess_data": "sed_tpu.data.preprocess",
    "CnnAvgPooling": "sed_tpu.models.cnn",
    "MobileNetV1": "sed_tpu.models.cnn",
    "M5": "sed_tpu.models.m5",
    "train": "sed_tpu.train.loop",
    "evaluate": "sed_tpu.train.loop",
    "make_optimizer": "sed_tpu.train.optim",
    "save_checkpoint": "sed_tpu.train.checkpoint",
    "load_checkpoint": "sed_tpu.train.checkpoint",
    "batch_predict_files": "sed_tpu.inference",
    "StreamingDetector": "sed_tpu.streaming",
    "BatchedStreamingDetector": "sed_tpu.streaming",
    "make_stream_fns": "sed_tpu.streaming",
    "DeviceStreamingDetector": "sed_tpu.device_streaming",
    "StreamPool": "sed_tpu.stream_pool",
    "StreamServer": "sed_tpu.serve_socket",
    "StreamClient": "sed_tpu.serve_socket",
    "WaveformStreamingDetector": "sed_tpu.waveform_streaming",
    "BatchedWaveformStreamingDetector": "sed_tpu.waveform_streaming",
    "WaveformStreamPool": "sed_tpu.waveform_streaming",
    "windowed_forward": "sed_tpu.parallel.time_shard",
    "calculate_metrics": "sed_tpu.utils.metrics",
    "f_score": "sed_tpu.utils.metrics",
    "event_based_metrics": "sed_tpu.utils.event_metrics",
    "event_metrics_from_scores": "sed_tpu.utils.event_metrics",
    "extract_events": "sed_tpu.utils.events_post",
    "quantize_cnn": "sed_tpu.models.quantize",
    "quantized_scores": "sed_tpu.models.quantize",
    "qat_init": "sed_tpu.models.qat",
    "qat_finetune": "sed_tpu.models.qat",
    "qat_export": "sed_tpu.models.qat",
    "mulaw_encode": "sed_tpu.ops.mulaw",
    "mulaw_decode": "sed_tpu.ops.mulaw",
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module = importlib.import_module(_EXPORTS[name])
        return getattr(module, name)
    raise AttributeError(f"module 'sed_tpu' has no attribute '{name}'")


def __dir__():
    return sorted(list(_EXPORTS) + ["__version__"])
