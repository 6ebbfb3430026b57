"""TPU-native sound-event-detection framework (reference: ariel415el/SoundEventDetection-Pytorch)."""

__version__ = "0.1.0"
