"""dan-tpu: a TPU-native (JAX/XLA/Pallas/pjit) face-detection framework with
the capabilities of the TF1 reference HiKapok/DAN (see SURVEY.md)."""

__version__ = "0.3.0"

from dan_tpu.config import DANConfig, default_config

__all__ = ["DANConfig", "default_config", "__version__"]
