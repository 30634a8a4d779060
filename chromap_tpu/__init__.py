"""chromap_tpu: TPU-native chromatin-profile read mapping framework."""

__version__ = "0.1.0"
