"""jamun_tpu: a TPU-native (JAX/XLA/Pallas/pjit) walk-jump sampling framework
for molecular ensembles, with the capabilities of prescient-design/jamun."""

__version__ = "0.1.0"
