"""semi_tpu — TPU-native streaming speech-enhancement framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
reference PyTorch codebase KI-D/Speech-Enhancement-Mi: streaming-stateful
layers as pure ``(params, state, x) -> (y, state)`` functions, the
chunk-serial runtime as ``jax.lax.scan``, and data augmentation /
training / eval designed for device meshes.
"""

__version__ = "0.1.0"
