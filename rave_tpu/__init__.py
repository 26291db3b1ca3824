"""rave_tpu: a TPU-native realtime neural audio codec / voice-conversion
framework (JAX / XLA / Pallas), built from scratch with the capabilities
of the reference RAVE system.

Subpackages
-----------
ops       -- streaming conv engine, PQMF, STFT/losses, Pallas kernels
models    -- neural blocks, latent heads, quantization, discriminators
train     -- jitted training loop, schedules, checkpointing
data      -- preprocessing and dataset pipeline
parallel  -- mesh / sharding helpers
export    -- streaming export and realtime serving
"""

__version__ = "0.1.0"
