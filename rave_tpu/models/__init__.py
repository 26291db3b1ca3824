from . import blocks, latent, quantization
