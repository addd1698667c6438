"""OptiSpeech-TPU: a TPU-native (JAX/XLA/Pallas) lightweight end-to-end TTS framework.

A ground-up re-design of the capabilities of mush42/optispeech
(FastSpeech2-style acoustic model + WaveNeXt vocoder head, jointly trained as a
GAN with Vocos-style discriminators) for TPU hardware:

- All model compute is pure-functional JAX, jitted into a handful of static
  shapes via length bucketing.
- The monotonic-alignment-search kernel, duration averaging, beta-binomial
  prior and forward-sum (CTC) loss are device-resident batched formulations
  (the reference round-trips to CPU/numba per batch item:
  /root/reference/optispeech/model/generator/alignments.py:177,232,277).
- Scale-out is a `jax.sharding.Mesh` data axis with XLA collectives
  (the reference delegates to Lightning DDP: configs/trainer/ddp.yaml).
"""

__version__ = "0.1.0"
