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

import os as _os

_plat = _os.environ.get("JAX_PLATFORMS")
if _plat and _plat != "axon":
    # Restore standard JAX semantics for the JAX_PLATFORMS env var: the
    # harness image's sitecustomize force-sets jax_platforms="axon,cpu" via
    # jax.config in EVERY interpreter, which silently overrides the env var.
    # Consequence before this guard: any test that launches a cli.train
    # SUBPROCESS under JAX_PLATFORMS=cpu (sweep e2e, preemption) actually ran
    # its training on the real TPU chip — slow, and racing whatever the TPU
    # was doing. Only applied when the env var asks for something other than
    # the image default ("axon"), so production TPU runs keep the
    # sitecustomize-provided cpu fallback platform.
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass
del _os, _plat
