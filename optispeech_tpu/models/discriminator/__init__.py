"""Vocoder discriminators (GAN critics) + loss bundle.

Interface parity with BaseVocoderDiscriminator
(/root/reference/optispeech/model/discriminator/__init__.py): implementations
expose `forward_disc`, `forward_gen`, `forward_val`, each returning
(loss, log_dict).
"""

from .vocos import VocosDiscriminator

DISCRIMINATORS = {"vocos": VocosDiscriminator}

__all__ = ["VocosDiscriminator", "DISCRIMINATORS"]
