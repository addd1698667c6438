"""Model layer (L2-L4): neural modules, generator composition, vocoder,
discriminators, and the top-level OptiSpeech API."""

from ..config import GeneratorConfig
from .generator import OptiSpeechGenerator
from .optispeech import OptiSpeech

__all__ = ["OptiSpeechGenerator", "GeneratorConfig", "OptiSpeech"]
