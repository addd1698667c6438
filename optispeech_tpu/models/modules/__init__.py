from .convnext import ConvNeXtBackbone, ConvNeXtBlock
from .core import (
    TextEmbedding,
    VariancePredictor,
    DurationPredictor,
    PitchPredictor,
    EnergyPredictor,
    ScaledSinusoidalEmbedding,
)
from .alignment import AlignmentModule
from .lightspeech import LightSpeechTransformerEncoder, LightSpeechTransformerDecoder
from .transformer import TransformerBackbone
from .conformer import ConformerBackbone
from .leanspeech import LeanSpeechBackbone

BACKBONES = {
    "convnext": ConvNeXtBackbone,
    "lightspeech_encoder": LightSpeechTransformerEncoder,
    "lightspeech_decoder": LightSpeechTransformerDecoder,
    "transformer": TransformerBackbone,
    "conformer": ConformerBackbone,
    "leanspeech": LeanSpeechBackbone,
}

__all__ = [
    "ConvNeXtBackbone",
    "ConvNeXtBlock",
    "TextEmbedding",
    "VariancePredictor",
    "DurationPredictor",
    "PitchPredictor",
    "EnergyPredictor",
    "ScaledSinusoidalEmbedding",
    "AlignmentModule",
    "LightSpeechTransformerEncoder",
    "LightSpeechTransformerDecoder",
    "TransformerBackbone",
    "ConformerBackbone",
    "LeanSpeechBackbone",
    "BACKBONES",
]
