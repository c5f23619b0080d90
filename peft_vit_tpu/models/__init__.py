from .classifier import ClassifierHead, FeatureBatchNorm, ImageClassifier
from .clip import CLIP, clip_from_config
from .text import TextTransformer
from .vit import VisionTransformer

__all__ = [
    "CLIP",
    "ClassifierHead",
    "FeatureBatchNorm",
    "ImageClassifier",
    "TextTransformer",
    "VisionTransformer",
    "clip_from_config",
]
