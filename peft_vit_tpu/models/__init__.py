from .classifier import (
    ClassifierHead,
    ContrastiveClassifier,
    FeatureBatchNorm,
    ImageClassifier,
)
from .clip import CLIP, clip_from_config
from .clip_resnet import AttentionPool2d, ModifiedResNet
from .convert import (
    clip_rn_state_dict_to_tree,
    clip_state_dict_to_tree,
    graft,
    infer_clip_rn_shape,
    infer_clip_shape,
    load_torch_checkpoint,
    stack_flat_blocks,
    timm_effnet_state_dict_to_tree,
    timm_vit_state_dict_to_tree,
    unstack_flat_blocks,
)
from .efficientnet import EfficientNet
from .factory import build_image_classifier, init_head_from_text
from .registry import get_custom_builder, register_model
from .hrnet import HRNet, HRNetV
from .resnet import (
    DyReLU,
    DyReLUSpec,
    FrozenBatchNorm,
    ResNet,
    SqueezeExcite,
    bit_resnet50,
    resnet50,
    resnet101,
    resnext50_32x4d,
    resnext101_64x4d,
    se_resnext50_32x4d,
)
from .rexnet import ReXNet
from .swin import SwinTransformer
from .text import TextTransformer
from .ssl_swin import build_ssl_swin, extract_n_last_blocks, multi_crop_forward
from .vit import VisionTransformer
from .vit_conv import ConvViT

__all__ = [
    "AttentionPool2d",
    "CLIP",
    "ClassifierHead",
    "EfficientNet",
    "ModifiedResNet",
    "clip_rn_state_dict_to_tree",
    "infer_clip_rn_shape",
    "timm_effnet_state_dict_to_tree",
    "FeatureBatchNorm",
    "FrozenBatchNorm",
    "HRNet",
    "HRNetV",
    "ContrastiveClassifier",
    "ImageClassifier",
    "ReXNet",
    "ResNet",
    "SqueezeExcite",
    "SwinTransformer",
    "TextTransformer",
    "ConvViT",
    "VisionTransformer",
    "get_custom_builder",
    "register_model",
    "build_ssl_swin",
    "extract_n_last_blocks",
    "multi_crop_forward",
    "DyReLU",
    "DyReLUSpec",
    "bit_resnet50",
    "build_image_classifier",
    "clip_from_config",
    "clip_state_dict_to_tree",
    "graft",
    "infer_clip_shape",
    "init_head_from_text",
    "load_torch_checkpoint",
    "resnet50",
    "resnet101",
    "resnext50_32x4d",
    "resnext101_64x4d",
    "se_resnext50_32x4d",
    "stack_flat_blocks",
    "timm_vit_state_dict_to_tree",
    "unstack_flat_blocks",
]
