from .spec import PEFTSpec, canonical_method, spec_from_config
from .masks import (
    build_mask,
    count_trainable,
    describe_mask,
    merge_params,
    split_params,
)

__all__ = [
    "PEFTSpec",
    "canonical_method",
    "spec_from_config",
    "build_mask",
    "count_trainable",
    "describe_mask",
    "merge_params",
    "split_params",
]
