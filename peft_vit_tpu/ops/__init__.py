from .attention import attention_reference, multi_head_attention
from .phm import (
    factorized_phm_weight,
    kronecker_product_batched,
    phm_linear,
    phm_weight,
)
from .wht import wht, wht_butterfly, wht_matmul

__all__ = [
    "attention_reference",
    "multi_head_attention",
    "factorized_phm_weight",
    "kronecker_product_batched",
    "phm_linear",
    "phm_weight",
    "wht",
    "wht_butterfly",
    "wht_matmul",
]
