from .attention import attention_reference, multi_head_attention
from .dropblock import drop_block, scheduled_keep_prob, stage_keep_prob
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
    "drop_block",
    "scheduled_keep_prob",
    "stage_keep_prob",
    "factorized_phm_weight",
    "kronecker_product_batched",
    "phm_linear",
    "phm_weight",
    "wht",
    "wht_butterfly",
    "wht_matmul",
]
