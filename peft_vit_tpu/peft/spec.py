"""PEFTSpec — the single static description of every PEFT method.

The reference implements each method as a full copy of the ViT plus a
``requires_grad`` name filter (SURVEY.md §2.2).  Here a method is:

* a ``PEFTSpec`` (which delta modules exist and where), and
* a trainable mask (``peft.masks``) over the parameter pytree.

Both are derived from ``config.PEFT.*`` by :func:`spec_from_config`.

Method table (reference file:line for the math each entry reproduces):

==================  =========================================================
linear / logistic    head only (linear_classifier.py:38-55)
full                 visual tower + head (full_model_finetune.py:80-93)
bitfit               'bias' filter (bitfit.py:73)
layernorm            'norm' filter (layernorm.py:73)
attention            'attn' filter (attention.py:73)
lora                 q/v low-rank deltas, r=4 alpha=128 (lora_model.py:459-515)
lora_fix_one         lora, only *_adapter1 trainable (lora_fix_one.py:598)
adapter              Houlsby bottleneck after MLP (adapter_model.py:204-342)
adapterdrop          adapter, only block 11 executes (adapterdrop.py:582-587)
compacter            PHM bottleneck after MLP (compacter_model.py:358-440)
kadaptation          Kronecker q/v deltas (kadaptation.py:117-244)
rpb                  relative position bias table (RPB.py:105-144)
lepe                 depthwise-conv positional encoding (LePE.py:106-139)
transformer_probe    extra trainable block (transformer_classifier.py:338-347)
vpt                  prompt tokens (north-star extension; not in reference)
intrinsic            Fastfood/SAID reparameterization (intrinsic/fastfood.py)
==================  =========================================================
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class PEFTSpec:
    """Static (hashable) description of the deltas injected into the ViT."""

    method: str = "none"

    # attention q/k/v deltas
    attn_delta: str = "none"  # 'none' | 'lora' | 'kron'
    lora_rank: int = 4
    lora_alpha: float = 128.0
    lora_targets: Tuple[str, ...] = ("q", "v")
    # parity quirk: the reference CLIP LoRA adds the q delta AFTER the
    # 1/sqrt(d) scaling of q (lora_model.py:720-734), giving the delta an
    # effective extra sqrt(d) gain.  True reproduces that; False applies the
    # textbook pre-scale delta (used by the supervised-ViT methods).
    lora_post_scale_q: bool = False
    # parity quirk #2: the reference reshapes the (N, B, C) seq-first
    # delta STRAIGHT into (B*H, N, hd) (lora_model.py:730-731) — a flat
    # reinterpretation that is the identity only at B = H = 1; at the
    # batch sizes/heads of every real reference training run the q/v
    # deltas are scrambled across batch and sequence.  True reproduces
    # the executed layout bit-for-bit (needed to replay reference LoRA
    # training trajectories); False (default) applies the clean per-head
    # mapping.
    lora_ref_reshape: bool = False
    # LoRA-MoE gating (dormant in the reference: lora_moe=0 hardcoded at
    # lora_model.py:463; fully functional here)
    lora_moe: bool = False
    lora_moe_group: int = 2
    lora_moe_act: str = "linear"  # linear|sigmoid|tanh|relu
    lora_moe_softmax: bool = False
    lora_moe_lambda: float = 1.0
    # shared bottleneck adapter on per-head q/k/v
    # (cls_vit_lora_adapter.py:175-194: Adapter(head_dim) applied to q,k,v)
    attn_adapter: str = "none"  # 'none' | 'shared_qkv'
    phm_dim: int = 4
    phm_rank: int = 1

    # post-MLP bottleneck adapter
    adapter: str = "none"  # 'none' | 'houlsby' | 'compacter'
    adapter_dim: int = 64
    adapter_act: str = "relu"
    # AdapterDrop: layers whose adapter actually executes (None = all).
    # Parameters exist in every block either way, exactly like the reference
    # (adapterdrop.py:170-199 creates them everywhere, :582-587 runs one).
    adapter_layers: Optional[Tuple[int, ...]] = None
    compacter_reduction: int = 12
    compacter_phm_dim_down: int = 32
    compacter_phm_dim_up: int = 4
    compacter_act: str = "gelu_new"

    # additive attention bias
    attn_bias: str = "none"  # 'none' | 'rpb'
    rpb_ndim: int = -1  # -1: derive from the patch grid

    # locally-enhanced positional encoding (depthwise conv on v)
    lepe: bool = False
    # Reproduce the reference's EXECUTED q/k/v layout bit-for-bit:
    # LePE.py:120-123 reshapes the already-permuted (3,B,N,C) qkvo
    # buffer into (B,N,3,H,hd), scrambling q/k/v across the batch (the
    # get_lepe conv still sees the clean v from qkvo[2]).  Discovered by
    # executing the reference (tests/golden/generate_from_reference.py);
    # default False = the intended clean semantics.  Opt in for loading
    # reference-trained LePE checkpoints at bit parity.
    lepe_ref_qkv: bool = False

    # visual prompt tokens
    prompt_tokens: int = 0
    prompt_deep: bool = False

    # extra trainable transformer block appended after the backbone
    extra_block: bool = False

    def any_injection(self) -> bool:
        return (
            self.attn_delta != "none"
            or self.adapter != "none"
            or self.attn_bias != "none"
            or self.lepe
            or self.prompt_tokens > 0
            or self.extra_block
        )


_METHOD_ALIASES = {
    "none": "none",
    "zeroshot": "none",
    "linear": "linear",
    "linear_probe": "linear",
    "logistic": "linear",
    "full": "full",
    "finetune": "full",
    "bitfit": "bitfit",
    "bias": "bitfit",
    "layernorm": "layernorm",
    "norm": "layernorm",
    "attention": "attention",
    "attn": "attention",
    "lora": "lora",
    "lora_clip": "lora",
    "lora_fix_one": "lora_fix_one",
    "lora_moe": "lora_moe",
    "lora_adapter": "lora_adapter",
    "lora_compacter": "lora_compacter",
    "lora_drop_adapter": "lora_drop_adapter",
    "adapterdrop_lora": "lora_drop_adapter",
    "first_attention": "first_attention",
    "1st_attention": "first_attention",
    "first_mlp": "first_mlp",
    "1st_mlp": "first_mlp",
    "adapter": "adapter",
    "adapter_clip": "adapter",
    "adapterdrop": "adapterdrop",
    "adapter_drop": "adapterdrop",
    "compacter": "compacter",
    "compacter_clip": "compacter",
    "kadaptation": "kadaptation",
    "kronecker_adaptation": "kadaptation",
    "rpb": "rpb",
    "position_bias": "rpb",
    "lepe": "lepe",
    "cswin": "lepe",
    "transformer_probe": "transformer_probe",
    "finetune_contrast": "finetune_contrast",
    "contrast": "finetune_contrast",
    "linear_probe_contrast": "linear_probe_contrast",
    "vpt": "vpt",
    "prompt": "vpt",
    "intrinsic": "intrinsic",
    "intrinsic_dimension": "intrinsic",
}


def canonical_method(name: str) -> str:
    key = name.lower().strip()
    if key not in _METHOD_ALIASES:
        raise ValueError(
            f"Unknown PEFT method {name!r}; known: "
            f"{sorted(set(_METHOD_ALIASES.values()))}"
        )
    return _METHOD_ALIASES[key]


def spec_from_config(cfg) -> PEFTSpec:
    """Build a PEFTSpec from a ``config.PEFT`` group (config/default.py)."""
    p = cfg.PEFT
    method = canonical_method(p.METHOD)

    kw = dict(
        method=method,
        lora_rank=int(p.LORA_RANK),
        lora_alpha=float(p.LORA_ALPHA),
        lora_targets=tuple(p.LORA_TARGETS),
        lora_post_scale_q=bool(p.LORA_POST_SCALE_Q),
        lora_ref_reshape=bool(p.get("LORA_REF_RESHAPE", False)),
        phm_dim=int(p.PHM_DIM),
        phm_rank=int(p.PHM_RANK),
        adapter_dim=int(p.ADAPTER_DIM),
        adapter_act=str(p.ADAPTER_ACT),
        compacter_reduction=int(p.COMPACTER_REDUCTION),
        compacter_phm_dim_down=int(p.COMPACTER_PHM_DIM_DOWN),
        compacter_phm_dim_up=int(p.COMPACTER_PHM_DIM_UP),
        compacter_act=str(p.COMPACTER_ACT),
        rpb_ndim=int(p.RPB_NDIM),
        prompt_tokens=int(p.PROMPT_TOKENS),
        prompt_deep=bool(p.PROMPT_DEEP),
    )

    if method in (
        "lora",
        "lora_fix_one",
        "lora_moe",
        "lora_adapter",
        "lora_compacter",
        "lora_drop_adapter",
    ):
        kw["attn_delta"] = "lora"
        if method == "lora_moe":
            kw["lora_moe"] = True
    elif method == "kadaptation":
        kw["attn_delta"] = "kron"
    if method in ("adapter", "adapterdrop", "lora_drop_adapter"):
        kw["adapter"] = "houlsby"
        if method in ("adapterdrop", "lora_drop_adapter"):
            layers = tuple(p.ADAPTER_LAYERS) or (11,)
            kw["adapter_layers"] = layers
    elif method in ("compacter", "lora_compacter"):
        kw["adapter"] = "compacter"
    if method == "lora_adapter":
        # reference cls_vit_lora_adapter: shared head-dim adapter on q/k/v
        kw["attn_adapter"] = "shared_qkv"
    if method == "rpb":
        kw["attn_bias"] = "rpb"
    if method == "lepe":
        kw["lepe"] = True
    if method == "transformer_probe" or bool(p.EXTRA_BLOCK):
        kw["extra_block"] = True
    if method == "vpt":
        kw["prompt_tokens"] = int(p.PROMPT_TOKENS) or 10

    return PEFTSpec(**kw)
