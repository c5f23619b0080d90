"""Checkpoint converters: torch state dicts -> flax param pytrees.

Covers both checkpoint families the reference consumes:

* OpenAI CLIP (.pt state dict) — rebuilt via shape inference exactly like
  the reference's ``build_model`` (evaluation/adapter_model.py:553-594 /
  clip_load.py:95-481): vision width from conv1, layer count from resblock
  keys, patch size from conv1 kernel, embed dim from text_projection.
* timm supervised ViT (``vit_base_patch16_224``) — the reference loads timm
  weights, caches them to ``vit.pth`` and re-loads into each modified
  architecture (evaluation/lora.py:584-596); here they convert directly
  into the one PEFT-injectable ViT.

Layout notes: torch Linear stores (out, in) -> flax Dense kernel (in, out)
(transposed); torch Conv2d (out, in, kh, kw) -> flax Conv (kh, kw, in, out).
Since PEFT param trees are a superset of the checkpoint (adapters etc. are
freshly initialized), conversion *grafts onto* an initialized tree.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
from flax import traverse_util


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        return t.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(t)


def infer_clip_shape(sd: Dict[str, Any]) -> Dict[str, int]:
    """Shape inference from an OpenAI CLIP state dict
    (adapter_model.py:553-576 logic)."""
    vision_width = _np(sd["visual.conv1.weight"]).shape[0]
    vision_layers = len(
        {
            k.split(".")[3]
            for k in sd
            if k.startswith("visual.transformer.resblocks.")
        }
    )
    patch = _np(sd["visual.conv1.weight"]).shape[-1]
    grid = int(
        round((_np(sd["visual.positional_embedding"]).shape[0] - 1) ** 0.5)
    )
    has_text = "text_projection" in sd
    if has_text:
        embed_dim = _np(sd["text_projection"]).shape[1]
        text_width = _np(sd["ln_final.weight"]).shape[0]
        text_layers = len(
            {
                k.split(".")[2]
                for k in sd
                if k.startswith("transformer.resblocks.")
            }
        )
        vocab_size = int(_np(sd["token_embedding.weight"]).shape[0])
        context_length = int(_np(sd["positional_embedding"]).shape[0])
    else:
        # visual-only export: embed dim from the visual projection
        embed_dim = _np(sd["visual.proj"]).shape[1]
        text_width, text_layers, vocab_size, context_length = 0, 0, 0, 0
    return dict(
        embed_dim=int(embed_dim),
        image_size=int(grid * patch),
        patch_size=int(patch),
        vision_width=int(vision_width),
        vision_layers=int(vision_layers),
        vision_heads=max(int(vision_width // 64), 1),
        vocab_size=vocab_size,
        context_length=context_length,
        text_width=int(text_width),
        text_layers=int(text_layers),
        text_heads=max(int(text_width // 64), 1),
        has_text=has_text,
    )


def _convert_block(sd, prefix: str) -> Dict[str, np.ndarray]:
    """One ResidualAttentionBlock -> our Block names."""
    out = {}
    out["ln_1/scale"] = _np(sd[f"{prefix}.ln_1.weight"])
    out["ln_1/bias"] = _np(sd[f"{prefix}.ln_1.bias"])
    out["ln_2/scale"] = _np(sd[f"{prefix}.ln_2.weight"])
    out["ln_2/bias"] = _np(sd[f"{prefix}.ln_2.bias"])
    out["attn/in_proj/kernel"] = _np(sd[f"{prefix}.attn.in_proj_weight"]).T
    out["attn/in_proj/bias"] = _np(sd[f"{prefix}.attn.in_proj_bias"])
    out["attn/out_proj/kernel"] = _np(
        sd[f"{prefix}.attn.out_proj.weight"]
    ).T
    out["attn/out_proj/bias"] = _np(sd[f"{prefix}.attn.out_proj.bias"])
    out["mlp/c_fc/kernel"] = _np(sd[f"{prefix}.mlp.c_fc.weight"]).T
    out["mlp/c_fc/bias"] = _np(sd[f"{prefix}.mlp.c_fc.bias"])
    out["mlp/c_proj/kernel"] = _np(sd[f"{prefix}.mlp.c_proj.weight"]).T
    out["mlp/c_proj/bias"] = _np(sd[f"{prefix}.mlp.c_proj.bias"])
    # reference-TRAINED PEFT checkpoints carry the injected modules too:
    # the Houlsby adapter (adapter_model.py:204-342: adapter_norm_before,
    # adapter_down = Sequential(LN, Linear, act), adapter_up) and the
    # LoRA q/v pairs (lora_model.py:727-742); map them so such
    # checkpoints load at full parity (refexec_clip_model.npz pins this)
    if f"{prefix}.adapter.adapter_down.1.weight" in sd:
        out["adapter/adapter_norm_before/scale"] = _np(
            sd[f"{prefix}.adapter.adapter_norm_before.weight"]
        )
        out["adapter/adapter_norm_before/bias"] = _np(
            sd[f"{prefix}.adapter.adapter_norm_before.bias"]
        )
        out["adapter/down/kernel"] = _np(
            sd[f"{prefix}.adapter.adapter_down.1.weight"]
        ).T
        out["adapter/down/bias"] = _np(
            sd[f"{prefix}.adapter.adapter_down.1.bias"]
        )
        out["adapter/up/kernel"] = _np(
            sd[f"{prefix}.adapter.adapter_up.weight"]
        ).T
        out["adapter/up/bias"] = _np(
            sd[f"{prefix}.adapter.adapter_up.bias"]
        )
    for t in ("q", "v"):
        if f"{prefix}.attn.{t}_proj_adapter1.weight" in sd:
            out[f"attn/{t}_adapter1/kernel"] = _np(
                sd[f"{prefix}.attn.{t}_proj_adapter1.weight"]
            ).T
            out[f"attn/{t}_adapter2/kernel"] = _np(
                sd[f"{prefix}.attn.{t}_proj_adapter2.weight"]
            ).T
    return out


def clip_state_dict_to_tree(sd: Dict[str, Any]) -> Dict[str, Any]:
    """OpenAI CLIP state dict -> flat {path: array} in our naming."""
    info = infer_clip_shape(sd)
    flat: Dict[str, np.ndarray] = {}

    # visual tower
    flat["visual/conv1/kernel"] = _np(sd["visual.conv1.weight"]).transpose(
        2, 3, 1, 0
    )
    flat["visual/class_embedding"] = _np(sd["visual.class_embedding"])
    flat["visual/positional_embedding"] = _np(
        sd["visual.positional_embedding"]
    )
    flat["visual/ln_pre/scale"] = _np(sd["visual.ln_pre.weight"])
    flat["visual/ln_pre/bias"] = _np(sd["visual.ln_pre.bias"])
    for i in range(info["vision_layers"]):
        blk = _convert_block(sd, f"visual.transformer.resblocks.{i}")
        for k, v in blk.items():
            flat[f"visual/blocks_{i}/{k}"] = v
    flat["visual/ln_post/scale"] = _np(sd["visual.ln_post.weight"])
    flat["visual/ln_post/bias"] = _np(sd["visual.ln_post.bias"])
    flat["visual/proj"] = _np(sd["visual.proj"])

    # text tower (absent in visual-only exports)
    if info["has_text"]:
        flat["text/token_embedding/embedding"] = _np(
            sd["token_embedding.weight"]
        )
        flat["text/positional_embedding"] = _np(sd["positional_embedding"])
        for i in range(info["text_layers"]):
            blk = _convert_block(sd, f"transformer.resblocks.{i}")
            for k, v in blk.items():
                flat[f"text/blocks_{i}/{k}"] = v
        flat["text/ln_final/scale"] = _np(sd["ln_final.weight"])
        flat["text/ln_final/bias"] = _np(sd["ln_final.bias"])
        flat["text/text_projection"] = _np(sd["text_projection"])
    if "logit_scale" in sd:
        flat["logit_scale"] = _np(sd["logit_scale"]).reshape(())
    return flat


def is_clip_rn_state_dict(sd: Dict[str, Any]) -> bool:
    """True for an OpenAI CLIP ModifiedResNet checkpoint (RN50 etc.).
    ViT and RN towers both ship ``visual.conv1.weight``; only the RN
    tower has an attention pool (model.py:96-160)."""
    return "visual.attnpool.positional_embedding" in sd


def infer_clip_rn_shape(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Shape inference for a ModifiedResNet CLIP state dict, mirroring
    the counting logic clip.py's ``build_model`` uses for RN variants."""
    width = _np(sd["visual.conv1.weight"]).shape[0] * 2
    layers = tuple(
        len(
            {
                k.split(".")[2]
                for k in sd
                if k.startswith(f"visual.layer{s}.")
            }
        )
        for s in (1, 2, 3, 4)
    )
    embed_dim = _np(sd["visual.attnpool.c_proj.weight"]).shape[0]
    grid = int(
        round(
            (_np(sd["visual.attnpool.positional_embedding"]).shape[0] - 1)
            ** 0.5
        )
    )
    info = dict(
        embed_dim=int(embed_dim),
        image_size=int(grid * 32),
        vision_width=int(width),
        vision_layers=layers,
        vision_heads=int(width * 32 // 64),
        has_text="text_projection" in sd,
    )
    if info["has_text"]:
        info.update(
            text_width=int(_np(sd["ln_final.weight"]).shape[0]),
            text_layers=len(
                {
                    k.split(".")[2]
                    for k in sd
                    if k.startswith("transformer.resblocks.")
                }
            ),
            vocab_size=int(_np(sd["token_embedding.weight"]).shape[0]),
            context_length=int(_np(sd["positional_embedding"]).shape[0]),
        )
        info["text_heads"] = max(info["text_width"] // 64, 1)
    else:
        info.update(
            text_width=0, text_layers=0, vocab_size=0,
            context_length=0, text_heads=1,
        )
    return info


def _convert_bn(sd, prefix: str, out: Dict, name: str, stats: Dict):
    out[f"{name}/scale"] = _np(sd[f"{prefix}.weight"])
    out[f"{name}/bias"] = _np(sd[f"{prefix}.bias"])
    stats[f"{name}/mean"] = _np(sd[f"{prefix}.running_mean"])
    stats[f"{name}/var"] = _np(sd[f"{prefix}.running_var"])


def clip_rn_state_dict_to_tree(
    sd: Dict[str, Any],
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """OpenAI CLIP RN state dict -> (flat params, flat batch_stats) in
    ``models/clip_resnet.py`` naming.  Conv kernels OIHW -> HWIO; the
    downsample Sequential's "-1" entry is a parameterless avgpool."""
    info = infer_clip_rn_shape(sd)
    flat: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    def conv(src, dst):
        flat[dst + "/kernel"] = _np(sd[src]).transpose(2, 3, 1, 0)

    for i in (1, 2, 3):
        conv(f"visual.conv{i}.weight", f"visual/conv{i}")
        _convert_bn(sd, f"visual.bn{i}", flat, f"visual/bn{i}", stats)
    for s, blocks in enumerate(info["vision_layers"], start=1):
        for i in range(blocks):
            src = f"visual.layer{s}.{i}"
            dst = f"visual/layer{s}_{i}"
            for c in (1, 2, 3):
                conv(f"{src}.conv{c}.weight", f"{dst}/conv{c}")
                _convert_bn(
                    sd, f"{src}.bn{c}", flat, f"{dst}/bn{c}", stats
                )
            if f"{src}.downsample.0.weight" in sd:
                conv(f"{src}.downsample.0.weight", f"{dst}/downsample_conv")
                _convert_bn(
                    sd,
                    f"{src}.downsample.1",
                    flat,
                    f"{dst}/downsample_bn",
                    stats,
                )
    flat["visual/attnpool/positional_embedding"] = _np(
        sd["visual.attnpool.positional_embedding"]
    )
    for p in ("q_proj", "k_proj", "v_proj", "c_proj"):
        flat[f"visual/attnpool/{p}/kernel"] = _np(
            sd[f"visual.attnpool.{p}.weight"]
        ).T
        flat[f"visual/attnpool/{p}/bias"] = _np(
            sd[f"visual.attnpool.{p}.bias"]
        )

    if info["has_text"]:
        flat["text/token_embedding/embedding"] = _np(
            sd["token_embedding.weight"]
        )
        flat["text/positional_embedding"] = _np(sd["positional_embedding"])
        for i in range(info["text_layers"]):
            blk = _convert_block(sd, f"transformer.resblocks.{i}")
            for k, v in blk.items():
                flat[f"text/blocks_{i}/{k}"] = v
        flat["text/ln_final/scale"] = _np(sd["ln_final.weight"])
        flat["text/ln_final/bias"] = _np(sd["ln_final.bias"])
        flat["text/text_projection"] = _np(sd["text_projection"])
    if "logit_scale" in sd:
        flat["logit_scale"] = _np(sd["logit_scale"]).reshape(())
    return flat, stats


def timm_effnet_state_dict_to_tree(
    sd: Dict[str, Any],
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """timm ``efficientnet_b0``-style state dict -> (flat params, flat
    batch_stats) in ``models/efficientnet.py`` naming.  The classifier
    head is dropped (the reference's EvalModel uses pooled features
    only, feature.py:227-231).  Depthwise conv weights (ch,1,k,k) and
    dense convs (o,i,k,k) both map OIHW -> HWIO."""
    flat: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    def conv(src, dst, bias=False):
        flat[dst + "/kernel"] = _np(sd[src + ".weight"]).transpose(
            2, 3, 1, 0
        )
        if bias:
            flat[dst + "/bias"] = _np(sd[src + ".bias"])

    conv("conv_stem", "conv_stem")
    _convert_bn(sd, "bn1", flat, "bn1", stats)
    s = 0
    while f"blocks.{s}.0.conv_dw.weight" in sd or (
        f"blocks.{s}.0.conv_pw.weight" in sd
    ):
        i = 0
        while f"blocks.{s}.{i}.conv_dw.weight" in sd:
            src = f"blocks.{s}.{i}"
            dst = f"blocks_{s}_{i}"
            inverted = f"{src}.conv_pwl.weight" in sd
            if inverted:
                conv(f"{src}.conv_pw", f"{dst}/conv_pw")
                _convert_bn(sd, f"{src}.bn1", flat, f"{dst}/bn1", stats)
                conv(f"{src}.conv_dw", f"{dst}/conv_dw")
                _convert_bn(sd, f"{src}.bn2", flat, f"{dst}/bn2", stats)
                conv(f"{src}.conv_pwl", f"{dst}/conv_pwl")
                _convert_bn(sd, f"{src}.bn3", flat, f"{dst}/bn3", stats)
            else:  # stage-0 depthwise-separable block
                conv(f"{src}.conv_dw", f"{dst}/conv_dw")
                _convert_bn(sd, f"{src}.bn1", flat, f"{dst}/bn1", stats)
                conv(f"{src}.conv_pw", f"{dst}/conv_pw")
                _convert_bn(sd, f"{src}.bn2", flat, f"{dst}/bn2", stats)
            conv(f"{src}.se.conv_reduce", f"{dst}/se/conv_reduce",
                 bias=True)
            conv(f"{src}.se.conv_expand", f"{dst}/se/conv_expand",
                 bias=True)
            i += 1
        s += 1
    conv("conv_head", "conv_head")
    _convert_bn(sd, "bn2", flat, "bn2", stats)
    return flat, stats


def timm_vit_state_dict_to_tree(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm ``vit_base_patch16_224``-style state dict -> our naming.

    Also maps the full_shot PEFT-variant injections (cls_vit_lora /
    cls_vit_adapter / cls_vit_adapterdrop_lora / cls_vit_position_bias /
    cls_vit_lora_adapter state dicts): q/v LoRA pairs, the post-MLP
    Houlsby adapter, the shared head-dim qkv adapter, the RPB table, and
    LePE's get_v conv.  ``cls_token`` is optional (use_cls_tocken=False
    checkpoints have a (1, g*g, w) pos_embed and no class token)."""
    flat: Dict[str, np.ndarray] = {}
    flat["conv1/kernel"] = _np(sd["patch_embed.proj.weight"]).transpose(
        2, 3, 1, 0
    )
    flat["conv1/bias"] = _np(sd["patch_embed.proj.bias"])
    if "cls_token" in sd:
        flat["class_embedding"] = _np(sd["cls_token"]).reshape(-1)
    flat["positional_embedding"] = _np(sd["pos_embed"])[0]
    layers = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    for i in range(layers):
        p = f"blocks.{i}"
        o = f"blocks_{i}"
        flat[f"{o}/ln_1/scale"] = _np(sd[f"{p}.norm1.weight"])
        flat[f"{o}/ln_1/bias"] = _np(sd[f"{p}.norm1.bias"])
        flat[f"{o}/ln_2/scale"] = _np(sd[f"{p}.norm2.weight"])
        flat[f"{o}/ln_2/bias"] = _np(sd[f"{p}.norm2.bias"])
        flat[f"{o}/attn/in_proj/kernel"] = _np(
            sd[f"{p}.attn.qkv.weight"]
        ).T
        if f"{p}.attn.qkv.bias" in sd:
            flat[f"{o}/attn/in_proj/bias"] = _np(
                sd[f"{p}.attn.qkv.bias"]
            )
        flat[f"{o}/attn/out_proj/kernel"] = _np(
            sd[f"{p}.attn.proj.weight"]
        ).T
        flat[f"{o}/attn/out_proj/bias"] = _np(
            sd[f"{p}.attn.proj.bias"]
        )
        flat[f"{o}/mlp/c_fc/kernel"] = _np(
            sd[f"{p}.mlp.fc1.weight"]
        ).T
        flat[f"{o}/mlp/c_fc/bias"] = _np(sd[f"{p}.mlp.fc1.bias"])
        flat[f"{o}/mlp/c_proj/kernel"] = _np(
            sd[f"{p}.mlp.fc2.weight"]
        ).T
        flat[f"{o}/mlp/c_proj/bias"] = _np(sd[f"{p}.mlp.fc2.bias"])
        # injected PEFT modules (present in variant checkpoints)
        for t in ("q", "v"):
            if f"{p}.attn.{t}_proj_adapter1.weight" in sd:
                flat[f"{o}/attn/{t}_adapter1/kernel"] = _np(
                    sd[f"{p}.attn.{t}_proj_adapter1.weight"]
                ).T
                flat[f"{o}/attn/{t}_adapter2/kernel"] = _np(
                    sd[f"{p}.attn.{t}_proj_adapter2.weight"]
                ).T
        for owner, tgt in ((f"{p}.adapter", f"{o}/adapter"),
                           (f"{p}.attn.adapter", f"{o}/attn/qkv_adapter")):
            if f"{owner}.adapter_down.1.weight" in sd:
                flat[f"{tgt}/adapter_norm_before/scale"] = _np(
                    sd[f"{owner}.adapter_norm_before.weight"]
                )
                flat[f"{tgt}/adapter_norm_before/bias"] = _np(
                    sd[f"{owner}.adapter_norm_before.bias"]
                )
                flat[f"{tgt}/down/kernel"] = _np(
                    sd[f"{owner}.adapter_down.1.weight"]
                ).T
                flat[f"{tgt}/down/bias"] = _np(
                    sd[f"{owner}.adapter_down.1.bias"]
                )
                flat[f"{tgt}/up/kernel"] = _np(
                    sd[f"{owner}.adapter_up.weight"]
                ).T
                flat[f"{tgt}/up/bias"] = _np(sd[f"{owner}.adapter_up.bias"])
        if f"{p}.attn.relative_position_bias_table" in sd:
            flat[f"{o}/attn/relative_position_bias_table"] = _np(
                sd[f"{p}.attn.relative_position_bias_table"]
            )
        if f"{p}.attn.get_v.weight" in sd:
            flat[f"{o}/attn/get_v/kernel"] = _np(
                sd[f"{p}.attn.get_v.weight"]
            ).transpose(2, 3, 1, 0)
            flat[f"{o}/attn/get_v/bias"] = _np(sd[f"{p}.attn.get_v.bias"])
    flat["ln_post/scale"] = _np(sd["norm.weight"])
    flat["ln_post/bias"] = _np(sd["norm.bias"])
    return flat


def convvit_state_dict_to_tree(
    sd: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """cls_vit_cswin.py / cls_vit_conv.py state dict -> ConvViT naming
    (models/vit_conv.py: patch_embed, pos_embed, blocks_N/{ln_1, attn.qkv/
    out_proj/get_v, ln_2, mlp.c_fc/c_proj, ln_3, conv.pw1/dw/bn/pw2},
    ln_post).  Returns (params, batch_stats) — the conv mixer's BN
    carries running statistics."""
    flat: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}
    flat["patch_embed/kernel"] = _np(
        sd["patch_embed.proj.weight"]
    ).transpose(2, 3, 1, 0)
    flat["patch_embed/bias"] = _np(sd["patch_embed.proj.bias"])
    if "cls_token" in sd:
        flat["cls_token"] = _np(sd["cls_token"]).reshape(-1)
    flat["pos_embed"] = _np(sd["pos_embed"])[0]
    layers = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    for i in range(layers):
        p = f"blocks.{i}"
        o = f"blocks_{i}"
        flat[f"{o}/ln_1/scale"] = _np(sd[f"{p}.norm1.weight"])
        flat[f"{o}/ln_1/bias"] = _np(sd[f"{p}.norm1.bias"])
        flat[f"{o}/ln_2/scale"] = _np(sd[f"{p}.norm2.weight"])
        flat[f"{o}/ln_2/bias"] = _np(sd[f"{p}.norm2.bias"])
        flat[f"{o}/attn/qkv/kernel"] = _np(sd[f"{p}.attn.qkv.weight"]).T
        if f"{p}.attn.qkv.bias" in sd:
            flat[f"{o}/attn/qkv/bias"] = _np(sd[f"{p}.attn.qkv.bias"])
        flat[f"{o}/attn/out_proj/kernel"] = _np(
            sd[f"{p}.attn.proj.weight"]
        ).T
        flat[f"{o}/attn/out_proj/bias"] = _np(sd[f"{p}.attn.proj.bias"])
        if f"{p}.attn.get_v.weight" in sd:
            flat[f"{o}/attn/get_v/kernel"] = _np(
                sd[f"{p}.attn.get_v.weight"]
            ).transpose(2, 3, 1, 0)
            flat[f"{o}/attn/get_v/bias"] = _np(sd[f"{p}.attn.get_v.bias"])
        if f"{p}.mlp.fc1.weight" in sd:
            flat[f"{o}/mlp/c_fc/kernel"] = _np(sd[f"{p}.mlp.fc1.weight"]).T
            flat[f"{o}/mlp/c_fc/bias"] = _np(sd[f"{p}.mlp.fc1.bias"])
            flat[f"{o}/mlp/c_proj/kernel"] = _np(
                sd[f"{p}.mlp.fc2.weight"]
            ).T
            flat[f"{o}/mlp/c_proj/bias"] = _np(sd[f"{p}.mlp.fc2.bias"])
        if f"{p}.conv.0.weight" in sd:
            # pw-glu-dw-bn-swish-pw mixer (cls_vit_conv.py:199-216)
            flat[f"{o}/ln_3/scale"] = _np(sd[f"{p}.norm3.weight"])
            flat[f"{o}/ln_3/bias"] = _np(sd[f"{p}.norm3.bias"])
            flat[f"{o}/conv/pw1/kernel"] = _np(
                sd[f"{p}.conv.0.weight"]
            ).transpose(2, 3, 1, 0)
            flat[f"{o}/conv/dw/kernel"] = _np(
                sd[f"{p}.conv.2.weight"]
            ).transpose(2, 3, 1, 0)
            flat[f"{o}/conv/bn/scale"] = _np(sd[f"{p}.conv.3.weight"])
            flat[f"{o}/conv/bn/bias"] = _np(sd[f"{p}.conv.3.bias"])
            stats[f"{o}/conv/bn/mean"] = _np(
                sd[f"{p}.conv.3.running_mean"]
            )
            stats[f"{o}/conv/bn/var"] = _np(sd[f"{p}.conv.3.running_var"])
            flat[f"{o}/conv/pw2/kernel"] = _np(
                sd[f"{p}.conv.5.weight"]
            ).transpose(2, 3, 1, 0)
    flat["ln_post/scale"] = _np(sd["norm.weight"])
    flat["ln_post/bias"] = _np(sd["norm.bias"])
    return flat, stats


def graft(params: Dict[str, Any], flat_src: Dict[str, np.ndarray],
          prefix: str = "", strict: bool = True) -> Tuple[Dict, list]:
    """Graft converted weights onto an initialized param tree.

    Returns (new_params, missing): leaves present in the tree but not the
    checkpoint keep their fresh init (adapters, head); leaves in the
    checkpoint but absent from the tree raise when strict.
    """
    flat = traverse_util.flatten_dict(params, sep="/")
    used = set()
    for k in list(flat.keys()):
        src_key = k[len(prefix):] if prefix and k.startswith(prefix) else k
        if src_key in flat_src:
            v = flat_src[src_key]
            assert flat[k].shape == v.shape, (
                k, flat[k].shape, v.shape
            )
            flat[k] = np.asarray(v, dtype=np.asarray(flat[k]).dtype)
            used.add(src_key)
    unused = sorted(set(flat_src) - used)
    if strict and unused:
        raise ValueError(f"checkpoint keys not consumed: {unused[:8]}...")
    missing = sorted(
        k for k in flat if (k[len(prefix):] if prefix else k) not in flat_src
    )
    return traverse_util.unflatten_dict(flat, sep="/"), missing


def stack_flat_blocks(
    flat: Dict[str, np.ndarray], layers: int
) -> Dict[str, np.ndarray]:
    """Unrolled ``...blocks_{i}/rest`` leaves -> scan layout
    ``...blocks/block/rest`` with a stacked leading (L, ...) axis."""
    import re

    out: Dict[str, np.ndarray] = {}
    grouped: Dict[tuple, Dict[int, np.ndarray]] = {}
    for k, v in flat.items():
        m = re.match(r"(.*?)blocks_(\d+)/(.*)", k)
        if m and int(m.group(2)) < layers:
            key = (m.group(1), m.group(3))
            grouped.setdefault(key, {})[int(m.group(2))] = v
        else:
            out[k] = v
    for (pre, rest), d in grouped.items():
        assert len(d) == layers, (pre, rest, sorted(d))
        out[f"{pre}blocks/block/{rest}"] = np.stack(
            [np.asarray(d[i]) for i in range(layers)]
        )
    return out


def unstack_flat_blocks(
    flat: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Inverse of stack_flat_blocks (scan layout -> unrolled)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if "blocks/block/" in k:
            pre, rest = k.split("blocks/block/", 1)
            for i in range(v.shape[0]):
                out[f"{pre}blocks_{i}/{rest}"] = np.asarray(v[i])
        else:
            out[k] = v
    return out


def load_torch_checkpoint(
    path: str, allow_pickle: bool = False, model_key: str = ""
) -> Dict[str, Any]:
    """torch.load a .pt/.pth checkpoint to a CPU state dict.

    Tries ``weights_only=True`` first (no arbitrary pickle execution from
    third-party files); pass ``allow_pickle=True`` to opt into the unsafe
    fallback for legacy checkpoints that store full module objects.

    ``model_key`` (reference ``TEST.MODEL_KEY``, tools/finetune.py:
    213-214): unwrap a nested checkpoint first — the SSL-eval yamls
    store the tower under 'teacher'.
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # OpenAI CLIP ships TorchScript archives (clip_load.py:95-110
        # loads them with torch.jit.load and takes the state dict)
        try:
            obj = torch.jit.load(path, map_location="cpu").state_dict()
        except Exception:
            if not allow_pickle:
                raise
            obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if model_key and isinstance(obj, dict) and model_key in obj:
        obj = obj[model_key]
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(
        obj["model"], dict
    ):
        obj = obj["model"]
    return obj


def swin_state_dict_to_tree(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Official Swin state dict (cls_swin.py / microsoft Swin naming) ->
    our SwinTransformer naming (models/swin.py).  Buffers
    (relative_position_index, attn_mask) are static here and skipped."""
    flat: Dict[str, np.ndarray] = {}
    flat["patch_embed/kernel"] = _np(
        sd["patch_embed.proj.weight"]
    ).transpose(2, 3, 1, 0)
    flat["patch_embed/bias"] = _np(sd["patch_embed.proj.bias"])
    if "patch_embed.norm.weight" in sd:
        flat["pos_norm/scale"] = _np(sd["patch_embed.norm.weight"])
        flat["pos_norm/bias"] = _np(sd["patch_embed.norm.bias"])
    if "absolute_pos_embed" in sd:
        flat["absolute_pos_embed"] = _np(sd["absolute_pos_embed"])[0]
    stages = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("layers.")}
    )
    for s in stages:
        blocks = sorted(
            {
                int(k.split(".")[3])
                for k in sd
                if k.startswith(f"layers.{s}.blocks.")
            }
        )
        for bi in blocks:
            p = f"layers.{s}.blocks.{bi}"
            o = f"stage{s}_block{bi}"
            flat[f"{o}/ln_1/scale"] = _np(sd[f"{p}.norm1.weight"])
            flat[f"{o}/ln_1/bias"] = _np(sd[f"{p}.norm1.bias"])
            flat[f"{o}/ln_2/scale"] = _np(sd[f"{p}.norm2.weight"])
            flat[f"{o}/ln_2/bias"] = _np(sd[f"{p}.norm2.bias"])
            flat[f"{o}/attn/in_proj/kernel"] = _np(
                sd[f"{p}.attn.qkv.weight"]
            ).T
            flat[f"{o}/attn/in_proj/bias"] = _np(sd[f"{p}.attn.qkv.bias"])
            flat[f"{o}/attn/out_proj/kernel"] = _np(
                sd[f"{p}.attn.proj.weight"]
            ).T
            flat[f"{o}/attn/out_proj/bias"] = _np(
                sd[f"{p}.attn.proj.bias"]
            )
            flat[f"{o}/attn/relative_position_bias_table"] = _np(
                sd[f"{p}.attn.relative_position_bias_table"]
            )
            for t in ("q", "v"):
                if f"{p}.attn.{t}_proj_adapter1.weight" in sd:
                    flat[f"{o}/attn/{t}_adapter1/kernel"] = _np(
                        sd[f"{p}.attn.{t}_proj_adapter1.weight"]
                    ).T
                    flat[f"{o}/attn/{t}_adapter2/kernel"] = _np(
                        sd[f"{p}.attn.{t}_proj_adapter2.weight"]
                    ).T
            flat[f"{o}/mlp_fc1/kernel"] = _np(sd[f"{p}.mlp.fc1.weight"]).T
            flat[f"{o}/mlp_fc1/bias"] = _np(sd[f"{p}.mlp.fc1.bias"])
            flat[f"{o}/mlp_fc2/kernel"] = _np(sd[f"{p}.mlp.fc2.weight"]).T
            flat[f"{o}/mlp_fc2/bias"] = _np(sd[f"{p}.mlp.fc2.bias"])
        if f"layers.{s}.downsample.reduction.weight" in sd:
            flat[f"downsample{s}/reduction/kernel"] = _np(
                sd[f"layers.{s}.downsample.reduction.weight"]
            ).T
            flat[f"downsample{s}/norm/scale"] = _np(
                sd[f"layers.{s}.downsample.norm.weight"]
            )
            flat[f"downsample{s}/norm/bias"] = _np(
                sd[f"layers.{s}.downsample.norm.bias"]
            )
    flat["norm/scale"] = _np(sd["norm.weight"])
    flat["norm/bias"] = _np(sd["norm.bias"])
    return flat


def hrnet_state_dict_to_tree(
    sd: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """cls_hrnet.py HighResolutionNet state dict -> our HRNet naming
    (models/hrnet.py).  Returns (params, batch_stats); the classifier
    Linear stays external (our HRNet returns pooled features)."""
    flat: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    def conv(path, key, bias=False):
        flat[path + "/kernel"] = _np(sd[key + ".weight"]).transpose(
            2, 3, 1, 0
        )
        if bias:
            flat[path + "/bias"] = _np(sd[key + ".bias"])

    def bn(path, key):
        flat[path + "/bn/scale"] = _np(sd[key + ".weight"])
        flat[path + "/bn/bias"] = _np(sd[key + ".bias"])
        stats[path + "/bn/mean"] = _np(sd[key + ".running_mean"])
        stats[path + "/bn/var"] = _np(sd[key + ".running_var"])

    conv("stem_conv1", "conv1")
    bn("stem_bn1", "bn1")
    conv("stem_conv2", "conv2")
    bn("stem_bn2", "bn2")

    def bottleneck(path, key):
        for c in ("conv1", "conv2", "conv3"):
            conv(f"{path}/{c}", f"{key}.{c}")
        for b in ("bn1", "bn2", "bn3"):
            bn(f"{path}/{b}", f"{key}.{b}")
        if f"{key}.downsample.0.weight" in sd:
            conv(f"{path}/downsample", f"{key}.downsample.0")
            bn(f"{path}/bn_down", f"{key}.downsample.1")

    def basic(path, key):
        for c in ("conv1", "conv2"):
            conv(f"{path}/{c}", f"{key}.{c}")
        for b in ("bn1", "bn2"):
            bn(f"{path}/{b}", f"{key}.{b}")

    k = 0
    while f"layer1.{k}.conv1.weight" in sd:
        bottleneck(f"layer1_block{k}", f"layer1.{k}")
        k += 1

    # transitions: reference transition{si+1}.{bi} is Sequential(conv,
    # bn, relu) for an existing branch with a channel change, or
    # Sequential(Sequential(conv, bn, relu)) for the new lowest branch
    si = 0
    while any(key.startswith(f"transition{si + 1}.") for key in sd):
        bi = 0
        while True:
            plain = f"transition{si + 1}.{bi}.0.weight"
            nested = f"transition{si + 1}.{bi}.0.0.weight"
            if plain in sd:
                conv(f"transition{si}_{bi}", f"transition{si + 1}.{bi}.0")
                bn(f"transition{si}_bn{bi}", f"transition{si + 1}.{bi}.1")
            elif nested in sd:
                conv(f"transition{si}_{bi}",
                     f"transition{si + 1}.{bi}.0.0")
                bn(f"transition{si}_bn{bi}",
                   f"transition{si + 1}.{bi}.0.1")
            elif not any(
                key.startswith(f"transition{si + 1}.{bi + 1}.")
                for key in sd
            ) and bi > 4:
                break
            bi += 1
            if bi > 8:
                break
        si += 1

    # stages
    for s in (2, 3, 4):
        m = 0
        while any(key.startswith(f"stage{s}.{m}.") for key in sd):
            base = f"stage{s}.{m}"
            o = f"stage{s}_module{m}"
            b = 0
            while f"{base}.branches.{b}.0.conv1.weight" in sd:
                blk = 0
                while f"{base}.branches.{b}.{blk}.conv1.weight" in sd:
                    basic(f"{o}/branch{b}_block{blk}",
                          f"{base}.branches.{b}.{blk}")
                    blk += 1
                b += 1
            for i in range(b):
                for j in range(b):
                    if j > i:
                        conv(f"{o}/fuse/up_{j}_{i}",
                             f"{base}.fuse_layers.{i}.{j}.0")
                        bn(f"{o}/fuse/up_bn_{j}_{i}",
                           f"{base}.fuse_layers.{i}.{j}.1")
                    elif j < i:
                        for kk in range(i - j):
                            conv(
                                f"{o}/fuse/down_{j}_{i}_{kk}",
                                f"{base}.fuse_layers.{i}.{j}.{kk}.0",
                            )
                            bn(
                                f"{o}/fuse/down_bn_{j}_{i}_{kk}",
                                f"{base}.fuse_layers.{i}.{j}.{kk}.1",
                            )
            m += 1

    i = 0
    while f"incre_modules.{i}.0.conv1.weight" in sd:
        bottleneck(f"incre{i}", f"incre_modules.{i}.0")
        i += 1
    i = 0
    while f"downsamp_modules.{i}.0.weight" in sd:
        conv(f"down{i + 1}", f"downsamp_modules.{i}.0", bias=True)
        bn(f"down_bn{i + 1}", f"downsamp_modules.{i}.1")
        i += 1
    conv("final_conv", "proj_modules.0", bias=True)
    bn("final_bn", "proj_modules.1")
    return flat, stats


def hrnet_v_state_dict_to_tree(
    sd: Dict[str, Any],
    version: str,
    stem_spec: str = "",
    num_modules=(),
    num_branches=(),
    num_blocks=(),
    num_channels=(),
    block=(),
    head_block=(),
    head_proj: int = 2048,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """cls_hrnet_v2/v2_share/v3/v4 state dict -> HRNetV naming
    (models/hrnet.py).  Mirrors the torch module tree structurally from
    the same arch spec the flax model gets; the classifier Linear stays
    external.  Returns (params, batch_stats)."""
    flat: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    def conv(path, key, bias=False):
        flat[path + "/kernel"] = _np(sd[key + ".weight"]).transpose(
            2, 3, 1, 0
        )
        if bias or key + ".bias" in sd:
            flat[path + "/bias"] = _np(sd[key + ".bias"])

    def bn(path, key):
        flat[path + "/bn/scale"] = _np(sd[key + ".weight"])
        flat[path + "/bn/bias"] = _np(sd[key + ".bias"])
        stats[path + "/bn/mean"] = _np(sd[key + ".running_mean"])
        stats[path + "/bn/var"] = _np(sd[key + ".running_var"])

    def se(path, key):
        if key + ".fc.0.weight" not in sd:
            return
        flat[path + "/fc0/kernel"] = _np(sd[key + ".fc.0.weight"]).T
        flat[path + "/fc2/kernel"] = _np(sd[key + ".fc.2.weight"]).T

    def downsample(path, key):
        # _build_layer style: Sequential(Conv2d, BatchNorm2d)
        if key + ".0.weight" in sd and key + ".1.running_mean" in sd:
            conv(path + "/downsample", key + ".0")
            bn(path + "/bn_down", key + ".1")
        # branch style: Sequential(AvgPool2d, Conv2d(norm=BN))
        elif key + ".1.weight" in sd:
            conv(path + "/downsample", key + ".1")
            bn(path + "/bn_down", key + ".1.norm")

    def basic(path, key):
        conv(path + "/conv1", key + ".conv1")
        bn(path + "/bn1", key + ".bn1")
        conv(path + "/conv2", key + ".conv2")
        bn(path + "/bn2", key + ".bn2")
        se(path + "/se", key + ".se")
        downsample(path, key + ".downsample")

    def bottleneck(path, key):
        for c in ("conv1", "conv2", "conv3"):
            conv(f"{path}/{c}", f"{key}.{c}")
        for b in ("bn1", "bn2", "bn3"):
            bn(f"{path}/{b}", f"{key}.{b}")
        se(path + "/se", key + ".se")
        downsample(path, key + ".downsample")

    def inverted(path, key):
        conv(path + "/conv_pw", key + ".conv_pw", bias=True)
        bn(path + "/bn1", key + ".bn1")
        conv(path + "/conv_dw", key + ".conv_dw", bias=True)
        bn(path + "/bn2", key + ".bn2")
        se(path + "/se", key + ".se")
        conv(path + "/conv_pwl", key + ".conv_pwl", bias=True)
        bn(path + "/bn3", key + ".bn3")
        downsample(path, key + ".downsample")

    blockmap = {"BASIC": basic, "BOTTLENECK": bottleneck,
                "INVERTED": inverted}

    def wrapper_conv_bn(path_conv, path_bn, key):
        # lib/layers/wrappers.py Conv2d(norm=get_norm('BN', ...))
        conv(path_conv, key)
        bn(path_bn, key + ".norm")

    # ---- stem
    if version in ("v2", "v2_share"):
        conv("stem_conv1", "conv1")
        bn("stem_bn1", "bn1")
        conv("stem_conv2", "conv2")
        bn("stem_bn2", "bn2")
        for k in range(4):
            bottleneck(f"layer1_block{k}", f"layer1.{k}")
    elif version == "v3":
        conv("stem_conv1", "conv1")
        bn("stem_bn1", "bn1")
        conv("stem_conv2", "conv2")
        bn("stem_bn2", "bn2")
        for k in range(2):
            inverted(f"layer1_block{k}", f"layer1.{k}")
    elif version == "v4":
        if stem_spec == "conv16s2conv24s2inv24e6x2":
            wrapper_conv_bn("stem_conv1", "stem_bn1", "stem.0")
            wrapper_conv_bn("stem_conv2", "stem_bn2", "stem.1")
            inverted("layer1_block0", "stem.2.0")
            inverted("layer1_block1", "stem.2.1")
        elif stem_spec == "conv32s2maxpools2":
            wrapper_conv_bn("stem_conv1", "stem_bn1", "stem.0")
        elif stem_spec == "conv32s2maxpools2inv32e6x1":
            wrapper_conv_bn("stem_conv1", "stem_bn1", "stem.0")
            inverted("layer1_block0", "stem.2.0")
        elif stem_spec == "conv32s2maxpools2inv32e2wosex1":
            # this stem's block is a RAW InvertedResidual, not a
            # _build_layer Sequential (cls_hrnet_v4.py:482)
            wrapper_conv_bn("stem_conv1", "stem_bn1", "stem.0")
            inverted("layer1_block0", "stem.2")
        elif stem_spec in ("conv32s2inv32e6s2x1", "conv24s2inv24e6s2x1"):
            wrapper_conv_bn("stem_conv1", "stem_bn1", "stem.0")
            inverted("layer1_block0", "stem.1.0")
        else:
            raise ValueError(f"unknown STEM_SPEC {stem_spec!r}")

    # ---- transitions + stages
    for i in range(len(num_modules)):
        nb = num_branches[i]
        for j in range(nb):
            plain = f"transition{i + 1}.{j}.0.weight"
            nested = f"transition{i + 1}.{j}.0.0.weight"
            if plain in sd:
                conv(f"transition{i + 1}_{j}", f"transition{i + 1}.{j}.0")
                bn(f"transition{i + 1}_bn{j}", f"transition{i + 1}.{j}.1")
            elif nested in sd:
                k = 0
                while f"transition{i + 1}.{j}.{k}.0.weight" in sd:
                    conv(
                        f"transition{i + 1}_{j}_{k}",
                        f"transition{i + 1}.{j}.{k}.0",
                    )
                    bn(
                        f"transition{i + 1}_bn{j}_{k}",
                        f"transition{i + 1}.{j}.{k}.1",
                    )
                    k += 1
        cvt = blockmap[block[i]]
        for m in range(num_modules[i]):
            base = f"stage{i + 2}.{m}"
            o = f"stage{i + 2}_m{m}"
            for b in range(nb):
                for blk in range(num_blocks[i][b]):
                    cvt(f"{o}/branch{b}_block{blk}",
                        f"{base}.branches.{b}.{blk}")
            for f in range(nb - 1):
                wrapper_conv_bn(
                    f"{o}/fuse_down{f}", f"{o}/fuse_down_bn{f}",
                    f"{base}.fuse_downsample_layers.{f}",
                )
                wrapper_conv_bn(
                    f"{o}/fuse_up{f}", f"{o}/fuse_up_bn{f}",
                    f"{base}.fuse_upsample_layers.{f}",
                )

    # ---- head
    for i, hb in enumerate(head_block):
        if f"incre_modules.{i}.0.conv1.weight" in sd or (
            f"incre_modules.{i}.0.conv_pw.weight" in sd
        ):
            blockmap[hb](f"incre{i}", f"incre_modules.{i}.0")
    i = 0
    while f"downsample_modules.{i}.0.weight" in sd:
        conv(f"down{i + 1}", f"downsample_modules.{i}.0", bias=True)
        bn(f"down_bn{i + 1}", f"downsample_modules.{i}.1")
        i += 1
    if head_proj > 0 and "proj_modules.0.weight" in sd:
        conv("final_conv", "proj_modules.0", bias=True)
        bn("final_bn", "proj_modules.1")

    return flat, stats


def ttnet_state_dict_to_tree(
    sd: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """cls_ttnet_v2.py MobileShuffleV2Net / cls_ttnet_v3.py TTNetV3
    state dict -> our TTNetV2/TTNetV3 naming (models/ttnet.py).
    Returns (params, batch_stats); detects the version by key prefix
    ('backbone.' = v2, 'stem.' = v3)."""
    flat: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    def conv(path, key):
        # same transpose covers dense (O,I,kh,kw) and depthwise
        # (C,1,kh,kw) -> flax (kh,kw,I|1,O|C)
        flat[path + "/kernel"] = _np(sd[key + ".weight"]).transpose(
            2, 3, 1, 0
        )

    def bn(path, key):
        flat[path + "/scale"] = _np(sd[key + ".weight"])
        flat[path + "/bias"] = _np(sd[key + ".bias"])
        stats[path + "/mean"] = _np(sd[key + ".running_mean"])
        stats[path + "/var"] = _np(sd[key + ".running_var"])

    def branch(path, key):
        # torch Sequential: 0 conv,1 bn,2 relu,3 conv,4 bn,5 relu,6 conv,7 bn
        for ours, theirs in (
            ("conv1", "0"), ("conv2", "3"), ("conv3", "6"),
        ):
            conv(f"{path}/{ours}", f"{key}.{theirs}")
        for ours, theirs in (("bn1", "1"), ("bn2", "4"), ("bn3", "7")):
            bn(f"{path}/{ours}", f"{key}.{theirs}")

    def block(path, key):
        branch(f"{path}/branch1", f"{key}.branch1")
        if f"{key}.branch2.0.weight" in sd:
            branch(f"{path}/branch2", f"{key}.branch2")

    if any(k.startswith("backbone.conv1.") for k in sd):  # v2
        conv("conv1_conv", "backbone.conv1.0")
        bn("conv1_bn", "backbone.conv1.1")
        block("block1", "backbone.block1")
        s = 1
        while f"backbone.stage_{s}.0.branch1.0.weight" in sd:
            i = 0
            while f"backbone.stage_{s}.{i}.branch1.0.weight" in sd:
                block(f"stage_{s}/block_{i}", f"backbone.stage_{s}.{i}")
                i += 1
            s += 1
    else:  # v3
        conv("stem_conv", "stem.0.0")
        bn("stem_bn", "stem.0.1")
        block("stem_block", "stem.1")
        s = 0
        while f"stages.{s}.0.branch1.0.weight" in sd:
            i = 0
            while f"stages.{s}.{i}.branch1.0.weight" in sd:
                block(f"stage_{s + 1}/block_{i}", f"stages.{s}.{i}")
                i += 1
            s += 1
        if "conv1x1.0.weight" in sd:
            conv("final_conv", "conv1x1.0")
            bn("final_bn", "conv1x1.1")

    flat["fc/kernel"] = _np(sd["fc.weight"]).T
    flat["fc/bias"] = _np(sd["fc.bias"])
    return flat, stats
