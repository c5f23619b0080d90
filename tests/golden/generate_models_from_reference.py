"""Whole-model golden fixtures produced by EXECUTING the reference.

Completes the refexec program (generate_from_reference.py pins block/
attention quirks; generate_engine_from_reference.py pins the engine):
these fixtures run the reference's COMPLETE models end-to-end at tiny
widths and store the full torch state dict plus inputs and outputs, so
tests/test_refexec_models.py can pin both our model forward AND the
checkpoint converters (clip_state_dict_to_tree / timm_vit_state_dict_to
_tree + graft) against the executed reference — the offline stand-in
for the env-gated real-checkpoint parity tests.

    PYTHONPATH= python tests/golden/generate_models_from_reference.py

* refexec_clip_model.npz — adapter_model.py CLIP (:397-530): ViT visual
  tower (width 64 => the class forces heads = width//64 = 1), text
  transformer with causal mask + EOT-argmax pooling, L2-normalized
  features, exp(logit_scale) similarity.
* refexec_cls_vit.npz — full_shot cls_vit.py VisionTransformer
  (timm-style: patch conv, cls token, pre-norm blocks, final norm,
  linear head), loaded with the timm/torch._six stubs.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
FEW = "/root/reference/few_shot/vision_benchmark/evaluation"
FULL = "/root/reference/full_shot/main/lib/models"


def _load_plain(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _install_stubs():
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()

            def forward(self, x):
                return x

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a, b)
            return tensor

        def to_2tuple(v):
            return v if isinstance(v, (tuple, list)) else (v, v)

        layers.DropPath = DropPath
        layers.trunc_normal_ = trunc_normal_
        layers.to_2tuple = to_2tuple
        models.layers = layers
        timm.models = models
        sys.modules.update({"timm": timm, "timm.models": models,
                            "timm.models.layers": layers})
    if "torch._six" not in sys.modules:
        import collections.abc as container_abcs

        six = types.ModuleType("torch._six")
        six.container_abcs = container_abcs
        sys.modules["torch._six"] = six


def _seeded(seed):
    g = torch.Generator().manual_seed(seed)

    def rand(*shape):
        # tuple form handles 0-dim params (logit_scale)
        return torch.randn(shape, generator=g, dtype=torch.float32)

    return rand


def _randomize(module, rand, scale=0.05):
    """Healthy-magnitude seeded params; 1-d 'weight's (norms) get +1."""
    with torch.no_grad():
        for name, p in module.named_parameters():
            v = rand(*p.shape) * scale
            if name.endswith("weight") and p.dim() == 1:
                v = v + 1.0
            if name == "logit_scale":
                v = torch.full_like(p, float(np.log(1 / 0.07)))
            p.copy_(v)


def _save_sd(out, module):
    for k, v in module.state_dict().items():
        out["sd__" + k.replace(".", "__")] = v.detach().numpy()


def gen_clip_model(seed=31, b=2, image=32, patch=16, vwidth=64,
                   vlayers=2, embed=16, ctx=12, vocab=50, twidth=32,
                   theads=2, tlayers=2):
    ref = _load_plain("_ref_adapter_model",
                      os.path.join(FEW, "adapter_model.py"))
    rand = _seeded(seed)
    m = ref.CLIP(embed, image, vlayers, vwidth, patch, ctx, vocab,
                 twidth, theads, tlayers).eval()
    _randomize(m, rand)
    x = rand(b, 3, image, image)
    # integer tokens; force the EOT (argmax) position to differ per row
    g = torch.Generator().manual_seed(seed + 1)
    toks = torch.randint(0, vocab - 1, (b, ctx), generator=g)
    toks[0, -1] = vocab - 1
    toks[1, ctx // 2] = vocab - 1
    with torch.no_grad():
        fi = m.encode_image(x)
        ft = m.encode_text(toks)
        li, lt = m(x, toks)
    out = {
        "x": x.numpy(),
        "toks": toks.numpy(),
        "feats_img": fi.numpy(),
        "feats_txt": ft.numpy(),
        "logits_img": li.numpy(),
        "theads": np.asarray(theads),
    }
    _save_sd(out, m)
    np.savez(os.path.join(HERE, "refexec_clip_model.npz"), **out)
    print("refexec_clip_model:", li.shape, float(li.abs().mean()))


def gen_lora_clip_model(seed=33, image=32, patch=16, vwidth=64,
                        vlayers=2, embed=16, ctx=12, vocab=50,
                        twidth=32, theads=2, tlayers=2):
    """lora_model.py CLIP (:1031-1118): visual tower built with
    kattention=True => every visual block runs the custom LoRA
    MultiheadAttention (rank 4, alpha 128, post-scale-q); the text tower
    is plain.  batch=1 and heads = vwidth//64 = 1 make the delta-reshape
    scramble (:730) the identity, so the executed forward is the
    post-scale-q semantics our module reproduces."""
    ref = _load_plain("_ref_lora_model",
                      os.path.join(FEW, "lora_model.py"))
    rand = _seeded(seed)
    m = ref.CLIP(embed, image, vlayers, vwidth, patch, ctx, vocab,
                 twidth, theads, tlayers).eval()
    _randomize(m, rand)
    x = rand(1, 3, image, image)
    g = torch.Generator().manual_seed(seed + 1)
    toks = torch.randint(0, vocab - 1, (1, ctx), generator=g)
    toks[0, -1] = vocab - 1
    with torch.no_grad():
        fi = m.encode_image(x)
        ft = m.encode_text(toks)
    out = {
        "x": x.numpy(),
        "toks": toks.numpy(),
        "feats_img": fi.numpy(),
        "feats_txt": ft.numpy(),
        "theads": np.asarray(theads),
    }
    _save_sd(out, m)
    np.savez(os.path.join(HERE, "refexec_lora_clip_model.npz"), **out)
    print("refexec_lora_clip_model:", fi.shape, float(fi.abs().mean()))


def gen_cls_vit(seed=32, b=2, image=32, patch=8, embed=32, depth=2,
                heads=2, classes=5):
    _install_stubs()
    ref = _load_plain("_ref_cls_vit", os.path.join(FULL, "cls_vit.py"))
    m = ref.VisionTransformer(
        img_size=image, patch_size=patch, num_classes=classes,
        embed_dim=embed, depth=depth, num_heads=heads, qkv_bias=True,
        pre_norm=True,
    ).eval()
    rand = _seeded(seed)
    _randomize(m, rand)
    x = rand(b, 3, image, image)
    with torch.no_grad():
        feats = m.forward_features(x)
        logits = m(x)
    if isinstance(feats, tuple):
        feats = feats[0]
    out = {
        "x": x.numpy(),
        "feats": feats.numpy(),
        "logits": logits.numpy(),
        "heads": np.asarray(heads),
    }
    _save_sd(out, m)
    np.savez(os.path.join(HERE, "refexec_cls_vit.npz"), **out)
    print("refexec_cls_vit:", logits.shape, float(logits.abs().mean()))




def _gen_vit_variant(fname, outname, seed, *, depth=2, width=32, heads=2,
                     image=32, patch=8, use_cls=True, classes=5, **mkw):
    """Shared driver for the full_shot PEFT ViT variants (all timm-style
    VisionTransformer clones differing only in the injected modules)."""
    _install_stubs()
    ref = _load_plain("_ref_" + fname[:-3], os.path.join(FULL, fname))
    m = ref.VisionTransformer(
        img_size=image, patch_size=patch, num_classes=classes,
        embed_dim=width, depth=depth, num_heads=heads, qkv_bias=True,
        pre_norm=True, use_cls_tocken=use_cls, **mkw,
    ).eval()
    rand = _seeded(seed)
    _randomize(m, rand)
    x = rand(2, 3, image, image)
    with torch.no_grad():
        feats = m.forward_features(x)
        logits = m(x)
    if isinstance(feats, tuple):
        feats = feats[0]
    out = {
        "x": x.numpy(),
        "feats": feats.numpy(),
        "logits": logits.numpy(),
        "heads": np.asarray(heads),
        "use_cls": np.asarray(1 if use_cls else 0),
    }
    _save_sd(out, m)
    np.savez(os.path.join(HERE, outname), **out)
    print(f"{outname[:-4]}:", logits.shape, float(logits.abs().mean()))


def gen_vit_variants():
    """Execute every loadable full_shot PEFT ViT variant:

    * cls_vit_lora — supervised pre-scale q/v LoRA (clean reshapes)
    * cls_vit_adapter — post-MLP adapter in EVERY block (:560)
    * cls_vit_adapterdrop_lora — LoRA everywhere, adapter params in every
      block but EXECUTED only at id==11 (:710-714) => depth 12
    * cls_vit_position_bias — RPB with the hardcoded ndim=7 (:80) =>
      49 tokens, so use_cls_tocken=False (the bias cannot broadcast over
      a cls row) and mean pooling
    * cls_vit_cswin — LePE with the qkvo reshape scramble (:96-99) and
      get_lepe's hardcoded 8-head reshape (:90) => heads=8, no cls
    """
    _gen_vit_variant("cls_vit_lora.py", "refexec_vit_lora.npz", 41)
    _gen_vit_variant("cls_vit_adapter.py", "refexec_vit_adapter.npz", 42)
    _gen_vit_variant(
        "cls_vit_adapterdrop_lora.py",
        "refexec_vit_adapterdrop_lora.npz", 43, depth=12,
    )
    _gen_vit_variant(
        "cls_vit_position_bias.py", "refexec_vit_rpb.npz", 44,
        width=16, image=56, use_cls=False,
    )
    _gen_vit_variant(
        "cls_vit_cswin.py", "refexec_vit_cswin.npz", 45,
        heads=8, use_cls=False,
    )


def gen_rexnet(seed=51, wm=0.5, dm=0.5, image=64, classes=5):
    """cls_rexnet.py ReXNetV1 executed whole (:123-185): pins the exact
    channel schedule (ceil depths, stem/inplanes DIVIDED by width_mult
    below 1, no growth on block 0, inplanes += final_ch/depth), the
    partial-channel residual, and ReXNet's own SE (conv+BN+relu+conv,
    channels//12, cls_rexnet.py:72-87)."""
    ref = _load_plain("_ref_cls_rexnet", os.path.join(FULL,
                                                      "cls_rexnet.py"))
    m = ref.ReXNetV1(width_mult=wm, depth_mult=dm, classes=classes).eval()
    rand = _seeded(seed)
    _randomize(m, rand)
    x = rand(2, 3, image, image)
    with torch.no_grad():
        logits = m(x)
    out = {
        "x": x.numpy(),
        "logits": logits.numpy(),
        "wm": np.asarray(wm),
        "dm": np.asarray(dm),
    }
    _save_sd(out, m)
    np.savez(os.path.join(HERE, "refexec_rexnet.npz"), **out)
    print("refexec_rexnet:", logits.shape, float(logits.abs().mean()))


def gen_resnet(seed=52, image=64, classes=5):
    """cls_resnet.py executed whole at R50-family geometry (width 16,
    stem_factor 0.25, stages (1, 1)): stage 1 plain, stage 2 stride 2
    with SELayer and the avg_down (ResNet-D) downsample — pins the
    post-act bottleneck, SE placement (after bn3, before the residual),
    SELayer's bias-free //16 reduction, and the avgpool+1x1 shortcut."""
    lib_dir = os.path.dirname(FULL)  # .../main/lib — so `layers` resolves
    sys.path.insert(0, lib_dir)
    try:
        ref = _load_plain("_ref_cls_resnet",
                          os.path.join(FULL, "cls_resnet.py"))
    finally:
        sys.path.remove(lib_dir)
    RN, Bot = ref.ResNet, ref.Bottleneck
    stage1 = RN.make_layer(
        Bot, 1, 1, avg_down=True, in_channels=16, out_channels=64,
        dropblock=None, bottleneck_channels=16,
    )
    stage2 = RN.make_layer(
        Bot, 1, 2, avg_down=True, in_channels=64, out_channels=128,
        dropblock=None, bottleneck_channels=32, with_se=True,
    )
    m = RN([stage1, stage2], res5_out_channels=128, num_classes=classes,
           stem_factor=0.25).eval()
    rand = _seeded(seed)
    _randomize(m, rand)
    x = rand(2, 3, image, image)
    with torch.no_grad():
        logits = m(x)
    out = {
        "x": x.numpy(),
        "logits": logits.numpy(),
    }
    _save_sd(out, m)
    np.savez(os.path.join(HERE, "refexec_resnet.npz"), **out)
    print("refexec_resnet:", logits.shape, float(logits.abs().mean()))


def gen_swin(seed=53, image=32, patch=4, embed=16, depths=(2, 2),
             heads=(2, 4), window=4, classes=5):
    """cls_swin.py SwinTransformer executed whole (official Swin):
    windowed attention with relative position bias, SHIFTED windows in
    odd blocks (stage 0 at resolution 8 / window 4 exercises the cyclic
    shift + attention mask; stage 1's resolution equals the window so
    shift disables), patch merging, and the final-norm + avgpool head."""
    _install_stubs()
    if "_reffs" not in sys.modules:
        pkg = types.ModuleType("_reffs")
        pkg.__path__ = []
        reg = types.ModuleType("_reffs.registry")

        def register_model(fn=None, **kw):
            if fn is None:
                return lambda f: f
            return fn

        reg.register_model = register_model
        sys.modules["_reffs"] = pkg
        sys.modules["_reffs.registry"] = reg
    spec = importlib.util.spec_from_file_location(
        "_reffs.cls_swin", os.path.join(FULL, "cls_swin.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_reffs.cls_swin"] = mod
    spec.loader.exec_module(mod)
    m = mod.SwinTransformer(
        img_size=image, patch_size=patch, num_classes=classes,
        embed_dim=embed, depths=list(depths), num_heads=list(heads),
        window_size=window, drop_path_rate=0.0,
    ).eval()
    rand = _seeded(seed)
    _randomize(m, rand)
    x = rand(2, 3, image, image)
    with torch.no_grad():
        feats = m.forward_features(x)
        logits = m(x)
    out = {
        "x": x.numpy(),
        "feats": feats.numpy(),
        "logits": logits.numpy(),
        "heads": np.asarray(list(heads)),
        "depths": np.asarray(list(depths)),
        "window": np.asarray(window),
    }
    _save_sd(out, m)
    np.savez(os.path.join(HERE, "refexec_swin.npz"), **out)
    print("refexec_swin:", logits.shape, float(logits.abs().mean()))


def gen_vit_conv(seed=54, image=32, patch=8, embed=32, depth=2, heads=2,
                 classes=5):
    """cls_vit_conv.py executed: blocks with the pw-glu-dw-bn-swish-pw
    conv mixer on the patch grid (:199-216), residual on the LN'd grid,
    and ADD_CLS pooling the mixer response into the cls token (:236-238).
    BN inside the mixer carries running statistics."""
    _install_stubs()
    ref = _load_plain("_ref_cls_vit_conv",
                      os.path.join(FULL, "cls_vit_conv.py"))
    m = ref.VisionTransformer(
        img_size=image, patch_size=patch, num_classes=classes,
        embed_dim=embed, depth=depth, num_heads=heads, qkv_bias=True,
        has_attn=True, has_mlp=True, has_conv=True,
        conv_ratio=1.0, add_cls=True,
    ).eval()
    rand = _seeded(seed)
    _randomize(m, rand)
    x = rand(2, 3, image, image)
    with torch.no_grad():
        feats = m.forward_features(x)
        logits = m(x)
    if isinstance(feats, tuple):
        feats = feats[0]
    out = {
        "x": x.numpy(),
        "feats": feats.numpy(),
        "logits": logits.numpy(),
        "heads": np.asarray(heads),
    }
    _save_sd(out, m)
    np.savez(os.path.join(HERE, "refexec_vit_conv.npz"), **out)
    print("refexec_vit_conv:", logits.shape, float(logits.abs().mean()))


def _load_few_shot_eval(fname):
    """Package-context loader for few_shot evaluation files with
    relative .feature/..optim/..evaluation.metric imports."""
    _install_stubs()
    for name, attrs in (
        ("_refpkg", {}),
        ("_refpkg.evaluation", {}),
        ("_refpkg.evaluation.feature",
         {"FeatureData": object, "get_model": lambda *a, **k: None}),
        ("_refpkg.evaluation.metric",
         {"get_metric": lambda *a, **k: None}),
        ("_refpkg.optim", {"build_optimizer": lambda *a, **k: None}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            mod.__path__ = []
            sys.modules[name] = mod
    name = "_refpkg.evaluation." + fname[:-3]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(FEW, fname)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def gen_clip_rn(seed=55, image=32, width=8, embed=16):
    """adapter_model.py ModifiedResNet executed whole (:96-160 in
    model.py, identical class in adapter_model.py which loads without
    the _add_docstr clash): 3-conv anti-aliased stem, avgpool-in-block
    bottlenecks, AttentionPool2d with the prepended mean token."""
    ref = _load_plain("_ref_adapter_model_rn",
                      os.path.join(FEW, "adapter_model.py"))
    m = ref.ModifiedResNet(
        layers=(1, 1, 1, 1), output_dim=embed,
        heads=width * 32 // 64, input_resolution=image, width=width,
    ).eval()
    rand = _seeded(seed)
    _randomize(m, rand)
    x = rand(2, 3, image, image)
    with torch.no_grad():
        out_feats = m(x)
    out = {
        "x": x.numpy(),
        "out": out_feats.numpy(),
        "width": np.asarray(width),
        "embed": np.asarray(embed),
        "image": np.asarray(image),
    }
    for k, v in m.state_dict().items():
        out["sd__visual__" + k.replace(".", "__")] = v.detach().numpy()
    np.savez(os.path.join(HERE, "refexec_clip_rn.npz"), **out)
    print("refexec_clip_rn:", out_feats.shape,
          float(out_feats.abs().mean()))


def gen_transformer_probe(seed=56, image=32, patch=8, embed=32, depth=2,
                          heads=2, classes=5):
    """transformer_classifier.py executed: the timm ViT with depth+1
    blocks — the appended 13th block is the only trainable part
    (:338-347, filter 'blocks.12' :563) but forward-wise it's an extra
    plain block; pins our spec.extra_block forward."""
    ref = _load_few_shot_eval("transformer_classifier.py")
    m = ref.VisionTransformer(
        img_size=image, patch_size=patch, num_classes=classes,
        embed_dim=embed, depth=depth, num_heads=heads, qkv_bias=True,
    ).eval()
    rand = _seeded(seed)
    _randomize(m, rand)
    x = rand(2, 3, image, image)
    with torch.no_grad():
        feats = m.forward_features(x)
        logits = m(x)
    if isinstance(feats, tuple):
        feats = feats[0]
    out = {
        "x": x.numpy(),
        "feats": feats.numpy(),
        "logits": logits.numpy(),
        "heads": np.asarray(heads),
        "depth": np.asarray(depth),
    }
    _save_sd(out, m)
    np.savez(os.path.join(HERE, "refexec_transformer_probe.npz"), **out)
    print("refexec_transformer_probe:", logits.shape,
          float(logits.abs().mean()))


class _AttrDict(dict):
    """dict with attribute access — cls_hrnet reads its spec both ways
    (stages_spec.NUM_MODULES and stages_spec['BLOCK'])."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def gen_hrnet(seed=57, image=64, w=8, classes=5):
    """cls_hrnet.py HighResolutionNet executed whole at W8 geometry with
    3 stages (branches 2/3/4): stem, 4-bottleneck layer1, transitions,
    basic-block branches, the multi-resolution fuse layers (1x1+BN+
    nearest-up and stride-2 chains), and the incre/downsamp/proj head
    (whose convs, uniquely, carry biases)."""
    lib_dir = os.path.dirname(FULL)
    sys.path.insert(0, lib_dir)
    try:
        ref = _load_plain("_ref_cls_hrnet",
                          os.path.join(FULL, "cls_hrnet.py"))
    finally:
        sys.path.remove(lib_dir)
    spec = _AttrDict(
        WITH_SE=False,
        STAGES=_AttrDict(
            NUM_STAGES=3,
            NUM_MODULES=[1, 1, 1],
            NUM_BRANCHES=[2, 3, 4],
            NUM_BLOCKS=[[4, 4], [4, 4, 4], [4, 4, 4, 4]],
            NUM_CHANNELS=[[w, 2 * w], [w, 2 * w, 4 * w],
                          [w, 2 * w, 4 * w, 8 * w]],
            BLOCK=["BASIC", "BASIC", "BASIC"],
            FUSE_METHOD=["SUM", "SUM", "SUM"],
        ),
        HEAD=_AttrDict(
            BLOCK=["BOTTLENECK"] * 4,
            NUM_CHANNELS=[32, 64, 128, 256],
            NUM_CHANNELS_PROJ=2048,
        ),
    )
    cfg = _AttrDict(
        MODEL=_AttrDict(SPEC=spec, NUM_CLASSES=classes)
    )
    m = ref.HighResolutionNet(cfg).eval()
    rand = _seeded(seed)
    _randomize(m, rand)
    x = rand(2, 3, image, image)
    with torch.no_grad():
        logits = m(x)
    out = {
        "x": x.numpy(),
        "logits": logits.numpy(),
        "w": np.asarray(w),
    }
    _save_sd(out, m)
    np.savez(os.path.join(HERE, "refexec_hrnet.npz"), **out)
    print("refexec_hrnet:", logits.shape, float(logits.abs().mean()))


def gen_ssl_swin(seed=58, image=32, patch=4, embed=16, depths=(2, 2),
                 heads=(2, 4), window=4, n_last=3):
    """ssl_swin.py SwinTransformer executed (the MoBY backbone,
    :574-956): ape on, plain forward (avg-pooled features) AND the SSL
    linear-eval protocol forward_return_n_last_blocks(n=3) where only
    last-stage blocks receive the final norm (:803-805)."""
    _install_stubs()
    if "_reffs" not in sys.modules:
        pkg = types.ModuleType("_reffs")
        pkg.__path__ = []
        reg = types.ModuleType("_reffs.registry")
        reg.register_model = lambda fn=None, **kw: (
            fn if fn is not None else (lambda f: f)
        )
        sys.modules["_reffs"] = pkg
        sys.modules["_reffs.registry"] = reg
    spec = importlib.util.spec_from_file_location(
        "_reffs.ssl_swin", os.path.join(FULL, "ssl_swin.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_reffs.ssl_swin"] = mod
    spec.loader.exec_module(mod)
    m = mod.SwinTransformer(
        img_size=image, patch_size=patch, num_classes=5,
        embed_dim=embed, depths=list(depths), num_heads=list(heads),
        window_size=window, drop_path_rate=0.0, ape=True,
    ).eval()
    rand = _seeded(seed)
    _randomize(m, rand)
    x = rand(2, 3, image, image)
    with torch.no_grad():
        feats = m.forward_features(x) if hasattr(
            m, "forward_features") else None
        nlast = m.forward_return_n_last_blocks(
            x, n=n_last, depth=list(depths)
        )
    out = {
        "x": x.numpy(),
        "nlast": nlast.numpy(),
        "heads": np.asarray(list(heads)),
        "depths": np.asarray(list(depths)),
        "window": np.asarray(window),
        "n_last": np.asarray(n_last),
    }
    if feats is not None:
        out["feats"] = feats.numpy()
    _save_sd(out, m)
    np.savez(os.path.join(HERE, "refexec_ssl_swin.npz"), **out)
    print("refexec_ssl_swin:", nlast.shape, float(nlast.abs().mean()))


def gen_resnet_d(seed=61, image=32, classes=5):
    """cls_resnetD.py executed whole: deep stem (3x3 s2/s1/s2, NO
    maxpool), PreActBottleneck (act0 on the input, downsample from
    act0's output, bn3 AFTER the residual add), DYReLU2 dynamic
    activations everywhere (stem acts, block acts, the trailing
    ``final`` act), SE on stage 2, avg_down shortcuts.  DropBlock stays
    None (eval-mode identity); its mask math is pinned statistically in
    tests/test_dropblock.py instead."""
    lib_dir = os.path.dirname(FULL)
    sys.path.insert(0, lib_dir)
    try:
        ref = _load_plain("_ref_cls_resnetD",
                          os.path.join(FULL, "cls_resnetD.py"))
    finally:
        sys.path.remove(lib_dir)
    dy_cfg = types.SimpleNamespace(
        ENABLE=True, REDUCTION=4, LAMBDA_A=1.0, K2=True, USE_BIAS=True,
        INIT_A=[1.0, 0.0], INIT_B=[0.0, 0.0],
    )
    RN = ref.ResNetD
    stage1 = RN.make_layer(
        ref.PreActBottleneck, 1, 1, avg_down=True, in_channels=64,
        out_channels=256, dropblock=None, bottleneck_channels=64,
        dy_relu_cfg=dy_cfg,
    )
    stage2 = RN.make_layer(
        ref.PreActBottleneck, 1, 2, avg_down=True, in_channels=256,
        out_channels=512, dropblock=None, bottleneck_channels=128,
        with_se=True, dy_relu_cfg=dy_cfg,
    )
    m = RN([stage1, stage2], res5_out_channels=512, deep_stem=True,
           num_classes=classes, dy_relu=dy_cfg)
    rand = _seeded(seed)
    _randomize(m, rand)
    # a couple of train-mode passes so the BN running stats are
    # non-trivial before the pinned eval forward
    m.train()
    with torch.no_grad():
        for _ in range(2):
            m(rand(2, 3, image, image))
    m.eval()
    x = rand(2, 3, image, image)
    with torch.no_grad():
        logits = m(x)
    out = {"x": x.numpy(), "logits": logits.numpy()}
    _save_sd(out, m)
    np.savez(os.path.join(HERE, "refexec_resnet_d.npz"), **out)
    print("refexec_resnet_d:", logits.shape, float(logits.abs().mean()))


def _gen_hrnet_v(name, fname, cfg_kw, seed, image=64, classes=5):
    """Execute one cls_hrnet_v{2,2_share,3,4} whole and pin it."""
    lib_dir = os.path.dirname(FULL)
    sys.path.insert(0, lib_dir)
    try:
        ref = _load_plain(f"_ref_{name}", os.path.join(FULL, f"{name}.py"))
    finally:
        sys.path.remove(lib_dir)
    cfg = _AttrDict(MODEL=_AttrDict(NUM_CLASSES=classes, **cfg_kw))
    m = ref.HighResolutionNet(cfg).eval()
    rand = _seeded(seed)
    _randomize(m, rand)
    x = rand(2, 3, image, image)
    with torch.no_grad():
        logits = m(x)
    out = {"x": x.numpy(), "logits": logits.numpy()}
    _save_sd(out, m)
    np.savez(os.path.join(HERE, fname), **out)
    print(f"{fname[:-4]}:", logits.shape, float(logits.abs().mean()))


def _hrnet_v_stages(block, chans):
    return _AttrDict(
        NUM_STAGES=len(chans),
        NUM_MODULES=[1] * len(chans),
        NUM_BRANCHES=[len(c) for c in chans],
        NUM_BLOCKS=[[2] * len(c) for c in chans],
        NUM_CHANNELS=[list(c) for c in chans],
        BLOCK=[block] * len(chans),
        FUSE_METHOD=["SUM"] * len(chans),
    )


def gen_hrnet_v2(seed=61):
    """cls_hrnet_v2.py whole: SE-bottleneck stem to 256, per-stage
    channel-changing transitions read from the branch's OWN resolution
    (:543-546), branches whose LAST block drops its relu (:223-225), the
    chained fuse (relu'd running sums, :277-311), and the
    with_relu=False BOTTLENECK incre head (:387-388)."""
    spec = _AttrDict(
        WITH_SE=True,
        STAGES=_hrnet_v_stages("BASIC", [(8, 16), (9, 18, 36),
                                         (10, 20, 40, 80)]),
        HEAD=_AttrDict(BLOCK=["BOTTLENECK"] * 4,
                       NUM_CHANNELS=[8, 16, 32, 64],
                       NUM_CHANNELS_PROJ=128),
    )
    _gen_hrnet_v("cls_hrnet_v2", "refexec_hrnet_v2.npz",
                 dict(SPEC=spec), seed)


def gen_hrnet_v2_share(seed=62):
    """cls_hrnet_v2_share.py whole: branch modules weight-shared across
    resolutions via cumulative channel splits (:164-174,302-310)."""
    spec = _AttrDict(
        WITH_SE=True,
        STAGES=_hrnet_v_stages("BASIC", [(8, 16), (8, 16, 32),
                                         (8, 16, 32, 64)]),
        HEAD=_AttrDict(BLOCK=["BOTTLENECK"] * 4,
                       NUM_CHANNELS=[8, 16, 32, 64],
                       NUM_CHANNELS_PROJ=128),
    )
    _gen_hrnet_v("cls_hrnet_v2_share", "refexec_hrnet_v2_share.npz",
                 dict(SPEC=spec), seed)


def gen_hrnet_v3(seed=63):
    """cls_hrnet_v3.py whole: 3->16->24 conv stem + 2 inverted residuals,
    INVERTED branches (bias-carrying convs, SE(reduction=4) on the
    expanded width), transitions always fed from the LAST branch."""
    extra = _AttrDict(
        WITH_SE=True,
        STAGES_SPEC=_hrnet_v_stages("INVERTED", [(8, 16), (8, 16, 32),
                                                 (8, 16, 32, 64)]),
        HEAD_SPEC=_AttrDict(BLOCK=["INVERTED"] * 4,
                            NUM_CHANNELS=[16, 32, 64, 128],
                            NUM_CHANNELS_PROJ=256),
    )
    _gen_hrnet_v("cls_hrnet_v3", "refexec_hrnet_v3.npz",
                 dict(EXTRA=extra), seed)


def gen_hrnet_v4(seed=64, stem="conv32s2maxpools2inv32e6x1",
                 fname="refexec_hrnet_v4.npz"):
    """cls_hrnet_v4.py whole at the flagship STEM_SPEC (w18s_stemV3
    experiment family)."""
    extra = _AttrDict(
        WITH_SE=True,
        STEM_SPEC=stem,
        STAGES_SPEC=_hrnet_v_stages("INVERTED", [(8, 16), (8, 16, 32),
                                                 (8, 16, 32, 64)]),
        HEAD_SPEC=_AttrDict(BLOCK=["INVERTED"] * 4,
                            NUM_CHANNELS=[16, 32, 64, 128],
                            NUM_CHANNELS_PROJ=256),
    )
    _gen_hrnet_v("cls_hrnet_v4", fname, dict(EXTRA=extra), seed)


def gen_hrnet_v4_wose(seed=65):
    """The 'inv32e2wosex1' stem: a raw InvertedResidual(exp=2) whose SE,
    despite the name, is ON (constructor default, cls_hrnet_v4.py:482)."""
    gen_hrnet_v4(seed, "conv32s2maxpools2inv32e2wosex1",
                 "refexec_hrnet_v4_wose.npz")


if __name__ == "__main__":
    gen_clip_model()
    gen_lora_clip_model()
    gen_cls_vit()
    gen_vit_variants()
    gen_rexnet()
    gen_resnet()
    gen_resnet_d()
    gen_swin()
    gen_vit_conv()
    gen_clip_rn()
    gen_transformer_probe()
    gen_hrnet()
    gen_ssl_swin()
    gen_hrnet_v2()
    gen_hrnet_v2_share()
    gen_hrnet_v3()
    gen_hrnet_v4()
    gen_hrnet_v4_wose()
