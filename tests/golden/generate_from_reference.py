"""Generate golden fixtures by EXECUTING the reference implementation.

Where generate_golden.py is an independent torch re-implementation of the
reference's quirky math (written from reading the code), this script runs
the reference's OWN modules — loaded straight from /root/reference with
importlib — and records their outputs.  The resulting refexec_*.npz twins
use the same key schema as the hand-written fixtures, and
test_golden_quirks.py parametrizes over both: every quirk is then pinned
twice, once against an independent reading and once against the executed
reference (VERDICT r2 weak #9).

Usage (offline, CPU):

    PYTHONPATH= python tests/golden/generate_from_reference.py --all

Each fixture runs in its own subprocess: lora_model.py and model.py both
call torch._C._add_docstr on the same functional (a one-per-process
operation), and the kadaptation fixture materializes the reference's
hardcoded (768, 768, 768) phm_rule (~1.7 GB).

Reference executability notes (why this is possible offline):
* adapter_model.py / lora_model.py / compacter_model.py import only
  torch / numpy / transformers — all present in this image.
* LePE.py, RPB.py (few_shot) and cls_vit_lora_adapter.py (full_shot)
  additionally want timm.models.layers (DropPath, trunc_normal_),
  torch._six, and the package-relative .feature/.optim/.metric modules;
  none of those symbols participate in the forward math, so they are
  satisfied with minimal stubs below.
* The LoRA fixtures use batch=1, heads=1: the reference reshapes its
  (N, B, C) delta straight to (B*H, N, C/H) (lora_model.py:730-731), a
  layout scramble for B*H > 1 that our framework deliberately does not
  reproduce (PARITY.md); at B=H=1 the reshape is the identity, so the
  genuine reference forward exercises the post-scale-q quirk
  (lora_model.py:719-731) with the scramble neutralized.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import types

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"
FEW = os.path.join(REF, "few_shot", "vision_benchmark", "evaluation")
FULL = os.path.join(REF, "full_shot", "main", "lib", "models")


# ---------------------------------------------------------------- loading

def _install_stubs() -> None:
    """Satisfy imports that play no part in the forward math."""
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):  # eval-mode identity
                return x

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a, b)
            return tensor

        layers.DropPath = DropPath
        layers.trunc_normal_ = trunc_normal_
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if "torch._six" not in sys.modules:
        import collections.abc as container_abcs

        six = types.ModuleType("torch._six")
        six.container_abcs = container_abcs
        sys.modules["torch._six"] = six


def _load_plain(name: str, path: str):
    """Load a reference file with no package context (absolute imports)."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_few_shot(fname: str):
    """Load a few_shot/evaluation file that does package-relative imports
    (.feature / ..optim / ..evaluation.metric)."""
    _install_stubs()
    pkg = types.ModuleType("_refpkg")
    pkg.__path__ = []
    ev = types.ModuleType("_refpkg.evaluation")
    ev.__path__ = []
    feature = types.ModuleType("_refpkg.evaluation.feature")
    feature.FeatureData = object
    feature.get_model = lambda *a, **k: None
    metric = types.ModuleType("_refpkg.evaluation.metric")
    metric.get_metric = lambda *a, **k: None
    optim = types.ModuleType("_refpkg.optim")
    optim.build_optimizer = lambda *a, **k: None
    sys.modules.update(
        {
            "_refpkg": pkg,
            "_refpkg.evaluation": ev,
            "_refpkg.evaluation.feature": feature,
            "_refpkg.evaluation.metric": metric,
            "_refpkg.optim": optim,
        }
    )
    name = "_refpkg.evaluation." + fname[:-3]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(FEW, fname)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_full_shot(fname: str):
    _install_stubs()
    return _load_plain("_reffull_" + fname[:-3], os.path.join(FULL, fname))


def _seeded(seed: int):
    g = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(*shape, generator=g, dtype=torch.float32) * 0.2

    return rand


def _randomize(module: torch.nn.Module, rand) -> None:
    """Overwrite every parameter with seeded randoms of healthy magnitude
    (reference inits zero the LoRA up-projections and shrink PHM rules,
    which would make a parity fixture insensitive to half the math).
    LayerNorm weights get +1 so the normalization stays well-scaled."""
    with torch.no_grad():
        for name, p in module.named_parameters():
            v = rand(*p.shape)
            if name.endswith("weight") and p.dim() == 1:
                v = v + 1.0
            p.copy_(v)


# --------------------------------------------------------------- fixtures

def gen_adapter_double_mlp(b=2, n=5, d=128, h=4, seed=11):
    """CLIP ResidualAttentionBlock with the bottleneck adapter
    (adapter_model.py:298-342) — executes the double-mlp(ln_2(x))
    residual quirk verbatim.  Adapter down_sample is hardcoded 64."""
    ref = _load_plain(
        "_ref_adapter_model", os.path.join(FEW, "adapter_model.py")
    )
    rand = _seeded(seed)
    blk = ref.ResidualAttentionBlock(d, h, kattention=True).eval()
    _randomize(blk, rand)
    x = rand(b, n, d)
    with torch.no_grad():
        out = blk(x.permute(1, 0, 2)).permute(1, 0, 2)
    sd = {k: v.detach() for k, v in blk.state_dict().items()}
    np.savez(
        os.path.join(HERE, "refexec_adapter_double_mlp.npz"),
        x=x.numpy(),
        ln1_w=sd["ln_1.weight"].numpy(), ln1_b=sd["ln_1.bias"].numpy(),
        w_qkv=sd["attn.in_proj_weight"].numpy(),
        b_qkv=sd["attn.in_proj_bias"].numpy(),
        w_out=sd["attn.out_proj.weight"].numpy(),
        b_out=sd["attn.out_proj.bias"].numpy(),
        ln2_w=sd["ln_2.weight"].numpy(), ln2_b=sd["ln_2.bias"].numpy(),
        w_fc=sd["mlp.c_fc.weight"].numpy(),
        b_fc=sd["mlp.c_fc.bias"].numpy(),
        w_proj=sd["mlp.c_proj.weight"].numpy(),
        b_proj=sd["mlp.c_proj.bias"].numpy(),
        lna_w=sd["adapter.adapter_norm_before.weight"].numpy(),
        lna_b=sd["adapter.adapter_norm_before.bias"].numpy(),
        w_down=sd["adapter.adapter_down.1.weight"].numpy(),
        b_down=sd["adapter.adapter_down.1.bias"].numpy(),
        w_up=sd["adapter.adapter_up.weight"].numpy(),
        b_up=sd["adapter.adapter_up.bias"].numpy(),
        out=out.numpy(),
        heads=np.asarray(h),
        adapter_dim=np.asarray(64),
    )
    print("refexec_adapter_double_mlp:", out.shape,
          float(out.abs().mean()))


def _lora_module(ref, d, moe=False, group=2, lam=1.5, seed=12):
    rand = _seeded(seed)
    m = ref.MultiheadAttention(d, 1).eval()  # B=H=1: see module docstring
    _randomize(m, rand)
    if moe:
        experts = m.lora_attn_dim // group
        m.lora_moe_group = group
        m.lora_moe_act = "sigmoid"
        m.lora_moe_lambda = lam
        m.q_moe_adapter1 = torch.nn.Linear(d, experts, bias=False)
        m.v_moe_adapter1 = torch.nn.Linear(d, experts, bias=False)
        with torch.no_grad():
            m.q_moe_adapter1.weight.copy_(rand(experts, d))
            m.v_moe_adapter1.weight.copy_(rand(experts, d))
        m.config = types.SimpleNamespace(lora_moe_softmax=0)
    return m, rand


def gen_lora_post_scale_q(n=5, d=16, seed=12):
    """lora_model.MultiheadAttention forward (lora_model.py:543-771):
    rank-4 alpha-128 q/v LoRA deltas with q pre-scaled by 1/sqrt(E)
    before the delta lands (the post-scale-q quirk).  B=H=1 neutralizes
    the (N,B,C)->(B*H,N,C/H) reshape scramble."""
    ref = _load_plain(
        "_ref_lora_model", os.path.join(FEW, "lora_model.py")
    )
    m, rand = _lora_module(ref, d, seed=seed)
    x = rand(1, n, d)
    q = x.permute(1, 0, 2)  # (N, B, C)
    with torch.no_grad():
        out = m(q, q, q, need_weights=False)[0].permute(1, 0, 2)
    sd = m.state_dict()
    np.savez(
        os.path.join(HERE, "refexec_lora_post_scale_q.npz"),
        x=x.numpy(),
        w_qkv=sd["in_proj_weight"].numpy(),
        b_qkv=sd["in_proj_bias"].numpy(),
        a_q=sd["q_proj_adapter1.weight"].numpy(),
        b_q=sd["q_proj_adapter2.weight"].numpy(),
        a_v=sd["v_proj_adapter1.weight"].numpy(),
        b_v=sd["v_proj_adapter2.weight"].numpy(),
        w_out=sd["out_proj.weight"].numpy(),
        b_out=sd["out_proj.bias"].numpy(),
        out=out.numpy(),
        heads=np.asarray(1),
        rank=np.asarray(m.lora_attn_dim),
        alpha=np.asarray(float(m.lora_attn_alpha)),
    )
    print("refexec_lora_post_scale_q:", out.shape,
          float(out.abs().mean()))


def gen_lora_moe_gate(n=5, d=16, group=2, lam=1.5, seed=13):
    """adapter_forward with g_weight (lora_model.py:491-515): the dormant
    MoE gate re-enabled exactly as the reference's lora_moe==1 branch
    would (lora_model.py:483-488), run through the genuine forward."""
    ref = _load_plain(
        "_ref_lora_model", os.path.join(FEW, "lora_model.py")
    )
    m, rand = _lora_module(ref, d, moe=True, group=group, lam=lam,
                           seed=seed)
    x = rand(1, n, d)
    q = x.permute(1, 0, 2)
    with torch.no_grad():
        out = m(q, q, q, need_weights=False)[0].permute(1, 0, 2)
    sd = m.state_dict()
    np.savez(
        os.path.join(HERE, "refexec_lora_moe_gate.npz"),
        x=x.numpy(),
        w_qkv=sd["in_proj_weight"].numpy(),
        b_qkv=sd["in_proj_bias"].numpy(),
        a_q=sd["q_proj_adapter1.weight"].numpy(),
        b_q=sd["q_proj_adapter2.weight"].numpy(),
        g_q=sd["q_moe_adapter1.weight"].numpy(),
        a_v=sd["v_proj_adapter1.weight"].numpy(),
        b_v=sd["v_proj_adapter2.weight"].numpy(),
        g_v=sd["v_moe_adapter1.weight"].numpy(),
        w_out=sd["out_proj.weight"].numpy(),
        b_out=sd["out_proj.bias"].numpy(),
        out=out.numpy(),
        heads=np.asarray(1),
        rank=np.asarray(m.lora_attn_dim),
        group=np.asarray(group),
        alpha=np.asarray(float(m.lora_attn_alpha)),
        lam=np.asarray(lam),
    )
    print("refexec_lora_moe_gate:", out.shape, float(out.abs().mean()))


def gen_compacter_phm_adapter(b=2, n=5, d=384, seed=14):
    """HyperComplexAdapter executed verbatim (compacter_model.py:358-427).
    The reference hardcodes reduction 12, down phm_dim 32, up phm_dim 4,
    so d=384 is the smallest width divisible through the whole chain."""
    ref = _load_plain(
        "_ref_compacter_model", os.path.join(FEW, "compacter_model.py")
    )
    rand = _seeded(seed)
    m = ref.HyperComplexAdapter(d).eval()
    _randomize(m, rand)
    x = rand(b, n, d)
    with torch.no_grad():
        out = m(x)
    sd = m.state_dict()
    np.savez(
        os.path.join(HERE, "refexec_compacter_phm_adapter.npz"),
        x=x.numpy(),
        ln_w=sd["adapter_norm_before.weight"].numpy(),
        ln_b=sd["adapter_norm_before.bias"].numpy(),
        rule_dn=sd["down_PHM.phm_rule"].numpy(),
        w_dn=sd["down_PHM.W"].numpy(),
        b_dn=sd["down_PHM.b"].numpy(),
        rule_up=sd["up_sampler.phm_rule"].numpy(),
        w_up=sd["up_sampler.W"].numpy(),
        b_up=sd["up_sampler.b"].numpy(),
        out=out.numpy(),
        reduction=np.asarray(12),
        phm_dim_down=np.asarray(32),
        phm_dim_up=np.asarray(4),
    )
    print("refexec_compacter_phm_adapter:", out.shape,
          float(out.abs().mean()))


def gen_lepe_attention(b=2, grid=4, d=16, h=4, seed=15):
    """LePE Attention executed verbatim (LePE.py:84-144): depthwise get_v
    on the (B, C, H, W)-reshaped v, added to attn @ v pre-merge."""
    ref = _load_few_shot("LePE.py")
    rand = _seeded(seed)
    m = ref.Attention(d, num_heads=h, qkv_bias=True).eval()
    _randomize(m, rand)
    x = rand(b, grid * grid, d)
    with torch.no_grad():
        out, _ = m(x)
    sd = m.state_dict()
    np.savez(
        os.path.join(HERE, "refexec_lepe_attention.npz"),
        x=x.numpy(),
        w_qkv=sd["qkv.weight"].numpy(), b_qkv=sd["qkv.bias"].numpy(),
        w_v=sd["get_v.weight"].numpy(), bias_v=sd["get_v.bias"].numpy(),
        w_out=sd["proj.weight"].numpy(), b_out=sd["proj.bias"].numpy(),
        out=out.numpy(),
        heads=np.asarray(h),
        grid=np.asarray(grid),
    )
    print("refexec_lepe_attention:", out.shape, float(out.abs().mean()))


def gen_rpb_attention(b=2, d=8, h=2, seed=16):
    """RPB Attention executed verbatim (RPB.py:84-160).  ndim is
    hardcoded 7, so the fixture runs the full 49-token window."""
    ref = _load_few_shot("RPB.py")
    rand = _seeded(seed)
    m = ref.Attention(d, num_heads=h, qkv_bias=True).eval()
    _randomize(m, rand)
    grid = int(m.ndim)
    x = rand(b, grid * grid, d)
    with torch.no_grad():
        out, _ = m(x)
    sd = m.state_dict()
    np.savez(
        os.path.join(HERE, "refexec_rpb_attention.npz"),
        x=x.numpy(),
        w_qkv=sd["qkv.weight"].numpy(), b_qkv=sd["qkv.bias"].numpy(),
        table=sd["relative_position_bias_table"].numpy(),
        w_out=sd["proj.weight"].numpy(), b_out=sd["proj.bias"].numpy(),
        out=out.numpy(),
        heads=np.asarray(h),
        grid=np.asarray(grid),
    )
    print("refexec_rpb_attention:", out.shape, float(out.abs().mean()))


def gen_shared_qkv_adapter(b=2, n=5, d=128, h=2, seed=17):
    """full_shot cls_vit_lora_adapter Attention executed verbatim
    (cls_vit_lora_adapter.py:150-200): ONE Adapter(64) applied to each of
    q, k, v after the head split — head_dim must be 64."""
    ref = _load_full_shot("cls_vit_lora_adapter.py")
    rand = _seeded(seed)
    m = ref.Attention(d, num_heads=h, qkv_bias=True).eval()
    _randomize(m, rand)
    x = rand(b, n, d)
    with torch.no_grad():
        out, _ = m(x)
    sd = m.state_dict()
    np.savez(
        os.path.join(HERE, "refexec_shared_qkv_adapter.npz"),
        x=x.numpy(),
        w_qkv=sd["qkv.weight"].numpy(), b_qkv=sd["qkv.bias"].numpy(),
        ln_w=sd["adapter.adapter_norm_before.weight"].numpy(),
        ln_b=sd["adapter.adapter_norm_before.bias"].numpy(),
        w_down=sd["adapter.adapter_down.1.weight"].numpy(),
        b_down=sd["adapter.adapter_down.1.bias"].numpy(),
        w_up=sd["adapter.adapter_up.weight"].numpy(),
        b_up=sd["adapter.adapter_up.bias"].numpy(),
        w_out=sd["proj.weight"].numpy(), b_out=sd["proj.bias"].numpy(),
        out=out.numpy(),
        heads=np.asarray(h),
    )
    print("refexec_shared_qkv_adapter:", out.shape,
          float(out.abs().mean()))


def kadaptation_tensors(b=2, n=5, d=768, h=12, seed=18):
    """Deterministic tensors for the kadaptation fixture, shared between
    the generator and the test so the (768,768,768) phm_rule never has to
    live in an npz (it alone is ~1.7 GB).  Returns a dict of torch
    tensors; the generator feeds them through the reference Attention,
    the test through the flax module, and only `out` is stored."""
    rand = _seeded(seed)
    return {
        "x": rand(b, n, d),
        "w_qkv": rand(3 * d, d),
        "b_qkv": rand(3 * d),
        "rule": rand(d, d, d) * 0.05,
        "l1": rand(d, 1, 1),
        "r1": rand(d, 1, 1),
        "l2": rand(d, 1, 1),
        "r2": rand(d, 1, 1),
        "w_out": rand(d, d),
        "b_out": rand(d),
        "heads": h,
        "phm_dim": d,
        "phm_rank": 1,
    }


def gen_kadaptation_kron_attn(seed=18):
    """Supervised KAdaptation Attention executed verbatim
    (kadaptation.py:117-244): shared (768,768,768) phm_rule, rank-1
    W_left/W_right factors, pre-scale q/v deltas, dead phmb bias.
    phm_dim=768 is hardcoded (:143), so this runs at the real width —
    the npz stores only the output; the test regenerates the inputs from
    kadaptation_tensors()."""
    ref = _load_few_shot("kadaptation.py")
    t = kadaptation_tensors(seed=seed)
    d, h = t["x"].shape[-1], t["heads"]
    m = ref.Attention(d, num_heads=h, qkv_bias=True).eval()
    with torch.no_grad():
        m.qkv.weight.copy_(t["w_qkv"])
        m.qkv.bias.copy_(t["b_qkv"])
        m.phm_rule.copy_(t["rule"])
        m.W_left1.copy_(t["l1"])
        m.W_right1.copy_(t["r1"])
        m.W_left2.copy_(t["l2"])
        m.W_right2.copy_(t["r2"])
        m.phmb.zero_()  # dead param (matvec bias commented out, :100)
        m.proj.weight.copy_(t["w_out"])
        m.proj.bias.copy_(t["b_out"])
        out, _ = m(t["x"])
    np.savez(
        os.path.join(HERE, "refexec_kadaptation_kron_attn.npz"),
        out=out.numpy(),
        seed=np.asarray(seed),
        heads=np.asarray(h),
        phm_dim=np.asarray(t["phm_dim"]),
        phm_rank=np.asarray(t["phm_rank"]),
    )
    print("refexec_kadaptation_kron_attn:", out.shape,
          float(out.abs().mean()))


GENERATORS = {
    "adapter_double_mlp": gen_adapter_double_mlp,
    "lora_post_scale_q": gen_lora_post_scale_q,
    "lora_moe_gate": gen_lora_moe_gate,
    "compacter_phm_adapter": gen_compacter_phm_adapter,
    "lepe_attention": gen_lepe_attention,
    "rpb_attention": gen_rpb_attention,
    "shared_qkv_adapter": gen_shared_qkv_adapter,
    "kadaptation_kron_attn": gen_kadaptation_kron_attn,
}


def main(argv):
    names = list(GENERATORS) if "--all" in argv else [
        a for a in argv if not a.startswith("-")
    ]
    if "--child" in argv:
        for name in names:
            GENERATORS[name]()
        return
    failed = []
    for name in names:
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__), "--child", name]
        )
        if rc != 0:
            failed.append(name)
    if failed:
        raise SystemExit(f"failed: {failed}")


if __name__ == "__main__":
    main(sys.argv[1:])
