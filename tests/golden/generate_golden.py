"""Generate golden arrays for the reference's PEFT quirks.

Run once (CPU, deterministic) and check the .npz files in:

    PYTHONPATH= python tests/golden/generate_golden.py

The math is an independent torch re-implementation of the two quirky
reference computations, written from reading the reference code — NOT an
import of it:

* post-scale-q LoRA attention (evaluation/lora_model.py:719-738):
  q is scaled by 1/sqrt(head_dim) BEFORE the LoRA delta is added, so the
  delta enters the scores unscaled; adapter_forward (:491-515) applies
  alpha/r on the up-projection.  NOTE the reference then reshapes the
  (N, B, C) delta straight to (B*H, N, C/H) without a permute — a layout
  scramble we deliberately do NOT reproduce (documented in PARITY.md);
  the golden uses the proper per-head layout with the pre-scale quirk.
* double-mlp adapter residual (evaluation/adapter_model.py:330-342):
  x = x + adapter(mlp(ln_2(x))) where the adapter's return already
  includes +mlp_out — the MLP output is effectively counted once inside
  the adapter residual, and the adapter path replaces the plain +mlp.
  Adapter = LN -> down -> relu -> up, +input (adapter_model.py:204-296).
"""

import os

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))


def quick_gelu(x):
    return x * torch.sigmoid(1.702 * x)


def gen_lora_post_scale_q(seed=0, b=2, n=5, d=16, h=4, r=2, alpha=8.0):
    g = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(*shape, generator=g, dtype=torch.float32) * 0.2

    x = rand(b, n, d)
    w_qkv, b_qkv = rand(3 * d, d), rand(3 * d)
    a_q, b_q = rand(r, d), rand(d, r)
    a_v, b_v = rand(r, d), rand(d, r)
    w_out, b_out = rand(d, d), rand(d)

    hd = d // h
    qkv = x @ w_qkv.T + b_qkv
    q, k, v = qkv.split(d, dim=-1)
    scale_factor = alpha / r
    dq = (x @ a_q.T) @ b_q.T * scale_factor
    dv = (x @ a_v.T) @ b_v.T * scale_factor
    # the quirk: q is pre-scaled, the delta is not (lora_model.py:719-731)
    q = q / hd**0.5 + dq
    v = v + dv

    def heads(t):
        return t.reshape(b, n, h, hd).permute(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    attn = torch.softmax(qh @ kh.transpose(-2, -1), dim=-1)
    out = (attn @ vh).permute(0, 2, 1, 3).reshape(b, n, d)
    out = out @ w_out.T + b_out

    np.savez(
        os.path.join(HERE, "lora_post_scale_q.npz"),
        x=x.numpy(),
        w_qkv=w_qkv.numpy(),
        b_qkv=b_qkv.numpy(),
        a_q=a_q.numpy(),
        b_q=b_q.numpy(),
        a_v=a_v.numpy(),
        b_v=b_v.numpy(),
        w_out=w_out.numpy(),
        b_out=b_out.numpy(),
        out=out.numpy(),
        heads=np.asarray(h),
        rank=np.asarray(r),
        alpha=np.asarray(alpha),
    )
    print("lora_post_scale_q:", out.shape, float(out.abs().mean()))


def gen_adapter_double_mlp(seed=1, b=2, n=5, d=16, h=4, ad=8):
    g = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(*shape, generator=g, dtype=torch.float32) * 0.2

    x = rand(b, n, d)
    x0 = x.clone()
    ln1_w, ln1_b = rand(d) + 1.0, rand(d)
    w_qkv, b_qkv = rand(3 * d, d), rand(3 * d)
    w_out, b_out = rand(d, d), rand(d)
    ln2_w, ln2_b = rand(d) + 1.0, rand(d)
    w_fc, b_fc = rand(4 * d, d), rand(4 * d)
    w_proj, b_proj = rand(d, 4 * d), rand(d)
    lna_w, lna_b = rand(d) + 1.0, rand(d)
    w_down, b_down = rand(ad, d), rand(ad)
    w_up, b_up = rand(d, ad), rand(d)

    def ln(t, w, bias):
        mu = t.mean(-1, keepdim=True)
        var = t.var(-1, unbiased=False, keepdim=True)
        return (t - mu) / torch.sqrt(var + 1e-5) * w + bias

    hd = d // h
    y = ln(x, ln1_w, ln1_b)
    qkv = y @ w_qkv.T + b_qkv
    q, k, v = qkv.split(d, dim=-1)

    def heads(t):
        return t.reshape(b, n, h, hd).permute(0, 2, 1, 3)

    attn = torch.softmax(
        heads(q) @ heads(k).transpose(-2, -1) * hd**-0.5, dim=-1
    )
    a = (attn @ heads(v)).permute(0, 2, 1, 3).reshape(b, n, d)
    x = x + (a @ w_out.T + b_out)

    m = ln(x, ln2_w, ln2_b)
    m = quick_gelu(m @ w_fc.T + b_fc) @ w_proj.T + b_proj
    # adapter(m) = up(relu(down(ln(m)))) + m; block adds it to x
    # (adapter_model.py:333: x = x + adapter(mlp(ln_2(x)))[0])
    z = ln(m, lna_w, lna_b)
    z = torch.relu(z @ w_down.T + b_down)
    z = z @ w_up.T + b_up
    out = x + (z + m)

    np.savez(
        os.path.join(HERE, "adapter_double_mlp.npz"),
        x=x0.numpy(),
        ln1_w=ln1_w.numpy(), ln1_b=ln1_b.numpy(),
        w_qkv=w_qkv.numpy(), b_qkv=b_qkv.numpy(),
        w_out=w_out.numpy(), b_out=b_out.numpy(),
        ln2_w=ln2_w.numpy(), ln2_b=ln2_b.numpy(),
        w_fc=w_fc.numpy(), b_fc=b_fc.numpy(),
        w_proj=w_proj.numpy(), b_proj=b_proj.numpy(),
        lna_w=lna_w.numpy(), lna_b=lna_b.numpy(),
        w_down=w_down.numpy(), b_down=b_down.numpy(),
        w_up=w_up.numpy(), b_up=b_up.numpy(),
        out=out.numpy(),
        heads=np.asarray(h),
        adapter_dim=np.asarray(ad),
    )
    print("adapter_double_mlp:", out.shape, float(out.abs().mean()))


def gen_compacter_phm_adapter(seed=2, b=2, n=5, d=16, red=4, pd_dn=4, pd_up=2):
    """HyperComplexAdapter (compacter_model.py:358-427): LN ->
    PHM down -> gelu_new -> PHM up, + residual.  Pins the PHM semantics:
    H = sum_i kron(phm_rule_i, W_i) with the RULE as the LEFT kron factor
    (kronecker_product_einsum_batched(phm_rule, W), :176-208), gelu_new =
    the tanh approximation, and the asymmetric down/up phm_dims."""
    g = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(*shape, generator=g, dtype=torch.float32) * 0.2

    down = d // red
    x = rand(b, n, d)
    ln_w, ln_b = rand(d) + 1.0, rand(d)
    rule_dn = rand(pd_dn, pd_dn, pd_dn)
    w_dn = rand(pd_dn, d // pd_dn, down // pd_dn)
    b_dn = rand(down)
    rule_up = rand(pd_up, pd_up, pd_up)
    w_up = rand(pd_up, down // pd_up, d // pd_up)
    b_up = rand(d)

    def ln(t, w, bias):
        mu = t.mean(-1, keepdim=True)
        var = t.var(-1, unbiased=False, keepdim=True)
        return (t - mu) / torch.sqrt(var + 1e-5) * w + bias

    def kron_sum(rule, w):
        # kronecker_product_einsum_batched(phm_rule, W).sum(0) (:184-201)
        return torch.einsum("bac,bkp->bakcp", rule, w).reshape(
            rule.shape[0], rule.shape[1] * w.shape[1],
            rule.shape[2] * w.shape[2],
        ).sum(0)

    def gelu_new(t):
        return (
            0.5 * t * (1.0 + torch.tanh(
                (2.0 / torch.pi) ** 0.5 * (t + 0.044715 * t**3)
            ))
        )

    z = ln(x, ln_w, ln_b)
    z = z @ kron_sum(rule_dn, w_dn) + b_dn
    z = gelu_new(z)
    out = z @ kron_sum(rule_up, w_up) + b_up + x

    np.savez(
        os.path.join(HERE, "compacter_phm_adapter.npz"),
        x=x.numpy(),
        ln_w=ln_w.numpy(), ln_b=ln_b.numpy(),
        rule_dn=rule_dn.numpy(), w_dn=w_dn.numpy(), b_dn=b_dn.numpy(),
        rule_up=rule_up.numpy(), w_up=w_up.numpy(), b_up=b_up.numpy(),
        out=out.numpy(),
        reduction=np.asarray(red),
        phm_dim_down=np.asarray(pd_dn),
        phm_dim_up=np.asarray(pd_up),
    )
    print("compacter_phm_adapter:", out.shape, float(out.abs().mean()))


def gen_kadaptation_kron_attn(seed=3, b=2, n=5, d=16, h=4, pn=4, rank=2):
    """KAdaptation attention deltas (kadaptation.py:190-230): the q/v
    deltas are PHM products with a SHARED phm_rule and rank-factorized
    per-slot weights W_i = W_left_i @ W_right_i (bmm, :211-212); the
    delta enters q BEFORE the 1/sqrt(hd) scale (supervised pre-scale,
    :216-224), and matvec's bias is commented out (:100-101) so phmb is
    a dead parameter."""
    g = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(*shape, generator=g, dtype=torch.float32) * 0.2

    x = rand(b, n, d)
    w_qkv, b_qkv = rand(3 * d, d), rand(3 * d)
    rule = rand(pn, pn, pn)
    l1, r1 = rand(pn, d // pn, rank), rand(pn, rank, d // pn)
    l2, r2 = rand(pn, d // pn, rank), rand(pn, rank, d // pn)
    w_out, b_out = rand(d, d), rand(d)

    def kron_sum(rule_t, w):
        return torch.einsum("bac,bkp->bakcp", rule_t, w).reshape(
            rule_t.shape[0], rule_t.shape[1] * w.shape[1],
            rule_t.shape[2] * w.shape[2],
        ).sum(0)

    qkv = x @ w_qkv.T + b_qkv
    q, k, v = qkv.split(d, dim=-1)
    dq = x @ kron_sum(rule, torch.bmm(l1, r1))
    dv = x @ kron_sum(rule, torch.bmm(l2, r2))
    q = q + dq  # pre-scale: the scale multiplies the scores below
    v = v + dv

    hd = d // h

    def heads(t):
        return t.reshape(b, n, h, hd).permute(0, 2, 1, 3)

    attn = torch.softmax(
        heads(q) @ heads(k).transpose(-2, -1) * hd**-0.5, dim=-1
    )
    out = (attn @ heads(v)).permute(0, 2, 1, 3).reshape(b, n, d)
    out = out @ w_out.T + b_out

    np.savez(
        os.path.join(HERE, "kadaptation_kron_attn.npz"),
        x=x.numpy(),
        w_qkv=w_qkv.numpy(), b_qkv=b_qkv.numpy(),
        rule=rule.numpy(),
        l1=l1.numpy(), r1=r1.numpy(), l2=l2.numpy(), r2=r2.numpy(),
        w_out=w_out.numpy(), b_out=b_out.numpy(),
        out=out.numpy(),
        heads=np.asarray(h),
        phm_dim=np.asarray(pn),
        phm_rank=np.asarray(rank),
    )
    print("kadaptation_kron_attn:", out.shape, float(out.abs().mean()))


def gen_lepe_attention(seed=4, b=2, g=4, d=16, h=4):
    """LePE attention (LePE.py:84-144): v is reshaped to (B, C, H, W),
    passed through a depthwise 3x3 conv (get_v), head-split C-major, and
    added to attn @ v BEFORE the head merge.  N must be a perfect square
    — get_lepe (:109-116) has no cls handling (int(sqrt(N)) truncates),
    so the golden uses a pure-grid sequence (n_prefix=0)."""
    import torch.nn.functional as F

    g_ = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(*shape, generator=g_, dtype=torch.float32) * 0.2

    n = g * g
    x = rand(b, n, d)
    w_qkv, b_qkv = rand(3 * d, d), rand(3 * d)
    w_v, bias_v = rand(d, 1, 3, 3), rand(d)  # depthwise conv weight
    w_out, b_out = rand(d, d), rand(d)

    hd = d // h
    qkv = x @ w_qkv.T + b_qkv
    q, k, v = qkv.split(d, dim=-1)

    def heads(t):
        return t.reshape(b, n, h, hd).permute(0, 2, 1, 3)

    attn = torch.softmax(
        heads(q) @ heads(k).transpose(-2, -1) * hd**-0.5, dim=-1
    )
    # get_lepe: (B, N, C) -> transpose -> (B, C, H, W) -> depthwise conv
    # -> (B, h, C/h, HW) -> permute -> (B, h, HW, C/h)   (:109-116)
    vimg = v.transpose(-2, -1).reshape(b, d, g, g)
    lepe = F.conv2d(vimg, w_v, bias_v, padding=1, groups=d)
    lepe = lepe.reshape(b, h, hd, n).permute(0, 1, 3, 2)
    out = (attn @ heads(v) + lepe).permute(0, 2, 1, 3).reshape(b, n, d)
    out = out @ w_out.T + b_out

    np.savez(
        os.path.join(HERE, "lepe_attention.npz"),
        x=x.numpy(),
        w_qkv=w_qkv.numpy(), b_qkv=b_qkv.numpy(),
        w_v=w_v.numpy(), bias_v=bias_v.numpy(),
        w_out=w_out.numpy(), b_out=b_out.numpy(),
        out=out.numpy(),
        heads=np.asarray(h),
        grid=np.asarray(g),
    )
    print("lepe_attention:", out.shape, float(out.abs().mean()))


def gen_rpb_attention(seed=5, b=2, g=4, d=16, h=4):
    """RPB attention (RPB.py:84-160): Swin-style relative position bias
    over an ndim x ndim grid added to the scaled scores before softmax.
    The bias is (h, g*g, g*g) with no cls row/col — broadcasting against
    (B, h, N, N) forces N == g*g in the reference, so the golden uses a
    pure-grid sequence."""
    g_ = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(*shape, generator=g_, dtype=torch.float32) * 0.2

    n = g * g
    x = rand(b, n, d)
    w_qkv, b_qkv = rand(3 * d, d), rand(3 * d)
    table = rand((2 * g - 1) * (2 * g - 1), h)
    w_out, b_out = rand(d, d), rand(d)

    # relative_position_index exactly as RPB.py:116-127
    coords = torch.stack(
        torch.meshgrid([torch.arange(g), torch.arange(g)], indexing="ij")
    )
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += g - 1
    rel[:, :, 1] += g - 1
    rel[:, :, 0] *= 2 * g - 1
    index = rel.sum(-1)  # (g*g, g*g)

    hd = d // h
    qkv = x @ w_qkv.T + b_qkv
    q, k, v = qkv.split(d, dim=-1)

    def heads(t):
        return t.reshape(b, n, h, hd).permute(0, 2, 1, 3)

    bias = table[index.view(-1)].view(n, n, h).permute(2, 0, 1)
    score = heads(q) @ heads(k).transpose(-2, -1) * hd**-0.5
    attn = torch.softmax(score + bias.unsqueeze(0), dim=-1)
    out = (attn @ heads(v)).permute(0, 2, 1, 3).reshape(b, n, d)
    out = out @ w_out.T + b_out

    np.savez(
        os.path.join(HERE, "rpb_attention.npz"),
        x=x.numpy(),
        w_qkv=w_qkv.numpy(), b_qkv=b_qkv.numpy(),
        table=table.numpy(),
        w_out=w_out.numpy(), b_out=b_out.numpy(),
        out=out.numpy(),
        heads=np.asarray(h),
        grid=np.asarray(g),
    )
    print("rpb_attention:", out.shape, float(out.abs().mean()))


def gen_clip_rn_tower(seed=6, b=2, width=8, layers=(1, 1, 1, 1),
                      embed_dim=16, image=32):
    """CLIP ModifiedResNet visual tower (model.py:13-160), independent
    torch re-implementation in OpenAI state-dict naming: 3-conv stem +
    avgpool, anti-aliased strided bottlenecks (avgpool after conv2,
    avgpool-prepended downsample), AttentionPool2d readout (mean token
    prepended, learned pos embedding, MHA -> x[0]).  The npz stores the
    full torch-format state dict so the test also pins the converter
    (clip_rn_state_dict_to_tree) key mapping, BN running stats included
    (eval mode)."""
    import torch.nn.functional as F

    g_ = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(*shape, generator=g_, dtype=torch.float32) * 0.2

    sd = {}

    def make_bn(prefix, ch):
        sd[f"{prefix}.weight"] = rand(ch) + 1.0
        sd[f"{prefix}.bias"] = rand(ch)
        sd[f"{prefix}.running_mean"] = rand(ch)
        sd[f"{prefix}.running_var"] = rand(ch).abs() + 0.5

    def bn(x, prefix):
        m, v = sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"]
        w_, b_ = sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]
        inv = (v + 1e-5).rsqrt()
        return (x - m[:, None, None]) * inv[:, None, None] * w_[
            :, None, None
        ] + b_[:, None, None]

    # stem
    sd["visual.conv1.weight"] = rand(width // 2, 3, 3, 3)
    make_bn("visual.bn1", width // 2)
    sd["visual.conv2.weight"] = rand(width // 2, width // 2, 3, 3)
    make_bn("visual.bn2", width // 2)
    sd["visual.conv3.weight"] = rand(width, width // 2, 3, 3)
    make_bn("visual.bn3", width)

    inplanes = width
    for s, blocks in enumerate(layers, start=1):
        planes = width * 2 ** (s - 1)
        for i in range(blocks):
            p = f"visual.layer{s}.{i}"
            sd[f"{p}.conv1.weight"] = rand(planes, inplanes, 1, 1)
            make_bn(f"{p}.bn1", planes)
            sd[f"{p}.conv2.weight"] = rand(planes, planes, 3, 3)
            make_bn(f"{p}.bn2", planes)
            sd[f"{p}.conv3.weight"] = rand(planes * 4, planes, 1, 1)
            make_bn(f"{p}.bn3", planes * 4)
            stride = 2 if (s > 1 and i == 0) else 1
            if stride > 1 or inplanes != planes * 4:
                sd[f"{p}.downsample.0.weight"] = rand(
                    planes * 4, inplanes, 1, 1
                )
                make_bn(f"{p}.downsample.1", planes * 4)
            inplanes = planes * 4

    c = width * 32
    heads = c // 64 or 1
    n = (image // 32) ** 2
    sd["visual.attnpool.positional_embedding"] = rand(n + 1, c)
    for pn in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{pn}.weight"] = rand(c, c)
        sd[f"visual.attnpool.{pn}.bias"] = rand(c)
    sd["visual.attnpool.c_proj.weight"] = rand(embed_dim, c)
    sd["visual.attnpool.c_proj.bias"] = rand(embed_dim)

    x = rand(b, 3, image, image)  # NCHW

    # forward (eval mode)
    h = F.relu(bn(F.conv2d(x, sd["visual.conv1.weight"], stride=2,
                           padding=1), "visual.bn1"))
    h = F.relu(bn(F.conv2d(h, sd["visual.conv2.weight"], padding=1),
                  "visual.bn2"))
    h = F.relu(bn(F.conv2d(h, sd["visual.conv3.weight"], padding=1),
                  "visual.bn3"))
    h = F.avg_pool2d(h, 2)

    inplanes = width
    for s, blocks in enumerate(layers, start=1):
        planes = width * 2 ** (s - 1)
        for i in range(blocks):
            p = f"visual.layer{s}.{i}"
            stride = 2 if (s > 1 and i == 0) else 1
            out = F.relu(bn(F.conv2d(h, sd[f"{p}.conv1.weight"]),
                            f"{p}.bn1"))
            out = F.relu(bn(F.conv2d(out, sd[f"{p}.conv2.weight"],
                                     padding=1), f"{p}.bn2"))
            if stride > 1:
                out = F.avg_pool2d(out, stride)
            out = bn(F.conv2d(out, sd[f"{p}.conv3.weight"]), f"{p}.bn3")
            identity = h
            if f"{p}.downsample.0.weight" in sd:
                identity = F.avg_pool2d(h, stride) if stride > 1 else h
                identity = bn(
                    F.conv2d(identity, sd[f"{p}.downsample.0.weight"]),
                    f"{p}.downsample.1",
                )
            h = F.relu(out + identity)
            inplanes = planes * 4

    # AttentionPool2d (model.py:59-95)
    t = h.reshape(b, c, -1).permute(2, 0, 1)  # (HW) N C
    t = torch.cat([t.mean(dim=0, keepdim=True), t], dim=0)
    t = t + sd["visual.attnpool.positional_embedding"][:, None, :]
    out, _ = F.multi_head_attention_forward(
        query=t, key=t, value=t,
        embed_dim_to_check=c,
        num_heads=heads,
        q_proj_weight=sd["visual.attnpool.q_proj.weight"],
        k_proj_weight=sd["visual.attnpool.k_proj.weight"],
        v_proj_weight=sd["visual.attnpool.v_proj.weight"],
        in_proj_weight=None,
        in_proj_bias=torch.cat([
            sd["visual.attnpool.q_proj.bias"],
            sd["visual.attnpool.k_proj.bias"],
            sd["visual.attnpool.v_proj.bias"],
        ]),
        bias_k=None, bias_v=None,
        add_zero_attn=False, dropout_p=0,
        out_proj_weight=sd["visual.attnpool.c_proj.weight"],
        out_proj_bias=sd["visual.attnpool.c_proj.bias"],
        use_separate_proj_weight=True,
        training=False, need_weights=False,
    )
    feat = out[0]

    arrays = {k.replace(".", "__"): v.numpy() for k, v in sd.items()}
    np.savez(
        os.path.join(HERE, "clip_rn_tower.npz"),
        x=x.numpy(),
        out=feat.numpy(),
        width=np.asarray(width),
        layers=np.asarray(layers),
        embed_dim=np.asarray(embed_dim),
        image=np.asarray(image),
        **arrays,
    )
    print("clip_rn_tower:", feat.shape, float(feat.abs().mean()))


def gen_effnet_tower(seed=7, b=2, image=32):
    """Tiny EfficientNet in timm naming + semantics (plain
    efficientnet_b0 family: symmetric k//2 padding, SiLU, BN eps 1e-3,
    SE reduced to round(block_input*0.25)), independent torch
    re-implementation.  Two stages — one depthwise-separable (expand=1,
    conv_dw->bn1->SE->conv_pw->bn2) and one inverted residual with two
    repeats (conv_pw->bn1->conv_dw->bn2->SE->conv_pwl->bn3) — cover both
    timm block layouts; the npz stores the timm-format state dict so the
    test also pins timm_effnet_state_dict_to_tree."""
    import torch.nn.functional as F

    g_ = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(*shape, generator=g_, dtype=torch.float32) * 0.2

    sd = {}

    def make_bn(prefix, ch):
        sd[f"{prefix}.weight"] = rand(ch) + 1.0
        sd[f"{prefix}.bias"] = rand(ch)
        sd[f"{prefix}.running_mean"] = rand(ch)
        sd[f"{prefix}.running_var"] = rand(ch).abs() + 0.5

    def bn(x, prefix):
        m, v = sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"]
        w_, b_ = sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]
        inv = (v + 1e-3).rsqrt()
        return (x - m[:, None, None]) * inv[:, None, None] * w_[
            :, None, None
        ] + b_[:, None, None]

    def se(x, prefix):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = F.conv2d(s, sd[f"{prefix}.conv_reduce.weight"],
                     sd[f"{prefix}.conv_reduce.bias"])
        s = F.silu(s)
        s = F.conv2d(s, sd[f"{prefix}.conv_expand.weight"],
                     sd[f"{prefix}.conv_expand.bias"])
        return x * torch.sigmoid(s)

    stem, c0, c1, head = 8, 8, 16, 24
    sd["conv_stem.weight"] = rand(stem, 3, 3, 3)
    make_bn("bn1", stem)
    # stage 0: DepthwiseSeparableConv (expand=1)
    sd["blocks.0.0.conv_dw.weight"] = rand(stem, 1, 3, 3)
    make_bn("blocks.0.0.bn1", stem)
    sd["blocks.0.0.se.conv_reduce.weight"] = rand(2, stem, 1, 1)
    sd["blocks.0.0.se.conv_reduce.bias"] = rand(2)
    sd["blocks.0.0.se.conv_expand.weight"] = rand(stem, 2, 1, 1)
    sd["blocks.0.0.se.conv_expand.bias"] = rand(stem)
    sd["blocks.0.0.conv_pw.weight"] = rand(c0, stem, 1, 1)
    make_bn("blocks.0.0.bn2", c0)
    # stage 1: InvertedResidual x2 (expand=6, k=3, first stride 2)
    inp = c0
    for i in range(2):
        p = f"blocks.1.{i}"
        mid = inp * 6
        red = max(1, int(inp * 0.25))
        sd[f"{p}.conv_pw.weight"] = rand(mid, inp, 1, 1)
        make_bn(f"{p}.bn1", mid)
        sd[f"{p}.conv_dw.weight"] = rand(mid, 1, 3, 3)
        make_bn(f"{p}.bn2", mid)
        sd[f"{p}.se.conv_reduce.weight"] = rand(red, mid, 1, 1)
        sd[f"{p}.se.conv_reduce.bias"] = rand(red)
        sd[f"{p}.se.conv_expand.weight"] = rand(mid, red, 1, 1)
        sd[f"{p}.se.conv_expand.bias"] = rand(mid)
        sd[f"{p}.conv_pwl.weight"] = rand(c1, mid, 1, 1)
        make_bn(f"{p}.bn3", c1)
        inp = c1
    sd["conv_head.weight"] = rand(head, c1, 1, 1)
    make_bn("bn2", head)

    x = rand(b, 3, image, image)

    h = F.silu(bn(F.conv2d(x, sd["conv_stem.weight"], stride=2,
                           padding=1), "bn1"))
    # stage 0
    d = F.conv2d(h, sd["blocks.0.0.conv_dw.weight"], padding=1,
                 groups=stem)
    d = F.silu(bn(d, "blocks.0.0.bn1"))
    d = se(d, "blocks.0.0.se")
    d = bn(F.conv2d(d, sd["blocks.0.0.conv_pw.weight"]),
           "blocks.0.0.bn2")
    h = d + h if stem == c0 else d
    # stage 1
    for i in range(2):
        p = f"blocks.1.{i}"
        stride = 2 if i == 0 else 1
        mid_w = sd[f"{p}.conv_pw.weight"].shape[0]
        m = F.silu(bn(F.conv2d(h, sd[f"{p}.conv_pw.weight"]),
                      f"{p}.bn1"))
        m = F.conv2d(m, sd[f"{p}.conv_dw.weight"], stride=stride,
                     padding=1, groups=mid_w)
        m = F.silu(bn(m, f"{p}.bn2"))
        m = se(m, f"{p}.se")
        m = bn(F.conv2d(m, sd[f"{p}.conv_pwl.weight"]), f"{p}.bn3")
        h = m + h if (stride == 1 and h.shape[1] == m.shape[1]) else m
    h = F.silu(bn(F.conv2d(h, sd["conv_head.weight"]), "bn2"))
    feat = h.mean(dim=(2, 3))

    arrays = {k.replace(".", "__"): v.numpy() for k, v in sd.items()}
    np.savez(
        os.path.join(HERE, "effnet_tower.npz"),
        x=x.numpy(),
        out=feat.numpy(),
        image=np.asarray(image),
        **arrays,
    )
    print("effnet_tower:", feat.shape, float(feat.abs().mean()))


def gen_shared_qkv_adapter(seed=8, b=2, n=5, d=16, h=4):
    """Shared per-head qkv adapter (cls_vit_lora_adapter.py:175-194):
    ONE Adapter(head_dim) — LN -> down(head_dim/2) -> relu -> up,
    +residual — applied to each of q, k, v AFTER the head split, then
    standard scaled attention."""
    g_ = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(*shape, generator=g_, dtype=torch.float32) * 0.2

    hd = d // h
    x = rand(b, n, d)
    w_qkv, b_qkv = rand(3 * d, d), rand(3 * d)
    ln_w, ln_b = rand(hd) + 1.0, rand(hd)
    w_down, b_down = rand(hd // 2, hd), rand(hd // 2)
    w_up, b_up = rand(hd, hd // 2), rand(hd)
    w_out, b_out = rand(d, d), rand(d)

    def ln(t, w, bias):
        mu = t.mean(-1, keepdim=True)
        var = t.var(-1, unbiased=False, keepdim=True)
        return (t - mu) / torch.sqrt(var + 1e-5) * w + bias

    def adapter(t):
        z = ln(t, ln_w, ln_b)
        z = torch.relu(z @ w_down.T + b_down)
        return z @ w_up.T + b_up + t

    qkv = x @ w_qkv.T + b_qkv
    q, k, v = qkv.split(d, dim=-1)

    def heads(t):
        return t.reshape(b, n, h, hd).permute(0, 2, 1, 3)

    qh, kh, vh = adapter(heads(q)), adapter(heads(k)), adapter(heads(v))
    attn = torch.softmax(qh @ kh.transpose(-2, -1) * hd**-0.5, dim=-1)
    out = (attn @ vh).permute(0, 2, 1, 3).reshape(b, n, d)
    out = out @ w_out.T + b_out

    np.savez(
        os.path.join(HERE, "shared_qkv_adapter.npz"),
        x=x.numpy(),
        w_qkv=w_qkv.numpy(), b_qkv=b_qkv.numpy(),
        ln_w=ln_w.numpy(), ln_b=ln_b.numpy(),
        w_down=w_down.numpy(), b_down=b_down.numpy(),
        w_up=w_up.numpy(), b_up=b_up.numpy(),
        w_out=w_out.numpy(), b_out=b_out.numpy(),
        out=out.numpy(),
        heads=np.asarray(h),
    )
    print("shared_qkv_adapter:", out.shape, float(out.abs().mean()))


def gen_lora_moe_gate(seed=9, b=2, n=5, d=16, h=4, r=4, group=2,
                      alpha=8.0, lam=1.5):
    """MoE-gated LoRA delta (lora_model.py:491-515 adapter_forward with
    g_weight): the rank axis viewed as (r/group, group), scaled by
    sigmoid(x @ G.T) * lambda per expert, then up-projected * alpha/r;
    injected with the CLIP post-scale-q quirk on q and v."""
    g_ = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(*shape, generator=g_, dtype=torch.float32) * 0.2

    experts = r // group
    x = rand(b, n, d)
    w_qkv, b_qkv = rand(3 * d, d), rand(3 * d)
    a_q, b_q, g_q = rand(r, d), rand(d, r), rand(experts, d)
    a_v, b_v, g_v = rand(r, d), rand(d, r), rand(experts, d)
    w_out, b_out = rand(d, d), rand(d)

    def delta(w1, w2, gw):
        res = x @ w1.T  # (b, n, r)
        g = torch.sigmoid(x @ gw.T) * lam  # (b, n, experts)
        res = res.view(b, n, experts, group) * g.unsqueeze(-1)
        return res.view(b, n, r) @ w2.T * (alpha / r)

    hd = d // h
    qkv = x @ w_qkv.T + b_qkv
    q, k, v = qkv.split(d, dim=-1)
    q = q / hd**0.5 + delta(a_q, b_q, g_q)  # post-scale-q quirk
    v = v + delta(a_v, b_v, g_v)

    def heads(t):
        return t.reshape(b, n, h, hd).permute(0, 2, 1, 3)

    attn = torch.softmax(
        heads(q) @ heads(k).transpose(-2, -1), dim=-1
    )
    out = (attn @ heads(v)).permute(0, 2, 1, 3).reshape(b, n, d)
    out = out @ w_out.T + b_out

    np.savez(
        os.path.join(HERE, "lora_moe_gate.npz"),
        x=x.numpy(),
        w_qkv=w_qkv.numpy(), b_qkv=b_qkv.numpy(),
        a_q=a_q.numpy(), b_q=b_q.numpy(), g_q=g_q.numpy(),
        a_v=a_v.numpy(), b_v=b_v.numpy(), g_v=g_v.numpy(),
        w_out=w_out.numpy(), b_out=b_out.numpy(),
        out=out.numpy(),
        heads=np.asarray(h),
        rank=np.asarray(r),
        group=np.asarray(group),
        alpha=np.asarray(alpha),
        lam=np.asarray(lam),
    )
    print("lora_moe_gate:", out.shape, float(out.abs().mean()))


if __name__ == "__main__":
    gen_lora_post_scale_q()
    gen_adapter_double_mlp()
    gen_compacter_phm_adapter()
    gen_kadaptation_kron_attn()
    gen_lepe_attention()
    gen_rpb_attention()
    gen_clip_rn_tower()
    gen_effnet_tower()
    gen_shared_qkv_adapter()
    gen_lora_moe_gate()
