"""Transformer building blocks with PEFT injection points.

One Block implementation serves every model family and PEFT method in the
reference (which copies a ~900-line ViT per method; SURVEY.md §7).  Injection
points, each reproducing specific reference math:

* LoRA q/k/v deltas        — evaluation/lora_model.py:459-515, lora.py:105-137
* Kronecker (KAdaptation)  — evaluation/kadaptation.py:117-244
* Houlsby adapter          — evaluation/adapter_model.py:204-342
* Compacter PHM adapter    — evaluation/compacter_model.py:358-440
* AdapterDrop gating       — evaluation/adapterdrop.py:582-587
* RPB attention bias       — evaluation/RPB.py:105-144
* LePE depthwise-conv PE   — evaluation/LePE.py:106-139

Numerics notes for torch parity:
* LayerNorm runs in fp32 and casts back (reference adapter_model.py:153-164).
* QuickGELU = x * sigmoid(1.702 x) (CLIP); 'gelu' is the exact erf form
  (torch nn.GELU default); 'gelu_new' is the tanh approximation the
  Compacter adapter uses.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import multi_head_attention
from ..ops.phm import factorized_phm_weight, phm_linear
from ..peft.spec import PEFTSpec

Dtype = Any


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_new(x: jax.Array) -> jax.Array:
    # HF "gelu_new": tanh approximation.
    return (
        0.5
        * x
        * (
            1.0
            + jnp.tanh(
                np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3.0))
            )
        )
    )


ACT2FN: dict[str, Callable[[jax.Array], jax.Array]] = {
    "relu": jax.nn.relu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": gelu_new,
    "quick_gelu": quick_gelu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32 (torch-parity default; reference
    adapter_model.py:153-164), output cast back to the input dtype.

    ``compute_fp32=False`` keeps the statistics in the input dtype — a
    throughput mode that avoids the cast round-trips in bf16 training
    (numerics: bf16 mean/var over 768-1024 lanes is fine for training,
    not for logit-parity evaluation).
    """

    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32
    compute_fp32: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        ct = jnp.float32 if self.compute_fp32 else orig_dtype
        xc = x.astype(ct)
        mean = jnp.mean(xc, axis=-1, keepdims=True)
        var = jnp.var(xc, axis=-1, keepdims=True)
        y = (xc - mean) * jax.lax.rsqrt(var + jnp.asarray(self.epsilon, ct))
        scale = self.param(
            "scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (x.shape[-1],), self.param_dtype
        )
        y = y * scale.astype(ct) + bias.astype(ct)
        return y.astype(orig_dtype)


def bert_init(std: float = 0.02):
    return nn.initializers.normal(stddev=std)


class Mlp(nn.Module):
    """c_fc -> act -> c_proj (reference adapter_model.py:316-320).

    ``int8=True`` routes both GEMMs through the int8 MXU inference path
    (ops/int8.py) — set only on no-grad forwards."""

    width: int
    hidden: int
    act: str = "gelu"
    int8: bool = False
    int8_bwd: bool = False  # differentiable int8 fwd (TPU.INT8_FWD_TRAIN)
    # which GEMMs participate when int8 is on (TPU.INT8_TARGETS)
    int8_targets: tuple = ("in_proj", "out_proj", "c_fc", "c_proj")
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import functools

        from ..ops.int8 import Int8Dense

        def dense(name):
            if self.int8 and name in self.int8_targets:
                return functools.partial(
                    Int8Dense, train_bwd=self.int8_bwd
                )
            return nn.Dense

        x = dense("c_fc")(
            self.hidden,
            name="c_fc",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = ACT2FN[self.act](x)
        x = dense("c_proj")(
            self.width,
            name="c_proj",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        return x


class Adapter(nn.Module):
    """Houlsby bottleneck adapter: LN -> down -> act -> up, + residual.

    Reference evaluation/adapter_model.py:204-296 with BERT init
    (normal(0.02) kernels, zero bias) and residual_before_ln semantics:
    __call__(m) returns up(act(down(ln(m)))) + m.
    """

    width: int
    adapter_dim: int = 64
    act: str = "relu"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        y = LayerNorm(name="adapter_norm_before", param_dtype=self.param_dtype)(x)
        y = nn.Dense(
            self.adapter_dim,
            name="down",
            kernel_init=bert_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(y)
        y = ACT2FN[self.act](y)
        y = nn.Dense(
            self.width,
            name="up",
            kernel_init=bert_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(y)
        return y + residual


def _fit_phm_dim(requested: int, *features: int) -> int:
    """Largest n <= requested dividing every feature dim."""
    n = max(min([requested, *features]), 1)
    while any(f % n for f in features):
        n -= 1
    return n


class PHMDense(nn.Module):
    """PHM linear layer (Compacter building block).

    Reference compacter_model.py:213-355: W (phm_dim, in/n, out/n) with
    glorot-uniform(gain sqrt2) init, phm_rule (n, n, n) normal(0.01),
    bias zeros; y = x @ (sum_i rule_i kron W_i) + b.
    """

    in_features: int
    out_features: int
    phm_dim: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = self.phm_dim
        assert self.in_features % n == 0 and self.out_features % n == 0
        w = self.param(
            "W",
            nn.initializers.variance_scaling(2.0, "fan_avg", "uniform"),
            (n, self.in_features // n, self.out_features // n),
            self.param_dtype,
        )
        rule = self.param(
            "phm_rule",
            nn.initializers.normal(stddev=0.01),
            (n, n, n),
            self.param_dtype,
        )
        b = (
            self.param(
                "b",
                nn.initializers.zeros,
                (self.out_features,),
                self.param_dtype,
            )
            if self.use_bias
            else None
        )
        return phm_linear(
            x,
            rule.astype(self.dtype),
            w.astype(self.dtype),
            None if b is None else b.astype(self.dtype),
        )


class CompacterAdapter(nn.Module):
    """Hypercomplex adapter (reference compacter_model.py:358-440).

    LN -> PHM down (phm_dim=32) -> gelu_new -> PHM up (phm_dim=4), +residual.
    """

    width: int
    reduction: int = 12
    phm_dim_down: int = 32
    phm_dim_up: int = 4
    act: str = "gelu_new"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        down_size = self.width // self.reduction
        # phm_dim must divide both features; shrink to the largest common
        # divisor when the tower is narrower than the reference's 768
        # (the reference would simply assert).
        phm_down = _fit_phm_dim(self.phm_dim_down, self.width, down_size)
        phm_up = _fit_phm_dim(self.phm_dim_up, down_size, self.width)
        y = LayerNorm(name="adapter_norm_before", param_dtype=self.param_dtype)(x)
        y = PHMDense(
            self.width,
            down_size,
            phm_down,
            name="down_phm",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(y)
        y = ACT2FN[self.act](y)
        y = PHMDense(
            down_size,
            self.width,
            phm_up,
            name="up_phm",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(y)
        return y + x


def _rpb_index(ndim: int) -> np.ndarray:
    """Swin-style relative position index for an ndim x ndim grid
    (reference RPB.py:113-125)."""
    coords = np.stack(
        np.meshgrid(np.arange(ndim), np.arange(ndim), indexing="ij")
    )  # (2, g, g)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, g*g, g*g)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ndim - 1
    rel[:, :, 1] += ndim - 1
    rel[:, :, 0] *= 2 * ndim - 1
    return rel.sum(-1)  # (g*g, g*g)


class MultiHeadAttention(nn.Module):
    """Packed-qkv attention with every attention-level PEFT hook.

    The qkv projection is a single Dense (one MXU matmul, the layout the
    CLIP checkpoint ships: in_proj_weight).  Deltas are added per spec:

    * lora: dq = (x @ A_q) @ B_q * alpha/r   (A ~ N(0, 0.02), B = 0)
    * kron: dq = x @ (sum_i rule_i kron (L_i R_i))
    * post_scale_q quirk (CLIP LoRA parity): dq is added after q is scaled
      by 1/sqrt(d), i.e. softmax((q/sqrt(d) + dq) k^T).
    """

    width: int
    heads: int
    spec: PEFTSpec = PEFTSpec()
    grid_size: int = 0  # patch grid side (for RPB / LePE); 0 = unavailable
    n_prefix: int = 1  # tokens before the patch grid (cls + prompts)
    causal: bool = False
    use_flash: bool = True
    softmax_fp32: bool = True  # False = TPU.BF16_SOFTMAX fast path
    int8: bool = False  # int8 MXU GEMMs for in/out_proj (no-grad only)
    int8_bwd: bool = False  # differentiable int8 fwd (TPU.INT8_FWD_TRAIN)
    int8_attn: bool = False  # QK^T dot on the int8 MXU (TPU.INT8_ATTN)
    int8_attn_pv: bool = False  # ALSO the P@V dot (TPU.INT8_ATTN_PV; unstable)
    int8_targets: tuple = ("in_proj", "out_proj", "c_fc", "c_proj")
    attn_batch_chunk: int = 0  # lax.map attention slices (VMEM-resident)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import functools

        from ..ops.int8 import Int8Dense

        b, n, d = x.shape
        h = self.heads
        hd = d // h
        spec = self.spec
        scale = hd**-0.5
        def dense_for(name):
            if self.int8 and name in self.int8_targets:
                return functools.partial(
                    Int8Dense, train_bwd=self.int8_bwd
                )
            return nn.Dense

        qkv = dense_for("in_proj")(
            3 * d,
            name="in_proj",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        deltas = {}
        if spec.attn_delta == "lora":
            lora_scale = spec.lora_alpha / spec.lora_rank
            for t in spec.lora_targets:
                a = nn.Dense(
                    spec.lora_rank,
                    use_bias=False,
                    name=f"{t}_adapter1",
                    kernel_init=bert_init(),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(x)
                if spec.lora_moe:
                    # MoE gating over rank groups (adapter_forward,
                    # lora_model.py:491-515): g = act(x @ G) * lambda,
                    # optionally softmaxed; the rank axis is viewed as
                    # (num_expert, group) and scaled per expert.
                    num_expert = max(
                        spec.lora_rank // spec.lora_moe_group, 1
                    )
                    g = nn.Dense(
                        num_expert,
                        use_bias=False,
                        name=f"{t}_moe_adapter1",
                        kernel_init=bert_init(),
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                    )(x)
                    if spec.lora_moe_act == "sigmoid":
                        g = jax.nn.sigmoid(g)
                    elif spec.lora_moe_act == "tanh":
                        g = jnp.tanh(g)
                    elif spec.lora_moe_act == "relu":
                        g = jax.nn.relu(g)
                    g = g * spec.lora_moe_lambda
                    if spec.lora_moe_softmax:
                        g = jax.nn.softmax(g, axis=-1)
                    a = (
                        a.reshape(
                            *a.shape[:-1],
                            num_expert,
                            spec.lora_moe_group,
                        )
                        * g[..., None]
                    ).reshape(*a.shape)
                deltas[t] = (
                    nn.Dense(
                        d,
                        use_bias=False,
                        name=f"{t}_adapter2",
                        kernel_init=nn.initializers.zeros,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                    )(a)
                    * lora_scale
                )
        elif spec.attn_delta == "kron":
            pn = spec.phm_dim
            assert d % pn == 0, f"phm_dim {pn} must divide width {d}"
            rule = self.param(
                "phm_rule",
                nn.initializers.normal(stddev=0.01),
                (pn, pn, pn),
                self.param_dtype,
            ).astype(self.dtype)
            # phmb exists-but-unused for trainable-count parity with
            # kadaptation.py:180 (bias is commented out in its matvec).
            self.param(
                "phmb", nn.initializers.zeros, (d,), self.param_dtype
            )
            for idx, t in enumerate(("q", "v"), start=1):
                wl = self.param(
                    f"W_left{idx}",
                    nn.initializers.normal(stddev=0.01),
                    (pn, d // pn, spec.phm_rank),
                    self.param_dtype,
                ).astype(self.dtype)
                wr = self.param(
                    f"W_right{idx}",
                    nn.initializers.normal(stddev=0.01),
                    (pn, spec.phm_rank, d // pn),
                    self.param_dtype,
                ).astype(self.dtype)
                hmat = factorized_phm_weight(rule, wl, wr)
                deltas[t] = jnp.einsum(
                    "bni,io->bno", x, hmat, preferred_element_type=jnp.float32
                ).astype(x.dtype)

        def split_heads(t: jax.Array) -> jax.Array:
            return t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)

        post_scale_q = (
            spec.attn_delta != "none" and spec.lora_post_scale_q
        )
        if post_scale_q:
            q = q * scale
            attn_scale = 1.0
        else:
            attn_scale = scale
        ref_reshape = (
            spec.attn_delta == "lora" and spec.lora_ref_reshape
        )
        if not ref_reshape:
            if "q" in deltas:
                q = q + deltas["q"]
            if "k" in deltas:
                k = k + deltas["k"]
            if "v" in deltas:
                v = v + deltas["v"]
        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
        if ref_reshape:
            # Executed-reference layout (lora_model.py:730-731): the
            # seq-first (N, B, C) delta is reshaped FLAT into
            # (B*H, N, hd) — scrambling batch/sequence/head unless
            # B = H = 1.  Reproduced verbatim for trajectory parity.
            def _ref_scramble(dl: jax.Array) -> jax.Array:
                return jnp.transpose(dl, (1, 0, 2)).reshape(b, h, n, hd)

            if "q" in deltas:
                qh = qh + _ref_scramble(deltas["q"])
            if "k" in deltas:
                kh = kh + _ref_scramble(deltas["k"])
            if "v" in deltas:
                vh = vh + _ref_scramble(deltas["v"])

        if spec.lepe and spec.lepe_ref_qkv:
            # Executed-reference LePE layout (LePE.py:120-123): the
            # (3, B, N, C) qkvo permutation is reshaped to
            # (B, N, 3, H, hd) — a flat reinterpretation that scrambles
            # q/k/v across the batch.  Reproduced verbatim for
            # checkpoint parity; the get_lepe conv below keeps the
            # clean v (qkvo[2]), exactly as the reference does.
            qkvo = jnp.transpose(qkv.reshape(b, n, 3, d), (2, 0, 1, 3))
            scr = jnp.transpose(
                qkvo.reshape(b, n, 3, h, hd), (2, 0, 3, 1, 4)
            )
            qh, kh, vh = scr[0], scr[1], scr[2]

        if spec.attn_adapter == "shared_qkv":
            # one head-dim bottleneck adapter shared by q, k, v
            # (cls_vit_lora_adapter.py:175-194: Adapter(64) on each)
            qkv_adapter = Adapter(
                hd,
                hd // 2,
                act="relu",
                name="qkv_adapter",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
            qh = qkv_adapter(qh)
            kh = qkv_adapter(kh)
            vh = qkv_adapter(vh)

        bias = None
        if spec.attn_bias == "rpb":
            g = spec.rpb_ndim if spec.rpb_ndim > 0 else self.grid_size
            assert g > 0, "RPB needs a patch grid"
            if g != self.grid_size:
                raise ValueError(
                    f"RPB_NDIM={g} does not match the {self.grid_size}x"
                    f"{self.grid_size} patch grid (the reference's fixed "
                    f"ndim=7 has the same constraint); use RPB_NDIM=-1 "
                    f"for auto"
                )
            table = self.param(
                "relative_position_bias_table",
                nn.initializers.zeros,
                ((2 * g - 1) * (2 * g - 1), h),
                self.param_dtype,
            )
            idx = _rpb_index(g)  # numpy, static
            patch_bias = table[idx.reshape(-1)].reshape(g * g, g * g, h)
            patch_bias = patch_bias.transpose(2, 0, 1)  # (h, g*g, g*g)
            # zero bias for the cls/prompt prefix rows+cols
            bias = jnp.zeros((h, n, n), self.dtype)
            bias = bias.at[
                :, self.n_prefix :, self.n_prefix :
            ].set(patch_bias.astype(self.dtype))
        if self.causal:
            causal = jnp.triu(
                jnp.full((n, n), -1e30, jnp.float32), k=1
            ).astype(self.dtype)
            bias = causal[None] if bias is None else bias + causal[None]
            bias = jnp.broadcast_to(bias, (h, n, n))

        if self.int8_attn and self.is_mutable_collection("qstats"):
            # calibration pass (TPU.INT8_ATTN, piggybacking the
            # INT8_STATIC_ACT calibration): record the attention
            # operands' absmax; the softmax output needs none (see
            # ops/attention.int8_attention)
            for nm, t in (("q", qh), ("k", kh), ("v", vh)):
                self.sow(
                    "qstats",
                    f"amax_{nm}",
                    jnp.max(jnp.abs(t.astype(jnp.float32))),
                    init_fn=lambda: jnp.zeros((), jnp.float32),
                    reduce_fn=jnp.maximum,
                )
        if (
            self.int8_attn
            and bias is None
            and self.has_variable("qscale", "s_q")
        ):
            from ..ops.attention import int8_attention

            out = int8_attention(
                qh,
                kh,
                vh,
                self.get_variable("qscale", "s_q"),
                self.get_variable("qscale", "s_k"),
                self.get_variable("qscale", "s_v"),
                float(attn_scale),
                self.softmax_fp32,
                self.int8_attn_pv,
            )
        else:
            out = multi_head_attention(
                qh,
                kh,
                vh,
                bias=bias,
                scale=attn_scale,
                # True = auto (kernel for long sequences, XLA otherwise)
                use_flash=None if self.use_flash else False,
                softmax_fp32=self.softmax_fp32,
                batch_chunk=self.attn_batch_chunk,
            )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)

        if spec.lepe:
            g = self.grid_size
            assert g > 0, "LePE needs a patch grid"
            vp = v[:, self.n_prefix :, :].reshape(b, g, g, d)
            lepe = nn.Conv(
                d,
                kernel_size=(3, 3),
                padding="SAME",
                feature_group_count=d,
                name="get_v",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(vp).reshape(b, g * g, d)
            out = out.at[:, self.n_prefix :, :].add(lepe)

        out = dense_for("out_proj")(
            d,
            name="out_proj",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(out)
        return out


class Block(nn.Module):
    """Pre-LN transformer block with post-MLP adapter hooks.

    Residual structure (reference adapter_model.py:330-342):
        x = x + attn(ln_1(x))
        m = mlp(ln_2(x))
        x = x + adapter(m)        # adapter includes its own +m residual
          | x + m                 # when no adapter / AdapterDrop-skipped
    """

    width: int
    heads: int
    mlp_ratio: float = 4.0
    act: str = "gelu"
    spec: PEFTSpec = PEFTSpec()
    layer_idx: int = 0
    grid_size: int = 0
    n_prefix: int = 1
    causal: bool = False
    use_flash: bool = True
    softmax_fp32: bool = True
    int8: bool = False  # int8 GEMMs on no-grad forwards (TPU.INT8_INFERENCE)
    # TPU.INT8_FWD_TRAIN: int8 GEMMs on TRAINING forwards too, with a
    # full-precision custom-vjp backward (QLoRA recipe; ops/int8.py).
    # Targets the frozen tower's in/out_proj + MLP GEMMs — the PEFT
    # deltas and head keep dense bf16 math either way.
    int8_train: bool = False
    int8_attn: bool = False  # TPU.INT8_ATTN: int8 QK^T dot
    int8_attn_pv: bool = False  # TPU.INT8_ATTN_PV: int8 P@V too (unstable)
    int8_targets: tuple = ("in_proj", "out_proj", "c_fc", "c_proj")
    attn_batch_chunk: int = 0  # TPU.ATTN_BATCH_CHUNK
    drop_path: float = 0.0
    ln_fp32: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        spec = self.spec
        # plain int8 only on deterministic (no-grad) forwards: jnp.round
        # has a zero gradient, so the training path must never route
        # through it.  int8_train opts the training forward in via the
        # custom-vjp op whose backward is full-precision.
        int8 = (self.int8 and deterministic) or self.int8_train
        int8_bwd = self.int8_train and not (self.int8 and deterministic)
        attn_out = MultiHeadAttention(
            self.width,
            self.heads,
            spec=spec,
            grid_size=self.grid_size,
            n_prefix=self.n_prefix,
            causal=self.causal,
            use_flash=self.use_flash,
            softmax_fp32=self.softmax_fp32,
            int8=int8,
            int8_bwd=int8_bwd,
            int8_attn=self.int8_attn and int8_bwd,
            int8_attn_pv=self.int8_attn_pv,
            int8_targets=self.int8_targets,
            attn_batch_chunk=self.attn_batch_chunk,
            name="attn",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(
            LayerNorm(
                name="ln_1",
                param_dtype=self.param_dtype,
                compute_fp32=self.ln_fp32,
            )(x)
        )
        x = x + self._drop_path(attn_out, deterministic)

        m = Mlp(
            self.width,
            int(self.width * self.mlp_ratio),
            act=self.act,
            int8=int8,
            int8_bwd=int8_bwd,
            int8_targets=self.int8_targets,
            name="mlp",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(
            LayerNorm(
                name="ln_2",
                param_dtype=self.param_dtype,
                compute_fp32=self.ln_fp32,
            )(x)
        )

        adapter_active = spec.adapter != "none" and (
            spec.adapter_layers is None
            or self.layer_idx in spec.adapter_layers
        )
        # NB: the adapter is *called* in every block so its params exist
        # everywhere (AdapterDrop parity: adapterdrop.py:170-199 creates
        # them in all blocks, :582-587 executes one).  In skipped blocks the
        # result is unused and XLA dead-code-eliminates the compute.
        if spec.adapter == "houlsby":
            delta = Adapter(
                self.width,
                spec.adapter_dim,
                act=spec.adapter_act,
                name="adapter",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(m)
            branch = delta if adapter_active else m
        elif spec.adapter == "compacter":
            delta = CompacterAdapter(
                self.width,
                reduction=spec.compacter_reduction,
                phm_dim_down=spec.compacter_phm_dim_down,
                phm_dim_up=spec.compacter_phm_dim_up,
                act=spec.compacter_act,
                name="compacter",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(m)
            branch = delta if adapter_active else m
        else:
            branch = m

        return x + self._drop_path(branch, deterministic)

    def _drop_path(
        self, x: jax.Array, deterministic: bool
    ) -> jax.Array:
        if self.drop_path == 0.0 or deterministic:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1))
        return x * mask.astype(x.dtype) / keep
