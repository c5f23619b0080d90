"""Execute the reference's ENGINE code paths and record golden fixtures.

Counterpart of generate_from_reference.py for the non-model machinery:
LR schedules, LARC, EMA, the loss zoo, mixup/mixcut, the optimizer's
no-weight-decay grouping, and — the flagship — the lr x wd sweep's
control flow (hyperparameter_sweep / hyperparameter_sweep_lr /
adjust_learning_rate from adapter_tuning_clip.py, run with a stubbed
train_task so only the reference's OWN search logic executes).

    PYTHONPATH= python tests/golden/generate_engine_from_reference.py

Everything lands in refexec_engine.npz; tests/test_refexec_engine.py
replays the same seeded inputs (via the *_inputs helpers here, which do
NOT touch the reference) through peft_vit_tpu and compares.

Import notes: warmup_lr.py / LARC.py / ema.py / loss.py / mixup.py /
mixcut.py are torch-only and load directly; build.py needs a timm.optim
stub; adapter_tuning_clip.py needs a wider stub set (vision_datasets,
tqdm is present, package-relative feature/optim/metric/models/datasets/
clip_load/common.constants, plus absolute vision_benchmark.* aliases) —
none of which participate in the sweep control flow.  mixcut.py calls
the long-removed np.int alias; the generator restores it for the call
(environment shim, the reference file is untouched).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import types

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"
LIB = os.path.join(REF, "full_shot", "main", "lib")
FEW = os.path.join(REF, "few_shot", "vision_benchmark", "evaluation")

OUT = {}


def _load_plain(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub(name: str, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _seeded(seed: int):
    g = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(*shape, generator=g, dtype=torch.float32)

    return rand


# ------------------------------------------------------------- inputs
# Shared between generator and test (pure torch/numpy, no reference).

def larc_inputs(seed=21):
    rand = _seeded(seed)
    params = [rand(4, 3), rand(8), rand(2, 2, 2)]
    grads = [[rand(*p.shape) for p in params] for _ in range(3)]
    return params, grads


def ema_inputs(seed=22):
    rand = _seeded(seed)
    init = [rand(3, 2), rand(5)]
    steps = [[rand(*p.shape) for p in init] for _ in range(3)]
    return init, steps


def loss_inputs(seed=23, b=4, c=6):
    rand = _seeded(seed)
    logits = rand(b, c)
    labels = torch.arange(b) % c
    soft = torch.softmax(rand(b, c), dim=-1)
    multihot = (rand(b, c) > 0.3).float()
    multihot[0] = 0.0
    multihot[0, 1] = 1.0  # uneven positive counts across rows
    return logits, labels, soft, multihot


def mixup_inputs(seed=24, b=6, c=3, hw=8):
    rand = _seeded(seed)
    x = rand(b, c, hw, hw)
    y = torch.arange(b) % 4
    return x, y


# ----------------------------------------------------------- schedules

def gen_schedules():
    wl = _load_plain("_ref_warmup_lr", os.path.join(LIB, "scheduler",
                                                    "warmup_lr.py"))

    def run(sched_cls, steps, /, **kw):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=0.1)
        sched = sched_cls(opt, **kw)
        lrs = []
        for _ in range(steps):
            lrs.append(opt.param_groups[0]["lr"])
            opt.step()
            sched.step()
        return np.asarray(lrs, np.float64)

    OUT["wc_lrs"] = run(
        wl.WarmupCosineLR, 60, max_iters=60, warmup_factor=0.001,
        warmup_epochs=10, warmup_method="linear",
    )
    OUT["ms_lrs"] = run(
        torch.optim.lr_scheduler.MultiStepLR, 10, milestones=[3, 6],
        gamma=0.1,
    )
    for key, kw in (
        ("cyc_tri", dict(mode="triangular")),
        ("cyc_tri2", dict(mode="triangular2")),
        ("cyc_exp", dict(mode="exp_range", gamma=0.98)),
    ):
        OUT[key] = run(
            torch.optim.lr_scheduler.CyclicLR, 40, base_lr=1e-4,
            max_lr=1e-2, step_size_up=8, cycle_momentum=False, **kw,
        )
    OUT["swalr_lrs"] = run(
        torch.optim.swa_utils.SWALR, 10, swa_lr=0.05, anneal_epochs=5,
        anneal_strategy="cos",
    )
    print("schedules:", {k: v[:3].round(6).tolist()
                         for k, v in OUT.items() if k.endswith("lrs")})


# ---------------------------------------------------------------- LARC

def gen_larc():
    larc_mod = _load_plain("_ref_larc", os.path.join(LIB, "optim",
                                                     "LARC.py"))
    for wd, tag in ((0.0, "wd0"), (0.01, "wd1")):
        params, grads = larc_inputs()
        ps = [torch.nn.Parameter(p.clone()) for p in params]
        opt = torch.optim.SGD(ps, lr=0.1, momentum=0.9, weight_decay=wd)
        opt = larc_mod.LARC(opt, trust_coefficient=0.02, clip=True)
        for step_grads in grads:
            for p, g in zip(ps, step_grads):
                p.grad = g.clone()
            opt.step()
        for i, p in enumerate(ps):
            OUT[f"larc_{tag}_p{i}"] = p.detach().numpy()
    print("larc: done")


# ----------------------------------------------------------------- EMA

def gen_ema():
    ema_mod = _load_plain("_ref_ema", os.path.join(LIB, "utils",
                                                   "ema.py"))
    init, steps = ema_inputs()
    model = torch.nn.Module()
    model.a = torch.nn.Parameter(init[0].clone())
    model.b = torch.nn.Parameter(init[1].clone())
    ema = ema_mod.EMA(model, decay=0.9)
    for sa, sb in steps:
        with torch.no_grad():
            model.a.copy_(sa)
            model.b.copy_(sb)
        ema(model)
    OUT["ema_shadow_a"] = ema.shadow["a"].numpy()
    OUT["ema_shadow_b"] = ema.shadow["b"].numpy()
    print("ema: done")


# -------------------------------------------------------------- losses

def gen_losses():
    loss_mod = _load_plain("_ref_loss", os.path.join(LIB, "core",
                                                     "loss.py"))
    logits, labels, soft, multihot = loss_inputs()
    OUT["loss_ls"] = loss_mod.LabelSmoothingCrossEntropy(0.1)(
        logits, labels).item()
    OUT["loss_soft"] = loss_mod.SoftTargetCrossEntropy()(
        logits, soft).item()
    OUT["loss_focal"] = loss_mod.FocalLoss(
        alpha=0.7, gamma=0.5, normalize=True)(logits, multihot).item()
    OUT["loss_focal_nonorm"] = loss_mod.FocalLoss(
        alpha=0.7, gamma=0.5, normalize=False)(logits, multihot).item()
    OUT["loss_msce"] = loss_mod.MultiSoftmaxCrossEntropyLoss()(
        logits, multihot.clone()).item()
    OUT["loss_mlsm"] = torch.nn.MultiLabelSoftMarginLoss(
        reduction="sum")(logits, multihot).item()
    OUT["loss_clip"] = loss_mod.CLIPContrastive()(
        logits[:, :4]).item()
    print("losses:", {k: round(OUT[k], 5) for k in OUT if
                      k.startswith("loss_")})


# -------------------------------------------------------- mixup/mixcut

def gen_mixup():
    mix = _load_plain("_ref_mixup", os.path.join(LIB, "core",
                                                 "mixup.py"))
    cut = _load_plain("_ref_mixcut", os.path.join(LIB, "core",
                                                  "mixcut.py"))
    x, y = mixup_inputs()
    np.random.seed(7)
    torch.manual_seed(7)
    mixed, y_a, y_b, lam = mix.mixup_data(x.clone(), y, 0.8)
    # the permutation is recoverable from y_b for distinct rows; store it
    OUT["mix_x"] = mixed.numpy()
    OUT["mix_lam"] = float(lam)
    OUT["mix_yb"] = y_b.numpy()
    np.random.seed(9)  # seed chosen so the cut box is non-empty (lam~0.77)
    torch.manual_seed(9)
    if not hasattr(np, "int"):  # removed alias used by rand_bbox
        np.int = int
        added = True
    else:
        added = False
    try:
        xcut, _, ycb, lamc = cut.mixcut_data(x.clone(), y, 1.0)
    finally:
        if added:
            del np.int
    OUT["cut_x"] = xcut.numpy()
    OUT["cut_lam"] = float(lamc)
    OUT["cut_yb"] = ycb.numpy()
    print("mixup lam:", OUT["mix_lam"], "mixcut lam:", OUT["cut_lam"])


# ----------------------------------------------------- wd param groups

def gen_set_wd():
    _stub("timm", models=None)
    _stub("timm.optim", create_optimizer=lambda *a, **k: None)
    build = _load_plain("_ref_optim_build", os.path.join(LIB, "optim",
                                                         "build.py"))

    class Tiny(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(4, 8, 3)          # decayed
            self.dw = torch.nn.Conv2d(8, 8, 3, groups=8)  # depthwise
            self.bn = torch.nn.BatchNorm2d(8)
            self.ln = torch.nn.LayerNorm(8)
            self.gn = torch.nn.GroupNorm(2, 8)
            self.fc = torch.nn.Linear(8, 2)               # w decayed, b not
            self.tok = torch.nn.Parameter(torch.zeros(8))

        def no_weight_decay(self):
            return {"tok"}

    cfg = types.SimpleNamespace(
        TRAIN=types.SimpleNamespace(
            WITHOUT_WD_LIST=["bn", "gn", "ln", "bias", "depthwise"]
        ),
        VERBOSE=False,
    )
    model = Tiny()
    groups = build.set_wd(cfg, model)
    id2name = {id(p): n for n, p in model.named_parameters()}
    no_wd = sorted(id2name[id(p)] for p in groups[1]["params"])
    with_wd = sorted(id2name[id(p)] for p in groups[0]["params"])
    OUT["wd_groups_json"] = json.dumps(
        {"no_wd": no_wd, "with_wd": with_wd}
    )
    print("set_wd no_wd:", no_wd)


# ------------------------------------------------------ sweep control

def _load_adapter_tuning():
    """Load adapter_tuning_clip.py with stubs for everything outside the
    sweep control flow."""
    pkg = _stub("_refpkg")
    pkg.__path__ = []
    for name in ("_refpkg.evaluation", "_refpkg.common",
                 "_refpkg.datasets", "_refpkg.models", "_refpkg.optim"):
        m = _stub(name)
        m.__path__ = []
    sys.modules["_refpkg.models"].__all__ = []
    sys.modules["_refpkg.datasets"].class_map = {}
    sys.modules["_refpkg.datasets"].template_map = {}
    _stub("_refpkg.evaluation.feature", FeatureData=object,
          extract_text_features=lambda *a, **k: None)
    _stub("_refpkg.evaluation.metric", get_metric=lambda *a, **k: None)
    _stub("_refpkg.evaluation.clip_load", __all__=[],
          adapter_load=lambda *a, **k: None)
    _stub("_refpkg.optim", build_optimizer=lambda *a, **k: None)
    _stub("_refpkg.common.constants",
          get_dataset_hub=lambda *a, **k: None,
          VISION_DATASET_STORAGE=None)
    # absolute aliases the file also imports
    vb = _stub("vision_benchmark")
    vb.__path__ = []
    _stub("vision_benchmark.datasets", SimpleTokenizer=object,
          HFPTTokenizer=object)
    _stub("vision_benchmark.evaluation",
          clip_zeroshot_evaluator=lambda *a, **k: None,
          construct_dataloader=lambda *a, **k: None)
    _stub("vision_datasets", ManifestDataset=object)
    name = "_refpkg.evaluation.adapter_tuning_clip"
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(FEW, "adapter_tuning_clip.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _Cfg:
    """Minimal yacs-like config shim for the sweep functions."""

    class _Train:
        SEARCH_WD_LOG_LOWER = -6
        SEARCH_WD_LOG_UPPER = 6
        LR = 1e-3
        WD = 0.0
        SCHEDULE = [3, 6]

    def __init__(self):
        self.TRAIN = self._Train()

    def defrost(self):
        pass

    def freeze(self):
        pass


def score_fn_a(idx: int) -> float:
    """Unimodal, peaked exactly at coarse index 48."""
    return 100.0 - abs(idx - 48)


def score_fn_b(idx: int) -> float:
    """Unimodal, peaked at 43 — between coarse points; separates the
    reference's left-wd refinement bug from clean refinement."""
    return 100.0 - abs(idx - 43)


def score_fn_lr(lr: float, idx: int) -> float:
    return 100.0 - abs(idx - 43) - 3.0 * abs(np.log10(lr) + 3.0)


def gen_sweep():
    mod = _load_adapter_tuning()
    grid = np.logspace(-6, 6, num=97)

    def nearest(wd):
        return int(np.abs(grid - wd).argmin())

    for fn, tag in ((score_fn_a, "a"), (score_fn_b, "b")):
        calls = []

        def train_task(train_dl, val_dl, config, sweep_run=False):
            wd = float(config.TRAIN.WD)
            calls.append(wd)
            return fn(nearest(wd))

        mod.train_task = train_task
        cfg = _Cfg()
        best_wd, best_score = mod.hyperparameter_sweep(None, None, cfg)
        OUT[f"sweep_{tag}_calls"] = np.asarray(calls, np.float64)
        OUT[f"sweep_{tag}_best_wd"] = float(best_wd)
        OUT[f"sweep_{tag}_best_score"] = float(best_score)
        print(f"sweep_{tag}: {len(calls)} cells, best wd idx",
              nearest(best_wd), "score", best_score)

    # full lr x wd search
    calls = []

    def train_task_lr(train_dl, val_dl, config, sweep_run=False):
        wd = float(config.TRAIN.WD)
        lr = float(config.TRAIN.LR)
        calls.append((lr, wd))
        return score_fn_lr(lr, nearest(wd))

    mod.train_task = train_task_lr
    cfg = _Cfg()
    best_lr, best_wd = mod.hyperparameter_sweep_lr(None, None, cfg)
    OUT["sweep_lr_best_lr"] = float(best_lr)
    OUT["sweep_lr_best_wd"] = float(best_wd)
    OUT["sweep_lr_ncalls"] = len(calls)
    print("sweep_lr best:", best_lr, nearest(best_wd), len(calls))

    # few-shot step-decay (adjust_learning_rate:380-386)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1e-3)
    lrs = []
    cfg = _Cfg()
    for epoch in range(10):
        mod.adjust_learning_rate(opt, epoch, cfg)
        lrs.append(opt.param_groups[0]["lr"])
    OUT["stepdecay_lrs"] = np.asarray(lrs, np.float64)
    print("stepdecay:", lrs[:5])




# --------------------------------------------- round-3 additions (D)

def contrastive_inputs(seed=61, b=6, d=8):
    rand = _seeded(seed)
    img = rand(b, d)
    txt = rand(b, d)
    labels = torch.tensor([0, 1, 2, 0, 1, 0])
    return img, txt, labels


def gen_hybrid_contrastive():
    """criterion.py HybridContrastive (:21-46) executed exactly as
    linear_classifier_contrast.py:260-264 drives it: logits = T *
    norm(img) @ norm(txt).T, targets = same-class indicator matrix,
    normalized soft-target CE in both directions."""
    crit = _load_plain("_ref_criterion",
                       os.path.join(FEW, "criterion.py"))
    img, txt, labels = contrastive_inputs()
    logit_scale = 1.7
    imgn = img / img.norm(dim=-1, keepdim=True)
    txtn = txt / txt.norm(dim=-1, keepdim=True)
    logits = float(np.exp(logit_scale)) * imgn @ txtn.t()
    targets = (labels.view(-1, 1) == labels.view(1, -1)).float()
    with torch.no_grad():
        OUT["hybrid_loss"] = crit.HybridContrastive()(
            logits, targets).item()
        OUT["hybrid_loss_i2t"] = crit.HybridContrastive(
            loss_type="i2t")(logits, targets).item()
    OUT["hybrid_logit_scale"] = logit_scale
    print("hybrid:", OUT["hybrid_loss"], OUT["hybrid_loss_i2t"])


def bn_probe_inputs(seed=62, b=8, d=6, classes=3):
    rand = _seeded(seed)
    feats_train = [rand(b, d) for _ in range(3)]
    feats_eval = rand(b, d)
    w = rand(classes, d) * 0.2
    bias = rand(classes) * 0.2
    return feats_train, feats_eval, w, bias


def gen_bn_probe():
    """linear_classifier.py Classifier (:38-57): BatchNorm1d(affine=
    False) -> Linear.  Executes three TRAIN-mode forwards (batch stats +
    running-stat updates at torch's default momentum 0.1) then an
    EVAL-mode forward (running stats) — pinning the probe's BN
    semantics across the sweep's train/validate cycle."""
    stubs_needed = False  # torch-only file? it imports .feature etc.
    # linear_classifier.py pulls the package; reuse the few_shot loader
    pkg = sys.modules.get("_refpkg")
    if pkg is None:
        stubs_needed = True
    mod = _load_few_shot_file("linear_classifier.py")
    del stubs_needed
    feats_train, feats_eval, w, bias = bn_probe_inputs()
    m = mod.Classifier(feats_train[0].shape[1], w.shape[0], 0.0)
    with torch.no_grad():
        m.layers[0].weight.copy_(w)
        m.layers[0].bias.copy_(bias)
    m.train()
    outs = []
    for f in feats_train:
        outs.append(m(f).detach().numpy())
    m.eval()
    with torch.no_grad():
        out_eval = m(feats_eval).numpy()
    for i, o in enumerate(outs):
        OUT[f"bn_probe_train{i}"] = o
    OUT["bn_probe_eval"] = out_eval
    OUT["bn_probe_running_mean"] = m.channel_bn.running_mean.numpy()
    OUT["bn_probe_running_var"] = m.channel_bn.running_var.numpy()
    print("bn_probe eval:", float(np.abs(out_eval).mean()))


def _load_few_shot_file(fname):
    """Package-context loader for few_shot evaluation files (stubs for
    feature/optim/metric/timm)."""
    import importlib.util

    for name, attrs in (
        ("_refpkg", {}),
        ("_refpkg.evaluation", {}),
        ("_refpkg.evaluation.feature", {"FeatureData": object,
                                        "get_model": lambda *a, **k: None}),
        ("_refpkg.evaluation.metric", {"get_metric": lambda *a, **k: None}),
        ("_refpkg.optim", {"build_optimizer": lambda *a, **k: None}),
    ):
        if name not in sys.modules:
            mod = _stub(name, **attrs)
            mod.__path__ = []
    name = "_refpkg.evaluation." + fname[:-3]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(FEW, fname)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


TOKENIZER_SAMPLES = [
    "a photo of a dog.",
    "a bad photo of the {}.".format("forest"),
    "itap of a traffic light.",
    "a black-and-white photo of a 1955 Chevrolet Bel-Air.",
    "x-ray of chest, Infiltration",
    "satellite imagery of a river; cloudy",
    "This is a photo of a large Boeing 747-400",
    "a plastic toy giraffe",
]


def gen_tokenizer():
    """datasets/simple_tokenizer.py SimpleTokenizer executed with the
    reference's own bpe_simple_vocab_16e6.txt.gz.  ftfy is stubbed as
    identity — fix_text is a unicode normalizer and every sample here is
    ASCII, so the executed path (html.unescape, regex split, BPE merge,
    SOT/EOT framing at context 77) is the reference's own."""
    if "ftfy" not in sys.modules:
        _stub("ftfy", fix_text=lambda s: s)
    tok_mod = _load_plain(
        "_ref_simple_tokenizer",
        os.path.join(os.path.dirname(FEW), "datasets",
                     "simple_tokenizer.py"),
    )
    bpe = os.path.join(os.path.dirname(FEW), "datasets",
                       "bpe_simple_vocab_16e6.txt.gz")
    tok = tok_mod.SimpleTokenizer(bpe_path=bpe)
    ids = tok.tokenize(TOKENIZER_SAMPLES, context_length=77)
    OUT["tokenizer_ids"] = ids.numpy()
    print("tokenizer ids:", ids.shape, ids[0, :8].tolist())




def intrinsic_inputs(seed=71, d=5, DD=11):
    rand = _seeded(seed)
    v = rand(d)
    x16 = rand(16)
    return v, x16


def gen_intrinsic():
    """intrinsic/fastfood.py executed: fast_walsh_hadamard_torched and the
    full fastfood transform H G Pi H (B v_pad) / (divisor * sqrt(DD/LL))
    (:81-190), plus DenseWrap's dense projection ray (dense.py:46-49:
    P ~ N(0,1)/sqrt(d), ray = P @ V)."""
    ff = _load_plain("_ref_fastfood",
                     os.path.join(LIB, "..", "intrinsic", "fastfood.py"))
    v, x16 = intrinsic_inputs()
    OUT["wht_out"] = ff.fast_walsh_hadamard_torched(
        x16.clone(), 0, normalize=False).numpy()
    torch.manual_seed(71)
    np.random.seed(71)
    BB, Pi, GG, divisor, LL = ff.fastfood_vars(11, device="cpu")
    with torch.no_grad():
        ret = ff.fastfood_torched(v.clone(), 11,
                                  [BB, Pi, GG, divisor, LL],
                                  device="cpu")
    OUT["ff_b"] = BB.numpy()
    OUT["ff_pi"] = Pi.numpy()
    OUT["ff_g"] = GG.numpy()
    OUT["ff_divisor"] = float(divisor)
    OUT["ff_ll"] = int(LL)
    OUT["ff_ret"] = ret.numpy()
    # dense ray
    rand = _seeded(72)
    P = rand(3, 4, 6) / 6 ** 0.5
    V = rand(6, 1)
    OUT["dense_p"] = P.numpy()
    OUT["dense_v"] = V.numpy()
    OUT["dense_ray"] = torch.matmul(P, V).squeeze(-1).numpy()
    print("intrinsic: ff_ret", OUT["ff_ret"][:3].round(4).tolist())


def main():
    gen_schedules()
    gen_hybrid_contrastive()
    gen_bn_probe()
    gen_tokenizer()
    gen_intrinsic()
    gen_larc()
    gen_ema()
    gen_losses()
    gen_mixup()
    gen_set_wd()
    gen_sweep()
    np.savez(os.path.join(HERE, "refexec_engine.npz"), **OUT)
    print("saved", len(OUT), "keys")


if __name__ == "__main__":
    main()
