"""Execute the reference full_shot EPOCH LOOP end-to-end and record the
composed trajectory (VERDICT r4 #6 — the full_shot twin of
refexec_trajectory_*.npz).

Runs the reference's REAL ``train_one_epoch`` + ``test``
(full_shot/main/lib/core/function.py:46-268) composed exactly as
``tools/train.py:148-240`` composes them — ``build_criterion``
(lib/core/loss.py:132), ``build_optimizer`` (lib/optim/build.py:131,
set_wd param groups), ``build_lr_scheduler`` MultiStep
(lib/scheduler/build.py:15-19, stepped at each epoch end), per-step
``EMA`` (lib/utils/ema.py, assign->test->resume per epoch), AverageMeter
math — under torch CPU on tiny seeded models/datasets, and records the
per-iteration train losses, per-epoch meter means, and per-epoch val
top-1 so tests/test_refexec_trainer_epoch.py can replay the identical
protocol through peft_vit_tpu's production ``engine/trainer.py`` and pin
the whole composed epoch.

Two legs:

* **vit_mixup_ema** — the reference's own cls_vit.py tower trained with
  Mixup soft targets + label smoothing + grad-norm clipping + EMA
  validation + MultiStep decay (WD=0: the reference wd-exclusion is the
  model's ``no_weight_decay()`` skip set, pinned separately in the
  optimizer tests).
* **resnet_bn** — the reference's cls_resnet.py Bottleneck tower (live
  BatchNorm) trained with hard CE + WD with WITHOUT_WD_LIST=['bn'] +
  MultiStep decay; eval on running stats.

    PYTHONPATH= python tests/golden/generate_trainer_epoch_from_reference.py

Environment shims (reference files untouched):
* ``.cuda()`` / ``torch.cuda.synchronize`` are no-ops (CPU rig).
* ``autocast`` is injected as a no-op context manager: function.py:83
  calls ``autocast(enabled=...)`` but its import is COMMENTED OUT
  (function.py:15) — as shipped, the reference's train_one_epoch raises
  NameError; every real run of it must have patched an autocast in
  (the same class of latent bug as cls_ttnet_v2.py:289's missing os).
* timm is not installable offline, so ``timm.data.Mixup`` is stubbed
  with a faithful batch-mode reimplementation (one Beta(a,a) lam per
  batch, x.flip(0) mixing, smoothed one-hot soft targets — exactly
  timm's 'batch' mode); the post-mix batches are RECORDED and both
  frameworks consume the identical recorded tensors, so the pin on
  everything downstream (CE + SGD + EMA + scheduler + meters) is exact
  regardless of who produced the mix.
"""

from __future__ import annotations

import contextlib
import importlib.util
import os
import sys
import types

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
LIB = "/root/reference/full_shot/main/lib"


def _load_plain(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _seeded(seed):
    g = torch.Generator().manual_seed(seed)

    def rand(*shape):
        return torch.randn(shape, generator=g, dtype=torch.float32)

    return rand


def _randomize(module, rand, scale=0.05):
    with torch.no_grad():
        for name, p in module.named_parameters():
            v = rand(*p.shape) * scale
            if name.endswith("weight") and p.dim() == 1:
                v = v + 1.0
            p.copy_(v)


def _shim_cuda():
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.empty_cache = lambda: None
    torch.cuda.synchronize = lambda *a, **k: None


class _CN:
    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __contains__(self, k):  # yacs CfgNode `'METHOD' in cfg.X` support
        return k in self.__dict__


class _FaithfulMixup:
    """timm.data.Mixup, 'batch' mode, mixup only (cutmix off), recording
    every post-mix batch it emits."""

    def __init__(self, mixup_alpha=0.4, cutmix_alpha=0.0, cutmix_minmax=None,
                 prob=1.0, switch_prob=0.0, mode="batch",
                 label_smoothing=0.1, num_classes=4):
        assert mode == "batch" and cutmix_alpha == 0.0
        self.alpha = mixup_alpha
        self.smoothing = label_smoothing
        self.num_classes = num_classes
        self.record = []

    def _one_hot(self, y):
        off = self.smoothing / self.num_classes
        on = 1.0 - self.smoothing + off
        t = torch.full((y.size(0), self.num_classes), off)
        t.scatter_(1, y.view(-1, 1), on)
        return t

    def __call__(self, x, y):
        lam = float(np.random.beta(self.alpha, self.alpha))
        x = lam * x + (1.0 - lam) * x.flip(0)
        t = self._one_hot(y)
        t = lam * t + (1.0 - lam) * t.flip(0)
        self.record.append((x.clone().numpy(), t.clone().numpy()))
        return x, t


def _load_function(mixup_cls):
    """lib/core/function.py with its core/utils imports satisfied by the
    REAL reference modules and the two shipped-broken names injected."""
    _shim_cuda()
    evaluate = _load_plain("_fs_evaluate", os.path.join(LIB, "core/evaluate.py"))
    mixcut = _load_plain("_fs_mixcut", os.path.join(LIB, "core/mixcut.py"))
    mixup = _load_plain("_fs_mixup", os.path.join(LIB, "core/mixup.py"))
    comm = _load_plain("_fs_comm", os.path.join(LIB, "utils/comm.py"))
    _stub("core", evaluate=evaluate, mixcut=mixcut, mixup=mixup)
    sys.modules["core.evaluate"] = evaluate
    sys.modules["core.mixcut"] = mixcut
    sys.modules["core.mixup"] = mixup
    _stub("utils", comm=comm)
    sys.modules["utils.comm"] = comm
    _stub("timm")
    _stub("timm.data", Mixup=mixup_cls)
    sys.modules["timm"].data = sys.modules["timm.data"]
    fn = _load_plain("_fs_function", os.path.join(LIB, "core/function.py"))

    # function.py:83 references `autocast` whose import is commented out
    # (line 15) — inject the no-op the reference's real runs must patch
    @contextlib.contextmanager
    def autocast(enabled=False):
        yield

    fn.autocast = autocast
    return fn


def _load_builders():
    loss = _load_plain("_fs_loss", os.path.join(LIB, "core/loss.py"))
    if "timm" not in sys.modules:
        _stub("timm")
    if "timm.optim" not in sys.modules:
        _stub("timm.optim", create_optimizer=lambda *a, **k: None)
        sys.modules["timm"].optim = sys.modules["timm.optim"]
    optim = _load_plain("_fs_optim", os.path.join(LIB, "optim/build.py"))
    if "timm.scheduler" not in sys.modules:
        _stub("timm.scheduler", create_scheduler=lambda *a, **k: (None, None))
        sys.modules["timm"].scheduler = sys.modules["timm.scheduler"]
    # scheduler/build.py does `from .warmup_lr import WarmupCosineLR`
    pkg = _stub("_fs_schedpkg")
    pkg.__path__ = [os.path.join(LIB, "scheduler")]
    spec = importlib.util.spec_from_file_location(
        "_fs_schedpkg.build", os.path.join(LIB, "scheduler/build.py")
    )
    sched = importlib.util.module_from_spec(spec)
    sys.modules["_fs_schedpkg.build"] = sched
    spec.loader.exec_module(sched)
    ema = _load_plain("_fs_ema", os.path.join(LIB, "utils/ema.py"))
    return loss, optim, sched, ema


def _cfg(num_classes, lr, wd, epochs, *, mixup, smoothing, clip_norm,
         without_wd, milestones):
    return _CN(
        PRINT_FREQ=1,
        VERBOSE=False,
        OUTPUT_DIR="/tmp",
        AMP=_CN(ENABLED=False, MEMORY_FORMAT="nchw"),
        AUG=_CN(
            MIXUP=mixup, MIXCUT=0.0, MIXCUT_MINMAX=[],
            MIXUP_PROB=1.0 if mixup > 0 else 0.0,
            MIXUP_SWITCH_PROB=0.0, MIXUP_MODE="batch",
        ),
        LOSS=_CN(LOSS="softmax", LABEL_SMOOTHING=smoothing),
        MODEL=_CN(NUM_CLASSES=num_classes),
        TRAIN=_CN(
            LR=lr, WD=wd, OPTIMIZER="sgd", MOMENTUM=0.9, NESTEROV=True,
            WITHOUT_WD_LIST=list(without_wd),
            CLIP_GRAD_NORM=clip_norm,
            BEGIN_EPOCH=0, END_EPOCH=epochs, EVAL_BEGIN_EPOCH=0,
            LR_SCHEDULER=_CN(METHOD="MultiStep",
                             MILESTONES=list(milestones), GAMMA=0.1),
        ),
    )


def _make_data(seed, n_train, n_val, classes, image):
    rng = np.random.RandomState(seed)
    yt = np.tile(np.arange(classes), n_train // classes)
    xt = rng.randn(n_train, 3, image, image).astype(np.float32) * 0.3
    xt += np.linspace(-1, 1, classes)[yt][:, None, None, None]
    yv = np.tile(np.arange(classes), n_val // classes)
    xv = rng.randn(n_val, 3, image, image).astype(np.float32) * 0.3
    xv += np.linspace(-1, 1, classes)[yv][:, None, None, None]
    return xt, yt, xv, yv


def _loader(x, y, batch):
    return [
        (torch.from_numpy(x[i : i + batch]),
         torch.from_numpy(y[i : i + batch]))
        for i in range(0, len(y), batch)
    ]


def _save_sd(out, module):
    for k, v in module.state_dict().items():
        out["sd." + k] = v.numpy()


def _run_leg(model, cfg, xt, yt, xv, yv, batch, *, ema_decay, fn, loss_mod,
             optim_mod, sched_mod, ema_mod, mixup_recorder):
    criterion = loss_mod.build_criterion(cfg)
    criterion_eval = loss_mod.build_criterion(cfg, train=False)
    optimizer = optim_mod.build_optimizer(cfg, model)
    lr_scheduler = sched_mod.build_lr_scheduler(cfg, optimizer, 0)
    ema_model = ema_mod.EMA(model, ema_decay) if ema_decay > 0 else None
    scaler = torch.cuda.amp.GradScaler(enabled=False)

    # snapshot the INITIAL weights — the replay starts from these; the
    # end-of-run weights are saved under "fsd." for an end-state pin
    init_sd = {
        k: v.clone().numpy() for k, v in model.state_dict().items()
    }

    iter_losses = []
    real_criterion = criterion

    class _Rec(torch.nn.Module):
        def forward(self, outputs, y):
            loss = real_criterion(outputs, y)
            iter_losses.append(float(loss.item()))
            return loss

    train_loader = _loader(xt, yt, batch)
    val_loader = _loader(xv, yv, batch)

    epoch_losses, val_top1, val_top1_ema, lrs = [], [], [], []
    for epoch in range(cfg.TRAIN.END_EPOCH):
        n0 = len(iter_losses)
        lrs.append(float(optimizer.param_groups[0]["lr"]))
        fn.train_one_epoch(
            cfg, train_loader, model, _Rec(), optimizer, epoch,
            "/tmp", "/tmp", None, ema_model, scaler=scaler,
        )
        epoch_losses.append(float(np.mean(iter_losses[n0:])))
        perf = fn.test(cfg, val_loader, model, criterion_eval, "/tmp", "/tmp")
        val_top1.append(float(perf))
        if ema_model is not None:
            ema_model.assign(model)
            perf_ema = fn.test(
                cfg, val_loader, model, criterion_eval, "/tmp", "/tmp"
            )
            ema_model.resume(model)
            val_top1_ema.append(float(perf_ema))
        lr_scheduler.step()

    out = {
        "x_train": xt, "y_train": yt, "x_val": xv, "y_val": yv,
        "batch": np.asarray(batch),
        "iter_losses": np.asarray(iter_losses, np.float64),
        "epoch_losses": np.asarray(epoch_losses, np.float64),
        "val_top1": np.asarray(val_top1, np.float64),
        "lrs": np.asarray(lrs, np.float64),
        "epochs": np.asarray(cfg.TRAIN.END_EPOCH),
        "milestones": np.asarray(cfg.TRAIN.LR_SCHEDULER.MILESTONES),
        "lr": np.asarray(cfg.TRAIN.LR),
        "wd": np.asarray(cfg.TRAIN.WD),
        "clip_norm": np.asarray(cfg.TRAIN.CLIP_GRAD_NORM),
    }
    if ema_model is not None:
        out["val_top1_ema"] = np.asarray(val_top1_ema, np.float64)
        out["ema_decay"] = np.asarray(ema_decay)
    if mixup_recorder is not None:
        rec = mixup_recorder.record
        out["mixed_x"] = np.stack([r[0] for r in rec])
        out["mixed_y"] = np.stack([r[1] for r in rec])
    for k, v in init_sd.items():
        out["sd." + k] = v
    for k, v in model.state_dict().items():
        out["fsd." + k] = v.numpy()
    return out


def gen_vit_leg(fn_loader, builders, seed=61):
    """cls_vit + Mixup(0.4, smoothing 0.1) + clip-grad 1.0 + EMA 0.9 +
    MultiStep[2]@0.1 over 3 epochs x 4 iters."""
    loss_mod, optim_mod, sched_mod, ema_mod = builders
    # timm stubs for cls_vit itself
    if not hasattr(sys.modules.get("timm", None), "models"):
        layers = _stub("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()

            def forward(self, x):
                return x

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a, b)
            return tensor

        layers.DropPath = DropPath
        layers.trunc_normal_ = trunc_normal_
        layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
        _stub("timm.models", layers=layers)
        sys.modules["timm"].models = sys.modules["timm.models"]
    if "torch._six" not in sys.modules:
        import collections.abc as container_abcs

        six = types.ModuleType("torch._six")
        six.container_abcs = container_abcs
        sys.modules["torch._six"] = six

    ref = _load_plain("_fs_cls_vit", os.path.join(LIB, "models/cls_vit.py"))
    classes, image, patch, embed = 5, 16, 8, 32
    m = ref.VisionTransformer(
        img_size=image, patch_size=patch, num_classes=classes,
        embed_dim=embed, depth=2, num_heads=2, qkv_bias=True,
        pre_norm=True,
    )
    rand = _seeded(seed)
    _randomize(m, rand)

    cfg = _cfg(classes, lr=0.05, wd=0.0, epochs=3, mixup=0.4,
               smoothing=0.1, clip_norm=1.0, without_wd=[],
               milestones=[2])
    np.random.seed(seed)  # the Mixup lam draws
    recorder_holder = []

    class RecMixup(_FaithfulMixup):
        def __init__(self, **kw):
            super().__init__(**kw)
            recorder_holder.append(self)

    fn = fn_loader(RecMixup)
    xt, yt, xv, yv = _make_data(seed + 1, 40, 20, classes, image)
    # one shared recorder across per-epoch Mixup instances
    out = _run_leg(
        m, cfg, xt, yt, xv, yv, 8, ema_decay=0.9, fn=fn,
        loss_mod=loss_mod, optim_mod=optim_mod, sched_mod=sched_mod,
        ema_mod=ema_mod, mixup_recorder=None,
    )
    rec = []
    for r in recorder_holder:
        rec.extend(r.record)
    out["mixed_x"] = np.stack([r[0] for r in rec])
    out["mixed_y"] = np.stack([r[1] for r in rec])
    out["heads"] = np.asarray(2)
    np.savez(os.path.join(HERE, "refexec_trainer_epoch_vit.npz"), **out)
    print("vit leg:", out["epoch_losses"], out["val_top1"],
          out["val_top1_ema"], out["lrs"])


def gen_resnet_leg(fn_loader, builders, seed=62):
    """cls_resnet Bottleneck (live BN) + hard CE + WD 1e-4 with
    WITHOUT_WD_LIST=['bn'] + MultiStep[2]@0.1 over 3 epochs x 4 iters."""
    loss_mod, optim_mod, sched_mod, ema_mod = builders
    lib_dir = LIB
    sys.path.insert(0, lib_dir)
    try:
        ref = _load_plain(
            "_fs_cls_resnet", os.path.join(LIB, "models/cls_resnet.py")
        )
    finally:
        sys.path.remove(lib_dir)
    RN, Bot = ref.ResNet, ref.Bottleneck
    classes, image = 5, 32
    stage1 = RN.make_layer(
        Bot, 1, 1, avg_down=True, in_channels=16, out_channels=64,
        dropblock=None, bottleneck_channels=16,
    )
    stage2 = RN.make_layer(
        Bot, 1, 2, avg_down=True, in_channels=64, out_channels=128,
        dropblock=None, bottleneck_channels=32, with_se=True,
    )
    m = RN([stage1, stage2], res5_out_channels=128, num_classes=classes,
           stem_factor=0.25)
    rand = _seeded(seed)
    _randomize(m, rand)
    # keep BN running stats at their torch defaults (mean 0, var 1) —
    # _randomize touches parameters only, so nothing to restore

    cfg = _cfg(classes, lr=0.02, wd=1e-4, epochs=3, mixup=0.0,
               smoothing=0.0, clip_norm=0.0, without_wd=["bn"],
               milestones=[2])
    fn = fn_loader(_FaithfulMixup)
    xt, yt, xv, yv = _make_data(seed + 1, 40, 20, classes, image)
    out = _run_leg(
        m, cfg, xt, yt, xv, yv, 8, ema_decay=0.0, fn=fn,
        loss_mod=loss_mod, optim_mod=optim_mod, sched_mod=sched_mod,
        ema_mod=ema_mod, mixup_recorder=None,
    )
    np.savez(os.path.join(HERE, "refexec_trainer_epoch_resnet.npz"), **out)
    print("resnet leg:", out["epoch_losses"], out["val_top1"], out["lrs"])


def main():
    torch.manual_seed(0)
    fn_holder = {}

    def fn_loader(mixup_cls):
        # function.py is loaded once; swap the Mixup symbol per leg
        if "fn" not in fn_holder:
            fn_holder["fn"] = _load_function(mixup_cls)
        fn_holder["fn"].Mixup = mixup_cls
        return fn_holder["fn"]

    builders = _load_builders()
    gen_vit_leg(fn_loader, builders)
    gen_resnet_leg(fn_loader, builders)


if __name__ == "__main__":
    main()
