"""Execute the reference's TRAINING LOOP end-to-end and record the
trajectory (VERDICT r3 next-round #2 — the last un-executed layer of
the parity pyramid).

Runs the reference's real ``train_task`` → ``Classifier`` /
``train_one`` / ``validate`` / ``adjust_learning_rate`` /
``build_optimizer`` (few_shot/vision_benchmark/evaluation/
adapter_tuning_clip.py:228-380 for the adapter leg; the lora_clip.py
clone for the LoRA leg) under torch CPU on a tiny seeded few-shot task,
and saves:

* the full initial Classifier state dict (backbone + head + channel_bn),
* the dataset (fixed batch order, no shuffling),
* per-epoch mean train losses (AverageMeter.avg over the epoch),
* per-epoch train/val metric values,
* the returned best score,

so tests/test_refexec_trajectory.py can replay the identical protocol
through peft_vit_tpu's sweep-cell engine (make_epoch_fn/make_eval_fn +
sgd_update + step_decay_lr + the channel_bn standardizer) from the
converted initial weights and pin the whole trajectory.

    PYTHONPATH= python tests/golden/generate_trajectory_from_reference.py

Environment shims (the reference files are untouched):
* ``.cuda()`` / ``torch.cuda.set_device`` / ``empty_cache`` are no-ops
  (CPU-only rig; reference hardcodes ``target.cuda(...)``).
* ``get_metric('accuracy')`` is a faithful top-1 stub
  (vision_evaluation is not installable offline; its accuracy evaluator
  is sklearn accuracy_score on argmax — metric.py:36-47).
* ``adapter_load`` / ``lora_load`` return a pre-built tiny CLIP from the
  reference's OWN adapter_model.py / lora_model.py (the real loaders
  only add checkpoint download + fp32 conversion, clip_load.py:193-235).

NB the LoRA leg runs at batch 4 / heads 1, where lora_model.py:730-731's
flat (N, B, C) -> (B*H, N, hd) delta reshape is a REAL scramble — the
fixture therefore pins PEFTSpec.lora_ref_reshape=True semantics (what
every real reference LoRA training run executes).
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
OPTIM = "/root/reference/few_shot/vision_benchmark/optim/build.py"


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
            if name == "logit_scale":
                v = torch.full_like(p, float(np.log(1 / 0.07)))
            p.copy_(v)


def _shim_cuda():
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.empty_cache = lambda: None


def _accuracy(labels, probs):
    """vision_evaluation 'accuracy' semantics: top-1 on softmax scores."""
    return float((np.asarray(probs).argmax(-1) == np.asarray(labels)).mean())


def _real_build_optimizer():
    """Load the reference's optim/build.py (timm.optim stubbed; the sgd
    path never touches it)."""
    if "timm.optim" not in sys.modules:
        timm = sys.modules.get("timm") or _stub("timm")
        _stub("timm.optim", create_optimizer=lambda *a, **k: None)
        timm.optim = sys.modules["timm.optim"]
    return _load_plain("_ref_optim_build", OPTIM).build_optimizer


def _load_driver(fname: str, build_optimizer, metric_calls):
    """Load a *_clip.py driver with everything OUTSIDE the training loop
    stubbed, and the REAL optimizer builder + a recording metric."""
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

    def get_metric(name):
        assert name == "accuracy", name

        def accuracy(labels, probs):
            r = _accuracy(labels, probs)
            metric_calls.append(r)
            return r

        return accuracy

    _stub("_refpkg.evaluation.metric", get_metric=get_metric)
    _stub("_refpkg.evaluation.clip_load", __all__=[],
          adapter_load=lambda *a, **k: None,
          lora_load=lambda *a, **k: None)
    sys.modules["_refpkg.optim"].build_optimizer = build_optimizer
    _stub("_refpkg.common.constants",
          get_dataset_hub=lambda *a, **k: None,
          VISION_DATASET_STORAGE=None)
    vb = _stub("vision_benchmark")
    vb.__path__ = []
    _stub("vision_benchmark.datasets", SimpleTokenizer=object,
          HFPTTokenizer=object)
    _stub("vision_benchmark.evaluation",
          clip_zeroshot_evaluator=lambda *a, **k: None,
          construct_dataloader=lambda *a, **k: None)
    _stub("vision_datasets", ManifestDataset=object)
    name = "_refpkg.evaluation." + fname[:-3]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(FEW, fname)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _CN:
    def __init__(self, **kw):
        self.__dict__.update(kw)

    def defrost(self):
        pass

    def freeze(self):
        pass


def _make_cfg(num_classes, embed_dim, lr, wd, epochs, schedule):
    cfg = _CN()
    cfg.GPUS = [0]
    cfg.VERBOSE = False
    cfg.TRAIN = _CN(
        LR=lr, WD=wd, BEGIN_EPOCH=0, END_EPOCH=epochs,
        SCHEDULE=list(schedule), OPTIMIZER="sgd", MOMENTUM=0.9,
        NESTEROV=True, WITHOUT_WD_LIST=[], TWO_LR=False,
        FREEZE_IMAGE_BACKBONE=False, INIT_HEAD_WITH_TEXT_ENCODER=False,
        MERGE_ENCODER_AND_HEAD_PROJ=False, INIT_HEAD_WITH_LOGIT_SCALE=False,
        NORMALIZE_VISUAL_FEATURE=False, EMULATE_ZERO_SHOT=False,
        SEARCH_RESULT_ON_LAST_EPOCH=False,
        SEARCH_WD_LOG_LOWER=-6, SEARCH_WD_LOG_UPPER=6,
    )
    cfg.MODEL = _CN(NAME="tiny_clip", SPEC=_CN(EMBED_DIM=embed_dim))
    cfg.DATASET = _CN(DATASET="synthetic-tiny", NUM_CLASSES=num_classes)
    cfg.TEST = _CN(METRIC="accuracy")
    cfg.CUDNN = _CN(BENCHMARK=False, DETERMINISTIC=True)
    return cfg


def _make_data(seed, n_train=16, n_val=8, classes=4, image=32, batch=4):
    """Separable seeded blobs, fixed batch order (lists as dataloaders)."""
    rng = np.random.RandomState(seed)
    def blobs(n):
        y = np.arange(n) % classes
        x = rng.randn(n, 3, image, image).astype(np.float32) * 0.4
        x += np.linspace(-1.2, 1.2, classes)[y][:, None, None, None]
        return x, y.astype(np.int64)

    xt, yt = blobs(n_train)
    xv, yv = blobs(n_val)
    train_dl = [
        (torch.from_numpy(xt[i : i + batch]),
         torch.from_numpy(yt[i : i + batch]))
        for i in range(0, n_train, batch)
    ]
    val_dl = [
        (torch.from_numpy(xv[i : i + batch]),
         torch.from_numpy(yv[i : i + batch]))
        for i in range(0, n_val, batch)
    ]
    return (xt, yt, xv, yv), train_dl, val_dl


def _run_leg(tag, driver_file, model_file, loader_name, seed,
             lr=0.03, wd=1e-4, epochs=4, schedule=(2, 3)):
    """Execute one method's train_task and dump the trajectory fixture."""
    _shim_cuda()
    metric_calls = []
    mod = _load_driver(driver_file, _real_build_optimizer(), metric_calls)

    # tiny CLIP from the reference's OWN model file
    ref_model_mod = _load_plain(
        f"_ref_model_{tag}", os.path.join(FEW, model_file)
    )
    rand = _seeded(seed)
    image, patch, vwidth, vlayers, embed = 32, 16, 64, 2, 16
    clip = ref_model_mod.CLIP(
        embed, image, vlayers, vwidth, patch, 12, 50, 32, 2, 2
    )
    _randomize(clip, rand)
    clip = clip.float()
    setattr(mod, loader_name, lambda *a, **k: (clip, None))

    classes = 4
    cfg = _make_cfg(classes, embed, lr, wd, epochs, schedule)
    arrays, train_dl, val_dl = _make_data(seed + 1, classes=classes,
                                          image=image)

    # capture per-epoch mean train losses via the criterion
    losses_by_epoch = []
    real_ce = torch.nn.CrossEntropyLoss

    class RecordingCE(real_ce):
        def forward(self, out, target):
            loss = super().forward(out, target)
            losses_by_epoch[-1].append(float(loss.detach()))
            return loss

    mod.torch.nn.CrossEntropyLoss = RecordingCE

    real_train_one = mod.train_one

    def train_one_wrap(*a, **k):
        losses_by_epoch.append([])
        return real_train_one(*a, **k)

    mod.train_one = train_one_wrap

    # snapshot the INITIAL Classifier weights: only the head Linear
    # draws from torch's global RNG (backbone is the prebuilt clip,
    # channel_bn is affine-free), so seeding the same value before
    # train_task's own Classifier build reproduces this state exactly
    torch.manual_seed(seed + 7)
    proto = mod.Classifier(cfg, 0)
    init_sd = {k: v.clone() for k, v in proto.state_dict().items()}

    torch.manual_seed(seed + 7)
    best = mod.train_task(train_dl, val_dl, cfg, sweep_run=False)

    # metric_calls alternate train/val per epoch (train_one then validate)
    train_metrics = metric_calls[0::2]
    val_metrics = metric_calls[1::2]
    assert len(train_metrics) == epochs and len(val_metrics) == epochs
    epoch_losses = [float(np.mean(ls)) for ls in losses_by_epoch]

    out = {
        "x_train": arrays[0], "y_train": arrays[1],
        "x_val": arrays[2], "y_val": arrays[3],
        "lr": lr, "wd": wd, "epochs": epochs,
        "schedule": np.asarray(schedule, np.int64),
        "batch": 4,
        "train_losses": np.asarray(epoch_losses, np.float64),
        "train_metrics": np.asarray(train_metrics, np.float64),
        "val_metrics": np.asarray(val_metrics, np.float64),
        "best": float(best),
    }
    for k, v in init_sd.items():
        out["sd__" + k.replace(".", "__")] = v.detach().numpy()
    path = os.path.join(HERE, f"refexec_trajectory_{tag}.npz")
    np.savez(path, **out)
    print(f"refexec_trajectory_{tag}: losses={epoch_losses} "
          f"val={val_metrics} best={best}")


def gen_adapter(seed=71):
    _run_leg("adapter", "adapter_tuning_clip.py", "adapter_model.py",
             "adapter_load", seed)


def gen_lora(seed=73):
    _run_leg("lora", "lora_clip.py", "lora_model.py", "lora_load", seed)


if __name__ == "__main__":
    gen_adapter()
    gen_lora()
