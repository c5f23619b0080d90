from .loss import (
    build_criterion,
    clip_contrastive_loss,
    focal_loss,
    multilabel_soft_margin_loss,
    hybrid_contrastive_loss,
    sigmoid_multilabel_loss,
    soft_target_cross_entropy,
    softmax_cross_entropy,
)
from .train import (
    ArrayTask,
    TrainCellState,
    bce_per_example,
    ce_per_example,
    init_cell_state,
    make_array_task,
    make_epoch_fn,
    make_eval_fn,
    masked_accuracy,
    sgd_update,
    step_decay_lr,
)
from .sweep import SweepEngine
from .optim import build_lr_schedule, build_optimizer, larc
from .ema import (
    EmaState,
    SwaState,
    ema_init,
    ema_update,
    swa_init,
    swa_update,
    swalr_schedule,
)
from .mixup import cutmix, mixup, mixup_cutmix
from .metrics import get_metric, metric_for_dataset, topk_accuracy
from .trainer import (
    FullTrainState,
    PreemptedError,
    Trainer,
    batch_iterator,
)
from .zeroshot import (
    clip_zeroshot_evaluator,
    extract_image_features,
    extract_text_features,
)
from .caption_metrics import coco_caption_metrics
from .contrastive import (
    clip_contrastive_step_fn,
    contrastive_eval_logits,
    hybrid_contrastive_per_example,
    hybrid_contrastive_step_fn,
    make_clip_train_step,
)
from .ssl import (
    MobyEncoder,
    MobyState,
    init_moby_state,
    make_moby_train_step,
)
from .probes import (
    logistic_probe_sweep,
    logistic_probe_vmapped,
    multilabel_probe,
)
from .checkpoint import (
    dump_nan_state,
    restore_checkpoint,
    save_checkpoint,
)
from .cached import (
    first_trainable_layer,
    make_suffix_apply,
    maybe_cache_prefix,
    precompute_prefix_tokens,
)

__all__ = [
    "ArrayTask",
    "FullTrainState",
    "PreemptedError",
    "Trainer",
    "batch_iterator",
    "clip_contrastive_step_fn",
    "coco_caption_metrics",
    "hybrid_contrastive_per_example",
    "make_clip_train_step",
    "MobyEncoder",
    "MobyState",
    "init_moby_state",
    "make_moby_train_step",
    "clip_zeroshot_evaluator",
    "contrastive_eval_logits",
    "dump_nan_state",
    "extract_image_features",
    "extract_text_features",
    "hybrid_contrastive_step_fn",
    "logistic_probe_sweep",
    "logistic_probe_vmapped",
    "multilabel_probe",
    "restore_checkpoint",
    "save_checkpoint",
    "EmaState",
    "SwaState",
    "SweepEngine",
    "TrainCellState",
    "bce_per_example",
    "build_criterion",
    "build_lr_schedule",
    "build_optimizer",
    "ce_per_example",
    "clip_contrastive_loss",
    "cutmix",
    "ema_init",
    "ema_update",
    "focal_loss",
    "multilabel_soft_margin_loss",
    "get_metric",
    "hybrid_contrastive_loss",
    "init_cell_state",
    "larc",
    "make_array_task",
    "make_epoch_fn",
    "make_eval_fn",
    "masked_accuracy",
    "metric_for_dataset",
    "mixup",
    "mixup_cutmix",
    "sgd_update",
    "sigmoid_multilabel_loss",
    "soft_target_cross_entropy",
    "softmax_cross_entropy",
    "step_decay_lr",
    "swa_init",
    "swa_update",
    "swalr_schedule",
    "topk_accuracy",
]
