"""Full-shot trainer: the pjit epoch loop.

Functional re-design of the reference distributed trainer
(full_shot/main/tools/train.py:64-291 + lib/core/function.py:46-268):

* epoch loop with train/eval, best-model tracking, auto-resume
* mixup/cutmix + label smoothing folded into the jitted step
* bf16 compute (the reference's AMP autocast+GradScaler; bf16 needs no
  loss scaling)
* optax optimizer/schedule from config (sgd/adam/adamW/rmsprop, LARC,
  WarmupCosine/MultiStep/Cosine), gradient-norm clip
* EMA shadow update per step; SWA averaging after SWA.BEGIN_EPOCH
* NaN-loss forensic dump + abort (lib/core/function.py:91-107)
* per-step throughput meters and cross-device metric reduction (the
  _meter_reduce allreduce is a jnp.mean under pjit — GSPMD inserts the
  collective)
* rank-0 Orbax checkpointing with TRAIN.AUTO_RESUME
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..peft.masks import merge_params
from .checkpoint import dump_nan_state, restore_checkpoint, save_checkpoint
from .ema import EmaState, SwaState, ema_init, ema_update, swa_init, swa_update
from .loss import build_criterion
from .mixup import mixup_cutmix
from .optim import build_lr_schedule, build_optimizer

logger = logging.getLogger(__name__)


def _as_device(a):
    """Pass through arrays already placed by the prefetch pipeline (a
    multi-host global array must not be re-converted)."""
    return a if isinstance(a, jax.Array) else jnp.asarray(a)


def _host_view(a):
    """Best-effort host copy for forensic dumps: a non-fully-addressable
    (multi-host) array yields this process's shards only."""
    if a is None:
        return None
    if isinstance(a, jax.Array) and not a.is_fully_addressable:
        return np.concatenate(
            [np.asarray(s.data) for s in a.addressable_shards]
        )
    return np.asarray(a)


class PreemptedError(RuntimeError):
    """Raised after a SIGTERM-triggered checkpoint: the run stopped
    cleanly at a dispatch boundary and will resume at that exact batch."""


class FullTrainState(NamedTuple):
    trainable: Any
    opt_state: Any
    step: jax.Array
    ema: Optional[EmaState]
    swa: Optional[SwaState]
    batch_stats: Any = None  # live-BN running stats (CNN backbones)
    # every-step NaN guard: AND of isfinite(loss) over all steps since
    # init — checked at each host fetch, so a NaN inside a scan chunk or
    # between PRINT_FREQ fetches cannot train through undetected (the
    # reference checks every step, lib/core/function.py:91-107)
    finite: Any = None


class Trainer:
    """Owns the jitted steps + host-side epoch loop for one config."""

    def __init__(
        self,
        cfg,
        model,
        params,
        mask,
        steps_per_epoch: int,
        mesh=None,
        rng: Optional[jax.Array] = None,
        batch_stats: Any = None,
    ):
        from ..peft.masks import split_params

        self.cfg = cfg
        self.model = model
        if bool(cfg.TRAIN.DETECT_ANOMALY):
            # torch.autograd.set_detect_anomaly analog (tools/train.py:159)
            from ..utils.profiling import enable_anomaly_detection

            enable_anomaly_detection(True)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.steps_per_epoch = steps_per_epoch
        self.mesh = mesh
        self.has_bn = bool(batch_stats)

        # TPU.MESH.PIPE > 1: pipeline the scan-layers block stack over
        # the mesh's pipe axis (parallel/pipeline.py GPipe schedule)
        self.pipeline = 0
        if mesh is not None and "pipe" in mesh.axis_names:
            self.pipeline = int(mesh.shape["pipe"])
            if self.pipeline > 1:
                if not getattr(model.backbone, "scan_layers", False):
                    raise ValueError(
                        "TPU.MESH.PIPE > 1 needs TPU.SCAN_LAYERS=True "
                        "(the pipeline stages the stacked block params)"
                    )
                if self.has_bn:
                    raise ValueError(
                        "pipeline parallelism supports LN towers only "
                        "(no batch_stats)"
                    )
        self.pp_microbatches = (
            int(cfg.TPU.get("PP_MICROBATCHES", 0)) or self.pipeline or 1
        )

        trainable, frozen = split_params(params, mask)
        # the jitted step donates the state (trainable/opt/batch_stats):
        # copy what we were handed so donation never deletes caller-owned
        # buffers shared with other Trainer instances
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        trainable = copy(trainable)
        batch_stats = copy(batch_stats) if self.has_bn else None
        self.frozen = frozen
        self.schedule = build_lr_schedule(cfg, steps_per_epoch)
        self.tx = build_optimizer(
            cfg, trainable, steps_per_epoch, self.schedule
        )
        ema = (
            ema_init(trainable, float(cfg.TRAIN.EMA_DECAY))
            if float(cfg.TRAIN.EMA_DECAY) > 0
            else None
        )
        swa = swa_init(trainable) if bool(cfg.SWA.ENABLED) else None
        opt_state = self.tx.init(trainable)
        # TPU.ZERO1: shard the optimizer state over the data axis (the
        # production-trainer wiring of parallel/train_step.py:60-77) —
        # GSPMD lowers the gradient all-reduce to reduce-scatter +
        # all-gather around the sharded update
        self.zero1 = bool(cfg.TPU.get("ZERO1", False)) and mesh is not None
        self._opt_shardings = None
        if self.zero1:
            from ..parallel.mesh import replicated, zero_tree_shardings

            self._opt_shardings = zero_tree_shardings(mesh, opt_state)
            opt_state = jax.tree_util.tree_map(
                jax.device_put, opt_state, self._opt_shardings
            )
            rep = replicated(mesh)
            trainable = jax.device_put(trainable, rep)
        self.state = FullTrainState(
            trainable=trainable,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            ema=ema,
            swa=swa,
            batch_stats=batch_stats if self.has_bn else None,
            finite=jnp.ones((), jnp.bool_),
        )

        aug = cfg.AUG
        self.use_mixup = (
            float(aug.MIXUP) > 0.0 or float(aug.MIXCUT) > 0.0
        )
        self.criterion = build_criterion(cfg, train=True)
        if self.use_mixup and cfg.LOSS.LOSS in (
            "softmax",
            "CE",
            "softmax_smooth",
            "labelSmoothCE",
            "soft_target",
            "softTargetCE",
        ):
            # timm convention: mixup owns label smoothing — its soft targets
            # are already smoothed, so the criterion must not re-smooth
            from .loss import soft_target_cross_entropy

            self.criterion = soft_target_cross_entropy
        self.eval_criterion = build_criterion(cfg, train=False)
        self.num_classes = int(cfg.MODEL.NUM_CLASSES) or int(
            cfg.DATASET.NUM_CLASSES
        )

        # device-side timm-aug (RandAugment/RandomErasing on the raw
        # [0,255] batch inside the jitted step; data/augment.py) — when
        # active, batches must arrive UN-normalized and eval normalizes
        # on device too
        from ..data.augment import make_train_transform

        self.train_transform = make_train_transform(cfg)
        self._norm_mean = jnp.asarray(cfg.INPUT.MEAN, jnp.float32) * 255.0
        self._norm_std = jnp.asarray(cfg.INPUT.STD, jnp.float32) * 255.0

        self._qk_cache = None  # (frozen identity, device int8 tree)
        self._train_step = self._build_train_step()
        self._eval_step = jax.jit(self._eval_fn)
        # set by the SIGTERM handler fit() installs (TPU preemption
        # notice): train_one_epoch checkpoints at the next dispatch
        # boundary and raises PreemptedError
        self._preempted = False

    # -- jitted steps --------------------------------------------------------

    def _build_train_step(self):
        cfg = self.cfg
        aug = cfg.AUG
        use_mixup = self.use_mixup
        num_classes = self.num_classes
        smoothing = float(cfg.LOSS.LABEL_SMOOTHING)
        model = self.model
        criterion = self.criterion
        tx = self.tx
        swa_begin = int(cfg.SWA.BEGIN_EPOCH)

        has_bn = self.has_bn
        pipeline = self.pipeline
        pp_mesh = self.mesh
        pp_microbatches = self.pp_microbatches

        transform = self.train_transform
        norm_mean, norm_std = self._norm_mean, self._norm_std
        do_flip = bool(cfg.AUG.get("RANDOM_FLIP", True))

        # DropBlock (AUG.DROPBLOCK_KEEP_PROB < 1, cls_resnet.py:409-419):
        # the model needs a 'dropblock' PRNG stream and the keep-prob
        # anneal position = global step / total steps
        use_dropblock = float(cfg.AUG.get("DROPBLOCK_KEEP_PROB", 1.0)) < 1.0
        if use_dropblock:
            # build-time guard (ADVICE r3): only the ResNet family
            # accepts the keep-prob anneal `progress` — ImageClassifier
            # forwards it positionally (models/classifier.py), which
            # would silently land on a ViT's return_tokens slot
            from ..models.resnet import ResNet

            backbone = getattr(model, "backbone", None)
            if not isinstance(backbone, ResNet):
                raise ValueError(
                    "AUG.DROPBLOCK_KEEP_PROB < 1 requires a ResNet "
                    f"backbone (got {type(backbone).__name__}); DropBlock "
                    "is a CNN regularizer (reference cls_resnet.py:409-419)"
                )
        total_steps = max(
            1, int(cfg.TRAIN.END_EPOCH) * int(self.steps_per_epoch)
        )

        def loss_fn(trainable, frozen, qk, batch_stats, x, y, rng, step):
            params = merge_params(trainable, frozen)
            if transform is not None:
                rng, t_rng = jax.random.split(rng)
                x = transform(t_rng, x)
            elif x.dtype == jnp.uint8:
                # raw-uint8 input path: flip + normalize on device (4x
                # fewer host->HBM bytes than shipping float32, and the
                # host never touches pixel floats — critical on thin
                # host CPUs)
                if do_flip:
                    rng, f_rng = jax.random.split(rng)
                    sel = jax.random.bernoulli(
                        f_rng, 0.5, (x.shape[0],)
                    )
                    x = jnp.where(
                        sel[:, None, None, None], x[:, :, ::-1, :], x
                    )
                x = (x.astype(jnp.float32) - norm_mean) / norm_std
            if use_mixup:
                x, y = mixup_cutmix(
                    rng,
                    x,
                    y,
                    num_classes,
                    mixup_alpha=float(aug.MIXUP) or 0.2,
                    cutmix_alpha=float(aug.MIXCUT) or 1.0,
                    switch_prob=float(aug.MIXUP_SWITCH_PROB),
                    smoothing=smoothing,
                )
            variables = {"params": params}
            if qk is not None:
                # TPU.INT8_FWD_TRAIN: qk is a variables update holding
                # the pre-quantized kernels ({"qkernel": ...}) and, under
                # TPU.INT8_STATIC_ACT, the calibrated per-tensor
                # activation scales ({"qscale": ...})
                variables.update(qk)
            # DropBlock kwargs wired on EVERY apply path (ADVICE r3: a
            # FROZEN_BN ResNet takes the non-BN branch below and still
            # needs the 'dropblock' PRNG stream + anneal position)
            kw = {}
            if use_dropblock:
                rng, db_rng = jax.random.split(rng)
                kw = {
                    "progress": step.astype(jnp.float32) / total_steps,
                    "rngs": {"dropblock": db_rng},
                }
            if has_bn:
                variables["batch_stats"] = batch_stats
                logits, updates = model.apply(
                    variables, x, True, mutable=["batch_stats"], **kw
                )
                new_stats = updates["batch_stats"]
            elif pipeline > 1:
                from ..parallel.pipeline import vit_pipeline_forward

                logits = vit_pipeline_forward(
                    model,
                    variables,
                    x,
                    mesh=pp_mesh,
                    microbatches=pp_microbatches,
                    batch_axis="data",
                    deterministic=False,
                )
                new_stats = batch_stats
            else:
                logits = model.apply(variables, x, True, **kw)
                new_stats = batch_stats
            loss = criterion(logits.astype(jnp.float32), y)
            return loss, (logits, new_stats)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        opt_shardings = self._opt_shardings

        # TPU.INT8_FWD_TRAIN: quantize the frozen tower's kernels ONCE
        # per RUN — the tower is constant for the Trainer's whole life,
        # so the int8 tree is computed outside the jitted step entirely
        # (see _frozen_qk) and passed in device-resident.  Per-step
        # weight quantization was measured as the dominant overhead of
        # the on-the-fly path, and even per-dispatch requantization costs
        # ~0.5% at k=32 (BASELINE.md round 4).
        int8_fwd = bool(cfg.TPU.get("INT8_FWD_TRAIN", False))
        int8_targets = tuple(
            cfg.TPU.get(
                "INT8_TARGETS", ["in_proj", "out_proj", "c_fc", "c_proj"]
            )
        )

        int8_bwd_dx = bool(cfg.TPU.get("INT8_BWD_DX", False))

        def _qk(frozen):
            if not int8_fwd:
                return None
            from ..ops.int8 import quantize_frozen_tree

            return quantize_frozen_tree(
                frozen, targets=int8_targets, bwd_dx=int8_bwd_dx
            )

        self._quantize_frozen = _qk if int8_fwd else None

        # TPU.INT8_STATIC_ACT: per-tensor STATIC activation scales,
        # calibrated once per run on the first batch (ops/int8.py
        # int8_static_matmul) — removes the per-row absmax reduce the
        # xprof showed at 2.9 TF/s for 13% of the step (BASELINE.md
        # round 4); the elementwise quantize then fuses into the
        # activation producers.  On preemption resume the scales are
        # re-calibrated from the first resumed batch — the saturating
        # static quantizer is tolerant to that batch-level jitter.
        self._int8_static = int8_fwd and bool(
            cfg.TPU.get("INT8_STATIC_ACT", False)
        )
        self._qscale = None
        if self._int8_static:
            from ..ops.int8 import activation_scales_from_stats

            calib_margin = float(cfg.TPU.get("INT8_CALIB_MARGIN", 1.5))

            def _calib(trainable, frozen, batch_stats, x):
                params = merge_params(trainable, frozen)
                if x.dtype == jnp.uint8 or transform is not None:
                    x = (x.astype(jnp.float32) - norm_mean) / norm_std
                variables = {"params": params}
                mut = ["qstats"]
                if has_bn:
                    variables["batch_stats"] = batch_stats
                    mut.append("batch_stats")  # BN update discarded
                _, st = model.apply(variables, x, True, mutable=mut)
                return activation_scales_from_stats(
                    st["qstats"], margin=calib_margin
                )

            self._calibrate = jax.jit(_calib)

        def train_step_inner(state, frozen, qk, x, y, rng, epoch):
            (loss, (logits, new_stats)), grads = grad_fn(
                state.trainable, frozen, qk, state.batch_stats, x, y, rng,
                state.step,
            )
            updates, opt_state = tx.update(
                grads, state.opt_state, state.trainable
            )
            if opt_shardings is not None:  # ZeRO-1: pin the sharded layout
                opt_state = jax.lax.with_sharding_constraint(
                    opt_state, opt_shardings
                )
            trainable = optax.apply_updates(state.trainable, updates)
            ema = state.ema
            if ema is not None:
                ema = ema_update(ema, trainable)
            swa = state.swa
            if swa is not None and swa_begin >= 0:
                swa = jax.lax.cond(
                    epoch >= swa_begin,
                    lambda s: swa_update(s, trainable),
                    lambda s: s,
                    swa,
                )
            finite = jnp.logical_and(state.finite, jnp.isfinite(loss))
            new_state = FullTrainState(
                trainable,
                opt_state,
                state.step + 1,
                ema,
                swa,
                new_stats,
                finite,
            )
            return new_state, loss, logits

        def train_step(state: FullTrainState, frozen, qk, x, y, rng, epoch):
            return train_step_inner(state, frozen, qk, x, y, rng, epoch)

        # TPU.STEPS_PER_DISPATCH > 1: scan K steps inside one jitted call
        # over a (K, B, ...) chunk.  One host->device transfer + one
        # dispatch per K steps — amortizes per-dispatch host cost exactly
        # like bench.py's k_chain, and is the production shape for
        # environments where dispatch/transfer latency is material.
        def train_step_scan(state, frozen, qk, xs, ys, rng, epoch):
            def body(carry, inp):
                s, r = carry
                r, sub = jax.random.split(r)
                x, y = inp
                s, loss, _ = train_step_inner(
                    s, frozen, qk, x, y, sub, epoch
                )
                return (s, r), loss

            (state, _), losses = jax.lax.scan(
                body, (state, rng), (xs, ys)
            )
            return state, losses

        if self.mesh is not None:
            # data-parallel over the mesh: batch sharded, state replicated;
            # GSPMD inserts the gradient all-reduce (the DDP analog)
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.mesh import DATA_AXIS, batch_sharding, replicated

            bsh = batch_sharding(self.mesh)
            rep = replicated(self.mesh)
            # chunk layout (K, B, ...): batch axis is axis 1
            csh = NamedSharding(self.mesh, PartitionSpec(None, DATA_AXIS))
            self._train_step_scan = jax.jit(
                train_step_scan,
                donate_argnums=(0,),
                in_shardings=(None, None, None, csh, csh, rep, rep),
            )
            return jax.jit(
                train_step,
                donate_argnums=(0,),
                in_shardings=(None, None, None, bsh, bsh, rep, rep),
            )
        self._train_step_scan = jax.jit(train_step_scan, donate_argnums=(0,))
        return jax.jit(train_step, donate_argnums=(0,))

    def _frozen_qk(self):
        """The device-resident int8 tree for TPU.INT8_FWD_TRAIN.

        The frozen tower never changes during a run, so its kernels are
        quantized exactly once (first dispatch) and reused for every
        step thereafter — the k->infinity limit of the old per-dispatch
        amortization, for free at any STEPS_PER_DISPATCH.  Keyed on the
        frozen tree's identity so a caller that swaps ``self.frozen``
        (e.g. loading a different checkpoint) gets a fresh tree.
        """
        if self._quantize_frozen is None:
            return None
        if self._qk_cache is None or self._qk_cache[0] is not self.frozen:
            qk = jax.jit(self._quantize_frozen)(self.frozen)
            self._qk_cache = (self.frozen, qk)
        return self._qk_cache[1]

    def _qk_vars(self, x=None):
        """The variables-update dict the jitted step consumes: the
        per-run pre-quantized kernels plus, under TPU.INT8_STATIC_ACT,
        the calibrated activation scales (calibrated lazily on the
        first batch ``x`` seen)."""
        qk = self._frozen_qk()
        if qk is None:
            return None
        out = {"qkernel": qk}
        if self._int8_static:
            if self._qscale is None and x is not None:
                self._qscale = self._calibrate(
                    self.state.trainable,
                    self.frozen,
                    self.state.batch_stats,
                    _as_device(x),
                )
            if self._qscale is not None:
                out["qscale"] = self._qscale
        return out

    def _eval_fn(self, trainable, frozen, batch_stats, x):
        params = merge_params(trainable, frozen)
        if self.train_transform is not None or x.dtype == jnp.uint8:
            # raw (un-normalized) batches: eval normalizes on device
            x = (x.astype(jnp.float32) - self._norm_mean) / self._norm_std
        variables = {"params": params}
        if self.has_bn:
            variables["batch_stats"] = batch_stats
        return self.model.apply(variables, x, False)

    # -- host loop ------------------------------------------------------------

    def _device_prefetch(self, batches, depth: int):
        """Background ``jax.device_put`` of upcoming items (chunks or single
        batches) so the host->HBM transfer of chunk n+1 overlaps the K
        device steps of chunk n — the pipelining the reference gets from
        DataLoader workers + CUDA streams (lib/core/function.py:149-161)."""
        from ..data.streaming import _threaded_pipe

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.mesh import DATA_AXIS, batch_sharding

            bsh = batch_sharding(self.mesh)
            csh = NamedSharding(
                self.mesh, PartitionSpec(None, DATA_AXIS)
            )
        else:
            bsh = csh = None
        multihost = jax.process_count() > 1 and self.mesh is not None

        def to_global(a, sh):
            if multihost:
                # each process holds only its stripe of the global batch;
                # assemble the global array from process-local shards
                return jax.make_array_from_process_local_data(sh, a)
            return jax.device_put(a, sh)

        def put(item):
            if len(item) == 3:
                xs, ys, tag = item
                return to_global(xs, csh), to_global(ys, csh), tag
            x, y = item
            return to_global(x, bsh), to_global(y, bsh)

        return _threaded_pipe(batches, put, depth)

    def _preempt_agreed(self) -> bool:
        """Preemption decision at a dispatch boundary.  Multi-host: the
        SIGTERM can land between different boundaries on different hosts,
        and the checkpoint save is a collective — OR-reduce the local
        flags so every process saves at the SAME boundary (or none does)."""
        if jax.process_count() == 1:
            return self._preempted
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(self._preempted, np.int32)
        )
        return bool(np.max(flags))

    def _check_finite(self, epoch, i, x, y):
        """Abort with a forensic dump when any step since init went
        non-finite (state.finite ANDs isfinite(loss) across ALL steps,
        including every scan index inside a chunk)."""
        if bool(self.state.finite):
            return
        dump_nan_state(
            f"{self.cfg.OUTPUT_DIR}/nan_dump_e{epoch}_i{i}.npz",
            x=_host_view(x),
            y=_host_view(y),
        )
        raise FloatingPointError(
            f"NaN/Inf loss detected by epoch {epoch} iter {i} "
            "(see the forensic dump; in scan mode the dump holds the "
            "whole (K, B, ...) chunk)"
        )

    def train_one_epoch(
        self,
        batches: Iterator[Tuple[np.ndarray, np.ndarray]],
        epoch: int,
        start_batch: int = 0,
        checkpoint_dir: Optional[str] = None,
    ) -> Dict[str, float]:
        cfg = self.cfg
        losses, seen = [], 0
        if self._int8_static:
            # recalibrate the static activation scales at every epoch
            # start (first batch seen by _qk_vars): the PEFT deltas
            # feed the residual stream, so layer-input ranges drift as
            # training progresses — stale scales saturate and destroy
            # convergence (measured on the CPU gate: learns to 0.03
            # then diverges without this).  One un-jitted forward per
            # epoch, off the hot path.
            self._qscale = None
        # raw-batch position inside the epoch (starts past a resumed
        # prefix); mid-epoch checkpoints record it for exact-step resume
        consumed = int(start_batch)
        ckpt_every = (
            int(cfg.TRAIN.get("CHECKPOINT_EVERY_STEPS", 0))
            if checkpoint_dir
            else 0
        )
        t_start = time.time()
        k_disp = int(cfg.TPU.get("STEPS_PER_DISPATCH", 1))
        if k_disp > 1:
            batches = _chunk_batches(batches, k_disp)
        depth = int(cfg.TPU.get("PREFETCH_DEPTH", 2))
        if jax.process_count() > 1 and self.mesh is not None:
            # multi-host REQUIRES the prefetch path: per-process local
            # shards must be assembled into global arrays before the jit
            depth = max(depth, 1)
        if depth > 0:
            batches = self._device_prefetch(batches, depth)
        x = y = None
        i = -1
        for i, item in enumerate(batches):
            self.rng, step_rng = jax.random.split(self.rng)
            if k_disp > 1 and len(item) == 3:
                xs, ys, _ = item  # (K, B, ...) stacked chunk
                self.state, loss = self._train_step_scan(
                    self.state,
                    self.frozen,
                    self._qk_vars(xs[0]),
                    _as_device(xs),
                    _as_device(ys),
                    step_rng,
                    jnp.asarray(epoch),
                )
                x, y = xs, ys
                seen += xs.shape[0] * xs.shape[1]
                k_item = xs.shape[0]
                loss = loss[-1]
            else:
                x, y = item
                self.state, loss, _ = self._train_step(
                    self.state,
                    self.frozen,
                    self._qk_vars(x),
                    _as_device(x),
                    _as_device(y),
                    step_rng,
                    jnp.asarray(epoch),
                )
                seen += x.shape[0]
                k_item = 1
            consumed += k_item
            crossed = ckpt_every > 0 and (consumed // ckpt_every) > (
                (consumed - k_item) // ckpt_every
            )
            if crossed:
                # crossed a CHECKPOINT_EVERY_STEPS multiple: persist an
                # exact-step resume point (at ANY dispatch boundary —
                # the streaming source resumes chunk-misaligned
                # positions by re-decoding at most one emission).
                # wait=False: Orbax snapshots the arrays to host before
                # returning (safe w.r.t. the donated train state) and
                # writes to disk in the background, overlapping IO with
                # the next dispatches
                self._check_finite(epoch, i, x, y)
                self.save(
                    checkpoint_dir,
                    epoch,
                    batch_in_epoch=consumed,
                    wait=False,
                )
            # preemption poll: free single-process (a local flag); multi-
            # host it is a host collective, so only at coarse
            # deterministic points (periodic-save crossings and
            # PRINT_FREQ boundaries) — never per dispatch
            if (
                checkpoint_dir
                and (
                    jax.process_count() == 1
                    or crossed
                    or (i + 1) % int(cfg.PRINT_FREQ) == 0
                )
                and self._preempt_agreed()
            ):
                # SIGTERM (TPU preemption notice): flush an exact-step
                # checkpoint and stop cleanly — the restarted job resumes
                # this very batch
                self._check_finite(epoch, i, x, y)
                self.save(checkpoint_dir, epoch, batch_in_epoch=consumed)
                raise PreemptedError(
                    f"SIGTERM: checkpointed at epoch {epoch} "
                    f"batch {consumed} and stopped"
                )
            if (i + 1) % int(cfg.PRINT_FREQ) == 0 or i == 0:
                loss_v = float(loss)  # host fetch = sync point
                losses.append(loss_v)
                self._check_finite(epoch, i, x, y)
                speed = seen / max(time.time() - t_start, 1e-9)
                logger.info(
                    "Epoch[%d] iter %d: loss %.4f lr %.3g (%.1f samples/s)",
                    epoch,
                    i,
                    loss_v,
                    float(self.schedule(self.state.step)),
                    speed,
                )
        # end-of-epoch check covers steps after the last PRINT_FREQ fetch
        self._check_finite(epoch, i, x, y)
        if ckpt_every > 0:
            # don't hand back control with an async save still in flight
            # (direct train_one_epoch callers may read the directory next)
            from .checkpoint import wait_for_saves

            wait_for_saves(checkpoint_dir)
        dt = time.time() - t_start
        if i < 0 and start_batch == 0:
            logger.warning(
                "Epoch[%d]: input pipeline yielded ZERO batches "
                "(dataset smaller than the global batch?)",
                epoch,
            )
        return {
            "loss": float(np.mean(losses)) if losses else float("nan"),
            "samples_per_sec": seen / max(dt, 1e-9),
            "epoch_time": dt,
        }

    def evaluate(
        self,
        batches: Iterator[Tuple[np.ndarray, np.ndarray]],
        use_ema: bool = False,
        use_swa: bool = False,
        metric: Optional[str] = None,
    ) -> float:
        """Full test pass (lib/core/function.py:173-279 semantics): top-1 +
        top-5 for multiclass; the dataset metric (mAP/roc_auc/...) for
        multilabel (B, C) targets or when ``metric`` names one explicitly."""
        from .metrics import get_metric

        trainable = self.state.trainable
        if use_ema and self.state.ema is not None:
            trainable = self.state.ema.shadow
        if use_swa and self.state.swa is not None:
            trainable = self.state.swa.average
        all_logits, all_y = [], []
        for x, y in batches:
            logits = self._eval_step(
                trainable, self.frozen, self.state.batch_stats, jnp.asarray(x)
            )
            all_logits.append(np.asarray(logits, np.float32))
            all_y.append(np.asarray(y))
        multihost = jax.process_count() > 1
        if not all_logits and not multihost:
            return 0.0
        if all_logits:
            scores = np.concatenate(all_logits)
            target = np.concatenate(all_y)
        else:  # empty shard: still participate in the gather below
            scores = np.zeros((0, self.num_classes), np.float32)
            target = np.zeros((0,), np.int64)
        if multihost:
            # each process evaluated only its stripe of the test set
            # (data/streaming.py shards eval by process_index); combine —
            # the reference all-reduces per-rank meters
            # (lib/core/function.py:271-279)
            from ..parallel.collectives import allgather_ragged

            scores = allgather_ragged(scores)
            target = allgather_ragged(target)
            if scores.shape[0] == 0:
                return 0.0
        if metric is None and target.ndim == 2:
            metric = "11point_mAP"
        if metric is not None and metric not in ("accuracy", "top1"):
            return get_metric(metric)(scores, target)
        ranked = np.argsort(-scores, axis=-1)
        top1 = 100.0 * float((ranked[:, 0] == target).mean())
        k = min(5, scores.shape[-1])
        top5 = 100.0 * float(
            (ranked[:, :k] == target[:, None]).any(-1).mean()
        )
        logger.info("=> eval top1 %.3f top5 %.3f", top1, top5)
        return top1

    def update_bn(self, batches, trainable=None):
        """torch.optim.swa_utils.update_bn analog (tools/swa_finetune.py:
        74-304): recompute BN running stats as the equal-weight average of
        per-batch statistics over ``batches`` — needed because the SWA-
        averaged weights were never the ones the stats were tracked under.

        Works for any per-module EMA momentum: flax updates
        ``new = m*old + (1-m)*batch``, so probing one batch from all-zero
        and all-one running stats measures ``m`` per leaf exactly, and each
        batch statistic is recovered as ``new0 / (1-m)``.  Installs the
        refreshed stats on the trainer state and returns them."""
        if not self.has_bn:
            return None
        if trainable is None:
            trainable = (
                self.state.swa.average
                if self.state.swa is not None
                else self.state.trainable
            )
        model = self.model

        def batch_pass(tr, frozen, stats, x):
            params = merge_params(tr, frozen)
            _, upd = model.apply(
                {"params": params, "batch_stats": stats},
                x,
                True,
                # unused streams are ignored; DropBlock models need one
                # for any train-mode forward (torch's update_bn also
                # runs with train-mode regularizers live)
                rngs={"dropblock": jax.random.PRNGKey(0)},
                mutable=["batch_stats"],
            )
            return upd["batch_stats"]

        batch_pass = jax.jit(batch_pass)
        tmap = jax.tree_util.tree_map
        zeros = tmap(jnp.zeros_like, self.state.batch_stats)
        ones = tmap(jnp.ones_like, self.state.batch_stats)
        total, count, momentum = None, 0, None
        for x, _ in batches:
            x = jnp.asarray(x)
            n0 = batch_pass(trainable, self.frozen, zeros, x)
            if momentum is None:
                n1 = batch_pass(trainable, self.frozen, ones, x)
                momentum = tmap(lambda a, b: b - a, n0, n1)
            batch_stat = tmap(
                lambda v, m: v / jnp.maximum(1.0 - m, 1e-6), n0, momentum
            )
            total = (
                batch_stat
                if total is None
                else tmap(jnp.add, total, batch_stat)
            )
            count += 1
        if total is None:
            return None
        new_stats = tmap(lambda t: t / count, total)
        self.state = self.state._replace(batch_stats=new_stats)
        return new_stats

    # -- checkpointing ---------------------------------------------------------

    def _ckpt_state(
        self, epoch: int = 0, batch_in_epoch: int = 0
    ) -> Dict[str, Any]:
        s = self.state
        out = {
            "trainable": s.trainable,
            "opt_state": s.opt_state,
            "step": s.step,
            "epoch": jnp.asarray(epoch, jnp.int32),
            # preemption-tolerant resume: raw batches already trained in
            # `epoch` (0 = the epoch is complete) + the host RNG key, so a
            # resumed run replays the exact remaining data order and
            # augmentation stream (the reference resumes only at epoch
            # granularity, lib/utils/utils.py:101-203)
            "batch_in_epoch": jnp.asarray(batch_in_epoch, jnp.int32),
            "rng": self.rng,
        }
        if s.ema is not None:
            out["ema_shadow"] = s.ema.shadow
        if s.swa is not None:
            out["swa_average"] = s.swa.average
            out["swa_count"] = s.swa.count
        if self.has_bn:
            out["batch_stats"] = s.batch_stats
        if jax.process_count() > 1:
            # Orbax cannot serialize host-local arrays multi-host; lift
            # any stragglers (e.g. the epoch scalar) to replicated global
            out = jax.tree_util.tree_map(self._globalize_leaf, out)
        return out

    def _globalize_leaf(self, v):
        if isinstance(v, jax.Array) and not v.is_fully_addressable:
            return v  # already a global (multi-host) array
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec

        return multihost_utils.host_local_array_to_global_array(
            np.asarray(v), self.mesh, PartitionSpec()
        )

    def save(
        self,
        directory: str,
        epoch: int,
        batch_in_epoch: int = 0,
        wait: bool = True,
    ) -> None:
        # index by GLOBAL optimizer step, not epoch: mid-epoch saves then
        # get unique, monotonically increasing ids (the stored dict itself
        # carries the epoch/batch position, so resume never reads meaning
        # into the index)
        index = int(jax.device_get(self.state.step))
        # batch position already on disk for this index, if this process
        # knows it (it wrote it, or it just resumed from it) — dedup
        # identical saves, OVERWRITE when only the position advanced
        # (e.g. a final periodic save at batch==steps must not block the
        # end-of-epoch save from recording "epoch complete")
        prev_batch = None
        if index == getattr(self, "_last_saved_index", None):
            prev_batch = self._last_saved_batch
        elif getattr(self, "_last_saved_index", None) is None and (
            index == getattr(self, "_resumed_index", None)
        ):
            prev_batch = self.resume_batch_in_epoch
        if prev_batch is not None and prev_batch == batch_in_epoch:
            return
        save_checkpoint(
            directory,
            index,
            self._ckpt_state(epoch, batch_in_epoch),
            wait=wait,
            overwrite=prev_batch is not None,
        )
        self._last_saved_index = index
        self._last_saved_batch = batch_in_epoch

    def maybe_resume(self, directory: str) -> Optional[int]:
        if not bool(self.cfg.TRAIN.AUTO_RESUME):
            return None
        from .checkpoint import checkpoint_keys, latest_step

        step = latest_step(directory)
        if step is None:
            return None
        template = self._ckpt_state()
        stored = checkpoint_keys(directory, step)
        if stored is not None:
            # tolerate older checkpoints without swa/ema/batch_stats (e.g.
            # swa_finetune resuming a plain run): absent leaves stay fresh
            template = {k: v for k, v in template.items() if k in stored}
        try:
            restored = restore_checkpoint(directory, template, step=step)
        except Exception:
            # checkpoint_keys could not read the stored layout (e.g. an
            # Orbax on-disk format change) AND the checkpoint predates
            # the optional fields — retry without them before giving up
            slim = {
                k: v
                for k, v in template.items()
                if k not in ("rng", "batch_in_epoch")
            }
            if len(slim) == len(template):
                raise
            restored = restore_checkpoint(directory, slim, step=step)
        if restored is None:
            return None
        self._resumed_index = step
        if self.mesh is not None and jax.process_count() == 1:
            # Orbax restores single-process arrays committed to device 0;
            # the jitted step's other operands are mesh-sharded, and jit
            # refuses mixed committed placements — re-place the restored
            # state the way __init__ placed the fresh state (replicated,
            # or the ZeRO-1 shardings for the optimizer tree)
            from ..parallel.mesh import replicated

            rep = replicated(self.mesh)
            restored = {
                k: jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, rep), v
                )
                for k, v in restored.items()
                if k != "opt_state"
            } | {
                "opt_state": (
                    jax.tree_util.tree_map(
                        jax.device_put,
                        restored["opt_state"],
                        self._opt_shardings,
                    )
                    if self.zero1
                    else jax.tree_util.tree_map(
                        lambda a: jax.device_put(a, rep),
                        restored["opt_state"],
                    )
                )
            }
        s = self.state
        ema = s.ema
        if s.ema is not None and "ema_shadow" in restored:
            ema = s.ema._replace(shadow=restored["ema_shadow"])
        swa = s.swa
        if s.swa is not None and "swa_average" in restored:
            swa = SwaState(restored["swa_average"], restored["swa_count"])
        batch_stats = s.batch_stats
        if self.has_bn and "batch_stats" in restored:
            batch_stats = restored["batch_stats"]
        self.state = FullTrainState(
            restored["trainable"],
            restored["opt_state"],
            restored["step"],
            ema,
            swa,
            batch_stats if self.has_bn else None,
            jnp.ones((), jnp.bool_),
        )
        def scalar(v):
            # multi-host restore yields non-addressable replicated global
            # arrays; any local shard carries the full (replicated) value
            if isinstance(v, jax.Array) and not v.is_fully_addressable:
                return np.asarray(v.addressable_data(0))
            return np.asarray(v)

        if "rng" in restored:
            self.rng = jnp.asarray(scalar(restored["rng"]))
        # 0 for end-of-epoch checkpoints and for pre-feature checkpoints
        self.resume_batch_in_epoch = int(
            scalar(restored.get("batch_in_epoch", 0))
        )
        return int(scalar(restored["epoch"]))

    def fit(
        self,
        train_batches_fn: Callable[[int], Iterator],
        eval_batches_fn: Callable[[], Iterator],
        checkpoint_dir: Optional[str] = None,
        tb_log_dir: Optional[str] = None,
    ) -> float:
        cfg = self.cfg
        begin = int(cfg.TRAIN.BEGIN_EPOCH)
        start_batch = 0
        if checkpoint_dir:
            resumed = self.maybe_resume(checkpoint_dir)
            if resumed is not None:
                start_batch = getattr(self, "resume_batch_in_epoch", 0)
                # mid-epoch checkpoint: re-enter THAT epoch at the exact
                # batch; end-of-epoch checkpoint: start the next one
                begin = resumed if start_batch > 0 else resumed + 1
                if start_batch:
                    logger.info(
                        "=> resuming mid-epoch: epoch %d batch %d",
                        begin,
                        start_batch,
                    )
        # per-epoch TensorBoard scalars, rank 0 only (the writer_dict of
        # tools/train.py:101-105 + lib/core/function.py:165-170,258-263)
        tb = None
        if tb_log_dir:
            from ..utils.tb import create_scalar_writer

            tb = create_scalar_writer(tb_log_dir)
        # TPU preemptions arrive as SIGTERM: note it, finish the current
        # dispatch, checkpoint at the boundary, exit via PreemptedError
        prev_handler = None
        if checkpoint_dir:
            import signal

            def _on_sigterm(signum, frame):
                logger.warning(
                    "=> SIGTERM: will checkpoint at the next dispatch "
                    "boundary and stop"
                )
                self._preempted = True

            try:
                prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
            except ValueError:
                prev_handler = None  # not the main thread: flag-only mode
        best = 0.0
        try:
            for epoch in range(begin, int(cfg.TRAIN.END_EPOCH)):
                sb, start_batch = start_batch, 0
                if sb:
                    try:
                        # sources that can seek (data/streaming.py) skip the
                        # trained prefix without decoding it
                        batches = train_batches_fn(epoch, sb)
                    except TypeError:
                        batches = _skip_batches(train_batches_fn(epoch), sb)
                else:
                    batches = train_batches_fn(epoch)
                stats = self.train_one_epoch(
                    batches, epoch, start_batch=sb, checkpoint_dir=checkpoint_dir
                )
                logger.info(
                    "=> Epoch %d done: loss %.4f (%.1f samples/s)",
                    epoch,
                    stats["loss"],
                    stats["samples_per_sec"],
                )
                if tb is not None:
                    tb.scalar("train_loss", stats["loss"], epoch)
                    tb.scalar("train_samples_per_sec",
                              stats["samples_per_sec"], epoch)
                    tb.scalar("lr", float(self.schedule(self.state.step)), epoch)
                if epoch >= int(cfg.TRAIN.EVAL_BEGIN_EPOCH):
                    acc = self.evaluate(eval_batches_fn())
                    best = max(best, acc)
                    logger.info(
                        "=> Epoch %d val acc %.3f (best %.3f)",
                        epoch,
                        acc,
                        best,
                    )
                    if tb is not None:
                        tb.scalar("valid_top1", acc, epoch)
                    if float(cfg.TRAIN.EMA_DECAY) > 0:
                        ema_acc = self.evaluate(
                            eval_batches_fn(), use_ema=True
                        )
                        logger.info("=> Epoch %d EMA acc %.3f", epoch, ema_acc)
                        if tb is not None:
                            tb.scalar("valid_top1_ema", ema_acc, epoch)
                        best = max(best, ema_acc)
                if checkpoint_dir:
                    self.save(checkpoint_dir, epoch)
                    if self._preempt_agreed():
                        # SIGTERM landed during the epoch tail or the
                        # eval pass: the end-of-epoch checkpoint above is
                        # the resume point — stop now instead of training
                        # into the next epoch past the grace window
                        raise PreemptedError(
                            f"SIGTERM: checkpointed completed epoch "
                            f"{epoch} and stopped"
                        )
            if self.state.swa is not None:
                if self.has_bn:
                    # BN refresh for the averaged weights (swa_utils.update_bn)
                    self.update_bn(train_batches_fn(int(cfg.TRAIN.END_EPOCH)))
                swa_acc = self.evaluate(eval_batches_fn(), use_swa=True)
                logger.info("=> SWA acc %.3f", swa_acc)
                if tb is not None:
                    tb.scalar("valid_top1_swa", swa_acc, int(cfg.TRAIN.END_EPOCH))
                best = max(best, swa_acc)
        finally:
            if prev_handler is not None:
                import signal

                signal.signal(signal.SIGTERM, prev_handler)
            if checkpoint_dir:
                # drain any in-flight async (wait=False) save
                from .checkpoint import wait_for_saves

                wait_for_saves(checkpoint_dir)
        if tb is not None:
            tb.close()
        return best


def _skip_batches(batches, n: int):
    """Drop the first ``n`` raw batches of an epoch iterator (counting K
    per pre-chunked (K, B, ...) item) — the universal mid-epoch-resume
    fallback for sources that cannot seek.  Skipped items are consumed,
    so the data/flip stream past the skip matches an uninterrupted run."""
    it = iter(batches)
    consumed = 0
    while consumed < n:
        item = next(it, None)
        if item is None:
            return
        consumed += item[0].shape[0] if len(item) == 3 else 1
    yield from it


def _chunk_batches(batches, k: int):
    """Group consecutive equal-shape (x, y) batches into (K, B, ...)
    stacks for the scan train step.  Tails (fewer than k, or ragged final
    batches) pass through unstacked so only two programs ever compile:
    the K-scan chunk and the single step."""
    buf = []
    for item in batches:
        if len(item) == 3:  # already a tagged (K, B, ...) chunk
            for b in buf:
                yield b
            buf = []
            yield item
            continue
        x, y = item
        if buf and x.shape != buf[-1][0].shape:
            for b in buf:
                yield b
            buf = []
            yield (x, y)
            continue
        buf.append((x, y))
        if len(buf) == k:
            yield (
                np.stack([b[0] for b in buf]),
                np.stack([b[1] for b in buf]),
                True,
            )
            buf = []
    for b in buf:
        yield b


def batch_iterator(
    x: np.ndarray,
    y: np.ndarray,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
):
    """Host batch iterator (full-shot scale; the ArrayTask path covers
    few-shot)."""
    n = len(x)
    idx = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    end = (n // batch_size) * batch_size if drop_last else n
    for i in range(0, end, batch_size):
        j = idx[i : i + batch_size]
        yield x[j], y[j]
