"""The lr x wd hyper-parameter sweep.

Reference protocol (evaluation/adapter_tuning_clip.py, duplicated in every
method file — written once here):

* outer: lr in logspace(-6, -1, 6)                    (:406-426)
* inner: wd in logspace(lo, hi, 97); evaluate the 7 coarse points that lie
  on logspace(lo, hi, 7), take the peak, then binary-refine with spans
  8, 4, 2, 1 around the peak                          (:173-225)
* each cell trains a FRESH model for END_EPOCH epochs with step-decay lr
  and reports best (or last) val accuracy             (:228-280)
* failures score 0 (reference: try/except around cells; here: NaN -> 0)
* final run: merge train+val, add EXTRA_FINAL_TRAIN_EPOCH, train once with
  the winning (lr, wd), evaluate on test              (:429-481)

TPU-native twist: cells are *vmapped*.  PEFT state is tiny, so K cells
train simultaneously as one batched program — the frozen backbone forward
is shared work per cell but runs at K-fold arithmetic intensity, which is
where a 197-token ViT otherwise underutilizes the MXU.  Set
``TRAIN.VMAP_SWEEP=False`` for the sequential reference behavior.

Known reference bug NOT reproduced: the refine loop trains every probe
with the *left* candidate's wd (``config.TRAIN.WD = l2_lambda_list[left]``
at adapter_tuning_clip.py:205 even when evaluating ``right``); here each
candidate trains with its own wd.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .train import (
    ArrayTask,
    PerExampleCriterion,
    TrainCellState,
    init_cell_state,
    make_epoch_fn,
    make_eval_fn,
    masked_accuracy,
    step_decay_lr,
)

logger = logging.getLogger(__name__)


class SweepEngine:
    """Drives the sweep for one (model, task) pair.

    Args:
      apply_fn: ``lambda variables, x, train: logits``.
      init_trainable: ``lambda rng: trainable pytree`` (fresh per cell,
        mirroring the reference's fresh ``Classifier(config, 0)`` per cell).
      frozen: frozen param pytree (None-holes where trainable).
      criterion: per-example loss.
    """

    def __init__(
        self,
        cfg,
        apply_fn,
        init_trainable: Callable,
        frozen,
        criterion: PerExampleCriterion,
        batch_size: Optional[int] = None,
        metric: str = "accuracy",
        bn_template=None,
        qkernel=None,
    ):
        self.cfg = cfg
        # the dataset metric scores every cell, mirroring the reference's
        # per-cell `validate` -> get_metric_name dispatch
        # (adapter_tuning_clip.py:338-377, evaluation/metric.py:36-47);
        # non-top1 metrics run host-side over the gathered val logits
        self.metric = metric
        from .metrics import get_metric

        self._metric_fn = get_metric(metric)
        # TPU.INT8_FWD_TRAIN: the frozen tower is shared by EVERY cell of
        # every round, so its Int8Dense kernels are pre-quantized exactly
        # once per sweep (the caller passes the device-resident qkernel
        # collection; see commands/run.py) and injected into each apply —
        # the same per-run amortization the Trainer gets from _frozen_qk,
        # on the reference's hottest workload (~78 trainings/dataset,
        # adapter_tuning_clip.py:173-225)
        self.qkernel = qkernel
        if qkernel is not None:
            base_apply = apply_fn

            def apply_fn(variables, x, train, **kw):
                return base_apply(
                    dict(variables, qkernel=qkernel), x, train, **kw
                )

        self.apply_fn = apply_fn
        self.init_trainable = init_trainable
        self.frozen = frozen
        self.criterion = criterion
        # TRAIN.CHANNEL_BN head standardizer and/or live-BN towers: every
        # cell starts from a fresh copy of this batch_stats template (the
        # reference builds a fresh Classifier per cell,
        # adapter_tuning_clip.py:231) and trains with mutable stats
        self.bn_template = bn_template
        has_bn = bn_template is not None
        self.batch_size = batch_size or int(cfg.TRAIN.BATCH_SIZE_PER_GPU)
        self.schedule = tuple(int(m) for m in cfg.TRAIN.SCHEDULE)

        lr_scale = None
        if bool(cfg.TRAIN.TWO_LR):
            # backbone at 0.1x lr, head at lr (optim/build.py:102-117)
            from flax import traverse_util

            flat = traverse_util.flatten_dict(
                jax.tree_util.tree_map(lambda _: 0, frozen), sep="/"
            )
            del flat  # structure comes from the trainable template below

            def scale_like(trainable):
                f = traverse_util.flatten_dict(trainable, sep="/")
                out = {
                    k: (
                        None
                        if v is None
                        else jnp.asarray(
                            1.0 if k.startswith("classifier/") else 0.1,
                            jnp.float32,
                        )
                    )
                    for k, v in f.items()
                }
                return traverse_util.unflatten_dict(out, sep="/")

            lr_scale = scale_like(
                init_trainable(jax.random.PRNGKey(0))
            )
        epoch_fn = make_epoch_fn(
            apply_fn,
            criterion,
            self.batch_size,
            momentum=float(cfg.TRAIN.MOMENTUM),
            nesterov=bool(cfg.TRAIN.NESTEROV),
            lr_scale=lr_scale,
            has_bn=has_bn,
        )
        eval_fn = make_eval_fn(apply_fn, self.batch_size, has_bn=has_bn)
        # vmap over cells: state/lr/wd are per-cell, data+frozen shared
        # (state.bn rides axis 0 of the state; a None bn is an empty
        # subtree and vmaps trivially).
        self._epoch_cells = jax.jit(
            jax.vmap(
                epoch_fn, in_axes=(0, None, None, None, None, None, 0, 0)
            )
        )
        self._eval_cells = jax.jit(
            jax.vmap(eval_fn, in_axes=(0, None, None, 0))
        )
        self._epoch_one = jax.jit(epoch_fn)
        self._eval_one = jax.jit(eval_fn)
        # jit the per-cell re-init: under jit, XLA dead-code-eliminates
        # the frozen-leaf initializers entirely (eager vmap materializes a
        # FULL param tree per cell — a 2.4 GB spike for 7 ViT-B cells, and
        # the axon relay backend was observed to retain those buffers,
        # leaking ~2.4 GB per sweep round until HBM exhaustion)
        self._init_cells = jax.jit(jax.vmap(init_trainable))
        self._init_one = jax.jit(init_trainable)

    # -- scoring --------------------------------------------------------------

    def _score_cells(self, logits, y, valid) -> np.ndarray:
        """Score (k, N, C) per-cell logits with the dataset metric.

        Device fast path for top-1 on integer labels; everything else
        (mean-per-class, 11-pt mAP, roc_auc, or (N, C) one-hot/multilabel
        targets) gathers to host — val sets are tiny (num_val x C).
        The host fetch doubles as the dispatch-queue sync point."""
        y = jnp.asarray(y)
        if self.metric in ("accuracy", "top1") and y.ndim == 1:
            accs = jax.vmap(masked_accuracy, in_axes=(0, None, None))(
                logits, y, valid
            )
            return np.asarray(accs)
        v = np.asarray(valid)
        scores_np = np.asarray(logits, np.float32)[:, v]
        target = np.asarray(y)[v]
        if self.metric in ("accuracy", "top1") and target.ndim == 2:
            # one-hot multiclass scored as top-1
            target = target.argmax(-1)
        out = np.zeros(scores_np.shape[0], np.float32)
        for i in range(scores_np.shape[0]):
            s = scores_np[i]
            out[i] = self._metric_fn(s, target) if np.isfinite(s).all() else 0.0
        return out

    def _score_one(self, logits, y, valid) -> float:
        return float(self._score_cells(logits[None], y, valid)[0])

    # -- cell training ------------------------------------------------------

    def train_cells(
        self,
        lrs: Sequence[float],
        wds: Sequence[float],
        task: ArrayTask,
        end_epoch: int,
        seed: int = 0,
        eval_on: str = "val",
    ) -> np.ndarray:
        """Train len(lrs) cells simultaneously; returns val scores (%)."""
        k = len(lrs)
        assert k == len(wds)
        rngs = jax.random.split(jax.random.PRNGKey(seed), k)
        trainables = self._init_cells(rngs)
        bn = self.bn_template
        states = jax.vmap(lambda t: init_cell_state(t, bn))(trainables)

        n = task.x_train.shape[0]
        lrs_arr = jnp.asarray(lrs, jnp.float32)
        wds_arr = jnp.asarray(wds, jnp.float32)
        best = np.zeros((k,), np.float32)
        rng_np = np.random.RandomState(seed)
        last = np.zeros((k,), np.float32)
        for epoch in range(end_epoch):
            lr_e = jax.vmap(
                lambda lr: step_decay_lr(lr, epoch, self.schedule)
            )(lrs_arr)
            perm = jnp.asarray(rng_np.permutation(n))
            states, _ = self._epoch_cells(
                states,
                self.frozen,
                task.x_train,
                task.y_train,
                task.valid_train,
                perm,
                lr_e,
                wds_arr,
            )
            logits = self._eval_cells(
                states.trainable, self.frozen, task.x_val, states.bn
            )
            # _score_cells gathers to host, which is also the required
            # dispatch-queue sync: without it, some PJRT backends (the axon
            # relay here) queue every epoch's buffers unboundedly and
            # exhaust HBM over a long sweep
            last = self._score_cells(logits, task.y_val, task.valid_val)
            best = np.maximum(best, last)

        scores = (
            last
            if bool(self.cfg.TRAIN.SEARCH_RESULT_ON_LAST_EPOCH)
            else best
        )
        return np.where(np.isfinite(scores), scores, 0.0)

    def train_final(
        self,
        lr: float,
        wd: float,
        task: ArrayTask,
        end_epoch: int,
        seed: int = 0,
    ) -> Tuple[TrainCellState, float]:
        """Single-cell training; returns (state, best val acc)."""
        trainable = self._init_one(jax.random.PRNGKey(seed))
        state = init_cell_state(trainable, self.bn_template)
        best = 0.0
        best_state = state
        n = task.x_train.shape[0]
        rng_np = np.random.RandomState(seed)
        for epoch in range(end_epoch):
            lr_e = step_decay_lr(lr, epoch, self.schedule)
            perm = jnp.asarray(rng_np.permutation(n))
            state, _ = self._epoch_one(
                state,
                self.frozen,
                task.x_train,
                task.y_train,
                task.valid_train,
                perm,
                lr_e,
                jnp.asarray(wd, jnp.float32),
            )
            logits = self._eval_one(
                state.trainable, self.frozen, task.x_val, state.bn
            )
            # host fetch inside _score_one doubles as the dispatch-queue sync
            acc = self._score_one(logits, task.y_val, task.valid_val)
            if acc >= best:
                best, best_state = acc, state
        return best_state, best

    # -- the search ---------------------------------------------------------

    def sweep_wd(
        self, lr: float, task: ArrayTask, end_epoch: int
    ) -> Tuple[float, float]:
        """97-point wd grid: 7 coarse + binary refinement
        (hyperparameter_sweep, adapter_tuning_clip.py:173-225)."""
        cfg = self.cfg
        lo = float(cfg.TRAIN.SEARCH_WD_LOG_LOWER)
        hi = float(cfg.TRAIN.SEARCH_WD_LOG_UPPER)
        n_pts = int(cfg.TRAIN.SEARCH_WD_POINTS)
        grid = np.logspace(lo, hi, num=n_pts)
        # coarse points by INDEX into the fine grid (float equality
        # between two separate logspace calls silently drops points for
        # non-binary-representable custom bounds)
        init_idx = [
            int(i)
            for i in np.linspace(
                0,
                n_pts - 1,
                num=min(int(cfg.TRAIN.SEARCH_WD_INIT_POINTS), n_pts),
            ).round()
        ]

        scores = {}

        def probe(idxs: List[int]):
            new = [i for i in idxs if i not in scores]
            if not new:
                return
            if bool(cfg.TRAIN.VMAP_SWEEP) and len(new) > 1:
                accs = self.train_cells(
                    [lr] * len(new),
                    [float(grid[i]) for i in new],
                    task,
                    end_epoch,
                )
                for i, a in zip(new, accs):
                    scores[i] = float(a)
            else:
                for i in new:
                    accs = self.train_cells(
                        [lr], [float(grid[i])], task, end_epoch
                    )
                    scores[i] = float(accs[0])
            for i in new:
                logger.info(
                    "=> lr %g wd %g: score %.3f", lr, grid[i], scores[i]
                )

        probe(init_idx)
        peak = max(scores, key=scores.get)
        if bool(self.cfg.SWEEP.REF_COMPAT):
            # Reproduce the reference's refine loop VERBATIM, including
            # its left-wd bug (adapter_tuning_clip.py:205: every probe
            # trains with the LEFT candidate's wd while the score is
            # attributed to the probed index) and its no-cache re-probes.
            # Proven by execution: refexec_engine.npz sweep_b fixture;
            # default False = each candidate trains with its own wd.
            peak_score = scores[peak]
            span = 8
            while span > 0:
                left = max(peak - span, 0)
                right = min(peak + span, len(grid) - 1)
                for idx in (i for i in (left, right) if i != peak):
                    acc = float(
                        self.train_cells(
                            [lr], [float(grid[left])], task, end_epoch
                        )[0]
                    )
                    logger.info(
                        "=> lr %g wd %g (ref-compat, idx %d): score %.3f",
                        lr, grid[left], idx, acc,
                    )
                    if acc > peak_score:
                        peak, peak_score = idx, acc
                span //= 2
            logger.info(
                "=> Learning rate %g: best l2 lambda %g (score %.3f)",
                lr, grid[peak], peak_score,
            )
            return float(grid[peak]), peak_score
        span = 8
        while span > 0:
            left = max(peak - span, 0)
            right = min(peak + span, len(grid) - 1)
            probe([i for i in (left, right) if i != peak])
            peak = max(scores, key=scores.get)
            span //= 2
        logger.info(
            "=> Learning rate %g: best l2 lambda %g (score %.3f)",
            lr,
            grid[peak],
            scores[peak],
        )
        return float(grid[peak]), scores[peak]

    def sweep(
        self,
        task: ArrayTask,
        end_epoch: int,
        lr_grid: Optional[Sequence[float]] = None,
    ) -> Tuple[float, float, float]:
        """Full lr x wd search (hyperparameter_sweep_lr, :406-426).
        Returns (best_lr, best_wd, best_score)."""
        t0 = time.time()
        lrs = list(lr_grid or np.logspace(-6, -1, num=6))
        best = (0.0, 0.0, -1.0)
        for lr in lrs:
            wd, score = self.sweep_wd(float(lr), task, end_epoch)
            logger.info("=> Learning rate: %g, best_score %.3f", lr, score)
            if score > best[2]:
                best = (float(lr), wd, score)
        logger.info(
            "Hyper parameter tuning result: learning rate %g, l2_lambda %g "
            "(%.2fs)",
            best[0],
            best[1],
            time.time() - t0,
        )
        return best
