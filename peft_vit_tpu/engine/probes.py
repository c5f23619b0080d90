"""Linear / logistic probes over frozen features.

Reference components reproduced:

* logistic probe (evaluation/logistic_classifier.py:13-117): sklearn
  L-BFGS LogisticRegression with the CLIP-paper C sweep — 97 logspace
  points, coarse-7 + binary refinement (same search shape as the wd
  sweep).  The reference parallelizes with multiprocessing+sharedmem; on
  TPU the whole sweep instead runs as ONE vmapped L-BFGS over C values
  (`logistic_probe_vmapped`), with a sklearn fallback for exact-protocol
  comparison.
* linear probe (evaluation/linear_classifier.py:38-344): BatchNorm1d
  (affine=False) + Linear trained with the standard sweep — that path is
  the main driver (commands/run.py) with PEFT.METHOD=linear and
  ImageClassifier(use_bn=True).
* multilabel probe (evaluation/multi_label.py): one-vs-rest logistic.
"""

from __future__ import annotations

import logging
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)


def _lbfgs_logistic(
    x: jax.Array,
    y: jax.Array,
    c_value: jax.Array,
    num_classes: int,
    max_iter: int = 200,
):
    """Multinomial logistic regression with L2 (1/C) penalty via optax
    L-BFGS.  Returns (W, b)."""
    n, d = x.shape

    def loss_fn(params):
        w, b = params
        logits = x @ w + b
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.mean(
            jnp.take_along_axis(logp, y[:, None], axis=1)
        )
        reg = 0.5 / c_value * jnp.sum(w**2) / n
        return nll + reg

    params = (
        jnp.zeros((d, num_classes), jnp.float32),
        jnp.zeros((num_classes,), jnp.float32),
    )
    solver = optax.lbfgs()
    state = solver.init(params)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def step(carry, _):
        params, state = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = solver.update(
            grad,
            state,
            params,
            value=value,
            grad=grad,
            value_fn=loss_fn,
        )
        params = optax.apply_updates(params, updates)
        return (params, state), value

    (params, _), _ = jax.lax.scan(
        step, (params, state), None, length=max_iter
    )
    return params


def logistic_probe_vmapped(
    train_x: np.ndarray,
    train_y: np.ndarray,
    val_x: np.ndarray,
    val_y: np.ndarray,
    num_classes: int,
    c_values: Sequence[float],
    max_iter: int = 200,
) -> Tuple[float, np.ndarray]:
    """Fit every C simultaneously (vmap over the regularization axis);
    returns (best_C, val accuracies)."""
    x = jnp.asarray(train_x, jnp.float32)
    y = jnp.asarray(train_y)
    cv = jnp.asarray(list(c_values), jnp.float32)

    fit = jax.jit(
        jax.vmap(
            lambda c: _lbfgs_logistic(x, y, c, num_classes, max_iter)
        )
    )
    ws, bs = fit(cv)
    logits = (
        jnp.asarray(val_x, jnp.float32) @ ws + bs[:, None, :]
    )  # (C, n_val, classes) via broadcasting: ws (C,d,k)
    pred = jnp.argmax(logits, axis=-1)
    accs = jnp.mean(
        (pred == jnp.asarray(val_y)[None]).astype(jnp.float32), axis=-1
    )
    accs = np.asarray(accs) * 100.0
    best = int(np.argmax(accs))
    return float(cv[best]), accs


def logistic_probe_sweep(
    train_x, train_y, val_x, val_y, test_x, test_y, num_classes: int,
    log_lower: float = -6.0, log_upper: float = 6.0, points: int = 97,
    use_sklearn: bool = False, max_iter: int = 200,
) -> Tuple[float, float]:
    """CLIP-paper protocol: coarse-7 + binary refinement over C in
    logspace, final fit on train+val, report test accuracy.
    Returns (test_acc, best_C)."""
    grid = np.logspace(log_lower, log_upper, points)
    coarse = np.logspace(log_lower, log_upper, 7)
    coarse_idx = [i for i, v in enumerate(grid) if v in set(coarse)]

    scores = {}

    def probe(idxs):
        new = [i for i in idxs if i not in scores]
        if not new:
            return
        if use_sklearn:
            for i in new:
                scores[i] = _sklearn_acc(
                    train_x, train_y, val_x, val_y, grid[i], max_iter
                )
        else:
            _, accs = logistic_probe_vmapped(
                train_x, train_y, val_x, val_y, num_classes,
                [grid[i] for i in new], max_iter,
            )
            for i, a in zip(new, accs):
                scores[i] = float(a)

    probe(coarse_idx)
    peak = max(scores, key=scores.get)
    span = 8
    while span > 0:
        left, right = max(peak - span, 0), min(peak + span, len(grid) - 1)
        probe([i for i in (left, right) if i != peak])
        peak = max(scores, key=scores.get)
        span //= 2
    best_c = float(grid[peak])
    logger.info("=> logistic probe best C=%g", best_c)

    xt = np.concatenate([train_x, val_x])
    yt = np.concatenate([train_y, val_y])
    if use_sklearn:
        acc = _sklearn_acc(xt, yt, test_x, test_y, best_c, max_iter)
    else:
        _, accs = logistic_probe_vmapped(
            xt, yt, test_x, test_y, num_classes, [best_c], max_iter
        )
        acc = float(accs[0])
    return acc, best_c


def _sklearn_acc(xt, yt, xv, yv, c, max_iter):
    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(C=float(c), max_iter=int(max_iter))
    clf.fit(xt, yt)
    return float(100.0 * clf.score(xv, yv))


def multilabel_probe(
    train_x, train_y, test_x, test_y, c: float = 1.0, max_iter: int = 200
) -> np.ndarray:
    """One-vs-rest logistic scores for multilabel data
    (evaluation/multi_label.py): returns (n_test, C) scores."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.multioutput import MultiOutputRegressor

    reg = MultiOutputRegressor(
        LogisticRegression(C=float(c), max_iter=int(max_iter))
    )
    reg.fit(train_x, train_y)
    return np.stack(
        [e.predict_proba(test_x)[:, 1] for e in reg.estimators_], axis=1
    )
