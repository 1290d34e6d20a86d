"""Evaluation metrics.

Covers both the metric actually used by the reference
(``node_classification/utils.py:132-136`` accuracy; inline L1/MAE in
``graph_regression/mma.py:156,181``) and the full surface of its
(dead, but inventoried — SURVEY §2.1 #7) ``metrics.py`` grab-bag:
MAE, argmax accuracy, SBM class-balanced accuracy, binary/weighted F1.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def accuracy(logits, labels) -> jnp.ndarray:
    """Argmax accuracy (utils.py:132-136 / metrics.py:20-27)."""
    preds = jnp.argmax(logits, axis=-1)
    return jnp.mean((preds == labels).astype(jnp.float32))


def mae(scores, targets) -> jnp.ndarray:
    """Mean absolute error (metrics.py:14-17)."""
    return jnp.mean(jnp.abs(scores - targets))


def accuracy_tu(logits, labels) -> jnp.ndarray:
    """TU-benchmark argmax accuracy (metrics.py:20-27) — same computation
    as :func:`accuracy`, kept under the reference's name for coverage."""
    return accuracy(logits, labels)


def accuracy_sbm(logits, labels) -> float:
    """Class-balanced accuracy over present classes (metrics.py:38-55)."""
    preds = np.asarray(jnp.argmax(logits, axis=-1))
    labels = np.asarray(labels)
    accs = []
    for c in np.unique(labels):
        sel = labels == c
        accs.append(float((preds[sel] == c).mean()))
    return float(np.mean(accs)) * 100.0


def _f1(preds, labels, average: str) -> float:
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    classes = np.unique(np.concatenate([labels, preds]))
    f1s, weights = [], []
    for c in classes:
        tp = float(((preds == c) & (labels == c)).sum())
        fp = float(((preds == c) & (labels != c)).sum())
        fn = float(((preds != c) & (labels == c)).sum())
        denom = 2 * tp + fp + fn
        f1s.append(0.0 if denom == 0 else 2 * tp / denom)
        weights.append(float((labels == c).sum()))
    if average == "binary":
        # F1 of the positive class (class 1), sklearn 'binary' semantics
        # (metrics.py:58-63).
        idx = list(classes).index(1) if 1 in classes else None
        return 0.0 if idx is None else f1s[idx]
    if average == "weighted":
        w = np.asarray(weights)
        return float((np.asarray(f1s) * w).sum() / max(w.sum(), 1.0))
    return float(np.mean(f1s))


def binary_f1_score(logits, labels) -> float:
    return _f1(np.asarray(jnp.argmax(logits, axis=-1)), labels, "binary")


def weighted_f1_score(logits, labels) -> float:
    return _f1(np.asarray(jnp.argmax(logits, axis=-1)), labels, "weighted")
