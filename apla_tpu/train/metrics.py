"""Host-side classification metrics — parity with `src/utils/metrics.py`.

Predictions accumulate on host (numpy) and final values come from sklearn,
exactly like the reference (`metrics.py:74-112`).  Under SPMD there is one
controller, so no cross-rank gather is needed (the reference's
`dist_gather` path collapses away); logits arrive already globally batched.
"""

from __future__ import annotations

import numpy as np
from sklearn import metrics as skm

from ..utils.config import EDict


def softmax_np(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def sigmoid_np(x):
    return 1.0 / (1.0 + np.exp(-x))


class ClassificationMetrics:
    """Accuracy, mean-per-class accuracy, quadratic kappa, ROC-AUC, recall
    (reference metrics.py:40-112)."""

    def __init__(self, n_classes, mode="", raw=True):
        self.n_classes = n_classes
        self.prefix = mode + "_" if mode else ""
        self.raw = raw
        self.reset()

    def reset(self):
        self.confusion_matrix = np.zeros((self.n_classes, self.n_classes))
        self.truths = []
        self.predictions = []
        self.roc_preds = []

    def add_preds(self, logits, truths):
        logits = np.asarray(logits, dtype=np.float32)
        truths = np.asarray(truths).reshape(-1).astype(np.int64)
        probs = softmax_np(logits) if self.raw else logits
        if self.n_classes == 2:
            self.roc_preds.extend(probs[:, -1])
        else:
            self.roc_preds.extend(probs)
        preds = probs.argmax(axis=1)
        self.predictions.extend(preds)
        self.truths.extend(truths)
        np.add.at(self.confusion_matrix, (truths, preds), 1)

    @staticmethod
    def calc_mean_per_class_acc(confusion_matrix):
        with np.errstate(divide="ignore", invalid="ignore"):
            divided = confusion_matrix.diagonal() / confusion_matrix.sum(axis=1)
        return float(np.mean(np.nan_to_num(divided, nan=0.0, posinf=0.0)))

    def get_values(self, use_dist=False, do_reset=True,
                   return_conf_matrix=False):
        del use_dist  # single-controller SPMD: data is already global
        truths, predictions = self.truths, self.predictions
        roc_preds = np.asarray(self.roc_preds)

        accuracy = skm.accuracy_score(truths, predictions)
        mpca = self.calc_mean_per_class_acc(self.confusion_matrix)
        if self.n_classes > 2:
            kappa = skm.cohen_kappa_score(truths, predictions,
                                          weights="quadratic")
        else:
            kappa = 0.0
        recall = skm.recall_score(truths, predictions, average="macro",
                                  zero_division=0)
        try:
            roc_auc = skm.roc_auc_score(truths, roc_preds, average="macro",
                                        multi_class="ovo")
        except Exception:
            roc_auc = 0.5

        if do_reset:
            cm = self.confusion_matrix.copy()
            self.reset()
        else:
            cm = self.confusion_matrix
        results = EDict({
            self.prefix + "accuracy": round(float(accuracy), 3),
            self.prefix + "mean_per_class_accuracy": round(float(mpca), 3),
            self.prefix + "quadratic_kappa": round(float(kappa), 3),
            self.prefix + "roc_auc": round(float(roc_auc), 3),
            self.prefix + "recall": round(float(recall), 3),
        })
        if return_conf_matrix:
            results["confusion_matrix"] = cm
        return results


def mean_roc_auc(truths, predictions):
    """Per-class macro ROC-AUC for multi-label (reference metrics.py:17-36)."""
    truths = np.asarray(truths, dtype=np.float64)
    predictions = np.asarray(predictions, dtype=np.float64)
    n_classes = predictions.shape[-1]
    total = 0.0
    for c in range(n_classes):
        auc = 0.5
        tar = (truths[:, c] + truths[:, c] ** 2) / 2
        if tar.sum() > 0:
            try:
                auc = skm.roc_auc_score(
                    tar, predictions[:, c], average="macro",
                    sample_weight=truths[:, c] ** 2 + 1e-06)
            except Exception:
                auc = 0.5
        total += auc
    return total / n_classes


class MultiLabelClassificationMetrics:
    """mAP / precision / recall / f1 / accuracy / roc_auc for multi-label
    (reference metrics.py:115-189)."""

    def __init__(self, n_classes, int_to_labels=None, act_threshold=0.5,
                 mode=""):
        self.n_classes = n_classes
        self.prefix = mode + "_" if mode else ""
        self.act_threshold = act_threshold
        self.labels = np.arange(n_classes)
        self.reset()

    def reset(self):
        self.confusion_matrix = np.zeros((self.n_classes, self.n_classes))
        self.truths = []
        self.predictions = []

    def add_preds(self, logits, truths, using_knn=False):
        probs = logits if using_knn else sigmoid_np(
            np.asarray(logits, dtype=np.float32))
        self.truths += np.asarray(truths).astype(int).tolist()
        self.predictions += np.asarray(probs).tolist()

    def get_values(self, use_dist=False, do_reset=True):
        truths = np.array(self.truths)
        predictions = np.array(self.predictions)
        try:
            mAP = skm.average_precision_score(truths, predictions,
                                              average="macro")
        except Exception:
            mAP = 0.0
        roc_auc = mean_roc_auc(truths, predictions)
        binary = (predictions > self.act_threshold).astype(int)
        accuracy = skm.accuracy_score(truths, binary)
        precision = skm.precision_score(truths, binary, average="macro",
                                        labels=self.labels, zero_division=0)
        recall = skm.recall_score(truths, binary, average="macro",
                                  labels=self.labels, zero_division=0)
        f1 = skm.f1_score(truths, binary, average="macro",
                          labels=self.labels, zero_division=0)
        if do_reset:
            self.reset()
        return EDict({
            self.prefix + "accuracy": round(float(accuracy), 3),
            self.prefix + "mAP": round(float(mAP), 3),
            self.prefix + "precision": round(float(precision), 3),
            self.prefix + "recall": round(float(recall), 3),
            self.prefix + "f1": round(float(f1), 3),
            self.prefix + "roc_auc": round(float(roc_auc), 3),
        })

    # reference exposes `get_value` (singular) on the multilabel class
    get_value = get_values
