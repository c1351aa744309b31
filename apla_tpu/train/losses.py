"""Classification losses (reference `wrappers.py:310-321` init_criteria:
CrossEntropy for multiclass, BCEWithLogits for multi-label/binary)."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cross_entropy(logits, labels):
    """Integer labels -> standard CE; float/2-D labels -> soft-target CE
    (mixup/cutmix collate produces soft labels, reference `_utils.py:424-441`)."""
    logits = logits.astype(jnp.float32)
    if labels.ndim == logits.ndim and jnp.issubdtype(labels.dtype, jnp.floating):
        return optax.softmax_cross_entropy(logits, labels).mean()
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels.astype(jnp.int32)).mean()


def bce_with_logits(logits, labels):
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    if labels.ndim == logits.ndim - 1:
        # binary head: logits [B, 1] vs integer labels [B] — align instead
        # of letting numpy broadcasting silently build a [B, B] loss
        labels = labels[..., None]
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def get_criterion(task: str, is_multiclass: bool):
    if task != "classification":
        raise NotImplementedError("Only classification tasks for now "
                                  "(reference wrappers.py:315-321)")
    return cross_entropy if is_multiclass else bce_with_logits
