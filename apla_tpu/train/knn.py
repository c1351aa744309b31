"""kNN evaluation: feature bank + temperature-weighted cosine-sim vote.

Reference: `src/defaults/trainer.py:347-455` (build_feature_bank /
knn_predict).  The DDP all-gather of bank features disappears — under SPMD
the embed step's output is already global on the host.  The predict math is
one jitted function: sim topk, exp(sim/T) weights, one-hot weighted vote.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("knn_k", "classes"))
def knn_predict(feature, feature_bank, feature_labels, knn_k: int,
                knn_t: float, classes: int):
    """feature [B, D] (L2-normalised), feature_bank [N, D] (L2-normalised),
    feature_labels [N] int.  Returns class probabilities [B, C]."""
    sim = jnp.dot(feature, feature_bank.T,
                  preferred_element_type=jnp.float32)       # [B, N]
    sim_weight, sim_idx = jax.lax.top_k(sim, knn_k)          # [B, K]
    sim_labels = feature_labels[sim_idx]                     # [B, K]
    sim_weight = jnp.exp(sim_weight / knn_t)
    one_hot = jax.nn.one_hot(sim_labels, classes)            # [B, K, C]
    scores = jnp.sum(one_hot * sim_weight[..., None], axis=1)
    return scores / jnp.sum(scores, axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("knn_k",))
def knn_predict_multilabel(feature, feature_bank, feature_labels, knn_k: int,
                           knn_t: float):
    """Multi-label variant (reference trainer.py:408-433): weighted average of
    neighbour label vectors.  feature_labels [N, C] float."""
    sim = jnp.dot(feature, feature_bank.T,
                  preferred_element_type=jnp.float32)
    sim_weight, sim_idx = jax.lax.top_k(sim, knn_k)
    gathered = feature_labels[sim_idx]                       # [B, K, C]
    w = jnp.exp(sim_weight / knn_t)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return jnp.sum(w[..., None] * gathered, axis=1)


def build_feature_bank(embed_fn, trainable, frozen, loader, pad_batch=None):
    """Run `embed_fn` over a loader, returning (features [N, D] np,
    labels [N] np).  Embeddings must come out L2-normalised."""
    feats, labels = [], []
    for batch in loader:
        images = batch["image"]
        n = images.shape[0]
        if pad_batch and n < pad_batch:
            pad = np.repeat(images[-1:], pad_batch - n, axis=0)
            images = np.concatenate([images, pad], axis=0)
        emb = np.asarray(embed_fn(trainable, frozen, images))[:n]
        feats.append(emb)
        labels.append(np.asarray(batch["label"]))
    return np.concatenate(feats), np.concatenate(labels)
