"""Classifier = ViT backbone + linear head.

Reference: `src/defaults/models.py:24-92` (Classifier wraps a backbone and an
`fc` head; `forward(return_embedding=...)` exposes backbone features).  Here
the classifier is a function pair over (trainable, frozen) pytrees so APLA's
partition extends naturally: the head always lives in the trainable tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .vit import ViTConfig, init_vit_params, vit_features, trunc_normal
from ..apla.core import AplaConfig, build_apla


def init_classifier(key, vit_cfg: ViTConfig, n_classes: int,
                    apla_cfg: AplaConfig | None = None,
                    freeze_backbone: bool = False):
    """Build (trainable, frozen) param trees for backbone + head.

    - apla_cfg given  -> backbone split per APLA; head trainable.
    - freeze_backbone -> linear probe: backbone frozen, head trainable.
    - neither         -> full fine-tune: whole backbone trainable.
    """
    k_vit, k_head = jax.random.split(key)
    vit_params = init_vit_params(k_vit, vit_cfg)
    d = vit_cfg.embed_dim
    head = {
        "kernel": trunc_normal(k_head, (d, n_classes), std=0.02),
        "bias": jnp.zeros((n_classes,)),
    }
    if apla_cfg is not None:
        backbone_t, backbone_f = build_apla(vit_params, vit_cfg, apla_cfg)
        trainable = {"backbone": backbone_t, "fc": head}
        frozen = {"backbone": backbone_f}
    elif freeze_backbone:
        trainable = {"fc": head}
        frozen = {"backbone": vit_params}
    else:
        trainable = {"backbone": vit_params, "fc": head}
        frozen = {}
    return trainable, frozen


def _backbone_params(trainable, frozen):
    """Resolve (full_params, apla_trainable_or_None) for the forward pass."""
    t_bb = trainable.get("backbone")
    f_bb = frozen.get("backbone")
    if f_bb is None:
        return t_bb, None          # full fine-tune
    if t_bb is None:
        return f_bb, None          # linear probe (frozen backbone)
    return f_bb, t_bb              # APLA split


def classifier_forward(trainable, frozen, x, vit_cfg: ViTConfig, rng=None,
                       deterministic=True, return_embedding=False,
                       pipeline=None, token_sharding=None):
    """Forward: [B, H, W, C] -> logits [B, n_classes] (and embedding if asked).

    `pipeline`: optional `parallel.pipeline.PipelineSpec` — run the trunk
    as a collective pipeline over the mesh model axis.
    `token_sharding`: optional `NamedSharding` for the token stream
    (sequence parallelism over the model axis)."""
    params, apla_t = _backbone_params(trainable, frozen)
    emb = vit_features(params, x, vit_cfg, trainable=apla_t, rng=rng,
                       deterministic=deterministic, pipeline=pipeline,
                       token_sharding=token_sharding)
    fc = trainable["fc"]
    logits = jnp.dot(emb, fc["kernel"].astype(emb.dtype),
                     preferred_element_type=emb.dtype) + fc["bias"].astype(emb.dtype)
    if return_embedding:
        return logits, emb
    return logits
