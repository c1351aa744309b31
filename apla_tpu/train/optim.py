"""Optimizer construction over the TRAINABLE pytree only.

Reference parity: `wrappers.py:186-221` — any torch.optim name, with two
param groups (weight-decay applied only to >=2-D non-bias tensors, the DINO
rule).  Here that's an optax weight-decay mask; gradients for frozen params
simply never exist, so there is nothing to filter.

Learning rate AND weight decay enter through `optax.inject_hyperparams` so
host-side schedulers (LRScheduler; DINO's wd cosine decay,
`DINO/trainer.py:8-11`) can set them every step without recompiling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


# Param names that are per-feature vectors in the reference (biases, norm
# scales, LayerScale gammas, the APLA bias slice).  Block params here are
# STACKED on a leading [depth] axis, so a per-block bias is 2-D — ndim alone
# cannot reproduce the reference rule; the key path can.
_NO_WD_NAMES = frozenset({"bias", "proj_bt", "scale", "gamma"})


def _path_leaf_name(path) -> str | None:
    for entry in reversed(path):
        if isinstance(entry, jax.tree_util.DictKey):
            return str(entry.key)
        if isinstance(entry, jax.tree_util.GetAttrKey):
            return entry.name
    return None


def wd_mask(params) -> object:
    """True for leaves that should be weight-decayed, mirroring the reference
    rule "no WD for .bias or 1-D params" (wrappers.py:204-221).  Because block
    params are stacked on a leading [depth] axis (LayerNorm scale -> [L, d]),
    the mask is path-aware: leaves named bias / scale / gamma / proj_bt are
    exempt regardless of stacked ndim; everything else decays iff ndim >= 2."""
    def decide(path, p):
        if _path_leaf_name(path) in _NO_WD_NAMES:
            return False
        return p.ndim >= 2
    return jax.tree_util.tree_map_with_path(decide, params)


def build_optimizer(opt_type: str, opt_params: dict, trainable_template,
                    grad_clip: float | None = None) -> optax.GradientTransformation:
    """Build an optax chain for `opt_type` ('AdamW', 'Adam', 'SGD', 'RMSprop',
    'LAMB') with reference param-group semantics.

    `opt_params` follows the YAML schema: {'lr': ..., 'weight_decay': ...,
    plus optimizer kwargs like betas/eps/momentum}.
    """
    opt_params = dict(opt_params)
    lr0 = float(opt_params.pop("lr", 1e-3))
    wd0 = float(opt_params.pop("weight_decay", 0.0))
    betas = opt_params.pop("betas", (0.9, 0.999))
    eps = float(opt_params.pop("eps", 1e-8))
    # torch.optim defaults: SGD/RMSprop momentum 0 unless configured
    momentum = float(opt_params.pop("momentum", 0.0))
    alpha = float(opt_params.pop("alpha", 0.99))  # RMSprop decay

    mask = wd_mask(trainable_template)

    def core(lr, wd):
        if opt_type == "AdamW":
            return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                               weight_decay=wd, mask=mask)
        if opt_type == "Adam":
            # torch.optim.Adam COUPLES weight decay into the gradient
            # (L2 regularization) before the moment updates — not AdamW's
            # decoupled decay
            return optax.chain(
                optax.add_decayed_weights(wd, mask=mask),
                optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps))
        if opt_type == "SGD":
            chain = [optax.add_decayed_weights(wd, mask=mask)]
            chain.append(optax.sgd(lr, momentum=momentum,
                                   nesterov=bool(opt_params.get("nesterov",
                                                                False))))
            return optax.chain(*chain)
        if opt_type == "RMSprop":
            # torch.optim.RMSprop semantics: alpha (decay) defaults 0.99,
            # eps added OUTSIDE the sqrt, weight decay coupled into the
            # grad, and the momentum buffer accumulates UNSCALED updates
            # (lr applied last — optax.rmsprop scales by lr before the
            # trace, which diverges under lr schedules)
            return optax.chain(
                optax.add_decayed_weights(wd, mask=mask),
                optax.scale_by_rms(decay=alpha, eps=eps, eps_in_sqrt=False),
                (optax.trace(decay=momentum) if momentum
                 else optax.identity()),
                optax.scale_by_learning_rate(lr))
        if opt_type == "LAMB":
            return optax.lamb(lr, b1=betas[0], b2=betas[1], eps=eps,
                              weight_decay=wd, mask=mask)
        raise NotImplementedError(f"optimizer {opt_type}")

    @optax.inject_hyperparams
    def make(lr, wd):
        chain = []
        if grad_clip:
            chain.append(optax.clip_by_global_norm(float(grad_clip)))
        chain.append(core(lr, wd))
        return optax.chain(*chain)

    return make(lr=jnp.asarray(lr0, jnp.float32),
                wd=jnp.asarray(wd0, jnp.float32))


def set_lr(opt_state, lr, wd=None):
    """Return opt_state with injected hyperparams replaced (functional —
    safe under jit)."""
    hp = dict(opt_state.hyperparams)
    hp["lr"] = jnp.asarray(lr, jnp.float32)
    if wd is not None:
        hp["wd"] = jnp.asarray(wd, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def get_lr(opt_state):
    return opt_state.hyperparams["lr"]
