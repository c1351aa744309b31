"""SSL projection/prediction heads.

Reference: `BYOL/models.py` (BYOLHead Linear-BN-ReLU stacks, Prediction_MLP)
and `DINO/models.py:74-110` / `dinov2/layers/dino_head.py` (DINOHead: MLP ->
L2-normalise -> weight-normalised last layer).

Functional form: params pytree + (for BN) a running-stats pytree threaded
through the train step.  BN normalises with batch statistics in training and
running statistics in eval, like torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.vit import trunc_normal


def _linear(key, d_in, d_out, bias=True, std=0.02):
    p = {"kernel": trunc_normal(key, (d_in, d_out), std=std)}
    if bias:
        p["bias"] = jnp.zeros((d_out,))
    return p


def _bn_init(dim):
    return ({"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
            {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))})


def batch_norm(x, params, state, train: bool, momentum=0.9, eps=1e-5):
    """Returns (y, new_state).  x: [B, D]."""
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=0)
        var = jnp.var(xf, axis=0)
        new_state = {
            "mean": momentum * state["mean"] + (1 - momentum) * mean,
            "var": momentum * state["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(x.dtype), new_state


# --------------------------------------------------------------------------- #
# BYOL / SimSiam heads
# --------------------------------------------------------------------------- #

def init_byol_head(key, in_size, out_size, hidden_size=4096, num_layers=2):
    """BYOLHead (reference BYOL/models.py:50-74): [Linear-BN-ReLU] x
    (num_layers-1) -> Linear-BN."""
    assert 1 < num_layers < 4
    keys = jax.random.split(key, num_layers)
    params, state = {}, {}
    dims = [in_size] + [hidden_size] * (num_layers - 1) + [out_size]
    for i in range(num_layers):
        params[f"fc{i}"] = _linear(keys[i], dims[i], dims[i + 1])
        bn_p, bn_s = _bn_init(dims[i + 1])
        params[f"bn{i}"] = bn_p
        state[f"bn{i}"] = bn_s
    return params, state


def byol_head_forward(x, params, state, train: bool):
    n = sum(1 for k in params if k.startswith("fc"))
    new_state = dict(state)
    for i in range(n):
        p = params[f"fc{i}"]
        x = jnp.dot(x, p["kernel"].astype(x.dtype),
                    preferred_element_type=x.dtype) + p["bias"].astype(x.dtype)
        x, new_state[f"bn{i}"] = batch_norm(x, params[f"bn{i}"],
                                            state[f"bn{i}"], train)
        if i < n - 1:
            x = jax.nn.relu(x)
    return x, new_state


def init_prediction_mlp(key, in_size, out_size, hidden_size=4096):
    """Prediction_MLP (reference BYOL/models.py:36-47):
    Linear-BN-ReLU-Linear."""
    k1, k2 = jax.random.split(key)
    params = {"fc0": _linear(k1, in_size, hidden_size),
              "fc1": _linear(k2, hidden_size, out_size)}
    bn_p, bn_s = _bn_init(hidden_size)
    params["bn0"] = bn_p
    return params, {"bn0": bn_s}


def prediction_mlp_forward(x, params, state, train: bool):
    p = params["fc0"]
    x = jnp.dot(x, p["kernel"].astype(x.dtype),
                preferred_element_type=x.dtype) + p["bias"].astype(x.dtype)
    x, bn_s = batch_norm(x, params["bn0"], state["bn0"], train)
    x = jax.nn.relu(x)
    p = params["fc1"]
    x = jnp.dot(x, p["kernel"].astype(x.dtype),
                preferred_element_type=x.dtype) + p["bias"].astype(x.dtype)
    return x, {"bn0": bn_s}


# --------------------------------------------------------------------------- #
# DINO head
# --------------------------------------------------------------------------- #

def init_dino_head(key, in_dim, out_dim, nlayers=3, hidden_dim=2048,
                   bottleneck_dim=256):
    """DINOHead (reference DINO/models.py:74-110): MLP(GELU) -> L2-norm ->
    weight-normalised linear (direction `v` trainable, magnitude `g` fixed
    at 1 when norm_last_layer, the reference default)."""
    keys = jax.random.split(key, nlayers + 1)
    mlp = []
    dims = ([in_dim, bottleneck_dim] if nlayers == 1
            else [in_dim] + [hidden_dim] * (nlayers - 1) + [bottleneck_dim])
    for i in range(len(dims) - 1):
        mlp.append(_linear(keys[i], dims[i], dims[i + 1]))
    last = trunc_normal(keys[-1], (bottleneck_dim, out_dim), std=0.02)
    return {"mlp": mlp, "last_v": last, "last_g": jnp.ones((out_dim,))}


def dino_head_bottleneck(x, params):
    """MLP + L2-norm half of the DINO head: [*, in_dim] -> [*, bottleneck]
    f32 unit rows (everything before the prototype projection)."""
    n = len(params["mlp"])
    for i, p in enumerate(params["mlp"]):
        x = jnp.dot(x, p["kernel"].astype(x.dtype),
                    preferred_element_type=x.dtype) + p["bias"].astype(x.dtype)
        if i < n - 1:
            x = jax.nn.gelu(x, approximate=False)
    x = x.astype(jnp.float32)
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


def dino_head_last_w(params, norm_last_layer=True):
    """The weight-normalised prototype projection [bottleneck, out_dim]:
    W = g * v / ||v||_col; with norm_last_layer (the reference default)
    the magnitude g is frozen at 1 (requires_grad=False)."""
    v = params["last_v"].astype(jnp.float32)
    v = v / (jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-12)
    g = params["last_g"].astype(jnp.float32)
    if norm_last_layer:
        g = jax.lax.stop_gradient(g)
    return v * g


def dino_head_forward(x, params, norm_last_layer=True, matmul_bf16=False):
    x = dino_head_bottleneck(x, params)
    w = dino_head_last_w(params, norm_last_layer)
    if matmul_bf16:
        # the [*, bottleneck] x [bottleneck, n_prototypes] matmul is the
        # head's FLOP body (65536 prototypes); bf16 inputs with f32
        # accumulation run it on the MXU at full rate.  Normalisations
        # and the logits stay f32.  Opt-in (dinov2 head_matmul_bf16).
        return jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)
