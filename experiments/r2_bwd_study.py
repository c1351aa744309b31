#!/usr/bin/env python
"""Round-2 study D: why is backward ~2.3x forward?

Facts so far (BASELINE.md + study B): fwd-only b64 = 38.7 ms; full train
step = 128.6 ms; attention and LN ablate to zero cost; remat policy is not
the driver (none = 142 ms).  dx matmuls have the same FLOPs as forward
(APLA: frozen dW skipped), so backward SHOULD cost ~= forward.

Hypothesis 1: dx = g @ W^T contracts over W's minor dim — the transposed
orientation may run much slower on the MXU than the forward orientation.
If true, pre-transposing the FROZEN weights (free: no grads, +86 MB bf16)
fixes it.

Method: chained matmuls inside ONE jit (sequential dependency via scan) —
immune to the ~1 ms/dispatch tunnel noise that polluted study A.

Also: decompose the step (fwd / value_and_grad / +optimizer) to locate the
time, and a no-attention MLP-scan micro-model fwd:bwd ratio.

Run detached:
  setsid nohup python experiments/r2_bwd_study.py > experiments/r2_bwd_study.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np
from jax import lax

OUT = os.path.join(os.path.dirname(__file__), "r2_bwd_study.jsonl")
M = 16640
ITERS = 12  # chain length inside one jit ~= one ViT's worth of MLP pairs


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def timeit(fn, *args, reps=10):
    o = fn(*args)
    _ = float(jnp.sum(o))   # compile + warmup, value-fetch barrier
    o = fn(*args)
    _ = float(jnp.sum(o))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    _ = float(jnp.sum(o))
    return (time.perf_counter() - t0) / reps


# ------------------------------------------------------------- study D1
# Orientation: forward vs transposed-contraction vs pre-transposed copies.

def study_d1():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, 768)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((768, 3072)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3072, 768)) * 0.02, jnp.bfloat16)
    w1t = jnp.asarray(np.asarray(w1).T.copy())  # [3072, 768] materialized
    w2t = jnp.asarray(np.asarray(w2).T.copy())  # [768, 3072]
    flops = ITERS * 2 * (2.0 * M * 768 * 3072)

    @jax.jit
    def chain_fwd(x, w1, w2):
        def body(h, _):
            h1 = jnp.dot(h, w1, preferred_element_type=jnp.bfloat16)
            return jnp.dot(h1, w2,
                           preferred_element_type=jnp.bfloat16) * 0.01, None
        h, _ = lax.scan(body, x, None, length=ITERS)
        return h

    @jax.jit
    def chain_bwd_orient(x, w1, w2):
        # the dx orientation: contract over each W's OUTPUT dim (W^T)
        def body(h, _):
            h1 = jnp.dot(h, w2.T, preferred_element_type=jnp.bfloat16)
            return jnp.dot(h1, w1.T,
                           preferred_element_type=jnp.bfloat16) * 0.01, None
        h, _ = lax.scan(body, x, None, length=ITERS)
        return h

    @jax.jit
    def chain_pretransposed(x, w2t, w1t):
        # same math as chain_bwd_orient but on materialized transposes
        def body(h, _):
            h1 = jnp.dot(h, w2t, preferred_element_type=jnp.bfloat16)
            return jnp.dot(h1, w1t,
                           preferred_element_type=jnp.bfloat16) * 0.01, None
        h, _ = lax.scan(body, x, None, length=ITERS)
        return h

    for name, fn, args in (
            ("fwd_orient", chain_fwd, (x, w1, w2)),
            ("bwd_orient_wT", chain_bwd_orient, (x, w1, w2)),
            ("bwd_pretransposed", chain_pretransposed, (x, w2t, w1t))):
        dt = timeit(fn, *args)
        emit({"study": "D1", "variant": name, "ms": round(dt * 1e3, 2),
              "tflops": round(flops / dt / 1e12, 1)})


# ------------------------------------------------------------- study D2
# Step decomposition on the real model: fwd / grads / grads+opt.

def study_d2():
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import classifier_forward, init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = VIT_BUILDERS["vit_base"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((64, 224, 224, 3)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, 1000, 64), jnp.int32)

    @jax.jit
    def fwd(trainable, frozen, images):
        return classifier_forward(trainable, frozen, images, cfg,
                                  deterministic=True)

    def loss_fn(trainable):
        logits = classifier_forward(trainable, frozen, images, cfg,
                                    rng=jax.random.PRNGKey(0),
                                    deterministic=False)
        return cross_entropy(logits, labels)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    def t_fwd():
        return timeit(lambda: fwd(trainable, frozen, images), reps=10)

    def t_grad():
        def call():
            loss, g = grad_fn(trainable)
            return g["head"]["fc"]["bias"]
        return timeit(call, reps=10)

    emit({"study": "D2", "variant": "fwd_only",
          "ms": round(t_fwd() * 1e3, 2)})
    emit({"study": "D2", "variant": "value_and_grad",
          "ms": round(t_grad() * 1e3, 2)})

    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy)
    batch = {"image": images, "label": labels}
    key = jax.random.PRNGKey(1)

    def call_full():
        nonlocal state
        state, m = step(state, frozen, batch, 3e-5, key)
        return m["loss"]

    state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    dt = timeit(call_full, reps=10)
    emit({"study": "D2", "variant": "full_train_step",
          "ms": round(dt * 1e3, 2)})


# ------------------------------------------------------------- study D3
# MLP-only scan micro-model: fwd vs grad ratio without attention.

def study_d3():
    rng = np.random.default_rng(0)
    depth = 12
    w1 = jnp.asarray(rng.standard_normal((depth, 768, 3072)) * 0.02,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((depth, 3072, 768)) * 0.02,
                     jnp.bfloat16)
    bias = jnp.zeros((depth, 768), jnp.bfloat16)  # the only trainable leaf
    x = jnp.asarray(rng.standard_normal((M, 768)), jnp.bfloat16)

    def net(bias, x):
        def body(h, scanned):
            w1_i, w2_i, b_i = scanned
            h1 = jax.nn.gelu(jnp.dot(h, w1_i,
                                     preferred_element_type=jnp.bfloat16))
            h2 = jnp.dot(h1, w2_i, preferred_element_type=jnp.bfloat16)
            return h + h2 + b_i, None
        h, _ = lax.scan(body, x, (w1, w2, bias))
        return jnp.sum(h.astype(jnp.float32))

    fwd = jax.jit(net)
    grad = jax.jit(jax.grad(net))
    flops = depth * 2 * (2.0 * M * 768 * 3072)

    dt_f = timeit(lambda: fwd(bias, x), reps=10)
    emit({"study": "D3", "variant": "mlp_scan_fwd",
          "ms": round(dt_f * 1e3, 2),
          "tflops": round(flops / dt_f / 1e12, 1)})
    dt_g = timeit(lambda: grad(bias, x), reps=10)
    # grad = fwd pass + dx backward pass: 2x the fwd matmul FLOPs
    emit({"study": "D3", "variant": "mlp_scan_grad",
          "ms": round(dt_g * 1e3, 2),
          "tflops": round(2 * flops / dt_g / 1e12, 1),
          "fwd_bwd_ratio": round(dt_g / dt_f - 1, 2)})


if __name__ == "__main__":
    emit({"study": "D", "devices": str(jax.devices())})
    study_d1()
    study_d3()
    study_d2()
    emit({"study": "D", "done": True})
