#!/usr/bin/env python
"""Round-2 study G: the fixed full-VMEM Pallas attention vs XLA attention.

Round 1's kernel cast q/k/v to f32 before the dots (fraction of bf16 MXU
rate) — now fixed to bf16 operands + f32 accumulation.  Attention is 46.2
ms of the 128.5 ms step (study E), so a kernel that halves it is ~20% step
time.

Measures (subprocess per variant):
  chain_xla / chain_pallas: 12 chained attention calls in ONE jit
    (fwd-only and fwd+grad) at ViT-B b64 shapes [64, 257, 12, 64]
  step_flash_gelu: full train step, use_flash=True + gelu_tanh=True
  step_flash: full train step, use_flash=True only

  python experiments/r2_attn_kernel.py            # all
  python experiments/r2_attn_kernel.py <variant>  # one
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r2_attn_kernel.jsonl")
B, N, H, D = 64, 257, 12, 64
DEPTH = 12


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return jax


def timeit(jnp, fn, *args, reps=10):
    o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def chain(kind):
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)
    scale = D ** -0.5

    def xla_attn(q):
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, q,
                            preferred_element_type=jnp.bfloat16) * scale
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1
                              ).astype(q.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", attn, q,
                          preferred_element_type=q.dtype)

    def pallas_attn(q):
        from apla_tpu.ops.pallas_mha import vmem_mha
        return vmem_mha(q, q, q, scale=scale)

    attn = {"xla": xla_attn, "pallas": pallas_attn}[kind]

    def net(x):
        def body(h, _):
            return attn(h), None
        h, _ = lax.scan(body, x, None, length=DEPTH)
        return jnp.sum(h.astype(jnp.float32))

    fwd = jax.jit(net)
    grad = jax.jit(jax.grad(net))
    # QK^T + AV per call: 2 * 2 * B*H*N^2*D
    flops = DEPTH * 2 * 2.0 * B * H * N * N * D

    dt = timeit(jnp, fwd, x)
    emit({"study": "G", "variant": f"chain_{kind}_fwd",
          "ms": round(dt * 1e3, 2), "tflops": round(flops / dt / 1e12, 1)})
    dt = timeit(jnp, grad, x)
    emit({"study": "G", "variant": f"chain_{kind}_grad",
          "ms": round(dt * 1e3, 2),
          "tflops": round(3 * flops / dt / 1e12, 1)})


def step(flash, gelu):
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = VIT_BUILDERS["vit_base"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, use_flash=flash,
        gelu_tanh=gelu)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    st = make_train_step(cfg, tx, cross_entropy)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.standard_normal((B, 224, 224, 3)),
                                  jnp.bfloat16),
             "label": jnp.asarray(rng.integers(0, 1000, B), jnp.int32)}
    key = jax.random.PRNGKey(1)
    state, m = st(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    for _ in range(3):
        state, m = st(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(30):
        state, m = st(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / 30
    emit({"study": "G",
          "variant": f"step_flash{int(flash)}_gelu{int(gelu)}",
          "ms": round(dt * 1e3, 2), "img_s": round(B / dt, 1)})


VARIANTS = ["chain_xla", "chain_pallas", "step_flash_gelu", "step_flash"]


def run_variant(name):
    try:
        if name == "chain_xla":
            chain("xla")
        elif name == "chain_pallas":
            chain("pallas")
        elif name == "step_flash_gelu":
            step(True, True)
        elif name == "step_flash":
            step(True, False)
    except Exception as e:  # noqa: BLE001
        emit({"study": "G", "variant": name, "error": repr(e)[:400]})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
    else:
        emit({"study": "G", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in VARIANTS:
            subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "G", "done": True})
