#!/usr/bin/env python
"""Round-5: the long-sequence fused APLA kernel at @518 (VERDICT r4 item 7).

ViT-B/14 @518 (N=1370, the reference pre-train grid
params/pretrain/dinov2/ISIC2019/vit_b/__common__.yml:125), b8, APLA-128,
gelu_tanh, remat='dots'.  Baselines (r3_long_seq.jsonl): XLA 63.6 img/s,
blockwise flash 46.3; best @518 recipe 67.9 (b32a8, r3_scaling2).  The new
q-strip kernel (ops/pallas_apla_attn_long.py) keeps the whole image's qkv
VMEM-resident and fuses the APLA projection + in-kernel dW_t.

Variants (one subprocess each): xla_b8, long_b8, long_b16a2, long_b32a8
plus an isolated 12-layer attention-chain comparison.

  setsid nohup python experiments/r5_long_fused.py > experiments/r5_long_fused.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r5_long_fused.jsonl")

VARIANTS = ("xla_b8", "long_b8", "long_b16a2", "long_b32a8", "chain_xla",
            "chain_long")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def step_variant(tag, batch, accum, fused):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState
    from apla_tpu.utils.profiling import compiled_memory_analysis

    cfg = VIT_BUILDERS["vit_base"](
        img_size=518, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, gelu_tanh=True,
        use_fused_apla=fused)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    stepf = make_train_step(cfg, tx, cross_entropy, accum_steps=accum)

    rng = np.random.default_rng(0)
    batch_d = {"image": jnp.asarray(
        rng.standard_normal((batch, 518, 518, 3)), jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)}
    key = jax.random.PRNGKey(1)

    mem = compiled_memory_analysis(stepf, state, frozen, batch_d, 3e-5, key)
    t0 = time.time()
    state, m = stepf(state, frozen, batch_d, 3e-5, key)
    _ = float(m["loss"])
    compile_s = round(time.time() - t0, 1)
    for _ in range(2):
        state, m = stepf(state, frozen, batch_d, 3e-5, key)
    _ = float(m["loss"])
    steps = 10
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = stepf(state, frozen, batch_d, 3e-5, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    emit({"study": "r5_long", "tag": tag, "batch": batch, "accum": accum,
          "fused": fused, "compile_s": compile_s,
          "ms_step": round(dt * 1e3, 1), "img_s": round(batch / dt, 1),
          "loss": round(float(m["loss"]), 4), **mem})


def chain_variant(tag, fused):
    """Isolated 12-layer attention+proj chain fwd+bwd at N=1370, b8 —
    the kernel vs XLA without the MLP/LN/patch-embed context."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from apla_tpu.ops.attention import apla_attention

    B, N, C, H, k = 8, 1370, 768, 12, 128
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    x = (jax.random.normal(keys[0], (B, N, C), jnp.bfloat16) * 0.2)
    frozen = {
        "qkv": {"kernel": jax.random.normal(keys[1], (C, 3 * C),
                                            jnp.bfloat16) * 0.02,
                "bias": jnp.zeros((3 * C,), jnp.bfloat16)},
        "proj": {"kernel": jax.random.normal(keys[2], (C, C),
                                             jnp.bfloat16) * 0.02,
                 "bias": jnp.zeros((C,), jnp.bfloat16)},
        "inds": jax.random.permutation(keys[3], C)[:k].astype(jnp.int32),
    }
    w_t = jax.random.normal(keys[4], (C, k), jnp.float32) * 0.02
    b_t = jnp.zeros((k,), jnp.float32)

    @jax.jit
    def chain(x, frozen, w_t, b_t):
        def loss(w_t, b_t):
            def body(h, _):
                t = {"proj_wt": w_t, "proj_bt": b_t}
                return apla_attention(h, frozen, t, H,
                                      use_fused=fused) + h, None
            out, _ = jax.lax.scan(body, x, None, length=12)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(w_t, b_t)
        return l + sum(jnp.sum(a) for a in g)

    t0 = time.time()
    _ = float(chain(x, frozen, w_t, b_t))
    compile_s = round(time.time() - t0, 1)
    _ = float(chain(x, frozen, w_t, b_t))
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        acc = chain(x, frozen, w_t, b_t)
    acc = float(acc)
    dt = (time.perf_counter() - t0) / reps
    emit({"study": "r5_long", "tag": tag, "fused": fused,
          "compile_s": compile_s, "ms_chain12": round(dt * 1e3, 2)})


def run(name):
    if name.startswith("chain"):
        chain_variant(name, fused=name.endswith("long"))
        return
    kind, spec = name.split("_", 1)
    fused = kind == "long"
    if "a" in spec:
        b, a = spec[1:].split("a")
        step_variant(name, int(b), int(a), fused)
    else:
        step_variant(name, int(spec[1:]), 1, fused)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            run(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "r5_long", "tag": sys.argv[1],
                  "error": repr(e)[:400]})
    else:
        from apla_tpu.utils.tpu_client_lock import tpu_client
        emit({"study": "r5_long", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        with tpu_client("r5_long_fused"):
            for name in VARIANTS:
                subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "r5_long", "done": True})
