#!/usr/bin/env python
"""Round-2 study I: custom-VJP LayerNorm.

Study E: LN statistics cost 10.5 ms of the 128.5 ms step.  The autodiff
backward of the straightforward LN recomputes/materialises f32
intermediates; a custom VJP saves the [M,1] row stats (mean, rstd) and
runs the standard two-reduction backward in bf16 with f32 accumulation.

Variants (subprocess each):
  baseline_gelu   dots + gelu_tanh (the 113.0 ms reference point)
  lnvjp_gelu      same + custom-VJP layer_norm

  python experiments/r2_ln_vjp.py            # all
  python experiments/r2_ln_vjp.py <variant>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r2_ln_vjp.jsonl")
BATCH = 64


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def make_ln_vjp():
    import jax
    import jax.numpy as jnp

    @jax.custom_vjp
    def ln(x, scale, bias, eps):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        return (y * scale + bias).astype(x.dtype)

    def fwd(x, scale, bias, eps):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (xf - mean) * rstd
        out = (xhat * scale + bias).astype(x.dtype)
        # residuals: x (bf16, cheap) + [M,1] stats; xhat recomputed in bwd
        return out, (x, mean.astype(jnp.float32), rstd.astype(jnp.float32),
                     scale)

    def bwd(res, g):
        import jax.numpy as jnp
        x, mean, rstd, scale = res
        gf = g.astype(jnp.float32)
        xf = x.astype(jnp.float32)
        xhat = (xf - mean) * rstd
        gy = gf * scale                       # dL/dxhat
        n = x.shape[-1]
        m1 = jnp.mean(gy, axis=-1, keepdims=True)
        m2 = jnp.mean(gy * xhat, axis=-1, keepdims=True)
        dx = (gy - m1 - xhat * m2) * rstd
        dscale = jnp.sum(gf * xhat,
                         axis=tuple(range(x.ndim - 1))).astype(jnp.float32)
        dbias = jnp.sum(gf,
                        axis=tuple(range(x.ndim - 1))).astype(jnp.float32)
        return dx.astype(x.dtype), dscale, dbias, None

    ln.defvjp(fwd, bwd)

    def layer_norm(x, scale, bias, eps=1e-6):
        return ln(x, scale.astype(jnp.float32), bias.astype(jnp.float32),
                  eps)

    return layer_norm


def run_variant(name):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    if name == "lnvjp_gelu":
        import apla_tpu.models.vit as vit_mod
        vit_mod.layer_norm = make_ln_vjp()  # BEFORE any tracing

    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = VIT_BUILDERS["vit_base"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, gelu_tanh=True)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3)),
                                  jnp.bfloat16),
             "label": jnp.asarray(rng.integers(0, 1000, BATCH), jnp.int32)}
    key = jax.random.PRNGKey(1)
    try:
        state, m = step(state, frozen, batch, 3e-5, key)
        loss0 = float(m["loss"])
        for _ in range(3):
            state, m = step(state, frozen, batch, 3e-5, key)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(30):
            state, m = step(state, frozen, batch, 3e-5, key)
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / 30
        emit({"study": "I", "variant": name, "ms": round(dt * 1e3, 2),
              "img_s": round(BATCH / dt, 1), "loss0": round(loss0, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"study": "I", "variant": name, "error": repr(e)[:400]})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
    else:
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in ("baseline_gelu", "lnvjp_gelu"):
            subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "I", "done": True})
