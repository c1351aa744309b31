#!/usr/bin/env python
"""Round-2 study H: batch sweep under gelu_tanh (the b64 sweet spot was
measured with erf gelu; the balance may have moved)."""
import json, os, subprocess, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(os.path.dirname(__file__), "r2_batch_gelu.jsonl")

def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f: f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)

def run(bs):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp, numpy as np
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState
    cfg = VIT_BUILDERS["vit_base"](img_size=224, patch_size=14,
        has_layerscale=True, layerscale_init=1.0, drop_path_rate=0.0,
        gelu_tanh=True)
    trainable, frozen = init_classifier(jax.random.PRNGKey(0), cfg,
        n_classes=1000, apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.standard_normal((bs, 224, 224, 3)),
                                  jnp.bfloat16),
             "label": jnp.asarray(rng.integers(0, 1000, bs), jnp.int32)}
    key = jax.random.PRNGKey(1)
    try:
        state, m = step(state, frozen, batch, 3e-5, key); _ = float(m["loss"])
        for _ in range(3):
            state, m = step(state, frozen, batch, 3e-5, key)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(30):
            state, m = step(state, frozen, batch, 3e-5, key)
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / 30
        emit({"study": "H", "batch": bs, "ms": round(dt*1e3, 2),
              "img_s": round(bs/dt, 1)})
    except Exception as e:
        emit({"study": "H", "batch": bs, "error": repr(e)[:300]})

if __name__ == "__main__":
    if len(sys.argv) > 1:
        run(int(sys.argv[1]))
    else:
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for bs in (96, 128, 48):
            subprocess.run([sys.executable, here, str(bs)], cwd=root)
        emit({"study": "H", "done": True})
