#!/usr/bin/env python
"""Round-5 follow-up: WHY is the long kernel neutral on the seg side-car?

r5_seg_fused.jsonl: ViT-L/16 @512 'full'-APLA seg steps are dead-neutral
fused vs XLA (b2 25.2 vs 25.1 img/s) — while the @518 ViT-B k=128 regime
ran the isolated chain 3.8x faster (r5_long_fused.jsonl chain_long 50.28
vs chain_xla 190.9 ms).  The new variable is 'full' APLA: k == C == 1024
turns the in-kernel dW_t into a [1024, 1024] f32 accumulator per q-strip.

This probe isolates a 12-layer attention+proj chain fwd+bwd at the seg
geometry (B=2, N=1025, C=1024, H=16) for k=1024 ('full', the seg recipe)
AND k=128 (the finetune-style rank) — fused vs XLA, one subprocess per
variant.  Distinguishes "the kernel is neutral at full-k" from "the seg
step's attention share is small".

  setsid nohup python experiments/r5_seg_chain.py > experiments/r5_seg_chain.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r5_seg_chain.jsonl")

VARIANTS = ("kfull_xla", "kfull_long", "k128_xla", "k128_long")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def chain_variant(tag):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from apla_tpu.ops.attention import apla_attention

    rank, path = tag.split("_")
    fused = path == "long"
    B, N, C, H = 2, 1025, 1024, 16
    k = C if rank == "kfull" else 128
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

    if fused:
        from apla_tpu.ops.pallas_apla_attn import fused_fits
        from apla_tpu.ops.pallas_apla_attn_long import long_fused_ok
        emit({"study": "r5_seg_chain", "tag": tag,
              "monolithic_fits": bool(fused_fits(N, C, k)),
              "long_admitted": bool(long_fused_ok(N, C, k, b=B))})

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
    emit({"study": "r5_seg_chain", "tag": tag, "k": k, "fused": fused,
          "compile_s": compile_s, "ms_chain12": round(dt * 1e3, 2)})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            chain_variant(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "r5_seg_chain", "tag": sys.argv[1],
                  "error": repr(e)[:400]})
    else:
        from apla_tpu.utils.tpu_client_lock import tpu_client
        emit({"study": "r5_seg_chain", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        env = dict(os.environ, APLA_FUSED_VMEM_MB="15")
        with tpu_client("r5_seg_chain"):
            for name in VARIANTS:
                subprocess.run([sys.executable, here, name], cwd=root,
                               env=env)
        emit({"study": "r5_seg_chain", "done": True})
