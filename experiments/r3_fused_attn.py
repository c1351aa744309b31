#!/usr/bin/env python
"""Round-3 north-star study: tight-padded VMEM MHA + the fused
APLA-attention kernel vs XLA (VERDICT r2 item 2).

Variants (one subprocess each; ONE TPU client at a time):
  chain_xla        12 chained XLA attentions (fwd, fwd+grad) — r2 baseline re-run
  chain_pallas     12 chained vmem_mha (now 257->272 pad, was 384)
  chain_fused      12 chained fused attention+APLA-proj kernels vs
  chain_xla_proj   12 chained XLA attention + apla_proj (the like-for-like
                   separate-ops baseline: includes the projection)
  step_base        full ViT-B b64a8 train step, XLA attention (the bench recipe)
  step_flash       same step, use_flash=True (VMEM kernel, 272 pad)
  step_fused       same step, use_fused_apla=True

  python experiments/r3_fused_attn.py            # all
  python experiments/r3_fused_attn.py <variant>  # one
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_fused_attn.jsonl")
B, N, H, D = 64, 257, 12, 64
C = H * D
K = 128
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
    o0 = o[0] if isinstance(o, tuple) else o
    _ = float(jnp.sum(o0.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    o0 = o[0] if isinstance(o, tuple) else o
    _ = float(jnp.sum(o0.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def chain(kind):
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.default_rng(0)
    scale = D ** -0.5

    if kind in ("xla", "pallas"):
        x = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)

        def xla_attn(q):
            logits = jnp.einsum("bnhd,bmhd->bhnm", q, q,
                                preferred_element_type=jnp.bfloat16) * scale
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1
                                  ).astype(q.dtype)
            return jnp.einsum("bhnm,bmhd->bnhd", attn, q,
                              preferred_element_type=q.dtype)

        def pallas_attn(q):
            from apla_tpu.ops.pallas_mha import vmem_mha
            return vmem_mha(q, q, q, scale)

        attn = xla_attn if kind == "xla" else pallas_attn

        @jax.jit
        def fwd(q):
            def body(h, _):
                return attn(h), None
            out, _ = lax.scan(body, q, None, length=DEPTH)
            return out

        @jax.jit
        def fwdbwd(q):
            def loss(q):
                return jnp.sum(fwd(q).astype(jnp.float32) ** 2)
            return jax.grad(loss)(q)

        t_f = timeit(jnp, fwd, x)
        t_b = timeit(jnp, fwdbwd, x)
    else:  # fused / xla_proj: chain includes the APLA projection
        qkv = jnp.asarray(rng.standard_normal((B, N, 3 * C)) * 0.05,
                          jnp.bfloat16)
        wf = jnp.asarray(rng.standard_normal((C, C)) * 0.03, jnp.float32)
        bf = jnp.zeros((C,), jnp.float32)
        inds = jnp.asarray(rng.permutation(C)[:K], jnp.int32)
        wt = jnp.asarray(rng.standard_normal((C, K)) * 0.03, jnp.float32)
        bt = jnp.zeros((K,), jnp.float32)

        if kind == "fused":
            from apla_tpu.ops.pallas_apla_attn import fused_apla_attention

            def one(h, wt, bt, wf, bf, inds):
                return fused_apla_attention(h, wt, bt, wf, bf, inds,
                                            H, scale)
        else:
            from apla_tpu.ops.apla_proj import apla_proj

            def one(h, wt, bt, wf, bf, inds):
                q, k, v = [a.reshape(B, N, H, D)
                           for a in jnp.split(h, 3, axis=-1)]
                logits = jnp.einsum(
                    "bnhd,bmhd->bhnm", q, k,
                    preferred_element_type=jnp.bfloat16) * scale
                attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1
                                      ).astype(h.dtype)
                o = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                               preferred_element_type=h.dtype)
                return apla_proj(o.reshape(B, N, C), wt, bt, wf, bf, inds)

        @jax.jit
        def fwd(qkv, wt, bt, wf, bf, inds):
            def body(h, _):
                o = one(h, wt, bt, wf, bf, inds)
                # re-expand to qkv width so the chain composes
                return jnp.concatenate([o, o, o], axis=-1), None
            out, _ = lax.scan(body, qkv, None, length=DEPTH)
            return out

        @jax.jit
        def fwdbwd(qkv, wt, bt, wf, bf, inds):
            def loss(qkv, wt, bt):
                return jnp.sum(
                    fwd(qkv, wt, bt, wf, bf, inds).astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2))(qkv, wt, bt)

        t_f = timeit(jnp, fwd, qkv, wt, bt, wf, bf, inds)
        t_b = timeit(jnp, lambda *a: fwdbwd(*a)[0], qkv, wt, bt, wf, bf,
                     inds)

    emit({"study": "chain", "kind": kind, "depth": DEPTH,
          "fwd_ms": round(t_f * 1e3, 2), "fwdbwd_ms": round(t_b * 1e3, 2)})


def step(kind, accum=8, batch=64):
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

    kw = dict(img_size=224, patch_size=14, has_layerscale=True,
              layerscale_init=1.0, drop_path_rate=0.0, gelu_tanh=True,
              remat=os.environ.get("APLA_BENCH_REMAT", "dots"))
    if kind == "flash":
        kw["use_flash"] = True
    elif kind == "fused":
        kw["use_fused_apla"] = True
    cfg = VIT_BUILDERS["vit_base"](**kw)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    stepf = make_train_step(cfg, tx, cross_entropy, accum_steps=accum)

    rng = np.random.default_rng(0)
    batch_d = {"image": jnp.asarray(
        rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)}
    key = jax.random.PRNGKey(1)
    state, m = stepf(state, frozen, batch_d, 3e-5, key)
    _ = float(m["loss"])
    for _ in range(3):
        state, m = stepf(state, frozen, batch_d, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        state, m = stepf(state, frozen, batch_d, 3e-5, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / reps
    # record the BB the kernel ACTUALLY ran (query the kernel's own policy
    # — do not re-derive it here)
    eff_bb = None
    if kind == "fused":
        from apla_tpu.ops.pallas_apla_attn import (effective_bb_bwd,
                                                   effective_bb_fwd)
        mb = batch // accum
        eff_bb = [effective_bb_fwd(mb, 272, 768),
                  effective_bb_bwd(mb, 272, 768, 128)]
    emit({"study": "step", "kind": kind, "batch": batch, "accum": accum,
          "bb_req": os.environ.get("APLA_FUSED_BB_FWD", "4"),
          "bb_eff": eff_bb,
          "remat": os.environ.get("APLA_BENCH_REMAT", "dots"),
          "ms_step": round(dt * 1e3, 1), "img_s": round(batch / dt, 1)})


VARIANTS = {
    "chain_xla": lambda: chain("xla"),
    "chain_pallas": lambda: chain("pallas"),
    "chain_fused": lambda: chain("fused"),
    "chain_xla_proj": lambda: chain("xla_proj"),
    "step_base": lambda: step("base"),
    "step_flash": lambda: step("flash"),
    "step_fused": lambda: step("fused"),
    # accum-regime sweep: where does the kernel's isolated win survive?
    "step_base_a1": lambda: step("base", 1),
    "step_flash_a1": lambda: step("flash", 1),
    "step_fused_a1": lambda: step("fused", 1),
    "step_flash_a2": lambda: step("flash", 2),
    "step_fused_a2": lambda: step("fused", 2),
    "step_fused_a4": lambda: step("fused", 4),
}
SWEEP2 = ["chain_fused", "step_base_a1", "step_flash_a1", "step_fused_a1",
          "step_flash_a2", "step_fused_a2", "step_fused_a4"]


def _bb_variant(name, fwd_bb, bwd_bb, accum):
    os.environ["APLA_FUSED_BB_FWD"] = str(fwd_bb)
    os.environ["APLA_FUSED_BB_BWD"] = str(bwd_bb)
    step("fused", accum)


# re-sweep with the image-batched (BB) fused kernel + fused batch sweep
# (per-image cost rises with batch for XLA; the kernel's memory-traffic
# profile may move the optimum)
SWEEP3 = ["step_fused_a2", "step_fused_a4", "step_fused",
          "step_fused_bb8a1", "step_fused_bb1a8",
          "step_fused_b32a1", "step_fused_b48a1", "step_fused_b96a1"]
# confirmation after the staging-safe BB rule (B>8 -> fwd<=2, bwd=1)
SWEEP4 = ["step_fused", "step_fused_a2", "step_fused_a4",
          "step_fused_b32a1", "step_fused_a1", "step_fused_a16"]
VARIANTS_EXTRA = {
    "step_fused_bb8a1": lambda: _bb_variant("bb8a1", 8, 4, 1),
    "step_fused_bb1a8": lambda: _bb_variant("bb1a8", 1, 1, 8),
    "step_fused_b32a1": lambda: step("fused", 1, 32),
    "step_fused_b48a1": lambda: step("fused", 1, 48),
    "step_fused_b96a1": lambda: step("fused", 1, 96),
    "step_fused_a16": lambda: step("fused", 16),
}  # (step_fused_a1 lives in the base VARIANTS table)


def main():
    VARIANTS.update(VARIANTS_EXTRA)
    if len(sys.argv) > 1 and not sys.argv[1].startswith("sweep"):
        VARIANTS[sys.argv[1]]()
        return
    me = os.path.abspath(__file__)
    names = list(VARIANTS)
    if len(sys.argv) > 1:
        names = {"sweep2": SWEEP2, "sweep3": SWEEP3,
                 "sweep4": SWEEP4}[sys.argv[1]]
    for name in names:
        print(f"=== {name} ===", flush=True)
        r = subprocess.run([sys.executable, me, name], timeout=1800)
        if r.returncode:
            emit({"study": "error", "kind": name, "rc": r.returncode})


if __name__ == "__main__":
    main()
