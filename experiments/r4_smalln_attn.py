#!/usr/bin/env python
"""Round-4: small-N fused-kernel policy for DINOv2 local crops (VERDICT r3
item 7).  The 50-token local crops are 33% of the DINOv2 step and the one
regime the fused kernel lost (20x at BB<=2: per-grid-step work too small).
The new small-N policy (pallas_apla_attn._SMALL_NP) folds crops x images
into the batch-grid dimension — BB is VMEM-capped, not envelope-capped.

Variants (one subprocess each; ONE TPU client at a time):
  chain_xla_local        12 chained XLA attention + apla_proj at the local
                         geometry (B=64 = b8 x 8 crops, N=50, ViT-B)
  chain_fused_local_bbX  same chain, fused kernel, BB_SMALL = X
  step_gate              full DINOv2 recipe step b8, round-3 gate
                         (fused globals, XLA locals) — the 151.4 control
  step_all_bbX           same step, locals ALSO fused (MIN_N=0), BB_SMALL=X
  step16_*               b16 variants of the winner

  python experiments/r4_smalln_attn.py            # full sweep
  python experiments/r4_smalln_attn.py <variant>  # one
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r4_smalln_attn.jsonl")
B, N, H, D = 64, 50, 12, 64   # b8 recipe: 8 images x 8 local crops, 98px/14
C = H * D
K = 128
DEPTH = 12
STEPS = 15


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
            return fused_apla_attention(h, wt, bt, wf, bf, inds, H, scale)
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
    t_b = timeit(jnp, lambda *a: fwdbwd(*a)[0], qkv, wt, bt, wf, bf, inds)

    from apla_tpu.ops.pallas_apla_attn import (effective_bb_bwd,
                                               effective_bb_fwd)
    emit({"study": "chain_local", "kind": kind, "B": B, "N": N,
          "depth": DEPTH,
          "bb_eff": [effective_bb_fwd(B, 64, C),
                     effective_bb_bwd(B, 64, C, K)],
          "fwd_ms": round(t_f * 1e3, 2), "fwdbwd_ms": round(t_b * 1e3, 2)})


def step(batch_size, min_n):
    """Full DINOv2 recipe step (ViT-B, 2x224 + 8x98 crops, 65536 protos)."""
    if min_n is not None:
        os.environ["APLA_FUSED_MIN_N"] = str(min_n)
    jax = setup_jax()

    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    from apla_tpu.utils.config import load_merged_params

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = load_merged_params(os.path.join(
        root, "params", "synthetic", "vit_tiny", "dinov2.yml"))
    params.model_params.backbone_type = "vit_base"
    sp = params.model_params.transformers_params.student
    sp.pre_img_size = 224
    sp.patch_size = 14
    sp.layerscale = 1.0
    sp.gelu_tanh = True
    sp.use_fused_apla = True
    params.model_params.adaptation.params.partial_size = 128
    params.dataset_params.ssl_global_size = 224
    params.dataset_params.ssl_local_size = 98
    params.dataset_params.synthetic_size = 4 * batch_size
    params.dataset_params.synthetic_img_size = 256
    for head in ("dino", "ibot"):
        params.model_params.dinov2[head].head_n_prototypes = 65536
        params.model_params.dinov2[head].head_bottleneck_dim = 256
        params.model_params.dinov2[head].head_hidden_dim = 2048
    params.training_params.is_dry = True
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = batch_size

    wrapper = DINOv2Wrapper(params)
    wrapper.instantiate()
    trainer = Dinov2Trainer(wrapper)
    loader = wrapper.dataloaders.trainloader
    loader.set_epoch(0)
    batch = next(iter(loader))
    dbatch = trainer._device_batch(batch)
    step_fn = trainer._get_step(False)

    state, m = step_fn(trainer.state, trainer.frozen, dbatch,
                       1e-4, 0.04, 0.994, 0.07, trainer.rng)
    _ = float(m["loss"])
    for _ in range(2):
        state, m = step_fn(state, trainer.frozen, dbatch,
                           1e-4, 0.04, 0.994, 0.07, trainer.rng)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step_fn(state, trainer.frozen, dbatch,
                           1e-4, 0.04, 0.994, 0.07, trainer.rng)
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS

    from apla_tpu.ops.pallas_apla_attn import (effective_bb_bwd,
                                               effective_bb_fwd, fused_min_n)
    n_loc = batch_size * 8
    emit({"study": "dinov2_step", "batch": batch_size,
          "fused_min_n": fused_min_n(),
          "bb_small": [os.environ.get("APLA_FUSED_BB_FWD_SMALL", "8"),
                       os.environ.get("APLA_FUSED_BB_BWD_SMALL", "8")],
          "bb_eff_local": [effective_bb_fwd(n_loc, 64, C),
                           effective_bb_bwd(n_loc, 64, C, K)],
          "ms_per_step": round(dt * 1e3, 1),
          "img_s": round(batch_size / dt, 1), "loss": round(loss, 4)})


def _small_bb(fwd_bb, bwd_bb, fn):
    os.environ["APLA_FUSED_BB_FWD_SMALL"] = str(fwd_bb)
    os.environ["APLA_FUSED_BB_BWD_SMALL"] = str(bwd_bb)
    fn()


def _no_fold(fn):
    os.environ["APLA_FUSED_SMALLN"] = "0"
    fn()


VARIANTS = {
    "chain_xla_local": lambda: chain("xla_proj"),
    "chain_fused_local_bb2": lambda: _small_bb(2, 2, lambda: chain("fused")),
    "chain_fused_local_bb4": lambda: _small_bb(4, 4, lambda: chain("fused")),
    "chain_fused_local_bb8": lambda: _small_bb(8, 8, lambda: chain("fused")),
    "chain_fused_local_bb16": lambda: _small_bb(16, 16, lambda: chain("fused")),
    # round-3 control (151.4): the r3 gate sent ALL small sequences to XLA;
    # reproducing it now requires disabling the r4 small-N fold admission
    "step_gate": lambda: _no_fold(lambda: step(8, None)),
    "step_all_bb4": lambda: _small_bb(4, 4, lambda: step(8, 0)),
    "step_all_bb8": lambda: _small_bb(8, 8, lambda: step(8, 0)),
    "step_all_bb16": lambda: _small_bb(16, 8, lambda: step(8, 0)),
    "step16_gate": lambda: step(16, None),
    "step16_all_bb8": lambda: _small_bb(8, 8, lambda: step(16, 0)),
    # the SHIPPED configuration: no env at all — small-N admission
    # (attention.small_n_fused_ok) must route locals to the kernel by itself
    "step_default": lambda: step(8, None),
    "step16_default": lambda: step(16, None),
}


def main():
    if len(sys.argv) > 1 and sys.argv[1] != "all":
        VARIANTS[sys.argv[1]]()
        return
    me = os.path.abspath(__file__)
    for name in VARIANTS:
        print(f"=== {name} ===", flush=True)
        r = subprocess.run([sys.executable, me, name], timeout=1800)
        if r.returncode:
            emit({"study": "error", "kind": name, "rc": r.returncode})


if __name__ == "__main__":
    main()
