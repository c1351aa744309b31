#!/usr/bin/env python
"""Round-5: hardware validation of the fused prototype-CE kernel
(ops/pallas_proto_ce.py) — the one round-4 component with zero real-TPU
evidence (VERDICT r4 item 1).

Two parts, ONE process (single axon client):
  numerics: Mosaic-compiled fwd + bwd vs the dense jnp oracle ON THE CHIP
            at padding-exercising and recipe geometries.
  timing:   fused vs dense value+grad chained inside one jit (lax.scan,
            round-2 methodology — per-dispatch tunnel floor ~1 ms) at the
            three DINOv2 b8 call-site row counts:
              dino-global R=16, dino-local pair-expanded R=128,
              iBOT masked buffer R=2048 (16 global crops x 128 max masked)
            with D=256 bottleneck, K=65536 prototypes (ViT-B recipe).

Output: experiments/r5_proto_ce_tpu.jsonl
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r5_proto_ce_tpu.jsonl")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from apla_tpu.ops.pallas_proto_ce import proto_ce

    dev = jax.devices()[0]
    emit({"study": "r5_proto_ce", "device": str(dev)})

    def dense_ce(xs, ws, xt, wt, center, tt, ts):
        # the separate-ops math the step uses today (bf16 matmul inputs to
        # match the kernel's MXU dtype; f32 logits/softmax chains)
        s = jnp.dot(xs.astype(jnp.bfloat16), ws.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        t = jnp.dot(xt.astype(jnp.bfloat16), wt.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        p_t = jax.nn.softmax((t - center.reshape(1, -1)) / tt, axis=-1)
        lsm = jax.nn.log_softmax(s / ts, axis=-1)
        return -jnp.sum(jax.lax.stop_gradient(p_t) * lsm, axis=-1)

    def make_inputs(key, R, D, K):
        ks = jax.random.split(key, 5)
        xs = jax.random.normal(ks[0], (R, D), jnp.float32)
        xs = xs / jnp.linalg.norm(xs, axis=-1, keepdims=True)
        xt = jax.random.normal(ks[1], (R, D), jnp.float32)
        xt = xt / jnp.linalg.norm(xt, axis=-1, keepdims=True)
        ws = jax.random.normal(ks[2], (D, K), jnp.float32)
        ws = ws / jnp.linalg.norm(ws, axis=0, keepdims=True)
        wt = jax.random.normal(ks[3], (D, K), jnp.float32)
        wt = wt / jnp.linalg.norm(wt, axis=0, keepdims=True)
        center = 0.1 * jax.random.normal(ks[4], (K,), jnp.float32)
        return xs, ws, xt, wt, center

    # ---------------- numerics on the chip ----------------
    for R, D, K in ((10, 256, 300), (48, 256, 4096), (128, 256, 65536)):
        xs, ws, xt, wt, center = make_inputs(jax.random.PRNGKey(0), R, D, K)
        tt = jnp.float32(0.04)
        w_rows = jax.random.uniform(jax.random.PRNGKey(3), (R,))

        @jax.jit
        def fused_vg(xs, ws, xt, wt, center, w_rows, tt):
            def f(xs, ws):
                return jnp.sum(w_rows * proto_ce(xs, ws, xt, wt, center,
                                                 tt, 0.1))
            return jax.value_and_grad(f, argnums=(0, 1))(xs, ws)

        @jax.jit
        def dense_vg(xs, ws, xt, wt, center, w_rows, tt):
            def f(xs, ws):
                return jnp.sum(w_rows * dense_ce(xs, ws, xt, wt, center,
                                                 tt, 0.1))
            return jax.value_and_grad(f, argnums=(0, 1))(xs, ws)

        try:
            t0 = time.time()
            lf, (gxf, gwf) = fused_vg(xs, ws, xt, wt, center, w_rows, tt)
            lf = float(lf)
            compile_s = round(time.time() - t0, 1)
            ld, (gxd, gwd) = dense_vg(xs, ws, xt, wt, center, w_rows, tt)
            ld = float(ld)
            rel = abs(lf - ld) / max(abs(ld), 1e-6)
            gx_rel = float(jnp.abs(gxf - gxd).max()) / max(
                float(jnp.abs(gxd).max()), 1e-6)
            gw_rel = float(jnp.abs(gwf - gwd).max()) / max(
                float(jnp.abs(gwd).max()), 1e-6)
            emit({"study": "r5_proto_ce", "part": "numerics",
                  "R": R, "D": D, "K": K, "compile_s": compile_s,
                  "loss_fused": round(lf, 4), "loss_dense": round(ld, 4),
                  "loss_rel": round(rel, 5), "dxs_rel": round(gx_rel, 5),
                  "dws_rel": round(gw_rel, 5),
                  "ok": bool(rel < 2e-2 and gx_rel < 5e-2 and gw_rel < 5e-2)})
        except Exception as e:  # noqa: BLE001
            emit({"study": "r5_proto_ce", "part": "numerics",
                  "R": R, "D": D, "K": K, "error": repr(e)[:400]})

    # ---------------- timing: chained value+grad ----------------
    CHAIN = 8
    D, K = 256, 65536
    for R in (16, 128, 2048):
        xs, ws, xt, wt, center = make_inputs(jax.random.PRNGKey(1), R, D, K)
        tt = jnp.float32(0.04)

        def chained(ce_fn, xs, ws, xt, wt, center, tt):
            def f(xs, ws):
                return jnp.sum(ce_fn(xs, ws, xt, wt, center, tt, 0.1))

            def body(carry, i):
                xs_c, acc = carry
                # fold the index in so the scan iterations can't CSE
                xs_i = xs_c + 1e-6 * i
                l, (gx, gw) = jax.value_and_grad(f, argnums=(0, 1))(xs_i, ws)
                return (xs_c, acc + l + jnp.sum(gx[0]) + gw[0, 0]), None

            (_, acc), _ = jax.lax.scan(
                body, (xs, jnp.float32(0.0)),
                jnp.arange(CHAIN, dtype=jnp.float32))
            return acc

        for name, fn in (("fused", proto_ce), ("dense", dense_ce)):
            try:
                run = jax.jit(functools.partial(chained, fn))
                t0 = time.time()
                _ = float(run(xs, ws, xt, wt, center, tt))
                compile_s = round(time.time() - t0, 1)
                _ = float(run(xs, ws, xt, wt, center, tt))
                reps = 5 if R <= 128 else 3
                t0 = time.perf_counter()
                for _ in range(reps):
                    acc = run(xs, ws, xt, wt, center, tt)
                acc = float(acc)
                dt = (time.perf_counter() - t0) / (reps * CHAIN)
                emit({"study": "r5_proto_ce", "part": "timing", "path": name,
                      "R": R, "D": D, "K": K, "chain": CHAIN,
                      "compile_s": compile_s,
                      "ms_per_call": round(dt * 1e3, 3)})
            except Exception as e:  # noqa: BLE001
                emit({"study": "r5_proto_ce", "part": "timing", "path": name,
                      "R": R, "D": D, "K": K, "error": repr(e)[:400]})

    emit({"study": "r5_proto_ce", "done": True})


if __name__ == "__main__":
    from apla_tpu.utils.tpu_client_lock import tpu_client
    with tpu_client("r5_proto_ce_tpu"):
        main()
