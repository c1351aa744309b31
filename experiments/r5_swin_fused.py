#!/usr/bin/env python
"""Round-5: Swin window attention through the fused small-N kernel
(VERDICT r4 item 3) — det train-step throughput fused vs XLA, plus the
isolated backbone fwd+bwd chain to expose the attention share.

Swin-T @224: windows are 49-token sequences folded batch x windows deep
(stage 1 at b16: 1024-deep fold), precisely the regime the small-N fold
was validated for in round 4.  The kernel adds the frozen rel-pos bias +
shift mask pre-softmax and applies the fully-trainable APLA proj in-kernel
(ops/pallas_apla_attn.fused_swin_attention).

Baseline to beat: det_b16 614.7 img/s (r3_segdet_bench.jsonl).
One subprocess per variant (round-2 methodology).

  python experiments/r5_swin_fused.py            # all
  python experiments/r5_swin_fused.py det_b16_fused
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r5_swin_fused.jsonl")
STEPS = 15

VARIANTS = ("det_b8_xla", "det_b8_fused", "det_b16_xla", "det_b16_fused",
            "bb_b16_xla", "bb_b16_fused")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _swin_diag(cfg, batch):
    """Per-stage fold diagnostics at this config/batch."""
    from apla_tpu.ops.pallas_apla_attn import (swin_effective_bb,
                                               swin_fused_ok, _pad_to)
    n = cfg.window_size ** 2
    np_ = _pad_to(n, 16)
    rows = []
    grid = cfg.img_size // cfg.patch_size
    for s in range(len(cfg.depths)):
        hw = grid // (2 ** s)
        win = min(cfg.window_size, hw)
        nwb = batch * (hw // win) ** 2
        c = cfg.embed_dim * 2 ** s
        h = cfg.num_heads[s]
        kp = _pad_to(c, 128)
        rows.append({"stage": s, "nwb": nwb,
                     "ok": bool(swin_fused_ok(nwb, win * win, c, h)),
                     "bb": [swin_effective_bb(nwb, np_, c, h),
                            swin_effective_bb(nwb, np_, c, h, kp)]})
    return rows


def bench(name):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from apla_tpu.models.swin import (SwinConfig, build_apla_swin,
                                      init_swin_params, swin_features)

    kind, b, path = name.split("_")
    batch = int(b[1:])
    fused = path == "fused"
    rng = np.random.default_rng(0)
    cfg = SwinConfig(img_size=224, use_fused_apla=fused)  # Swin-T defaults
    key = jax.random.PRNGKey(0)
    sp = init_swin_params(key, cfg)
    bb_t, bb_f = build_apla_swin(sp)
    diag = _swin_diag(cfg, batch)

    if kind == "bb":
        # isolated backbone fwd+bwd chain: grad wrt the APLA projs of a
        # scalar of all pyramid levels, STEPS iterations inside ONE jit
        images = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)),
                             jnp.bfloat16)

        # frozen tree passed as an ARG (never close over device arrays in
        # jitted experiment fns — axon constant-fetch FAILED_PRECONDITION)
        @jax.jit
        def chain(t, f, images):
            def body(carry, i):
                def loss(t):
                    feats = swin_features(f, images + 1e-6 * i, cfg,
                                          trainable=t)
                    return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                               for x in feats)
                l, g = jax.value_and_grad(loss)(t)
                return carry + l + sum(jnp.sum(x) for x in
                                       jax.tree.leaves(g)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(8, dtype=jnp.float32))
            return acc

        t0 = time.time()
        _ = float(chain(bb_t, bb_f, images))
        compile_s = round(time.time() - t0, 1)
        _ = float(chain(bb_t, bb_f, images))
        t0 = time.perf_counter()
        reps = 3
        for _i in range(reps):
            acc = chain(bb_t, bb_f, images)
        acc = float(acc)
        dt = (time.perf_counter() - t0) / (reps * 8)
        emit({"study": "r5_swin", "variant": name, "batch": batch,
              "compile_s": compile_s, "ms": round(dt * 1e3, 2),
              "img_s": round(batch / dt, 1), "diag": diag})
        return

    from apla_tpu.models.detection import (_conv_init, init_fcos_head,
                                           make_detection_train_step)
    n_levels = len(cfg.depths)
    dims = [cfg.embed_dim * 2 ** i for i in range(n_levels)]
    keys = jax.random.split(key, n_levels + 1)
    trainable = {
        "backbone": bb_t,
        "head": init_fcos_head(keys[0], cfg.embed_dim, 80, channels=128,
                               n_levels=n_levels),
        "laterals": [_conv_init(keys[1 + i], 1, dims[i], cfg.embed_dim)
                     for i in range(n_levels)],
    }
    tx = optax.adamw(1e-4)
    opt_state = tx.init(trainable)
    strides = tuple(4 * 2 ** i for i in range(n_levels))
    step = make_detection_train_step(cfg, tx, strides=strides)
    boxes = np.zeros((batch, 16, 4), np.float32)
    boxes[:, :4] = rng.uniform(0, 100, (batch, 4, 4)).astype(np.float32)
    boxes[:, :4, 2:] += 60
    labels = np.full((batch, 16), -1, np.int32)
    labels[:, :4] = rng.integers(0, 80, (batch, 4))
    bt = {
        "image": jnp.asarray(
            rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16),
        "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(labels),
    }
    t0 = time.time()
    trainable, opt_state, m = step(trainable, opt_state, bb_f, bt)
    _ = float(m["total"])
    compile_s = round(time.time() - t0, 1)
    for _i in range(2):
        trainable, opt_state, m = step(trainable, opt_state, bb_f, bt)
    _ = float(m["total"])
    t0 = time.perf_counter()
    for _i in range(STEPS):
        trainable, opt_state, m = step(trainable, opt_state, bb_f, bt)
    _ = float(m["total"])
    dt = (time.perf_counter() - t0) / STEPS
    emit({"study": "r5_swin", "variant": name, "batch": batch,
          "compile_s": compile_s, "ms": round(dt * 1e3, 1),
          "img_s": round(batch / dt, 1), "loss": round(float(m["total"]), 4),
          "diag": diag})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            bench(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "r5_swin", "variant": sys.argv[1],
                  "error": repr(e)[:400]})
    else:
        from apla_tpu.utils.tpu_client_lock import tpu_client
        emit({"study": "r5_swin", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        with tpu_client("r5_swin_fused"):
            for name in VARIANTS:
                subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "r5_swin", "done": True})
