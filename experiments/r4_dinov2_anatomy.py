#!/usr/bin/env python
"""Round-4 study: DINOv2 step anatomy at the NEW fused baseline (165.4
img/s b8, small-N fold shipped) — where does the remaining 48.4 ms go,
and what would a fused prototype-CE kernel (linear + online-softmax CE,
Liger-style) be worth?

One subprocess per variant (round-2 methodology).  Config-knob ablations
reuse the r3 set; the *_stub variants monkeypatch the loss functions
BEFORE the step is built (safe in a fresh subprocess — the jaxpr-cache
trap only bites in-process variant switching):

- ce_stub      : dino + iBOT CE replaced by mean(logits) sums; teacher
                 softmax+centering replaced by a linear scale.  Keeps the
                 head matmuls AND the [R, 65536] logits materialisation —
                 bounds the saving of the softmax/CE chains alone.
- no_last_layer: head returns the 256-d bottleneck, losses consume it
                 directly (CE over 256 dims).  Bounds matmul+logits+CE —
                 i.e. the entire 65536-prototype tail beyond the MLP.

A fused linear-CE kernel's win lives between ce_stub (chains only) and
no_last_layer (tail minus one streamed weight read).

  python experiments/r4_dinov2_anatomy.py        # all
  python experiments/r4_dinov2_anatomy.py base   # one
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r4_dinov2_anatomy.jsonl")
STEPS = 15
BATCH = 8

VARIANTS = ("base", "no_koleo", "no_ibot", "no_ibot_smalln0", "no_local",
            "head4096", "ce_stub", "no_last_layer", "head_bf16_real",
            "proto_ce", "proto_ce_ibot")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _no_local_strategy_file():
    g = {"RandomResizedCrop": {"apply": True, "size": 224,
                               "scale": [0.32, 1.0]},
         "HorizontalFlip": {"apply": True, "p": 0.5}}
    strategy = {
        "general_args": {"overwrite_defaults": True,
                         "inherit": ["Resize", "Normalize"]},
        "repetition_strategy": {"n_augmentations": [1, 1],
                                "order": ["global_1", "global_2"]},
        "transforms": {"train_transforms": {"global_1": g, "global_2": g}},
    }
    path = os.path.join(tempfile.mkdtemp(prefix="anat_"), "strategy.json")
    with open(path, "w") as f:
        json.dump(strategy, f)
    return path


def _apply_stubs(name):
    import jax
    import jax.numpy as jnp

    from apla_tpu.ssl import dinov2 as d2

    if name == "ce_stub":
        # same input tensors, no softmax/log-softmax/CE chains
        d2.softmax_center_teacher = (
            lambda t_out, center, teacher_temp:
            (t_out.astype(jnp.float32) - center) / teacher_temp)

        def dino_stub(student_out_list, teacher_softmaxed_list,
                      student_temp=0.1):
            total = 0.0
            for s in student_out_list:
                for t in teacher_softmaxed_list:
                    total = total + jnp.mean(s.astype(jnp.float32)) \
                        + jnp.mean(jax.lax.stop_gradient(t))
            return total

        def ibot_stub(student_masked, teacher_softmaxed_masked, masks_weight,
                      n_images, student_temp=0.1):
            per_patch = jnp.mean(
                student_masked.astype(jnp.float32), axis=-1) \
                + jnp.mean(jax.lax.stop_gradient(teacher_softmaxed_masked),
                           axis=-1)
            return -jnp.sum(per_patch * masks_weight) / n_images

        d2.dinov2_dino_loss = dino_stub
        d2.ibot_patch_loss = ibot_stub
    elif name == "no_last_layer":
        from apla_tpu.ssl import heads

        def head_no_last(x, params, norm_last_layer=True, matmul_bf16=False):
            n = len(params["mlp"])
            for i, p in enumerate(params["mlp"]):
                x = jnp.dot(x, p["kernel"].astype(x.dtype),
                            preferred_element_type=x.dtype) \
                    + p["bias"].astype(x.dtype)
                if i < n - 1:
                    x = jax.nn.gelu(x, approximate=False)
            x = x.astype(jnp.float32)
            return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

        heads.dino_head_forward = head_no_last
        d2.dino_head_forward = head_no_last


def bench(name):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    _apply_stubs(name)

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
    params.dataset_params.synthetic_size = 4 * BATCH
    params.dataset_params.synthetic_img_size = 256
    for head in ("dino", "ibot"):
        params.model_params.dinov2[head].head_n_prototypes = 65536
        params.model_params.dinov2[head].head_bottleneck_dim = 256
        params.model_params.dinov2[head].head_hidden_dim = 2048
    params.training_params.is_dry = True
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = BATCH

    if name == "no_koleo":
        params.model_params.dinov2.dino.koleo_loss_weight = 0.0
    elif name == "no_ibot":
        params.model_params.dinov2.ibot.loss_weight = 0.0
    elif name == "no_ibot_smalln0":
        # control for the r4 103.7 ms no_ibot anomaly: same ablation with
        # the small-N fused fold disabled (locals forced onto XLA) — if the
        # anomaly is an admission interaction, this row is FASTER than
        # no_ibot; if it reproduces here too, it's not the fold
        params.model_params.dinov2.ibot.loss_weight = 0.0
        os.environ["APLA_FUSED_SMALLN"] = "0"
    elif name == "no_local":
        params.dataset_params.augmentation_strategy_path = \
            _no_local_strategy_file()
    elif name == "head4096":
        for head in ("dino", "ibot"):
            params.model_params.dinov2[head].head_n_prototypes = 4096
    elif name == "no_last_layer":
        # head output = 256-d bottleneck -> centers must match that width
        for head in ("dino", "ibot"):
            params.model_params.dinov2[head].head_n_prototypes = 256
    elif name == "head_bf16_real":
        # the REAL knob (r3's "head_bf16 neutral" measured a phantom key
        # nothing consumed): bf16 last-layer matmul, f32 accumulation
        params.model_params.dinov2.head_matmul_bf16 = True
    elif name == "proto_ce":
        # the fused prototype-CE kernel (linear + online-softmax CE, no
        # [rows, 65536] logits in HBM) for dino-global/local AND iBOT
        params.model_params.dinov2.fused_proto_ce = True
    elif name == "proto_ce_ibot":
        # selective mode: fuse ONLY the iBOT site (the r5 hardware winner,
        # +42% at R=2048); dino global/local keep the dense math
        params.model_params.dinov2.fused_proto_ce = "ibot"

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
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    # admission diagnostics: what the fused policy actually selects at the
    # two geometries this step dispatches (272-pad globals, 64-pad locals)
    from apla_tpu.ops.pallas_apla_attn import (effective_bb_bwd,
                                               effective_bb_fwd,
                                               small_n_fused_ok)
    bl = BATCH * 8  # local crops fold batch x n_crops
    emit({"study": "r4_anatomy", "variant": name, "batch": BATCH,
          "ms_per_step": round(dt * 1e3, 1),
          "img_s": round(BATCH / dt, 1),
          "local_admitted": bool(small_n_fused_ok(bl, 50, 768)),
          "bb_local": [effective_bb_fwd(bl, 64, 768),
                       effective_bb_bwd(bl, 64, 768, 128)],
          "bb_global": [effective_bb_fwd(2 * BATCH, 272, 768),
                        effective_bb_bwd(2 * BATCH, 272, 768, 128)]})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            bench(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "r4_anatomy", "variant": sys.argv[1],
                  "error": repr(e)[:300]})
    else:
        emit({"study": "r4_anatomy", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in VARIANTS:
            subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "r4_anatomy", "done": True})
