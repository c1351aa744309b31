"""PyTorch checkpoint import: DINO/DINOv2 `.pth` state_dicts -> param pytree.

Reference behaviour: the vit builders download dinov2 checkpoints and
`load_state_dict` them (`src/utils/transformers/transformers_utils.py:10-57`);
APLA checkpoints store split proj weights that `load_from_pretrained`
special-cases (`src/utils/pretrained_loader.py:27-30`).

Conventions converted here (torch -> jax):
- Linear weight [out, in]      -> kernel [in, out]  (transpose)
- Conv2d weight [O, I, kh, kw] -> kernel [kh, kw, I, O] (HWIO)
- per-block tensors            -> stacked on a leading [depth] axis
This container has zero egress, so weights must already be on disk
(`model_params.pretrained_checkpoint` path); otherwise training starts from
the random init with a warning.
"""

from __future__ import annotations

import os
import warnings

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") \
        else np.asarray(t)


def convert_torch_vit_state_dict(sd: dict, depth: int, use_swiglu=False,
                                 has_layerscale=False) -> dict:
    """Convert a DINO/DINOv2-style VisionTransformer state_dict to our pytree
    (unstacked -> stacked blocks)."""
    sd = {k.removeprefix("module.").removeprefix("backbone."): v
          for k, v in sd.items()}
    # dinov2 chunked-block layout ('blocks.<chunk>.<i>....', reference
    # dinov2_vits.py BlockChunk) -> flat 'blocks.<i>....'
    if any(k.startswith("blocks.0.0.") for k in sd):
        import re
        sd = {re.sub(r"^blocks\.\d+\.(\d+\.)", r"blocks.\1", k): v
              for k, v in sd.items()}
    params = {
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "patch_embed": {
            "kernel": _np(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "norm": {"scale": _np(sd["norm.weight"]), "bias": _np(sd["norm.bias"])},
    }
    if "register_tokens" in sd:
        params["register_tokens"] = _np(sd["register_tokens"])
    if "mask_token" in sd:
        params["mask_token"] = _np(sd["mask_token"]).reshape(1, 1, -1)

    blocks = []
    for i in range(depth):
        p = f"blocks.{i}."

        def g(name):
            return _np(sd[p + name])

        if p + "attn.qkv.weight" in sd:
            qkv_w = g("attn.qkv.weight").T
            qkv_b = g("attn.qkv.bias") if p + "attn.qkv.bias" in sd else None
        else:
            # separate q/k/v weights (reference AttentionSepQKV,
            # vit.py:200-231) — packed into the fused qkv layout at import
            qkv_w = np.concatenate(
                [g("attn.q.weight").T, g("attn.k.weight").T,
                 g("attn.v.weight").T], axis=1)
            qkv_b = (np.concatenate([g("attn.q.bias"), g("attn.k.bias"),
                                     g("attn.v.bias")])
                     if p + "attn.q.bias" in sd else None)
        b = {
            "norm1": {"scale": g("norm1.weight"), "bias": g("norm1.bias")},
            "norm2": {"scale": g("norm2.weight"), "bias": g("norm2.bias")},
            "attn": {
                "qkv": {"kernel": qkv_w},
                "proj": {"kernel": g("attn.proj.weight").T,
                         "bias": g("attn.proj.bias")},
            },
        }
        if qkv_b is not None:
            b["attn"]["qkv"]["bias"] = qkv_b
        if use_swiglu:
            b["mlp"] = {
                "w12": {"kernel": g("mlp.w12.weight").T,
                        "bias": g("mlp.w12.bias")},
                "w3": {"kernel": g("mlp.w3.weight").T,
                       "bias": g("mlp.w3.bias")},
            }
        else:
            b["mlp"] = {
                "fc1": {"kernel": g("mlp.fc1.weight").T,
                        "bias": g("mlp.fc1.bias")},
                "fc2": {"kernel": g("mlp.fc2.weight").T,
                        "bias": g("mlp.fc2.bias")},
            }
        if has_layerscale:
            if p + "ls1.gamma" in sd:
                b["ls1"] = {"gamma": g("ls1.gamma")}
                b["ls2"] = {"gamma": g("ls2.gamma")}
            elif p + "gamma_1" in sd:  # older dinov2 naming
                b["ls1"] = {"gamma": g("gamma_1")}
                b["ls2"] = {"gamma": g("gamma_2")}
        blocks.append(b)

    import jax
    import jax.numpy as jnp
    params["blocks"] = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *blocks)
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32), params)
    return params


def export_torch_vit_state_dict(params: dict, use_swiglu=False) -> dict:
    """Inverse of `convert_torch_vit_state_dict`: our (stacked-blocks) pytree
    -> a DINO/DINOv2-style torch state_dict (numpy values; wrap in
    torch.from_numpy for torch.save).  APLA-split params must be merged
    first (`apla.core.merge_apla_params`)."""
    sd = {}
    sd["cls_token"] = _np(params["cls_token"])
    sd["pos_embed"] = _np(params["pos_embed"])
    if "register_tokens" in params:
        sd["register_tokens"] = _np(params["register_tokens"])
    if "mask_token" in params:
        sd["mask_token"] = _np(params["mask_token"]).reshape(1, -1)
    sd["patch_embed.proj.weight"] = \
        _np(params["patch_embed"]["kernel"]).transpose(3, 2, 0, 1)
    sd["patch_embed.proj.bias"] = _np(params["patch_embed"]["bias"])
    sd["norm.weight"] = _np(params["norm"]["scale"])
    sd["norm.bias"] = _np(params["norm"]["bias"])

    blocks = params["blocks"]
    depth = _np(blocks["norm1"]["scale"]).shape[0]
    for i in range(depth):
        p = f"blocks.{i}."

        def put(name, arr):
            sd[p + name] = np.asarray(arr)

        put("norm1.weight", _np(blocks["norm1"]["scale"])[i])
        put("norm1.bias", _np(blocks["norm1"]["bias"])[i])
        put("norm2.weight", _np(blocks["norm2"]["scale"])[i])
        put("norm2.bias", _np(blocks["norm2"]["bias"])[i])
        put("attn.qkv.weight", _np(blocks["attn"]["qkv"]["kernel"])[i].T)
        if "bias" in blocks["attn"]["qkv"]:
            put("attn.qkv.bias", _np(blocks["attn"]["qkv"]["bias"])[i])
        put("attn.proj.weight", _np(blocks["attn"]["proj"]["kernel"])[i].T)
        put("attn.proj.bias", _np(blocks["attn"]["proj"]["bias"])[i])
        if use_swiglu:
            put("mlp.w12.weight", _np(blocks["mlp"]["w12"]["kernel"])[i].T)
            put("mlp.w12.bias", _np(blocks["mlp"]["w12"]["bias"])[i])
            put("mlp.w3.weight", _np(blocks["mlp"]["w3"]["kernel"])[i].T)
            put("mlp.w3.bias", _np(blocks["mlp"]["w3"]["bias"])[i])
        else:
            put("mlp.fc1.weight", _np(blocks["mlp"]["fc1"]["kernel"])[i].T)
            put("mlp.fc1.bias", _np(blocks["mlp"]["fc1"]["bias"])[i])
            put("mlp.fc2.weight", _np(blocks["mlp"]["fc2"]["kernel"])[i].T)
            put("mlp.fc2.bias", _np(blocks["mlp"]["fc2"]["bias"])[i])
        if "ls1" in blocks:
            put("ls1.gamma", _np(blocks["ls1"]["gamma"])[i])
            put("ls2.gamma", _np(blocks["ls2"]["gamma"])[i])
    return sd


def load_torch_checkpoint(path: str) -> dict:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("teacher", "student", "model", "state_dict"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
            break
    return ckpt


def maybe_load_pretrained_backbone(trainable, frozen, model_params, vit_cfg):
    """If a local checkpoint path is configured, import it into the backbone
    params (re-splitting APLA leaves afterwards)."""
    path = model_params.get("pretrained_checkpoint", "")
    if not path or not os.path.exists(path):
        warnings.warn(
            "model_params.pretrained=true but no local checkpoint found "
            f"(pretrained_checkpoint={path!r}); zero-egress environment "
            "cannot download dinov2 weights — continuing from random init.")
        return trainable, frozen
    import jax.numpy as jnp

    sd = load_torch_checkpoint(path)
    if any(k.startswith("embeddings.patch_embeddings") for k in sd):
        # HF Dinov2Model naming (hub mirror of the dinov2 checkpoints)
        params = convert_vit_hf_dinov2_state_dict(sd, vit_cfg.depth)
    else:
        params = convert_torch_vit_state_dict(
            sd, vit_cfg.depth, use_swiglu=vit_cfg.use_swiglu,
            has_layerscale=vit_cfg.has_layerscale)

    # rebuild the split with the imported weights, keeping existing inds
    if "backbone" in frozen and "inds" in frozen["backbone"]["blocks"]["attn"]:
        inds = np.asarray(frozen["backbone"]["blocks"]["attn"]["inds"])
        kernel = params["blocks"]["attn"]["proj"]["kernel"]
        bias = params["blocks"]["attn"]["proj"]["bias"]
        proj_wt = jnp.take_along_axis(
            kernel, jnp.asarray(inds)[:, None, :], axis=2)
        proj_bt = jnp.take_along_axis(bias, jnp.asarray(inds), axis=1)
        trainable = dict(trainable)
        trainable["backbone"] = {"blocks": {"proj_wt": proj_wt,
                                            "proj_bt": proj_bt}}
        frozen = dict(frozen)
        new_frozen_bb = dict(params)
        new_frozen_bb["blocks"] = dict(params["blocks"])
        new_frozen_bb["blocks"]["attn"] = dict(params["blocks"]["attn"])
        new_frozen_bb["blocks"]["attn"]["inds"] = jnp.asarray(inds)
        frozen["backbone"] = new_frozen_bb
    elif "backbone" in frozen:
        t_bb = trainable.get("backbone", {})
        if "blocks" in t_bb and "attn" in t_bb.get("blocks", {}) \
                and "proj" in t_bb["blocks"]["attn"]:
            # APLA 'full' mode: proj lives in the trainable tree
            proj = params["blocks"]["attn"].pop("proj")
            trainable = dict(trainable)
            trainable["backbone"] = {"blocks": {"attn": {"proj": proj}}}
        frozen = dict(frozen)
        frozen["backbone"] = params
    else:  # full fine-tune
        trainable = dict(trainable)
        trainable["backbone"] = params
    return trainable, frozen


def convert_swin_hf_state_dict(sd: dict, depths) -> dict:
    """HF `SwinModel` state_dict -> this framework's Swin param pytree
    (models/swin.py init_swin_params layout).  Covers the detection
    side-car: the reference tells users to bring a pretrained Swin into
    mmdet (`segmentation_and_detection/detection/apla_swin_transformer.py`);
    here the standard Hugging Face checkpoints import directly.

    Key mapping (HF -> ours):
      embeddings.patch_embeddings.projection  -> patch_embed (OIHW->HWIO)
      embeddings.norm                         -> patch_norm
      encoder.layers.s.blocks.i.attention.self.{query,key,value}
                                              -> stages[s].blocks[i].attn.qkv
                                                 (packed [d, 3d])
      ...attention.self.relative_position_bias_table -> attn.rel_bias
      ...attention.output.dense               -> attn.proj
      ...layernorm_before/after               -> norm1/norm2
      ...intermediate.dense / output.dense    -> mlp.fc1 / fc2
      encoder.layers.s.downsample.{reduction,norm} -> stages[s].downsample
      layernorm (final)                       -> norms[-1] (pyramid norm of
                                                 the last stage)
    Per-stage pyramid norms for earlier stages have no HF counterpart
    (mmdet adds them when fine-tuning); they stay at their init values.
    """
    import numpy as np

    def lin(prefix):
        w = _np(sd[prefix + ".weight"]).T          # [in, out]
        p = {"kernel": w}
        if prefix + ".bias" in sd:
            p["bias"] = _np(sd[prefix + ".bias"])
        return p

    def ln(prefix):
        return {"scale": _np(sd[prefix + ".weight"]),
                "bias": _np(sd[prefix + ".bias"])}

    params = {
        "patch_embed": {
            "kernel": _np(
                sd["embeddings.patch_embeddings.projection.weight"]
            ).transpose(2, 3, 1, 0),                # OIHW -> HWIO
            "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "patch_norm": ln("embeddings.norm"),
        "stages": [],
        "norms": [],
    }
    for s, depth in enumerate(depths):
        base = f"encoder.layers.{s}"
        blocks = []
        for i in range(depth):
            b = f"{base}.blocks.{i}"
            q = lin(f"{b}.attention.self.query")
            k = lin(f"{b}.attention.self.key")
            v = lin(f"{b}.attention.self.value")
            qkv = {
                "kernel": np.concatenate(
                    [q["kernel"], k["kernel"], v["kernel"]], axis=1),
                "bias": np.concatenate([q["bias"], k["bias"], v["bias"]]),
            }
            blocks.append({
                "norm1": ln(f"{b}.layernorm_before"),
                "attn": {
                    "qkv": qkv,
                    "proj": lin(f"{b}.attention.output.dense"),
                    "rel_bias": _np(sd[
                        f"{b}.attention.self.relative_position_bias_table"]),
                },
                "norm2": ln(f"{b}.layernorm_after"),
                "mlp": {
                    "fc1": lin(f"{b}.intermediate.dense"),
                    "fc2": lin(f"{b}.output.dense"),
                },
            })
        stage = {"blocks": blocks}
        if f"{base}.downsample.reduction.weight" in sd:
            stage["downsample"] = {
                "reduction": lin(f"{base}.downsample.reduction"),
                "norm": ln(f"{base}.downsample.norm"),
            }
        params["stages"].append(stage)
        dim = params["patch_embed"]["bias"].shape[0] * (2 ** s)
        params["norms"].append({"scale": np.ones((dim,), np.float32),
                                "bias": np.zeros((dim,), np.float32)})
    if "layernorm.weight" in sd:
        params["norms"][-1] = ln("layernorm")
    return params


def swin_arch_from_hf_state_dict(sd: dict) -> dict:
    """Infer (embed_dim, depths, num_heads, window_size) from an HF
    SwinModel state_dict so `--swin_ckpt` users need not restate the
    architecture."""
    import math
    embed_dim = int(
        _np(sd["embeddings.patch_embeddings.projection.bias"]).shape[0])
    depths, num_heads = [], []
    s = 0
    while f"encoder.layers.{s}.blocks.0.layernorm_before.weight" in sd:
        i = 0
        while (f"encoder.layers.{s}.blocks.{i}.layernorm_before.weight"
               in sd):
            i += 1
        depths.append(i)
        table = _np(sd[f"encoder.layers.{s}.blocks.0."
                       f"attention.self.relative_position_bias_table"])
        num_heads.append(int(table.shape[1]))
        window = (int(math.isqrt(table.shape[0])) + 1) // 2
        s += 1
    patch = int(_np(
        sd["embeddings.patch_embeddings.projection.weight"]).shape[-1])
    return {"embed_dim": embed_dim, "depths": tuple(depths),
            "num_heads": tuple(num_heads), "window_size": window,
            "patch_size": patch}


def convert_vit_hf_dinov2_state_dict(sd: dict, depth: int) -> dict:
    """HF `Dinov2Model` state_dict -> this framework's ViT param pytree
    (the HF-hub mirror of the dinov2 checkpoints the reference downloads
    via torch.hub, transformers_utils.py:10-57).  Blocks are stacked on
    the leading depth axis for the scan trunk."""
    import numpy as np

    def lin(prefix):
        p = {"kernel": _np(sd[prefix + ".weight"]).T}
        if prefix + ".bias" in sd:
            p["bias"] = _np(sd[prefix + ".bias"])
        return p

    def ln(prefix):
        return {"scale": _np(sd[prefix + ".weight"]),
                "bias": _np(sd[prefix + ".bias"])}

    params = {
        "patch_embed": {
            "kernel": _np(sd["embeddings.patch_embeddings.projection"
                             ".weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "cls_token": _np(sd["embeddings.cls_token"]),
        "pos_embed": _np(sd["embeddings.position_embeddings"]),
        "norm": ln("layernorm"),
    }
    if "embeddings.mask_token" in sd:
        mt = _np(sd["embeddings.mask_token"])
        params["mask_token"] = mt.reshape(1, 1, -1)
    if "embeddings.register_tokens" in sd:
        params["register_tokens"] = _np(sd["embeddings.register_tokens"])

    blocks = []
    for i in range(depth):
        b = f"encoder.layer.{i}"
        q = lin(f"{b}.attention.attention.query")
        k = lin(f"{b}.attention.attention.key")
        v = lin(f"{b}.attention.attention.value")
        blk = {
            "norm1": ln(f"{b}.norm1"),
            "attn": {
                "qkv": {
                    "kernel": np.concatenate(
                        [q["kernel"], k["kernel"], v["kernel"]], axis=1),
                    "bias": np.concatenate(
                        [q["bias"], k["bias"], v["bias"]]),
                },
                "proj": lin(f"{b}.attention.output.dense"),
            },
            "norm2": ln(f"{b}.norm2"),
        }
        if f"{b}.mlp.fc1.weight" in sd:
            blk["mlp"] = {"fc1": lin(f"{b}.mlp.fc1"),
                          "fc2": lin(f"{b}.mlp.fc2")}
        else:  # SwiGLU variant (dinov2-giant)
            blk["mlp"] = {"w12": lin(f"{b}.mlp.weights_in"),
                          "w3": lin(f"{b}.mlp.weights_out")}
        if f"{b}.layer_scale1.lambda1" in sd:
            blk["ls1"] = {"gamma": _np(sd[f"{b}.layer_scale1.lambda1"])}
            blk["ls2"] = {"gamma": _np(sd[f"{b}.layer_scale2.lambda1"])}
        blocks.append(blk)
    import jax

    params["blocks"] = jax.tree.map(
        lambda *xs: np.stack(xs), *blocks)
    return params


def export_swin_hf_state_dict(params: dict) -> dict:
    """Our Swin param pytree -> HF `SwinModel` state_dict naming (numpy
    values; inverse of `convert_swin_hf_state_dict`, round-trip tested).
    Lets a model fine-tuned here be loaded back into the torch ecosystem
    (`SwinModel.load_state_dict` after torch.from_numpy)."""
    import numpy as np

    sd = {}

    def put_lin(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            sd[prefix + ".bias"] = np.asarray(p["bias"])

    def put_ln(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["scale"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])

    sd["embeddings.patch_embeddings.projection.weight"] = \
        np.asarray(params["patch_embed"]["kernel"]).transpose(3, 2, 0, 1)
    sd["embeddings.patch_embeddings.projection.bias"] = \
        np.asarray(params["patch_embed"]["bias"])
    if "patch_norm" in params:
        put_ln("embeddings.norm", params["patch_norm"])

    for s, stage in enumerate(params["stages"]):
        base = f"encoder.layers.{s}"
        for i, blk in enumerate(stage["blocks"]):
            b = f"{base}.blocks.{i}"
            qkv_k = np.asarray(blk["attn"]["qkv"]["kernel"])
            qkv_b = np.asarray(blk["attn"]["qkv"]["bias"])
            d = qkv_k.shape[0]
            for j, name in enumerate(("query", "key", "value")):
                put_lin(f"{b}.attention.self.{name}",
                        {"kernel": qkv_k[:, j * d:(j + 1) * d],
                         "bias": qkv_b[j * d:(j + 1) * d]})
            sd[f"{b}.attention.self.relative_position_bias_table"] = \
                np.asarray(blk["attn"]["rel_bias"])
            put_lin(f"{b}.attention.output.dense", blk["attn"]["proj"])
            put_ln(f"{b}.layernorm_before", blk["norm1"])
            put_ln(f"{b}.layernorm_after", blk["norm2"])
            put_lin(f"{b}.intermediate.dense", blk["mlp"]["fc1"])
            put_lin(f"{b}.output.dense", blk["mlp"]["fc2"])
        if "downsample" in stage:
            put_lin(f"{base}.downsample.reduction",
                    stage["downsample"]["reduction"])
            put_ln(f"{base}.downsample.norm", stage["downsample"]["norm"])
    put_ln("layernorm", params["norms"][-1])
    return sd
