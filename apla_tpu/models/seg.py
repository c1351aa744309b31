"""Semantic segmentation with an APLA-adapted ViT backbone.

Reference: `src/segmentation_and_detection/segmentation/apla_vit.py` — the
reference drops an APLA-frozen ViT into mmseg and pairs it with a SETR-PUP
decoder (`apla_setr_vit-l_pup_8xb2-160k_ade20k-512x512.py`).  Here both live
in-repo: the backbone is the standard `vit_features` trunk with the APLA
trainable/frozen split ('full' mode == reference behaviour: only
`attn.out_proj` trainable), and the decoder is a SETR-PUP-style progressive
upsampling head (conv3x3 + 2x resize, repeated) implemented in jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..apla.core import AplaConfig, build_apla
from .vit import ViTConfig, init_vit_params, trunc_normal, vit_features


def init_pup_head(key, embed_dim: int, n_classes: int, channels: int = 256,
                  n_stages: int = 4):
    """SETR-PUP decoder params: n_stages of conv3x3(+up2x), then a 1x1
    classifier."""
    keys = jax.random.split(key, n_stages + 1)
    params = {"convs": []}
    c_in = embed_dim
    for i in range(n_stages):
        params["convs"].append({
            "kernel": trunc_normal(keys[i], (3, 3, c_in, channels), std=0.02),
            "bias": jnp.zeros((channels,)),
        })
        c_in = channels
    params["cls"] = {
        "kernel": trunc_normal(keys[-1], (1, 1, channels, n_classes),
                               std=0.02),
        "bias": jnp.zeros((n_classes,)),
    }
    return params


def pup_head_forward(feat, params, out_hw):
    """feat: [B, h, w, D] patch-feature grid -> logits [B, H, W, n_classes].
    Each stage: conv3x3 + bilinear 2x upsample (SETR-PUP)."""
    x = feat
    for conv in params["convs"]:
        x = jax.lax.conv_general_dilated(
            x, conv["kernel"].astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        x = x + conv["bias"].astype(x.dtype)
        x = jax.nn.relu(x)
        B, h, w, C = x.shape
        x = jax.image.resize(x, (B, h * 2, w * 2, C), method="bilinear")
    x = jax.lax.conv_general_dilated(
        x, params["cls"]["kernel"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    x = x + params["cls"]["bias"].astype(x.dtype)
    if x.shape[1:3] != tuple(out_hw):
        x = jax.image.resize(
            x.astype(jnp.float32),
            (x.shape[0], out_hw[0], out_hw[1], x.shape[-1]),
            method="bilinear")
    return x.astype(jnp.float32)


# Reference SETR attaches 3 auxiliary heads at fractional trunk depths
# (mmseg backbone out_indices (9, 14, 19, 23) for ViT-L/24 = floor(f*D)
# for f in 0.4/0.6/0.8 plus the final layer; apla_setr...py auxiliary_head
# in_index 0/1/2, loss_weight 0.4 each)
AUX_FRACTIONS = (0.4, 0.6, 0.8)


def aux_indices(depth: int, n_aux: int):
    return [min(depth - 1, int(f * depth))
            for f in AUX_FRACTIONS[:n_aux]]


def init_segmenter(key, vit_cfg: ViTConfig, n_classes: int,
                   apla_cfg: AplaConfig | None = None, channels: int = 256,
                   n_aux_heads: int = 0, aux_channels: int = 256):
    """(trainable, frozen) for backbone + PUP head.  `apla_cfg=None` defaults
    to the reference seg recipe: partial_size='full' (only the attention
    out-projections train, apla_vit.py:27-33).  `n_aux_heads` > 0 adds
    SETRUPHead-style auxiliary decoders (num_convs=2) on intermediate
    trunk layers (reference apla_setr...py auxiliary_head list)."""
    k_bb, k_head, k_aux = jax.random.split(key, 3)
    vit_params = init_vit_params(k_bb, vit_cfg)
    if apla_cfg is None:
        apla_cfg = AplaConfig(partial_size="full")
    bb_t, bb_f = build_apla(vit_params, vit_cfg, apla_cfg)
    head = init_pup_head(k_head, vit_cfg.embed_dim, n_classes,
                         channels=channels)
    trainable = {"backbone": bb_t, "head": head}
    if n_aux_heads:
        if n_aux_heads > len(AUX_FRACTIONS):
            raise ValueError(f"at most {len(AUX_FRACTIONS)} aux heads")
        keys = jax.random.split(k_aux, n_aux_heads)
        trainable["aux_heads"] = [
            init_pup_head(keys[i], vit_cfg.embed_dim, n_classes,
                          channels=aux_channels, n_stages=2)
            for i in range(n_aux_heads)]
    return (trainable, {"backbone": bb_f})


def _token_grid(tokens, vit_cfg: ViTConfig):
    patches = tokens[:, 1 + vit_cfg.num_register_tokens:]
    B, N, D = patches.shape
    g = int(round(N ** 0.5))
    return patches.reshape(B, g, g, D)


def segmenter_forward(trainable, frozen, images, vit_cfg: ViTConfig,
                      rng=None, deterministic=True):
    """images [B, H, W, C] -> per-pixel logits [B, H, W, n_classes]."""
    from .classifier import _backbone_params
    t = {"backbone": trainable["backbone"]}
    params, apla_t = _backbone_params(t, frozen)
    tokens = vit_features(params, images, vit_cfg, trainable=apla_t, rng=rng,
                          deterministic=deterministic,
                          return_all_tokens=True)
    feat = _token_grid(tokens, vit_cfg)
    return pup_head_forward(feat, trainable["head"], images.shape[1:3])


def segmenter_forward_train(trainable, frozen, images, vit_cfg: ViTConfig,
                            rng=None, deterministic=True):
    """Main + auxiliary logits from ONE trunk pass (aux heads read the
    scan's per-layer outputs at the reference's fractional depths).
    Returns (main [B,H,W,K], [aux_i [B,H,W,K], ...])."""
    aux_heads = trainable.get("aux_heads", [])
    if not aux_heads:
        return (segmenter_forward(trainable, frozen, images, vit_cfg,
                                  rng=rng, deterministic=deterministic), [])
    from .classifier import _backbone_params
    t = {"backbone": trainable["backbone"]}
    params, apla_t = _backbone_params(t, frozen)
    tokens, layer_outs = vit_features(
        params, images, vit_cfg, trainable=apla_t, rng=rng,
        deterministic=deterministic, return_all_tokens=True,
        return_layers=True)
    out_hw = images.shape[1:3]
    main = pup_head_forward(_token_grid(tokens, vit_cfg),
                            trainable["head"], out_hw)
    aux = [pup_head_forward(
               _token_grid(layer_outs[idx], vit_cfg), aux_heads[i], out_hw)
           for i, idx in enumerate(aux_indices(vit_cfg.depth,
                                               len(aux_heads)))]
    return main, aux


def slide_stride(crop: int, stride=None) -> int:
    """Default 2/3-crop stride (the reference's 341/512); validates a
    user-supplied stride — stride > crop would leave uncovered pixels
    (0/0 NaNs after averaging), <= 0 an empty grid."""
    stride = int(stride) if stride else max(1, (2 * crop) // 3)
    if not 0 < stride <= crop:
        raise ValueError(f"slide stride must be in (0, crop={crop}], "
                         f"got {stride}")
    return stride


def slide_starts(full: int, crop: int, stride: int):
    """Window start offsets covering [0, full): stride steps with the
    final window flushed to the edge so every pixel is covered."""
    ss = list(range(0, full - crop + 1, stride))
    if ss[-1] != full - crop:
        ss.append(full - crop)
    return ss


def segmenter_slide_forward(trainable, frozen, images, vit_cfg: ViTConfig,
                            stride: int | None = None):
    """Sliding-window inference (reference seg recipe:
    apla_setr_vit-l_pup...py:65 `test_cfg=dict(mode='slide',
    crop_size=(512,512), stride=(341,341))`): the backbone runs at its
    training crop (`vit_cfg.img_size`) over a larger eval image; window
    logits are summed and averaged on overlaps.  `images` [B, H, W, 3]
    with H, W >= crop.  The window grid is STATIC for a given (H, W) —
    one XLA program, no dynamic shapes.  Default stride = 2/3 crop
    (the reference's 341/512)."""
    crop = int(vit_cfg.img_size)
    B, H, W, _ = images.shape
    if H < crop or W < crop:
        raise ValueError(f"eval image {H}x{W} smaller than crop {crop}")
    stride = slide_stride(crop, stride)

    out = cnt = None
    for y in slide_starts(H, crop, stride):
        for x in slide_starts(W, crop, stride):
            win = jax.lax.slice(images, (0, y, x, 0),
                                (B, y + crop, x + crop, images.shape[-1]))
            logits = segmenter_forward(trainable, frozen, win, vit_cfg)
            if out is None:
                out = jnp.zeros((B, H, W, logits.shape[-1]), logits.dtype)
                cnt = jnp.zeros((B, H, W, 1), logits.dtype)
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(
                    out, (0, y, x, 0),
                    (B, crop, crop, out.shape[-1])) + logits,
                (0, y, x, 0))
            cnt = jax.lax.dynamic_update_slice(
                cnt, jax.lax.dynamic_slice(
                    cnt, (0, y, x, 0), (B, crop, crop, 1)) + 1.0,
                (0, y, x, 0))
    return out / cnt


def segmentation_loss(logits, labels, ignore_index: int = 255):
    """Per-pixel CE with ignore label (mmseg convention)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, safe_labels[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(jnp.where(valid, ll, 0.0)) / n_valid


def iou_counts(pred, labels, n_classes: int, ignore_index: int = 255):
    """Per-class (intersection, union) pixel counts — accumulate these
    over batches and divide ONCE for dataset-level mIoU (a mean of
    per-batch mIoUs over-weights small tail batches and classes that
    appear in few batches)."""
    import numpy as np
    pred = np.asarray(pred)
    labels = np.asarray(labels)
    valid = labels != ignore_index
    inter = np.zeros((n_classes,), np.int64)
    union = np.zeros((n_classes,), np.int64)
    for c in range(n_classes):
        p = (pred == c) & valid
        t = (labels == c) & valid
        inter[c] = (p & t).sum()
        union[c] = (p | t).sum()
    return inter, union


def mean_iou_from_counts(inter, union):
    import numpy as np
    inter, union = np.asarray(inter), np.asarray(union)
    present = union > 0
    if not present.any():
        return 0.0
    return float(np.mean(inter[present] / union[present]))


def mean_iou(pred, labels, n_classes: int, ignore_index: int = 255):
    """mIoU over a batch (host-side numpy)."""
    return mean_iou_from_counts(
        *iou_counts(pred, labels, n_classes, ignore_index=ignore_index))


def make_seg_train_step(vit_cfg, tx, aux_weight: float = 0.4):
    """Jitted segmentation train step (fwd + per-pixel CE + update) over the
    (trainable, frozen) split — the first-class analogue of the supervised
    `make_train_step` for the SETR-PUP side-car.  When the trainable tree
    carries `aux_heads`, their losses join at `aux_weight` (reference
    auxiliary_head loss_weight 0.4).  Returns
    step(trainable, opt_state, frozen, batch) -> (trainable, opt_state,
    metrics)."""
    import optax

    def step(trainable, opt_state, frozen, batch):
        images, labels = batch["image"], batch["label"]

        def loss_fn(t):
            main, aux = segmenter_forward_train(t, frozen, images, vit_cfg)
            loss = segmentation_loss(main, labels)
            for a in aux:
                loss = loss + aux_weight * segmentation_loss(a, labels)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {
            "loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(step, donate_argnums=(0, 1))
