"""AOT inference export + serving predictor (jax.export / StableHLO).

The reference's deployment story ends at `--test` — an eval loop over a
live torch module (`src/defaults/trainer.py:247-345`).  TPU-native
serving inverts that: compile the forward ONCE, ahead of time, for a
fixed set of batch shapes, and ship a self-contained artifact that a
host with the same runtime can execute WITHOUT the model code.  The
artifact is a directory:

  meta.json               img_size / n_classes / batch_sizes / config echo
  params.msgpack          {"trainable": ..., "frozen": ...} — flax msgpack,
                          restored WITHOUT templates (plain nested dicts)
  program_b{B}.jaxexport  serialized jax.export program per batch size

Each program computes (logits, embedding) so both the classification and
the kNN/feature-bank serving paths (reference `trainer.py:347-455`) run
from one artifact.  `Predictor` chunks a request over the exported batch
sizes, padding the tail to the smallest covering shape (XLA static-shape
discipline: no recompiles, ever, at serve time).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from jax import export as jexport

_PARAMS_FILE = "params.msgpack"
_META_FILE = "meta.json"


from .train.checkpoint import _to_host


def _struct(tree):
    # leaves are host numpy arrays by the time this runs
    return jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                        tree)


def _maybe_quantize(frozen, quantize_frozen: bool):
    """Optionally int8-quantize the large frozen backbone kernels
    (qkv/fc1/fc2 -> {'w_int8','scale'}, `ops/quant.py`) — ~4x smaller
    artifact params and serve-time weight memory for those leaves; the
    exported program runs the W8A8 dense path.  No-op if the tree is
    already quantized (e.g. a wrapper built with
    `model_params.quantize_frozen`)."""
    if not quantize_frozen:
        return frozen
    # a tree quantized with a custom `which` (e.g. fc-only) has a float
    # qkv but re-quantizing would crash on the fc quant dicts — the
    # layout knowledge lives in ops.quant.is_quantized
    from .ops.quant import is_quantized, quantize_frozen_backbone
    return frozen if is_quantized(frozen) else \
        quantize_frozen_backbone(frozen)


def _gate_pallas(vit_cfg, platforms):
    """The Pallas kernels (fused APLA attention AND the flash/VMEM MHA)
    only lower for TPU, and their in-model gates key on the CURRENT
    backend — wrong for an explicit cross-platform export: a cpu (or
    multi-platform) artifact must not contain Mosaic calls.  With explicit
    platforms including a non-TPU target, fall back to XLA attention (same
    numerics); with platforms=None the in-model gates already match the
    lowering backend."""
    uses_pallas = vit_cfg.use_fused_apla or vit_cfg.use_flash
    if (platforms and uses_pallas
            and any(p.lower() != "tpu" for p in platforms)):
        return dataclasses.replace(vit_cfg, use_fused_apla=False,
                                   use_flash=False)
    if platforms and uses_pallas:
        from .ops.pallas_apla_attn import fused_available
        if not fused_available():
            import warnings
            warnings.warn(
                "exporting for tpu from a non-TPU host: the Pallas "
                "attention kernels cannot be traced here, the artifact "
                "will use XLA attention (slower at serve time — export on "
                "a TPU host to keep the kernel)", stacklevel=2)
    return vit_cfg


def _check_batch_sizes(batch_sizes):
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive, got {batch_sizes}")
    return batch_sizes


def _write_params(path, host_t, host_f):
    with open(os.path.join(path, _PARAMS_FILE), "wb") as f:
        f.write(serialization.to_bytes({"trainable": host_t,
                                        "frozen": host_f}))


def _write_programs(path, fwd, host_t, host_f, batch_sizes, img, platforms):
    kw = {"platforms": tuple(platforms)} if platforms else {}
    for b in batch_sizes:
        exp = jexport.export(jax.jit(fwd), **kw)(
            _struct(host_t), _struct(host_f),
            jax.ShapeDtypeStruct((b, img, img, 3), jnp.float32))
        with open(os.path.join(path, f"program_b{b}.jaxexport"), "wb") as f:
            f.write(exp.serialize())


def _cfg_echo(vit_cfg):
    echo = dataclasses.asdict(vit_cfg)
    echo["compute_dtype"] = str(echo["compute_dtype"].__name__
                                if hasattr(echo["compute_dtype"], "__name__")
                                else echo["compute_dtype"])
    return echo


def export_classifier(path: str, trainable, frozen, vit_cfg,
                      batch_sizes=(1, 8, 64), platforms=None,
                      quantize_frozen=False) -> dict:
    """Write a serving artifact for a (trainable, frozen) classifier.

    `platforms`: optional sequence like ("cpu", "tpu") for multi-platform
    lowering; default = the current backend only.  Returns the meta dict.

    `quantize_frozen`: see `_maybe_quantize`.
    """
    from .models.classifier import classifier_forward

    frozen = _maybe_quantize(frozen, quantize_frozen)
    batch_sizes = _check_batch_sizes(batch_sizes)
    os.makedirs(path, exist_ok=True)
    vit_cfg = _gate_pallas(vit_cfg, platforms)

    host_t, host_f = _to_host(trainable), _to_host(frozen)
    _write_params(path, host_t, host_f)

    def fwd(tr, fz, images):
        logits, emb = classifier_forward(tr, fz, images, vit_cfg,
                                         deterministic=True,
                                         return_embedding=True)
        return logits.astype(jnp.float32), emb.astype(jnp.float32)

    n_classes = int(np.shape(host_t["fc"]["bias"])[0])
    img = int(vit_cfg.img_size)
    _write_programs(path, fwd, host_t, host_f, batch_sizes, img, platforms)

    meta = {
        "format": "apla_tpu.serve/1",
        "img_size": img,
        "n_classes": n_classes,
        "embed_dim": int(vit_cfg.embed_dim),
        "batch_sizes": batch_sizes,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "quantized_frozen": bool(quantize_frozen),
        "vit_config": _cfg_echo(vit_cfg),
    }
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def export_segmenter(path: str, trainable, frozen, vit_cfg,
                     batch_sizes=(1, 4), platforms=None,
                     quantize_frozen=False) -> dict:
    """Write a serving artifact for a (trainable, frozen) SETR-PUP
    segmenter (the side-car trained by `python -m apla_tpu.segdet seg`).
    Programs compute per-pixel logits [B, H, W, n_classes] (f32); the
    artifact loads back as a `SegPredictor` (predict -> logits,
    masks -> argmax class map)."""
    from .models.seg import segmenter_forward

    frozen = _maybe_quantize(frozen, quantize_frozen)
    batch_sizes = _check_batch_sizes(batch_sizes)
    os.makedirs(path, exist_ok=True)
    vit_cfg = _gate_pallas(vit_cfg, platforms)

    host_t, host_f = _to_host(trainable), _to_host(frozen)
    _write_params(path, host_t, host_f)

    def fwd(tr, fz, images):
        return segmenter_forward(tr, fz, images, vit_cfg,
                                 deterministic=True).astype(jnp.float32)

    n_classes = int(np.shape(host_t["head"]["cls"]["bias"])[0])
    img = int(vit_cfg.img_size)
    _write_programs(path, fwd, host_t, host_f, batch_sizes, img, platforms)

    meta = {
        "format": "apla_tpu.serve/1",
        "task": "segmenter",
        "img_size": img,
        "n_classes": n_classes,
        "batch_sizes": batch_sizes,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "quantized_frozen": bool(quantize_frozen),
        "vit_config": _cfg_echo(vit_cfg),
    }
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def export_detector(path: str, trainable, frozen, swin_cfg, strides,
                    batch_sizes=(1, 8), platforms=None,
                    quantize_frozen=False) -> dict:
    """Write a serving artifact for the FCOS detection side-car
    (`python -m apla_tpu.segdet det`): APLA-Swin pyramid + FCOS head.
    Programs compute the RAW per-level maps (cls_logits [B,H,W,K],
    box [B,H,W,4], ctr [B,H,W,1]) — score/NMS decoding is host-side and
    per-image (`models/detection.decode_detections`), so it stays out of
    the compiled program; `DetPredictor.detect` runs it.  Checkpoints
    trained with the instance-mask branch (`segdet det --masks`) export
    coefficient maps per level plus prototype masks; `detect` then also
    returns per-instance masks."""
    from .models.detection import _conv, fcos_head_forward, protonet_forward
    from .models.swin import swin_features

    frozen = _maybe_quantize(frozen, quantize_frozen)
    batch_sizes = _check_batch_sizes(batch_sizes)
    os.makedirs(path, exist_ok=True)

    host_t, host_f = _to_host(trainable), _to_host(frozen)
    _write_params(path, host_t, host_f)
    with_masks = "protonet" in host_t

    def fwd(tr, fz, images):
        feats = swin_features(fz, images, swin_cfg,
                              trainable=tr["backbone"])
        outs = fcos_head_forward(feats, tr["head"], tr.get("laterals"))
        levels = [tuple(o.astype(jnp.float32) for o in lvl) for lvl in outs]
        if with_masks:
            protos = protonet_forward(_conv(feats[0], tr["laterals"][0]),
                                      tr["protonet"])
            return {"levels": levels, "protos": protos.astype(jnp.float32)}
        return levels

    n_classes = int(np.shape(host_t["head"]["cls"]["bias"])[0])
    img = int(swin_cfg.img_size)
    _write_programs(path, fwd, host_t, host_f, batch_sizes, img, platforms)

    meta = {
        "format": "apla_tpu.serve/1",
        "task": "detector",
        "img_size": img,
        "n_classes": n_classes,
        "strides": [int(s) for s in strides],
        "with_masks": with_masks,
        "batch_sizes": batch_sizes,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "quantized_frozen": bool(quantize_frozen),
    }
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


class Predictor:
    """Executes an exported artifact.  No model code involved: the programs
    are deserialized StableHLO, the params plain arrays."""

    def __init__(self, meta: dict, params: dict, programs: dict):
        self.meta = meta
        self._params = params
        self._programs = programs           # batch_size -> Exported
        self.batch_sizes = sorted(programs)

    # -------------------------------------------------------------- #
    def _pick_batch(self, rem: int) -> int:
        """Exported batch for the next call on `rem` remaining images.

        Padding up to a covering batch costs wasted compute (~linear in
        the pad); decomposing costs extra dispatches (fixed overhead per
        call).  Rule: pad to the smallest covering batch when the waste
        is at most half that batch (n=63 over {1,8,64} -> one padded b64
        call, not 7x b8 + 7x b1), otherwise take the largest batch that
        fits and recurse on the tail."""
        covers = [b for b in self.batch_sizes if b >= rem]
        fits = [b for b in self.batch_sizes if b <= rem]
        if covers and (not fits or min(covers) - rem <= min(covers) // 2):
            return min(covers)
        return max(fits)

    def _iter_chunks(self, images: np.ndarray):
        """Validate + chunk a request over the exported batch sizes:
        yields (batch_size, n_real, padded_chunk) per program call (tail
        chunks are zero-padded to the chosen static batch; callers trim
        outputs to n_real).  Shared by all Predictor subclasses so the
        chunk/pad policy stays in one place."""
        n = images.shape[0]
        img = self.meta["img_size"]
        if images.ndim != 4 or images.shape[1:] != (img, img, 3):
            raise ValueError(
                f"expected [n, {img}, {img}, 3] images, got {images.shape}")
        images = np.asarray(images, np.float32)
        i = 0
        while i < n:
            rem = n - i
            b = self._pick_batch(rem)
            m = min(b, rem)                    # real images in this call
            chunk = images[i:i + m]
            if m < b:
                chunk = np.concatenate(
                    [chunk, np.zeros((b - m,) + chunk.shape[1:],
                                     np.float32)])
            yield b, m, chunk
            i += m

    def _run_chunks(self, images: np.ndarray):
        out_l, out_e = [], []
        for b, m, chunk in self._iter_chunks(images):
            logits, emb = self._programs[b].call(
                self._params["trainable"], self._params["frozen"],
                jnp.asarray(chunk))
            out_l.append(np.asarray(logits)[:m])
            out_e.append(np.asarray(emb)[:m])
        return (np.concatenate(out_l) if out_l
                else np.zeros((0, self.meta["n_classes"]), np.float32),
                np.concatenate(out_e) if out_e
                else np.zeros((0, self.meta["embed_dim"]), np.float32))

    def predict(self, images: np.ndarray) -> np.ndarray:
        """[n, H, W, 3] float images (normalized) -> [n, n_classes] logits."""
        return self._run_chunks(images)[0]

    def embed(self, images: np.ndarray) -> np.ndarray:
        """[n, H, W, 3] -> [n, embed_dim] backbone features (kNN serving)."""
        return self._run_chunks(images)[1]

    def predict_and_embed(self, images: np.ndarray):
        """Both outputs from ONE pass over the programs (each call already
        computes logits AND embeddings — use this when you need both)."""
        return self._run_chunks(images)


class SegPredictor(Predictor):
    """Executes a segmentation artifact: programs return per-pixel logits
    [B, H, W, n_classes]."""

    def _run_chunks(self, images: np.ndarray):
        out = []
        for b, m, chunk in self._iter_chunks(images):
            logits = self._programs[b].call(
                self._params["trainable"], self._params["frozen"],
                jnp.asarray(chunk))
            out.append(np.asarray(logits)[:m])
        img_sz = self.meta["img_size"]
        return (np.concatenate(out) if out
                else np.zeros((0, img_sz, img_sz, self.meta["n_classes"]),
                              np.float32))

    def predict(self, images: np.ndarray) -> np.ndarray:
        """[n, H, W, 3] -> [n, H, W, n_classes] per-pixel logits."""
        return self._run_chunks(images)

    def masks(self, images: np.ndarray) -> np.ndarray:
        """[n, H, W, 3] -> [n, H, W] int32 argmax class map."""
        return np.argmax(self._run_chunks(images), axis=-1).astype(np.int32)

    def predict_slide(self, images: np.ndarray,
                      stride: int | None = None) -> np.ndarray:
        """Sliding-window inference over images LARGER than the exported
        crop (models/seg.segmenter_slide_forward semantics, host-side:
        windows batch through the fixed-shape programs, logits averaged
        on overlaps; default stride 2/3 crop — the reference's 341/512).
        [n, H, W, 3] with H, W >= crop -> [n, H, W, n_classes]."""
        from .models.seg import slide_starts, slide_stride
        crop = self.meta["img_size"]
        n, H, W = images.shape[0], images.shape[1], images.shape[2]
        if images.ndim != 4 or images.shape[3] != 3 \
                or H < crop or W < crop:
            raise ValueError(
                f"expected [n, >={crop}, >={crop}, 3], got {images.shape}")
        if H == crop and W == crop:
            return self._run_chunks(images)
        stride = slide_stride(crop, stride)

        images = np.asarray(images, np.float32)
        positions = [(i, y, x) for i in range(n)
                     for y in slide_starts(H, crop, stride)
                     for x in slide_starts(W, crop, stride)]
        out = np.zeros((n, H, W, self.meta["n_classes"]), np.float32)
        cnt = np.zeros((n, H, W, 1), np.float32)
        # stream window groups through the programs: peak host memory is
        # one group of window logits, not the whole grid's
        group_size = max(self.batch_sizes)
        for g in range(0, len(positions), group_size):
            group = positions[g:g + group_size]
            chunk = np.stack([images[i, y:y + crop, x:x + crop]
                              for i, y, x in group])
            logits = self._run_chunks(chunk)
            for (i, y, x), lg in zip(group, logits):
                out[i, y:y + crop, x:x + crop] += lg
                cnt[i, y:y + crop, x:x + crop] += 1.0
        return out / cnt

    def masks_slide(self, images: np.ndarray,
                    stride: int | None = None) -> np.ndarray:
        return np.argmax(self.predict_slide(images, stride=stride),
                         axis=-1).astype(np.int32)

    def embed(self, images):
        raise NotImplementedError("segmentation artifacts have no "
                                  "embedding output")


class DetPredictor(Predictor):
    """Executes a detection artifact: programs return raw per-level FCOS
    maps (plus prototype masks for --masks exports); `detect` decodes them
    per image on host (sigmoid + score threshold + greedy NMS, and
    prototype-mask assembly when present)."""

    @staticmethod
    def _split(outs):
        """Program output -> (levels, protos-or-None); mask exports wrap
        the per-level maps in {'levels': ..., 'protos': ...}."""
        if isinstance(outs, dict):
            return outs["levels"], outs["protos"]
        return outs, None

    def _run_chunks(self, images: np.ndarray):
        chunks, proto_chunks = [], []
        for b, m, chunk in self._iter_chunks(images):
            levels, protos = self._split(self._programs[b].call(
                self._params["trainable"], self._params["frozen"],
                jnp.asarray(chunk)))
            chunks.append([tuple(np.asarray(o)[:m] for o in lvl)
                           for lvl in levels])
            if protos is not None:
                proto_chunks.append(np.asarray(protos)[:m])
        if not chunks:
            # empty request: run the smallest program on zeros so the
            # per-level output shapes are still correct (trimmed to 0)
            img = self.meta["img_size"]
            b = self.batch_sizes[0]
            levels, protos = self._split(self._programs[b].call(
                self._params["trainable"], self._params["frozen"],
                jnp.zeros((b, img, img, 3), jnp.float32)))
            chunks.append([tuple(np.asarray(o)[:0] for o in lvl)
                           for lvl in levels])
            if protos is not None:
                proto_chunks.append(np.asarray(protos)[:0])
        arity = len(chunks[0][0])
        # concat chunks per level/output along the batch dim
        levels = [tuple(np.concatenate([c[lvl][j] for c in chunks])
                        for j in range(arity))
                  for lvl in range(len(chunks[0]))]
        protos = np.concatenate(proto_chunks) if proto_chunks else None
        return levels, protos

    def predict(self, images: np.ndarray):
        """[n, H, W, 3] -> per-level raw maps
        [(cls_logits [n,H_l,W_l,K], box [n,H_l,W_l,4], ctr [n,H_l,W_l,1])]
        (+ a coefficient map per level for mask exports; `predict_protos`
        exposes the prototype tensor)."""
        return self._run_chunks(images)[0]

    def predict_protos(self, images: np.ndarray):
        """[n, H, W, 3] -> prototype masks [n, Hm, Wm, P] (mask exports)."""
        return self._run_chunks(images)[1]

    def detect(self, images: np.ndarray, score_thresh=0.05, top_k=100):
        """[n, H, W, 3] -> list of n (boxes [M,4], scores [M], labels [M])
        tuples — (boxes, scores, labels, masks [M,Hm,Wm] bool) for mask
        exports (host-side decode + NMS per image)."""
        from .models.detection import decode_detections
        levels, protos = self._run_chunks(images)
        strides = self.meta["strides"]
        out = []
        for j in range(images.shape[0]):
            per_img = [tuple(o[j:j + 1] for o in lvl) for lvl in levels]
            kw = {}
            if protos is not None:
                kw = {"protos": protos[j:j + 1],
                      "mask_stride": strides[0]}
            out.append(decode_detections(per_img, strides,
                                         score_thresh=score_thresh,
                                         top_k=top_k, **kw))
        return out

    def embed(self, images):
        raise NotImplementedError("detection artifacts have no embedding "
                                  "output")


def _relist(tree):
    """flax msgpack_restore returns Python lists as {'0': ..., '1': ...}
    dicts when restored template-free; convert those back so the params
    match the exported program's pytree structure (the PUP head's `convs`
    and the det laterals are lists)."""
    if isinstance(tree, dict):
        keys = list(tree.keys())
        if keys and all(isinstance(k, str) and k.isdigit() for k in keys):
            ints = sorted(int(k) for k in keys)
            if ints == list(range(len(ints))):
                return [_relist(tree[str(i)]) for i in ints]
        return {k: _relist(v) for k, v in tree.items()}
    return tree


def load_predictor(path: str) -> Predictor:
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    if meta.get("format") != "apla_tpu.serve/1":
        raise ValueError(f"not an apla_tpu serving artifact: {path}")
    with open(os.path.join(path, _PARAMS_FILE), "rb") as f:
        params = _relist(serialization.msgpack_restore(f.read()))
    programs = {}
    for b in meta["batch_sizes"]:
        with open(os.path.join(path, f"program_b{b}.jaxexport"), "rb") as f:
            programs[int(b)] = jexport.deserialize(f.read())
    cls = {"segmenter": SegPredictor,
           "detector": DetPredictor}.get(meta.get("task"), Predictor)
    return cls(meta, params, programs)


# ------------------------------------------------------------------ #
# CLI: python -m apla_tpu.serve export --params_path ... --out ...
# ------------------------------------------------------------------ #

def _build_from_params(params_path: str, pretrained_path: str | None,
                       n_classes: int | None):
    from .data import datasets as datasets_mod
    from .utils.config import load_merged_params
    from .wrapper import DefaultWrapper

    params = load_merged_params(params_path)
    wrapper = DefaultWrapper(params)
    if n_classes is None:
        ds_cls = datasets_mod.get_dataset_class(
            wrapper.dataset_params.dataset)
        n_classes = int(ds_cls.n_classes)
        if not bool(getattr(ds_cls, "is_multiclass", True)) \
                and n_classes <= 2:
            n_classes = 1
    wrapper.model_params.n_classes = n_classes
    vit_cfg = wrapper.build_vit_config()
    apla_cfg = wrapper.build_apla_config()
    from .models.classifier import init_classifier
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), vit_cfg, n_classes, apla_cfg=apla_cfg,
        freeze_backbone=bool(wrapper.model_params.get("freeze_backbone",
                                                      False)))
    if wrapper.model_params.get("pretrained"):
        from .utils.pretrained import maybe_load_pretrained_backbone
        trainable, frozen = maybe_load_pretrained_backbone(
            trainable, frozen, wrapper.model_params, vit_cfg)
    ckpt = pretrained_path or wrapper.transfer_learning_params.get(
        "pretrained_path")
    if ckpt:
        from .train.checkpoint import transfer_into
        trainable, frozen = transfer_into(trainable, frozen, ckpt,
                                          where="serve-export")
    return trainable, frozen, vit_cfg


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        prog="apla_tpu.serve",
        description="Export / inspect AOT serving artifacts")
    sub = ap.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("export", help="export a serving artifact")
    ex.add_argument("--params_path", required=True)
    ex.add_argument("--pretrained_path", default=None,
                    help="checkpoint dir to adopt weights from")
    ex.add_argument("--out", required=True)
    ex.add_argument("--batch_sizes", default="1,8,64")
    ex.add_argument("--n_classes", type=int, default=None)
    ex.add_argument("--platforms", default=None,
                    help="comma list, e.g. cpu,tpu (default: current)")
    ex.add_argument("--quantize_frozen", action="store_true",
                    help="int8 frozen backbone kernels in the artifact "
                         "(~4x smaller params, W8A8 serve path)")
    exs = sub.add_parser("export_seg",
                         help="export a segmentation artifact from a "
                              "segdet checkpoint (seg_best.msgpack)")
    exs.add_argument("--ckpt", required=True,
                     help="segdet seg_best.msgpack ({'trainable','frozen'})")
    exs.add_argument("--backbone", default="vit_large")
    exs.add_argument("--img_size", type=int, default=512)
    exs.add_argument("--patch_size", type=int, default=16)
    exs.add_argument("--out", required=True)
    exs.add_argument("--batch_sizes", default="1,4")
    exs.add_argument("--platforms", default=None)
    exs.add_argument("--quantize_frozen", action="store_true")
    exd = sub.add_parser("export_det",
                         help="export a detection artifact from a segdet "
                              "checkpoint (det_best.msgpack)")
    exd.add_argument("--ckpt", required=True)
    exd.add_argument("--img_size", type=int, default=224)
    exd.add_argument("--embed_dim", type=int, default=96)
    exd.add_argument("--depths", default="2,2,6")
    exd.add_argument("--num_heads", default="3,6,12")
    exd.add_argument("--window_size", type=int, default=7)
    exd.add_argument("--out", required=True)
    exd.add_argument("--batch_sizes", default="1,8")
    exd.add_argument("--platforms", default=None)
    exd.add_argument("--quantize_frozen", action="store_true",
                     help="int8 frozen Swin kernels in the artifact")
    info = sub.add_parser("info", help="print an artifact's meta")
    info.add_argument("artifact")
    ev = sub.add_parser("eval",
                        help="evaluate a classifier artifact on a "
                             "dataset split (the --test table, served)")
    ev.add_argument("artifact")
    ev.add_argument("--params_path",
                    help="recipe YAML naming the dataset + transforms "
                         "(classifier artifacts)")
    ev.add_argument("--split", default=None, choices=("test", "val"),
                    help="classifier artifacts (default test); a "
                         "--seg_root eval always scores the ADE "
                         "'validation' split")
    ev.add_argument("--knn", action="store_true",
                    help="also kNN-classify via the served embeddings "
                         "(feature bank = train split, val transforms)")
    ev.add_argument("--seg_root", default=None,
                    help="segmenter artifacts: ADE20K-layout root to "
                         "compute val mIoU over (instead of --params_path)")
    ev.add_argument("--eval_img_size", type=int, default=None,
                    help="with --seg_root: evaluate at this size via "
                         "sliding windows of the exported crop")
    ev.add_argument("--eval_stride", type=int, default=None,
                    help="slide stride (default 2/3 of the crop)")
    ev.add_argument("--det_img_dir", default=None,
                    help="detector artifacts: COCO image dir (with "
                         "--det_ann) to compute mAP@50 over")
    ev.add_argument("--det_ann", default=None,
                    help="detector artifacts: COCO instances .json")
    pr = sub.add_parser("predict", help="run an artifact on images")
    pr.add_argument("artifact")
    pr.add_argument("inputs", nargs="+",
                    help="a .npy [n,H,W,3] float batch (already "
                         "normalized), or image files (decoded, resized, "
                         "normalized with --mean/--std)")
    pr.add_argument("--top_k", type=int, default=5,
                    help="classes printed per image (classifier)")
    pr.add_argument("--embed", action="store_true",
                    help="print/save embeddings instead of logits "
                         "(classifier artifacts)")
    pr.add_argument("--score_thresh", type=float, default=0.05,
                    help="detector decode threshold")
    pr.add_argument("--max_dets", type=int, default=100,
                    help="detector NMS cap per image")
    pr.add_argument("--mean", default="0.485,0.456,0.406")
    pr.add_argument("--std", default="0.229,0.224,0.225")
    pr.add_argument("--out", default=None,
                    help="write the output to this file: logits/embeddings "
                         ".npy (classifier), argmax masks .npy (segmenter), "
                         "detections .json (detector)")
    args = ap.parse_args(argv)

    if args.cmd == "info":
        with open(os.path.join(args.artifact, _META_FILE)) as f:
            print(json.dumps(json.load(f), indent=2))
        return

    if args.cmd == "eval" and (args.det_img_dir or args.det_ann):
        if not (args.det_img_dir and args.det_ann):
            ap.error("--det_img_dir and --det_ann go together")
        if args.split or args.knn or args.params_path or args.seg_root \
                or args.eval_img_size or args.eval_stride:
            ap.error("--det_img_dir/--det_ann take no other eval flags")
        pred = load_predictor(args.artifact)
        if pred.meta.get("task") != "detector":
            ap.error("--det_img_dir requires a detector artifact")
        from .data.detection_data import CocoDetection, detection_collate
        from .data.loader import DataLoader
        from .models.detection import DetectionAP
        img = pred.meta["img_size"]
        with_masks = bool(pred.meta.get("with_masks"))
        strides = pred.meta.get("strides", [4])
        ds = CocoDetection(args.det_img_dir, args.det_ann, img_size=img,
                           with_masks=with_masks, mask_stride=strides[0])
        bsz = max(pred.batch_sizes)
        vloader = DataLoader(ds, batch_size=bsz, shuffle=False,
                             drop_last=False, num_workers=2,
                             collate_fn=detection_collate)
        metric = DetectionAP(ds.n_classes)
        mask_metric = DetectionAP(ds.n_classes, use_masks=True) \
            if with_masks else None
        n_seen = 0
        for bi, b in enumerate(vloader):
            dets = pred.detect(np.asarray(b["image"], np.float32))
            for j, det in enumerate(dets):
                boxes, scores, labels = det[:3]
                keep = b["labels"][j] >= 0
                metric.add_image(bi * bsz + j, boxes, scores, labels,
                                 b["boxes"][j][keep], b["labels"][j][keep])
                if with_masks:
                    mask_metric.add_image(
                        bi * bsz + j, boxes, scores, labels,
                        b["boxes"][j][keep], b["labels"][j][keep],
                        pred_masks=det[3], gt_masks=b["masks"][j][keep])
                n_seen += 1
        print(f"EVAL RESULTS (val, {n_seen} samples, "
              f"artifact {args.artifact})")
        print(f"  val_map50 : {round(metric.mean_ap(), 4)}")
        if with_masks:
            print(f"  val_mask_map50 : {round(mask_metric.mean_ap(), 4)}")
        return

    if args.cmd == "eval" and args.seg_root:
        # ignored flags would silently change what gets measured — reject
        if args.split or args.knn or args.params_path:
            ap.error("--seg_root evaluates the ADE validation split; "
                     "--split/--knn/--params_path do not apply")
        pred = load_predictor(args.artifact)
        if pred.meta.get("task") != "segmenter":
            ap.error("--seg_root requires a segmenter artifact")
        from .data.loader import DataLoader
        from .data.segmentation_data import (ADE20KSegmentation,
                                             segmentation_collate)
        from .models.seg import iou_counts, mean_iou_from_counts
        img = pred.meta["img_size"]
        eval_size = int(args.eval_img_size) if args.eval_img_size else img
        if eval_size < img:
            ap.error(f"--eval_img_size {eval_size} < exported crop {img}")
        if args.eval_stride and eval_size == img:
            ap.error("--eval_stride needs --eval_img_size > the exported "
                     "crop (no sliding at the crop size)")
        val = ADE20KSegmentation(args.seg_root, "validation",
                                 img_size=eval_size)
        vloader = DataLoader(val, batch_size=max(pred.batch_sizes),
                             shuffle=False, drop_last=False, num_workers=2,
                             collate_fn=segmentation_collate)
        inter = union = 0
        n_seen = 0
        for b in vloader:
            im = np.asarray(b["image"], np.float32)
            masks = (pred.masks_slide(im, stride=args.eval_stride)
                     if eval_size > img else pred.masks(im))
            # accumulate pixel counts; divide once (dataset-level mIoU,
            # matching the segdet train loop's evaluate)
            bi, bu = iou_counts(masks, b["label"], n_classes=val.n_classes)
            inter = inter + bi
            union = union + bu
            n_seen += masks.shape[0]
        miou = mean_iou_from_counts(inter, union) if np.ndim(union) else 0.0
        print(f"EVAL RESULTS (val, {n_seen} samples, "
              f"artifact {args.artifact})")
        print(f"  val_miou : {round(miou, 4)}")
        return

    if args.cmd == "eval":
        if not args.params_path:
            ap.error("eval needs --params_path (or --seg_root for "
                     "segmenter artifacts)")
        if args.eval_img_size or args.eval_stride:
            ap.error("--eval_img_size/--eval_stride apply only with "
                     "--seg_root")
        pred = load_predictor(args.artifact)
        if pred.meta.get("task", "classifier") != "classifier":
            ap.error("eval supports classifier artifacts"
                     " (segmenter: pass --seg_root)")
        from .train.metrics import (ClassificationMetrics,
                                    MultiLabelClassificationMetrics)
        from .utils.config import load_merged_params
        from .wrapper import DefaultWrapper
        split = args.split or "test"
        wrapper = DefaultWrapper(load_merged_params(args.params_path))
        if args.knn:   # init_dataloaders builds fbank_loader on this flag
            wrapper.training_params.knn_eval = True
        loaders = wrapper.init_dataloaders()
        loader = (loaders.testloader if split == "test"
                  else loaders.valloader)
        ds = loader.dataset
        n_classes = pred.meta["n_classes"]
        metric_cls = (ClassificationMetrics if ds.is_multiclass
                      else MultiLabelClassificationMetrics)
        metric = metric_cls(n_classes, mode=split)

        def embed_norm(e):
            return e / (np.linalg.norm(e, axis=-1, keepdims=True) + 1e-12)

        kmetric = feats = bank_labels = None
        if args.knn:
            from .train.knn import (build_feature_bank, knn_predict,
                                    knn_predict_multilabel)
            # the trainer's bank recipe (train split, val transforms)
            # driven by the served embedding path
            feats, bank_labels = build_feature_bank(
                lambda _t, _f, im: embed_norm(
                    pred.embed(np.asarray(im, np.float32))),
                None, None, loaders.fbank_loader)
            knn_k = min(int(getattr(ds, "knn_nhood", 20)), len(bank_labels))
            kmetric = metric_cls(n_classes, mode=f"knn_{split}")

        n_seen = 0
        for batch in loader:
            labels = np.asarray(batch["label"])
            # one pass: each program call computes logits AND embeddings
            logits, emb = pred.predict_and_embed(
                np.asarray(batch["image"], np.float32))
            metric.add_preds(logits, labels)
            n_seen += labels.shape[0]
            if kmetric is None:
                continue
            emb = embed_norm(emb)
            if ds.is_multiclass:
                scores = knn_predict(
                    jnp.asarray(emb), jnp.asarray(feats),
                    jnp.asarray(np.asarray(bank_labels).astype(np.int32)),
                    knn_k=knn_k, knn_t=0.07, classes=n_classes)
                kmetric.raw = False  # already probabilities
                kmetric.add_preds(np.asarray(scores), labels)
            else:
                scores = knn_predict_multilabel(
                    jnp.asarray(emb), jnp.asarray(feats),
                    jnp.asarray(np.asarray(bank_labels).astype(np.float32)),
                    knn_k=knn_k, knn_t=0.07)
                kmetric.add_preds(np.asarray(scores), labels,
                                  using_knn=True)
        results = metric.get_values()
        if kmetric is not None:
            results.update(kmetric.get_values())
        print(f"EVAL RESULTS ({split}, {n_seen} samples, "
              f"artifact {args.artifact})")
        width = max(len(k) for k in results)
        for k, v in results.items():
            print(f"  {k:<{width}} : {v}")
        return

    if args.cmd == "predict":
        pred = load_predictor(args.artifact)
        img = pred.meta["img_size"]
        npys = [p for p in args.inputs if p.endswith(".npy")]
        if npys and len(args.inputs) > 1:
            ap.error("pass ONE .npy batch, or image files — not a mix "
                     "of several")
        if npys:
            x = np.load(npys[0]).astype(np.float32)
        else:
            from PIL import Image
            mean = np.asarray([float(v) for v in args.mean.split(",")],
                              np.float32)
            std = np.asarray([float(v) for v in args.std.split(",")],
                             np.float32)
            ims = []
            for p in args.inputs:
                im = Image.open(p).convert("RGB").resize((img, img),
                                                         Image.BICUBIC)
                ims.append((np.asarray(im, np.float32) / 255.0 - mean) / std)
            x = np.stack(ims)
        task = pred.meta.get("task", "classifier")
        if task == "detector":
            dets = pred.detect(x, score_thresh=args.score_thresh,
                               top_k=args.max_dets)
            recs = []
            for i, det in enumerate(dets):
                boxes, scores, labels = det[:3]
                rec = {"image": i, "boxes": np.asarray(boxes).tolist(),
                       "scores": np.round(np.asarray(scores), 4).tolist(),
                       "labels": np.asarray(labels).tolist()}
                if len(det) == 4:  # mask export: [M, Hm, Wm] 0/1 grids
                    rec["masks"] = np.asarray(det[3], np.uint8).tolist()
                recs.append(rec)
            for rec in recs:
                print(json.dumps(rec))
            if args.out:
                with open(args.out, "w") as f:
                    json.dump(recs, f)
                print(f"detections -> {args.out}")
            return
        if task == "segmenter":
            img_sz = pred.meta["img_size"]
            oversized = x.shape[1] > img_sz or x.shape[2] > img_sz
            masks = pred.masks_slide(x) if oversized else pred.masks(x)
            for i, m in enumerate(masks):
                cls, cnt = np.unique(m, return_counts=True)
                top = sorted(zip(cnt.tolist(), cls.tolist()), reverse=True)
                print(f"image {i}: mask {m.shape}, top classes "
                      + ", ".join(f"{c} ({n}px)" for n, c in top[:5]))
            if args.out:
                np.save(args.out, masks)
                print(f"masks -> {args.out}")
            return
        out = pred.embed(x) if args.embed else pred.predict(x)
        if args.embed:
            print(f"embeddings {out.shape}")
        else:
            k = min(args.top_k, out.shape[-1])
            for i, row in enumerate(out):
                top = np.argsort(row)[::-1][:k]
                print(f"image {i}: "
                      + ", ".join(f"class {c}: {row[c]:.3f}" for c in top))
        if args.out:
            np.save(args.out, out)
            print(f"output -> {args.out}")
        return

    if args.cmd == "export_seg":
        from .models.vit import VIT_BUILDERS
        with open(args.ckpt, "rb") as f:
            tree = _relist(serialization.msgpack_restore(f.read()))
        cfg = VIT_BUILDERS[args.backbone](img_size=args.img_size,
                                          patch_size=args.patch_size)
        bs = [int(x) for x in str(args.batch_sizes).split(",") if x]
        platforms = (args.platforms.split(",") if args.platforms else None)
        meta = export_segmenter(args.out, tree["trainable"], tree["frozen"],
                                cfg, batch_sizes=bs, platforms=platforms,
                                quantize_frozen=args.quantize_frozen)
        print(f"Exported segmenter (img {meta['img_size']}, "
              f"{meta['n_classes']} classes) at batch sizes "
              f"{meta['batch_sizes']} -> {args.out}")
        return

    if args.cmd == "export_det":
        from .models.swin import SwinConfig
        with open(args.ckpt, "rb") as f:
            tree = _relist(serialization.msgpack_restore(f.read()))
        depths = tuple(int(x) for x in args.depths.split(","))
        cfg = SwinConfig(img_size=args.img_size, patch_size=4,
                         embed_dim=args.embed_dim, depths=depths,
                         num_heads=tuple(int(x)
                                         for x in args.num_heads.split(",")),
                         window_size=args.window_size,
                         compute_dtype=jnp.float32)
        strides = tuple(4 * (2 ** i) for i in range(len(depths)))
        bs = [int(x) for x in str(args.batch_sizes).split(",") if x]
        platforms = (args.platforms.split(",") if args.platforms else None)
        meta = export_detector(args.out, tree["trainable"], tree["frozen"],
                               cfg, strides, batch_sizes=bs,
                               platforms=platforms,
                               quantize_frozen=args.quantize_frozen)
        print(f"Exported detector (img {meta['img_size']}, "
              f"{meta['n_classes']} classes, strides {meta['strides']}) "
              f"at batch sizes {meta['batch_sizes']} -> {args.out}")
        return

    trainable, frozen, vit_cfg = _build_from_params(
        args.params_path, args.pretrained_path, args.n_classes)
    bs = [int(x) for x in str(args.batch_sizes).split(",") if x]
    platforms = (args.platforms.split(",") if args.platforms else None)
    meta = export_classifier(args.out, trainable, frozen, vit_cfg,
                             batch_sizes=bs, platforms=platforms,
                             quantize_frozen=args.quantize_frozen)
    print(f"Exported {meta['vit_config'].get('depth')}-block classifier "
          f"(img {meta['img_size']}, {meta['n_classes']} classes) at "
          f"batch sizes {meta['batch_sizes']} -> {args.out}")


if __name__ == "__main__":
    main()
