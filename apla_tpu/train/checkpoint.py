"""Checkpoint save/load with reference-parity fields.

Reference checkpoint dict (`bases.py:456-467`): {iters, state_dict,
original_state, optimizer, epoch, parameters, best_val_target, scaler}.
Here: a directory with msgpack-serialised pytrees (flax.serialization) plus a
JSON manifest.  The frozen backbone is saved once per run ("original_state"
analogue); per-step checkpoints carry only the trainable tree + optimizer
state, so checkpoint size scales with APLA rank, not model size.
"""

from __future__ import annotations

import json
import os
import pickle
import threading

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


_async_lock = threading.Lock()   # serialise overlapping async saves
_async_thread: threading.Thread | None = None


def wait_for_async_save() -> None:
    """Block until a pending async checkpoint write finishes (call before
    process exit / before reading the checkpoint back)."""
    t = _async_thread
    if t is not None and t.is_alive():
        t.join()


def save_checkpoint(path: str, *, state, frozen=None, epoch: int = 0,
                    parameters: dict | None = None,
                    best_val_target: float | None = None,
                    best_trainable=None, extra: dict | None = None,
                    aux_state: dict | None = None,
                    async_save: bool = False) -> None:
    """`aux_state`: extra pytrees to persist (SSL teacher, centering buffers,
    BN stats — the reference stores the whole model state_dict, which covers
    these implicitly).

    `async_save`: gather to host synchronously (cheap — checkpoint size
    scales with APLA rank) but serialise+write on a background thread so
    the train loop never stalls on disk.  `wait_for_async_save()` joins."""
    global _async_thread
    payload = {
        "trainable": _to_host(state.trainable),
        "opt_state": _to_host(state.opt_state),
    }
    if aux_state:
        payload["aux_state"] = _to_host(aux_state)
    if best_trainable is not None:
        payload["best_trainable"] = _to_host(best_trainable)
    frozen_host = _to_host(frozen) if frozen is not None else None
    manifest = {
        "iters": int(state.step),
        "epoch": int(epoch),
        "best_val_target": (None if best_val_target is None
                            else float(best_val_target)),
    }
    if extra:
        manifest.update(extra)
    params_copy = dict(parameters) if parameters is not None else None

    def write():
        with _async_lock:
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "state.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(payload))
            if frozen_host is not None:
                with open(os.path.join(path, "frozen.msgpack"), "wb") as f:
                    f.write(serialization.to_bytes(frozen_host))
            with open(os.path.join(path, "manifest.json"), "w") as f:
                json.dump(manifest, f, indent=2)
            if params_copy is not None:
                # full config embedded, like the reference (bases.py:462)
                with open(os.path.join(path, "parameters.pkl"), "wb") as f:
                    pickle.dump(params_copy, f)

    if async_save:
        wait_for_async_save()  # never queue more than one
        _async_thread = threading.Thread(target=write, daemon=True)
        _async_thread.start()
    else:
        wait_for_async_save()
        write()


def load_checkpoint(path: str, *, state_template, frozen_template=None,
                    aux_template=None, best_template=None):
    """Restore (state, frozen, manifest[, aux via manifest key]).  Templates
    give the pytree structure (msgpack is structure-free, reference
    `load_state_dict` analogue).  `best_template`: structure of the saved
    best-model snapshot when it differs from the trainable tree (SSL
    trainers snapshot the feature-branch backbone only)."""
    wait_for_async_save()  # a pending async write must land first
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        raw = f.read()
    template = {
        "trainable": _to_host(state_template.trainable),
        "opt_state": _to_host(state_template.opt_state),
    }
    # optional keys must exist in the template to round-trip
    payload_probe = serialization.msgpack_restore(raw)
    if "best_trainable" in payload_probe:
        template["best_trainable"] = (
            _to_host(best_template) if best_template is not None
            else template["trainable"])
    if "aux_state" in payload_probe and aux_template is not None:
        template["aux_state"] = _to_host(aux_template)
    payload = serialization.from_bytes(template, raw)

    state = state_template.replace(
        trainable=payload["trainable"], opt_state=payload["opt_state"])
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    state = state.replace(
        step=jax.numpy.asarray(manifest["iters"], jax.numpy.int32))

    frozen = None
    fpath = os.path.join(path, "frozen.msgpack")
    if frozen_template is not None and os.path.exists(fpath):
        with open(fpath, "rb") as f:
            frozen = serialization.from_bytes(_to_host(frozen_template),
                                              f.read())
    best_trainable = payload.get("best_trainable")
    aux_state = payload.get("aux_state")
    return state, frozen, manifest, best_trainable, aux_state


def load_parameters(path: str) -> dict | None:
    p = os.path.join(path, "parameters.pkl")
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        return pickle.load(f)


def load_transfer_checkpoint(path: str):
    """Structure-free read of a checkpoint dir for transfer learning
    (reference `load_from_pretrained`, pretrained_loader.py:24-39, driven
    by `transfer_learning_params.pretrained_path` at wrapper init).
    Returns (trainable, frozen_or_None) as plain dict pytrees (numpy);
    prefers the best-model weights when the checkpoint carries them."""
    wait_for_async_save()
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    trainable = payload["trainable"]
    best = payload.get("best_trainable")
    if best:
        if isinstance(best, dict) and "backbone" in best:
            trainable = best            # full-trainable best (supervised)
        elif isinstance(best, dict) and "backbone" in trainable:
            # SSL best snapshot = the feature-branch BACKBONE subtree;
            # graft it into the trainable layout
            trainable = dict(trainable)
            trainable["backbone"] = best
    frozen = None
    fpath = os.path.join(path, "frozen.msgpack")
    if os.path.exists(fpath):
        with open(fpath, "rb") as f:
            frozen = serialization.msgpack_restore(f.read())
    return trainable, frozen


def adopt_pytree(template, loaded, where="checkpoint"):
    """Adoption with the reference's strictness (pretrained_loader.py:27-30:
    strict load, but UNEXPECTED checkpoint keys tolerated while MISSING
    keys are an error): every leaf of `template` must be found in `loaded`
    with a matching shape; extra keys in `loaded` (e.g. an SSL backbone's
    mask_token / LayerScale when fine-tuning without them) are ignored."""

    def walk(t, l, path):
        if isinstance(t, dict):
            if not isinstance(l, dict):
                raise ValueError(f"transfer {where}: {path or '<root>'} is "
                                 f"a dict in the model, {type(l)} loaded")
            missing = [k for k in t if k not in l]
            if missing:
                raise ValueError(
                    f"transfer {where}: missing keys at {path or '<root>'}:"
                    f" {missing}")
            return {k: walk(t[k], l[k], f"{path}.{k}") for k in t}
        if isinstance(t, (list, tuple)):
            if not isinstance(l, (list, tuple)) or len(l) != len(t):
                raise ValueError(
                    f"transfer {where}: sequence mismatch at {path}")
            out = [walk(ti, li, f"{path}[{i}]")
                   for i, (ti, li) in enumerate(zip(t, l))]
            return type(t)(out) if isinstance(t, tuple) else out
        l = np.asarray(l)
        t_shape = tuple(np.shape(t))
        if l.shape != t_shape:
            raise ValueError(
                f"transfer {where}: leaf shape mismatch at {path}: "
                f"{l.shape} vs {t_shape}")
        return l

    return walk(template, loaded, "")


def transfer_into(trainable, frozen, path: str, where="wrapper"):
    """Load a transfer checkpoint into (trainable, frozen).  Full strict
    adoption when the trainable structures match (supervised -> supervised);
    otherwise the 'backbone' subtrees transfer (SSL pre-train ->
    supervised fine-tune and vice versa — the reference's commented
    backbone-only path, pretrained_loader.py:33)."""
    t_ck, f_ck = load_transfer_checkpoint(path)
    try:
        trainable = adopt_pytree(trainable, t_ck, where=f"{where}.trainable")
        scope = "full"
    except ValueError:
        if "backbone" not in trainable or "backbone" not in t_ck:
            raise
        trainable = dict(trainable)
        trainable["backbone"] = adopt_pytree(
            trainable["backbone"], t_ck["backbone"],
            where=f"{where}.backbone")
        scope = "backbone-only"
    if f_ck is not None and frozen is not None:
        try:
            frozen = adopt_pytree(frozen, f_ck, where=f"{where}.frozen")
        except ValueError:
            if "backbone" in frozen and "backbone" in f_ck:
                frozen = dict(frozen)
                frozen["backbone"] = adopt_pytree(
                    frozen["backbone"], f_ck["backbone"],
                    where=f"{where}.frozen.backbone")
            else:
                raise
    print(f"Transfer-loaded {scope} weights from {path}")
    return trainable, frozen
