"""BYOL / SimSiam self-supervised training.

Reference: `src/self_supervised/BYOL/` — BYOL wraps online+target encoders
with BN-MLP heads and an EMA target (`models.py:77-160`); SimSiam reuses the
machinery with a negative-cosine loss and no momentum (`use_momentum=False`).
Evaluation is kNN-only on the ONLINE encoder's backbone
(`trainer.py:232-236` BYOL_to_classifier).

TPU-native: the whole step — both views through student, teacher views under
stop_gradient, loss, backward, optimizer, EMA teacher update (a tree_map
lerp, the reference's `torch._foreach`-free analogue of `ema_update`) — is
ONE jitted function.  Under APLA the teacher shares every frozen leaf with
the student, so teacher memory and EMA cost scale with the APLA rank.
"""

from __future__ import annotations

import os
from copy import deepcopy

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.classifier import _backbone_params
from ..models.vit import vit_features
from ..ops.pallas_apla_attn import accum_scan_trace
from ..parallel.mesh import replicated_sharding
from ..train.optim import build_optimizer, set_lr
from ..train.schedules import cosine_with_warmup_table
from ..wrapper import DefaultWrapper
from .heads import (byol_head_forward, init_byol_head, init_prediction_mlp,
                    prediction_mlp_forward)
from .multicrop import apply_augmentation_strategy


@struct.dataclass
class SSLTrainState:
    step: jnp.ndarray
    trainable: object        # student: backbone(+APLA split) / head / predictor
    teacher: object          # EMA copies of {backbone, head} trainable parts
    model_state: object      # BN running stats {student: ..., teacher: ...}
    opt_state: object


def byol_loss(preds, targets):
    """2 - 2*cos per view pair, summed then averaged
    (reference BYOL/models.py:7-20)."""
    total = 0.0
    for p, t in zip(preds, targets):
        p = p.astype(jnp.float32)
        t = t.astype(jnp.float32)
        p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-12)
        t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
        total = total + (2.0 - 2.0 * jnp.sum(p * t, axis=-1))
    return jnp.mean(total)


def simsiam_loss(preds, targets):
    """Negative cosine / 2 per pair, summed then averaged
    (reference BYOL/models.py:23-33)."""
    total = 0.0
    for p, t in zip(preds, targets):
        p = p.astype(jnp.float32)
        t = t.astype(jnp.float32)
        p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-12)
        t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
        total = total + (-jnp.sum(p * t, axis=-1) / 2.0)
    return jnp.mean(total)  # sum over pairs, mean over batch


class BYOLWrapper(DefaultWrapper):
    is_supervised = False
    use_momentum = True  # False => SimSiam
    strategy_name = "byol"

    def __init__(self, parameters, use_momentum=None):
        if use_momentum is not None:
            self.use_momentum = use_momentum
        super().__init__(parameters)

    def update_augmentation_strategy(self, parameters):
        return apply_augmentation_strategy(parameters, self.strategy_name)

    def init_dataloaders(self):
        loaders = super().init_dataloaders()
        self._setup_device_multicrop(loaders)
        return loaders

    def _setup_device_multicrop(self, loaders):
        """`dataset_params.device_augment`: host ships ONE resized uint8
        image; every crop of the multicrop strategy is generated inside
        the jitted step (data/device_augs.device_multicrop) — the host-PIL
        multi-pipeline otherwise bottlenecks TPU rates (measured 43.5 vs
        2475 img/s for the 10-crop dinov2 recipe, BASELINE.md)."""
        from .multicrop import resolve_strategy_spec
        self.ssl_device_crop_cfgs = None
        if not self.dataset_params.get("device_augment"):
            return
        from ..data.device_augs import crop_cfgs_from_strategy
        # a user strategy file wins, as on the host path — its crop
        # counts/sizes flow into the device configs too
        spec = resolve_strategy_spec(self.parameters, self.strategy_name)
        trainset = loaders.trainloader.dataset
        g = int(self.dataset_params.get("ssl_global_size")
                or spec["global_size"])
        l = self.dataset_params.get("ssl_local_size") or spec["local_size"]
        trainset.raw_mode = True
        trainset.raw_size = max(
            int(self.dataset_params.get("device_raw_size", 0))
            or int(g * 8 / 7), g)
        self.ssl_device_crop_cfgs = crop_cfgs_from_strategy(
            spec, trainset.mean, trainset.std, g_size=g, l_size=l)

    def init_model(self, seed: int = 0):
        from ..models.classifier import init_classifier
        self.vit_cfg = self.build_vit_config()
        apla_cfg = self.build_apla_config()
        key = jax.random.PRNGKey(seed)
        k_bb, k_head, k_pred = jax.random.split(key, 3)
        bb_trainable, bb_frozen = init_classifier(
            k_bb, self.vit_cfg, n_classes=1,  # fc head replaced by BYOL head
            apla_cfg=apla_cfg,
            freeze_backbone=bool(self.model_params.get("freeze_backbone",
                                                       False)))
        d = self.vit_cfg.embed_dim
        if self.use_momentum:  # BYOL defaults (models.py:92-99)
            proj_size, proj_hidden, pred_hidden, nlayers = 256, 4096, 4096, 2
        else:  # SimSiam defaults (models.py:100-106)
            proj_size, proj_hidden, pred_hidden, nlayers = 2048, 2048, 512, 3
        head_p, head_s = init_byol_head(k_head, d, proj_size, proj_hidden,
                                        num_layers=nlayers)
        pred_p, pred_s = init_prediction_mlp(k_pred, proj_size, proj_size,
                                             pred_hidden)
        student_bb = bb_trainable.get("backbone", {})
        trainable = {"backbone": student_bb, "head": head_p,
                     "predictor": pred_p}
        # teacher starts equal to student (reference asserts this,
        # models.py:118); frozen leaves shared via bb_frozen
        teacher = {"backbone": deepcopy(student_bb), "head": deepcopy(head_p)}
        model_state = {
            "student": {"head": head_s, "predictor": pred_s},
            "teacher": {"head": deepcopy(head_s)},
        }
        if self.model_params.get("pretrained"):
            from ..utils.pretrained import maybe_load_pretrained_backbone
            t2 = {"backbone": trainable["backbone"]}
            f2 = {"backbone": bb_frozen["backbone"]} if "backbone" in bb_frozen else {}
            t2, f2 = maybe_load_pretrained_backbone(
                t2, f2, self.model_params, self.vit_cfg)
            trainable["backbone"] = t2.get("backbone", {})
            if "backbone" in f2:
                bb_frozen["backbone"] = f2["backbone"]
            teacher["backbone"] = deepcopy(trainable["backbone"])

        # transfer learning: adopt a previous run's checkpoint into the
        # online encoder, then copy the WHOLE online network to the target
        # (reference BYOL/wrappers.py:30 load_state_dict(deepcopy(online)))
        # — a backbone-only teacher sync would leave the teacher head at
        # random init, breaking the teacher==student start invariant
        tl_path = self.transfer_learning_params.get("pretrained_path")
        if tl_path:
            from ..train.checkpoint import transfer_into
            trainable, bb_frozen = transfer_into(trainable, bb_frozen,
                                                 tl_path, where="byol")
            teacher["backbone"] = deepcopy(trainable["backbone"])
            teacher["head"] = deepcopy(trainable["head"])

        repl = replicated_sharding(self.mesh)
        from ..parallel.mesh import shard_params
        policy = self.system_params.get("param_sharding", "replicated")
        if policy == "pp":
            # stage-shard the student AND teacher stacked blocks (the EMA
            # update is elementwise, so placements are preserved)
            self.trainable = shard_params(trainable, self.mesh, policy="pp")
            self.teacher = shard_params(teacher, self.mesh, policy="pp")
        else:
            self.trainable = jax.device_put(trainable, repl)
            self.teacher = jax.device_put(teacher, repl)
        self.model_state = jax.device_put(model_state, repl)
        self.frozen = shard_params(bb_frozen, self.mesh, policy=policy)

    def init_optimization(self):
        opt = self.optimization_params.default
        self.tx = build_optimizer(
            opt.optimizer.type, dict(opt.optimizer.params), self.trainable,
            grad_clip=self.training_params.get("grad_clipping"))
        steps_per_epoch = len(self.dataloaders.trainloader)
        from ..train.schedules import LRScheduler
        self.scheduler = LRScheduler(
            opt.scheduler.type, opt.scheduler.get("params", {}),
            max_lr=opt.optimizer.params.lr,
            steps_per_epoch=steps_per_epoch,
            epochs=self.training_params.epochs)
        total_iters = steps_per_epoch * int(self.training_params.epochs)
        # EMA momentum cosine 0.99 -> 1.0 (reference models.py:131-134)
        self.momentum_schedule = cosine_with_warmup_table(
            0.99, 1.0, max(total_iters, 1))
        state = SSLTrainState(
            step=jnp.zeros((), jnp.int32), trainable=self.trainable,
            teacher=self.teacher, model_state=self.model_state,
            opt_state=self.tx.init(self.trainable))
        if self.system_params.get("param_sharding") == "pp":
            # trainable/teacher (and the optax zeros_like mirrors) are
            # already stage-sharded — a blanket replicate would undo it
            self.state = state
        else:
            self.state = jax.device_put(state,
                                        replicated_sharding(self.mesh))


def _encode(backbone_trainable, frozen, images, vit_cfg, rng, deterministic,
            pipeline=None, token_sharding=None, **kw):
    """Backbone features for one view, handling the APLA/full/frozen split.

    `pipeline`/`token_sharding`: the PP / SP placements (see
    models/vit.py) — threaded through every SSL trunk call so the
    parallelism knobs work for the SSL objectives too."""
    t = {"backbone": backbone_trainable} if backbone_trainable else {}
    params, apla_t = _backbone_params(t, frozen)
    return vit_features(params, images, vit_cfg, trainable=apla_t, rng=rng,
                        deterministic=deterministic, pipeline=pipeline,
                        token_sharding=token_sharding, **kw)


def make_byol_train_step(vit_cfg, tx, use_momentum: bool,
                         device_crop_cfgs=None, accum_steps: int = 1,
                         pipeline=None, token_sharding=None):
    """`accum_steps`: scan the whole per-batch computation over microbatches
    with one optimizer/EMA update at the end.  BatchNorm statistics in the
    BYOL heads are then per-micro — the same batch decoupling the
    reference's per-rank (non-synced) BatchNorm1d has under DDP."""
    loss_fn_pair = byol_loss if use_momentum else simsiam_loss

    def train_step(state: SSLTrainState, frozen, views, lr, momentum, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if device_crop_cfgs is not None:
            # `views` is the raw uint8 batch; build both views on device
            from ..data.device_augs import device_augment
            step_rng, crop_rng = jax.random.split(step_rng)
            views = [device_augment(views, jax.random.fold_in(crop_rng, i),
                                    cfg, compute_dtype=vit_cfg.compute_dtype)
                     for i, cfg in enumerate(device_crop_cfgs)]
        rngs = jax.random.split(step_rng, len(views))

        def make_loss_fn(mviews, mrngs, model_state):
            def loss_fn(trainable):
                ms = model_state["student"]
                # BN running stats thread through BOTH view forwards
                # (one update per forward, like torch BN) — passing the
                # original stats each time would discard view 0's update
                new_head_s, new_pred_s = ms["head"], ms["predictor"]
                preds = []
                for v, view in enumerate(mviews):
                    emb = _encode(trainable.get("backbone"), frozen, view,
                                  vit_cfg, mrngs[v], deterministic=False,
                                  pipeline=pipeline,
                                  token_sharding=token_sharding)
                    proj, new_head_s = byol_head_forward(
                        emb, trainable["head"], new_head_s, train=True)
                    pred, new_pred_s = prediction_mlp_forward(
                        proj, trainable["predictor"], new_pred_s,
                        train=True)
                    preds.append(pred)

                # target branch: teacher (BYOL) or student itself (SimSiam),
                # views reversed, no gradients (reference models.py:152-156)
                targets = []
                t_head_s = model_state["teacher"]["head"]
                if use_momentum:
                    t_bb = jax.lax.stop_gradient(state.teacher["backbone"])
                    t_head = jax.lax.stop_gradient(state.teacher["head"])
                else:
                    t_bb = jax.lax.stop_gradient(trainable.get("backbone"))
                    t_head = jax.lax.stop_gradient(trainable["head"])
                for view in mviews[::-1]:
                    emb = _encode(t_bb, frozen, view, vit_cfg, None,
                                  deterministic=True, pipeline=pipeline,
                                  token_sharding=token_sharding)
                    proj, t_head_s = byol_head_forward(emb, t_head,
                                                       t_head_s, train=True)
                    targets.append(jax.lax.stop_gradient(proj))

                loss = loss_fn_pair(preds, targets)
                new_ms = {"student": {"head": new_head_s,
                                      "predictor": new_pred_s},
                          "teacher": {"head": t_head_s}}
                return loss, new_ms
            return loss_fn

        if accum_steps == 1:
            (loss, new_model_state), grads = jax.value_and_grad(
                make_loss_fn(views, rngs, state.model_state),
                has_aux=True)(state.trainable)
        else:
            B = views[0].shape[0]
            assert B % accum_steps == 0, (B, accum_steps)
            mb = B // accum_steps
            views_m = tuple(v.reshape((accum_steps, mb) + v.shape[1:])
                            for v in views)
            # [accum, n_views, 2] per-micro per-view keys
            rngs_m = jnp.stack([jax.random.split(r, accum_steps)
                                for r in rngs], axis=1)
            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.trainable)

            def body(carry, xs):
                acc_loss, acc_g, ms = carry
                vs, rs = xs
                with accum_scan_trace():
                    (loss_i, new_ms), g_i = jax.value_and_grad(
                        make_loss_fn(list(vs), list(rs), ms),
                        has_aux=True)(state.trainable)
                return (acc_loss + loss_i,
                        jax.tree.map(jnp.add, acc_g, g_i), new_ms), None

            (loss_sum, grads, new_model_state), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zero_g,
                       state.model_state), (views_m, rngs_m))
            loss = loss_sum / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, grads)

        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)

        if use_momentum:
            # EMA teacher update over the trainable leaves only — frozen
            # leaves are shared, so EMA on them is the identity
            m = momentum.astype(jnp.float32) if hasattr(momentum, "astype") \
                else jnp.float32(momentum)
            teacher = jax.tree.map(
                lambda t, s: t * m + s.astype(t.dtype) * (1.0 - m),
                state.teacher,
                {"backbone": trainable.get("backbone", {}),
                 "head": trainable["head"]})
        else:
            teacher = state.teacher

        new_state = state.replace(step=state.step + 1, trainable=trainable,
                                  teacher=teacher,
                                  model_state=new_model_state,
                                  opt_state=opt_state)
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    return jax.jit(train_step, donate_argnums=(0,))


class BYOLTrainer:
    """SSL run loop (reference `BYOL/trainer.py`): train on multi-view
    batches, kNN-only validation on the feature extractor's backbone, EMA
    momentum from a cosine table."""

    # which branch the feature extractor uses (reference BYOL_to_classifier:
    # online encoder; DINO overrides to the teacher)
    feature_branch = "student"

    def __init__(self, wrapper, use_momentum=None):
        self.wrapper = wrapper
        self.parameters = wrapper.parameters
        tp = wrapper.training_params
        self.epochs = int(tp.epochs)
        self.val_every = float(tp.get("val_every", 1.0))
        self.log_every = int(tp.get("log_every", 25))
        self.save_best_model = bool(tp.get("save_best_model", True))
        self.restore_session = bool(tp.get("restore_session", False))
        self.model_name = tp.get("model_name", "ssl_model")
        self.save_dir = tp.get("save_dir", "checkpoints")
        self.is_debug = bool(tp.get("is_debug", False))
        self.is_dry = bool(tp.get("is_dry", False))

        self.mesh = wrapper.mesh
        self.vit_cfg = wrapper.vit_cfg
        self.frozen = wrapper.frozen
        self.state = wrapper.state
        self.scheduler = wrapper.scheduler
        self.n_classes = int(wrapper.model_params.n_classes)
        self.knn_nhood = int(wrapper.model_params.get("knn_nhood", 200))
        self.target_metric = wrapper.model_params.target_metric
        self.use_momentum = (wrapper.use_momentum if use_momentum is None
                             else use_momentum)

        self.train_step = make_byol_train_step(
            self.vit_cfg, wrapper.tx, self.use_momentum,
            device_crop_cfgs=getattr(wrapper, "ssl_device_crop_cfgs", None),
            accum_steps=int(tp.get("accum_steps", 1)),
            pipeline=getattr(wrapper, "pipeline_spec", None),
            token_sharding=getattr(wrapper, "token_sharding", None))
        self.iters = 0
        self.epoch0 = 0
        self.best_val_target = -np.inf
        self.best_trainable = None
        self.rng = jax.random.PRNGKey(int(tp.get("seed", 0)))
        from ..utils.logging import make_run_logger
        self.logger = make_run_logger(wrapper, self)

    # -------------------------------------------------------------- #
    def _feature_params(self, state=None):
        state = state or self.state
        bb = (state.teacher["backbone"]
              if (self.feature_branch == "teacher" and self.use_momentum)
              else state.trainable.get("backbone"))
        return bb

    def _embed(self, images):
        bb = self._feature_params()
        emb = _encode(bb if bb else None, self.frozen,
                      jnp.asarray(images), self.vit_cfg, None, True)
        emb = np.asarray(emb.astype(jnp.float32))
        return emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)

    def _device_views(self, batch):
        from ..parallel.mesh import shard_batch
        views = batch["image"]
        if not isinstance(views, list):
            # device-multicrop path: one raw uint8 batch; crops are built
            # inside the jitted step
            return shard_batch(views, self.mesh)
        return [shard_batch(v, self.mesh) for v in views]

    def momentum_at(self, it):
        table = self.wrapper.momentum_schedule
        return float(table[min(it, len(table) - 1)])

    # -------------------------------------------------------------- #
    def train(self):
        import time
        from ..utils.logging import cyan, gray
        if self.restore_session:
            self.load_session()
        loader = self.wrapper.dataloaders.trainloader
        steps_per_epoch = len(loader)
        val_interval = max(int(self.val_every * steps_per_epoch), 1)
        print(cyan(f"SSL training {self.model_name}: {self.epochs} epochs x "
                   f"{steps_per_epoch} steps"))
        t0 = time.time()
        images_seen = 0
        from ..data.loader import device_prefetch
        for epoch in range(self.epoch0, self.epochs):
            loader.set_epoch(epoch)
            self.epoch = epoch
            for batch, views in device_prefetch(loader, self._device_views):
                lr = self.scheduler.lr(self.iters)
                mom = self.momentum_at(self.iters)
                self.state, m = self.train_step(
                    self.state, self.frozen, views, lr, mom, self.rng)
                images_seen += batch["label"].shape[0]
                self.iters += 1
                if self.iters % self.log_every == 0 or self.iters == 1:
                    loss = float(m["loss"])
                    ips = images_seen / max(time.time() - t0, 1e-9)
                    self.logger.log({"train_loss": loss, "lr": lr,
                                     "ema_momentum": mom,
                                     "images_per_sec": ips}, self.iters)
                    print(gray(f"it {self.iters:6d} ep {epoch:3d} "
                               f"loss {loss:.4f} lr {lr:.2e} img/s {ips:.1f}"))
                if self.iters % val_interval == 0:
                    self.epoch_step(epoch)
                    self._last_val_iter = self.iters
        if getattr(self, "_last_val_iter", -1) != self.iters:
            self.epoch_step(self.epochs - 1)
        self.save_session(self.epochs - 1)
        self.logger.finish()

    def epoch_step(self, epoch):
        results = self.evaluate()
        val_target = results.get(f"knn_val_{self.target_metric}")
        if val_target is not None and val_target >= self.best_val_target:
            self.best_val_target = val_target
            if self.save_best_model:
                self.best_trainable = jax.tree.map(np.asarray,
                                                   self._feature_params())
        self.logger.log(results, self.iters)
        from ..utils.logging import cyan
        print(cyan(f"[knn val @ it {self.iters}] " + " ".join(
            f"{k}={v}" for k, v in results.items())))
        self.save_session(epoch)

    def evaluate(self, loader=None):
        """kNN-only validation (reference BYOL/trainer.py:97-166)."""
        from ..train.knn import knn_predict, knn_predict_multilabel
        fb_loader = self.wrapper.dataloaders.fbank_loader
        val_loader = loader or self.wrapper.dataloaders.valloader
        feats, labels = [], []
        for batch in fb_loader:
            feats.append(self._embed(batch["image"]))
            labels.append(np.asarray(batch["label"]))
        feats = np.concatenate(feats)
        labels = np.concatenate(labels)
        knn_k = min(self.knn_nhood, len(labels))
        metric = self.wrapper.metric_class(self.n_classes, mode="knn_val")
        for batch in val_loader:
            emb = self._embed(batch["image"])
            if self.wrapper.is_multiclass:
                scores = knn_predict(emb, feats, labels.astype(np.int32),
                                     knn_k=knn_k, knn_t=0.1,
                                     classes=self.n_classes)
                metric.raw = False
                metric.add_preds(np.asarray(scores), batch["label"])
            else:
                scores = knn_predict_multilabel(
                    emb, feats, labels.astype(np.float32),
                    knn_k=knn_k, knn_t=0.1)
                metric.add_preds(np.asarray(scores), batch["label"],
                                 using_knn=True)
        return metric.get_values()

    def _aux_state(self, state=None):
        """Every state field beyond (step, trainable, opt_state) — teacher,
        centering buffers, BN stats — persisted alongside the trainable tree
        (the reference saves the full module state_dict, covering these)."""
        import dataclasses
        state = state or self.state
        return {f.name: getattr(state, f.name)
                for f in dataclasses.fields(state)
                if f.name not in ("step", "trainable", "opt_state")}

    def save_session(self, epoch):
        if self.is_dry or self.is_debug:
            return
        from ..train.checkpoint import save_checkpoint
        save_checkpoint(
            os.path.join(self.save_dir, self.model_name),
            state=self.state, frozen=self.frozen, epoch=epoch,
            parameters=self.parameters,
            best_val_target=(None if self.best_val_target == -np.inf
                             else float(self.best_val_target)),
            best_trainable=self.best_trainable,
            aux_state=self._aux_state(),
            extra={"scheduler": self.scheduler.state_dict()},
            async_save=bool(self.wrapper.training_params.get(
                "async_checkpoint", False)))

    def _place_frozen(self, frozen):
        """Re-apply the param-sharding policy to checkpoint-loaded frozen
        params (see Trainer._place_frozen)."""
        from ..parallel.mesh import shard_params
        return shard_params(
            frozen, self.mesh,
            policy=self.wrapper.system_params.get("param_sharding",
                                                  "replicated"))

    def load_session(self):
        from ..train.checkpoint import load_checkpoint
        from ..utils.logging import cyan, yellow
        path = os.path.join(self.save_dir, self.model_name)
        if not os.path.isdir(path):
            print(yellow(f"restore_session: no checkpoint at {path}"))
            return
        state, frozen, manifest, best, aux = load_checkpoint(
            path, state_template=self.state, frozen_template=self.frozen,
            aux_template=self._aux_state(),
            best_template=self._feature_params())
        if aux is not None:
            state = state.replace(**aux)
        self.state = state
        if best is not None:
            self.best_trainable = best
        if frozen is not None:
            self.frozen = self._place_frozen(frozen)
        self.iters = manifest["iters"]
        self.epoch0 = manifest["epoch"]
        if manifest.get("best_val_target") is not None:
            self.best_val_target = manifest["best_val_target"]
        print(cyan(f"Restored SSL session from {path} at iter {self.iters}"))

    def test(self, chpt_path=None):
        """kNN evaluation on the test set, optionally from a checkpoint dir
        (reference trainer.test with --knn)."""
        if chpt_path and os.path.isdir(chpt_path):
            from ..train.checkpoint import load_checkpoint
            state, frozen, _, best, aux = load_checkpoint(
                chpt_path, state_template=self.state,
                frozen_template=self.frozen, aux_template=self._aux_state(),
                best_template=self._feature_params())
            if aux is not None:
                state = state.replace(**aux)
            self.state = state
            if best is not None:
                self.best_trainable = best
            if frozen is not None:
                self.frozen = self._place_frozen(frozen)
        # evaluate the best feature-branch snapshot (reference test() loads
        # the best checkpoint); falls back to the current state
        if self.best_trainable is not None:
            if self.feature_branch == "teacher" and self.use_momentum:
                teacher = dict(self.state.teacher)
                teacher["backbone"] = self.best_trainable
                self.state = self.state.replace(teacher=teacher)
            else:
                trainable = dict(self.state.trainable)
                trainable["backbone"] = self.best_trainable
                self.state = self.state.replace(trainable=trainable)
        results = self.evaluate(self.wrapper.dataloaders.testloader)
        from ..utils.logging import cyan
        print(cyan("SSL TEST RESULTS (kNN)"))
        for k, v in results.items():
            print(f"  {k} : {v}")
        return results
