"""Supervised Trainer — the run loop.

Reference: `src/defaults/trainer.py` + `BaseTrainer` (`bases.py:379-502`).
Same behaviours (val_every fraction-of-epoch validation, best-model tracking
by the dataset's `target_metric`, grad clipping, checkpoint save/resume,
`--test` table, kNN eval) on a jitted hot loop:

- ONE compiled train step (fwd+bwd+clip+update); the host only streams data,
  computes the LR scalar and polls the loss at `log_every` (device->host
  transfers off the critical path — JAX async dispatch keeps the TPU busy).
- No DDP: the mesh shards the batch; XLA inserts the (APLA-sized) grad psum.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from ..parallel.mesh import pad_to_multiple, shard_batch
from ..utils.logging import cyan, gray, yellow
from .checkpoint import load_checkpoint, save_checkpoint
from .knn import build_feature_bank, knn_predict, knn_predict_multilabel
from .steps import make_embed_step, make_eval_step, make_train_step


class Trainer:
    def __init__(self, wrapper):
        self.wrapper = wrapper
        self.parameters = wrapper.parameters
        tp = wrapper.training_params
        self.epochs = int(tp.epochs)
        self.val_every = float(tp.get("val_every", 1.0))
        self.log_every = int(tp.get("log_every", 25))
        self.save_best_model = bool(tp.get("save_best_model", True))
        self.knn_eval = bool(tp.get("knn_eval", False))
        self.restore_session = bool(tp.get("restore_session", False))
        self.restore_only_model = bool(tp.get("restore_only_model", False))
        self.model_name = tp.get("model_name", "model")
        self.save_dir = tp.get("save_dir", "checkpoints")
        # dry/debug arrive via training_params (main.py sets them from the
        # CLI BEFORE construction, so the logger sees the right mode)
        self.is_debug = bool(tp.get("is_debug", False))
        self.is_dry = bool(tp.get("is_dry", False))

        self.mesh = wrapper.mesh
        self.vit_cfg = wrapper.vit_cfg
        self.frozen = wrapper.frozen
        self.state = wrapper.state
        self.scheduler = wrapper.scheduler
        self.criterion = wrapper.criterion
        self.target_metric = wrapper.model_params.target_metric
        self.n_classes = int(wrapper.model_params.n_classes)
        self.knn_nhood = int(wrapper.model_params.get("knn_nhood", 200))

        self.train_step = make_train_step(
            self.vit_cfg, wrapper.tx, self.criterion,
            device_aug_cfg=getattr(wrapper, "device_aug_cfg", None),
            accum_steps=int(tp.get("accum_steps", 1)),
            skip_nonfinite=bool(tp.get("skip_nonfinite_updates", False)),
            pipeline=getattr(wrapper, "pipeline_spec", None),
            token_sharding=getattr(wrapper, "token_sharding", None))
        self.eval_step = make_eval_step(
            self.vit_cfg, self.criterion,
            pipeline=getattr(wrapper, "pipeline_spec", None),
            token_sharding=getattr(wrapper, "token_sharding", None))
        self.embed_step = make_embed_step(
            self.vit_cfg,
            pipeline=getattr(wrapper, "pipeline_spec", None),
            token_sharding=getattr(wrapper, "token_sharding", None))

        self.iters = 0
        self.epoch0 = 0
        self.best_val_target = -np.inf
        self.best_trainable = None
        self.rng = jax.random.PRNGKey(int(tp.get("seed", 0)))

        from ..utils.logging import make_run_logger
        self.logger = make_run_logger(wrapper, self)

    # ------------------------------------------------------------------ #
    @property
    def checkpoint_path(self):
        return os.path.join(self.save_dir, self.model_name)

    def load_session(self):
        """Resume from the last checkpoint (reference bases.py:405-434)."""
        from .checkpoint import wait_for_async_save
        wait_for_async_save()
        path = self.checkpoint_path
        if not os.path.isdir(path):
            print(yellow(f"restore_session: no checkpoint at {path}"))
            return
        state, frozen, manifest, best_trainable, _ = load_checkpoint(
            path, state_template=self.state, frozen_template=self.frozen)
        if self.restore_only_model:
            # weights only (reference bases.py restore_only_model): keep
            # the FRESH optimizer state and step counter
            self.state = self.state.replace(trainable=state.trainable)
        else:
            self.state = state  # host arrays; jit re-places on first step
            self.iters = manifest["iters"]
            # derive the resume epoch from the iteration count: a
            # checkpoint written at exact completion then resumes as a
            # no-op instead of re-training the stored epoch index
            self.epoch0 = self.iters // max(
                len(self.wrapper.dataloaders.trainloader), 1)
            if manifest.get("best_val_target") is not None:
                self.best_val_target = manifest["best_val_target"]
            self.scheduler.load_state_dict(manifest.get("scheduler", {}))
        if frozen is not None:
            self.frozen = self._place_frozen(frozen)
        self.best_trainable = best_trainable
        print(cyan(f"Restored session from {path} at iter {self.iters}"))

    def save_session(self, epoch, verbose=False):
        if self.is_dry or self.is_debug:
            return
        save_checkpoint(
            self.checkpoint_path, state=self.state, frozen=self.frozen,
            epoch=epoch, parameters=self.parameters,
            best_val_target=(None if self.best_val_target == -np.inf
                             else self.best_val_target),
            best_trainable=self.best_trainable,
            extra={"scheduler": self.scheduler.state_dict()},
            async_save=bool(self.wrapper.training_params.get(
                "async_checkpoint", False)))
        if verbose:
            print(gray(f"Checkpoint saved to {self.checkpoint_path}"))

    # ------------------------------------------------------------------ #
    def _place_frozen(self, frozen):
        """Re-apply the configured param-sharding policy to frozen params
        loaded from a checkpoint (host arrays) — without this, resuming an
        fsdp run would silently replicate the frozen backbone and lose the
        per-chip memory saving."""
        from ..parallel.mesh import shard_params
        return shard_params(
            frozen, self.mesh,
            policy=self.wrapper.system_params.get("param_sharding",
                                                  "replicated"))

    def _device_batch(self, batch):
        n_devices = self.mesh.devices.size
        batch, _ = pad_to_multiple(batch, n_devices)
        return shard_batch(batch, self.mesh)

    def install_preemption_handler(self):
        """Graceful preemption: SIGTERM/SIGINT requests a checkpoint at the
        next step boundary (the reference has no preemption story — SURVEY
        §5; TPU pools preempt, so this framework saves and exits cleanly)."""
        import signal

        self._preempted = False

        def _handler(signum, frame):
            self._preempted = True

        try:
            signal.signal(signal.SIGTERM, _handler)
            signal.signal(signal.SIGINT, _handler)
        except ValueError:
            pass  # not the main thread (tests) — flag can be set directly

    def train(self):
        if self.restore_session:
            self.load_session()
        self.install_preemption_handler()
        loader = self.wrapper.dataloaders.trainloader
        steps_per_epoch = len(loader)
        val_interval = max(int(self.val_every * steps_per_epoch), 1)

        from ..utils.profiling import StepTimer
        timer = StepTimer(sync_every=self.log_every)
        # opt-in device profiling (SURVEY §5: the reference has none; here
        # `training_params.profile_dir` captures an xplane trace of steps
        # 10..20 for tensorboard/xprof — gated, some backends lack support)
        profile_dir = self.wrapper.training_params.get("profile_dir")
        profiling = False
        print(cyan(f"Training {self.model_name}: {self.epochs} epochs x "
                   f"{steps_per_epoch} steps, mesh={self.mesh.shape}"))
        t_start = time.time()
        images_seen = 0
        # mid-epoch resume: skip the batches of epoch0 that were already
        # trained (the loader's shuffle is deterministic in (seed, epoch),
        # so the remainder replays exactly the untrained tail)
        skip_first = self.iters % steps_per_epoch if self.iters else 0
        from ..data.loader import device_prefetch
        for epoch in range(self.epoch0, self.epochs):
            loader.set_epoch(epoch)
            skip = skip_first if epoch == self.epoch0 else 0
            # 1-deep device prefetch: batch N+1 ships to HBM while step N
            # computes — H2D off the critical path
            for bi, (batch, dbatch) in enumerate(
                    device_prefetch(loader, self._device_batch)):
                if bi < skip:
                    continue
                lr = self.scheduler.lr(self.iters)
                self.state, m = self.train_step(
                    self.state, self.frozen, dbatch, lr, self.rng)
                images_seen += batch["label"].shape[0]
                self.iters += 1
                timer.tick(sync_value=m["loss"])

                if profile_dir and self.iters == 10 and not profiling:
                    try:
                        jax.profiler.start_trace(profile_dir)
                        profiling = True
                    except Exception as e:
                        print(yellow(f"profiler unavailable: {e}"))
                        profile_dir = None
                elif profiling and self.iters == 20:
                    jax.profiler.stop_trace()
                    profiling = False
                    profile_dir = None
                    print(gray("profiler trace written"))

                if self.iters % self.log_every == 0:
                    loss = float(m["loss"])
                    gnorm = float(m["grad_norm"])
                    ips = images_seen / max(time.time() - t_start, 1e-9)
                    rec = {"train_loss": loss, "lr": lr, "grad_norm": gnorm,
                           "images_per_sec": ips}
                    rec.update(timer.summary())
                    from ..utils.profiling import device_memory_stats
                    rec.update(device_memory_stats())
                    self.logger.log(rec, self.iters)
                    print(gray(f"it {self.iters:6d} ep {epoch:3d} "
                               f"loss {loss:.4f} lr {lr:.2e} "
                               f"gnorm {gnorm:.2f} img/s {ips:.1f}"))

                if self.iters % val_interval == 0:
                    self.epoch_step(epoch)
                    self._last_val_iter = self.iters

                if self._preempted:
                    print(yellow("Preemption signal received — saving "
                                 f"checkpoint at iter {self.iters}"))
                    self.save_session(epoch, verbose=True)
                    from .checkpoint import wait_for_async_save
                    wait_for_async_save()  # a daemon-thread write killed
                    # at process exit would corrupt the checkpoint exactly
                    # when preemption needs it
                    self.logger.finish()
                    return

        if getattr(self, "_last_val_iter", -1) != self.iters:
            self.epoch_step(self.epochs - 1)
        self.save_session(self.epochs - 1, verbose=True)
        from .checkpoint import wait_for_async_save
        wait_for_async_save()
        self.logger.finish()

    # ------------------------------------------------------------------ #
    def epoch_step(self, epoch):
        """Validate + model selection + checkpoint (reference
        trainer.py:153-245)."""
        results = self.evaluate(self.wrapper.dataloaders.valloader,
                                prefix="val")
        val_target = results.get(f"val_{self.target_metric}")
        val_loss = results.get("val_loss")
        # plateau patience counts EPOCHS (reference steps ReduceLROnPlateau
        # once per steps_per_epoch) — with val_every < 1 this hook fires
        # several times per epoch, so feed the scheduler once per epoch
        if epoch != getattr(self, "_plateau_fed_epoch", -1):
            self.scheduler.epoch_feedback(val_target=val_target,
                                          val_loss=val_loss)
            self._plateau_fed_epoch = epoch
        if val_target is not None and val_target >= self.best_val_target:
            self.best_val_target = val_target
            if self.save_best_model:
                self.best_trainable = jax.tree.map(np.asarray,
                                                   self.state.trainable)
        self.logger.log(results, self.iters)
        print(cyan(f"[val @ it {self.iters}] " + " ".join(
            f"{k}={v}" for k, v in results.items())))
        self.save_session(epoch)

    def evaluate(self, loader, prefix="val", trainable=None):
        trainable = self.state.trainable if trainable is None else trainable
        metric = self.wrapper.metric_class(self.n_classes, mode=prefix)
        loss_sum, loss_count = 0.0, 0
        bs = loader.batch_size
        for batch in loader:
            n = batch["label"].shape[0]
            if n < bs:  # pad to the compiled shape (edge mode)
                batch, _ = pad_to_multiple(batch, bs)
            labels = batch["label"][:n]
            losses, logits = self.eval_step(trainable, self.frozen,
                                            self._device_batch(batch))
            # _device_batch may pad further (to a mesh multiple) — always
            # trim device outputs to the true sample count before averaging
            logits = np.asarray(logits)[:n]
            loss_sum += float(np.sum(np.asarray(losses)[:n]))
            loss_count += n
            metric.add_preds(logits, labels)
        results = metric.get_values()
        results[f"{prefix}_loss"] = round(loss_sum / max(loss_count, 1), 4)
        return results

    # ------------------------------------------------------------------ #
    def test(self, chpt_path=None):
        """Test-set evaluation with the best checkpoint (reference
        trainer.py:247-345); optional kNN eval."""
        trainable = self.state.trainable
        if chpt_path and os.path.isdir(chpt_path):
            state, frozen, _, best_trainable, _ = load_checkpoint(
                chpt_path, state_template=self.state,
                frozen_template=self.frozen)
            trainable = (best_trainable if best_trainable is not None
                         else state.trainable)
            if frozen is not None:
                self.frozen = self._place_frozen(frozen)
        elif self.best_trainable is not None:
            trainable = self.best_trainable

        results = self.evaluate(self.wrapper.dataloaders.testloader,
                                prefix="test", trainable=trainable)
        if self.knn_eval and self.wrapper.dataloaders.fbank_loader is not None:
            knn_results = self.knn_evaluate(
                self.wrapper.dataloaders.testloader, trainable, prefix="test")
            results.update(knn_results)

        print(cyan("TEST RESULTS"))
        width = max(len(k) for k in results)
        for k, v in results.items():
            print(f"  {k:<{width}} : {v}")
        self.logger.log(results, self.iters)
        return results

    def knn_evaluate(self, loader, trainable=None, prefix="val"):
        """kNN metrics via the feature bank (reference trainer.py:163-220 knn
        branch + BYOL/trainer.py:97-166)."""
        trainable = self.state.trainable if trainable is None else trainable
        fb_loader = self.wrapper.dataloaders.fbank_loader
        # pad short final batches to the compiled shape — an unpadded tail
        # batch would retrace/recompile the jitted embed step per shape
        feats, labels = build_feature_bank(
            self.embed_step, trainable, self.frozen, fb_loader,
            pad_batch=fb_loader.batch_size)
        knn_k = min(self.knn_nhood, len(labels))
        metric = self.wrapper.metric_class(self.n_classes,
                                           mode=f"knn_{prefix}")
        for batch in loader:
            n = batch["label"].shape[0]
            if n < loader.batch_size:
                batch, _ = pad_to_multiple(batch, loader.batch_size)
            emb = np.asarray(self.embed_step(trainable, self.frozen,
                                             batch["image"]))[:n]
            batch = {k: v[:n] for k, v in batch.items()}
            if self.wrapper.is_multiclass:
                scores = knn_predict(emb, feats, labels.astype(np.int32),
                                     knn_k=knn_k, knn_t=0.07,
                                     classes=self.n_classes)
                metric.raw = False  # scores are already probabilities
                metric.add_preds(np.asarray(scores), batch["label"])
            else:
                scores = knn_predict_multilabel(emb, feats,
                                                labels.astype(np.float32),
                                                knn_k=knn_k, knn_t=0.07)
                metric.add_preds(np.asarray(scores), batch["label"],
                                 using_knn=True)
        return metric.get_values()
