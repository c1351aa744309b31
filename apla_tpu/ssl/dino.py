"""DINO (v1) self-supervised training.

Reference: `src/self_supervised/DINO/` — student/teacher with DINOHead,
multi-crop (2 global + 8 local), centering + temperature sharpening loss
(`models.py:8-70`), EMA teacher, weight-decay cosine decay and last-layer
freeze for the first epoch (`trainer.py:4-58`).

TPU-native: one jitted step per (epoch-dependent) teacher temperature; the
centering EMA is part of the train state (the reference's async allreduce
center update collapses to a batch mean under single-controller SPMD).
Local and global crops run as two fixed-shape forwards (XLA static shapes;
cf. reference vit.py:371-385 per-resolution batching).
"""

from __future__ import annotations

from copy import deepcopy

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..ops.pallas_apla_attn import accum_scan_trace
from ..parallel.mesh import replicated_sharding
from ..train.optim import build_optimizer, set_lr
from ..train.schedules import cosine_with_warmup_table
from .byol import BYOLTrainer, BYOLWrapper, _encode
from .heads import dino_head_forward, init_dino_head


@struct.dataclass
class DINOTrainState:
    step: jnp.ndarray
    trainable: object     # {'backbone': ..., 'head': dino head}
    teacher: object       # EMA copies of trainable parts
    center: jnp.ndarray   # [1, out_dim] loss centering buffer
    opt_state: object


def make_teacher_temp_schedule(warmup_teacher_temp, teacher_temp,
                               warmup_epochs, nepochs):
    """Per-epoch teacher temperature (reference DINO/models.py:19-24)."""
    return np.concatenate([
        np.linspace(warmup_teacher_temp, teacher_temp, warmup_epochs),
        np.ones(max(nepochs - warmup_epochs, 0)) * teacher_temp,
    ]).astype(np.float32)


def dino_pair_ce(student_out, teacher_softmaxed, student_temp=0.1):
    """Mean CE over all (teacher chunk, student chunk) pairs, skipping
    same-view pairs (reference models.py:26-70 inner loop).  THE loss used
    by the train step; `dino_loss` wraps it with the centering EMA."""
    total, n_terms = 0.0, 0
    for iq, q in enumerate(teacher_softmaxed):
        q = jax.lax.stop_gradient(q)
        for v, s in enumerate(student_out):
            if v == iq:
                continue  # same-view pairs skipped
            logp = jax.nn.log_softmax(s / student_temp, axis=-1)
            total = total + jnp.mean(jnp.sum(-q * logp, axis=-1))
            n_terms += 1
    return jnp.asarray(total / n_terms, jnp.float32)


def dino_loss(student_out, teacher_out, center, teacher_temp,
              student_temp=0.1, center_momentum=0.9):
    """Cross-entropy between teacher (centered+sharpened) and student chunks
    (reference models.py:26-70).  student_out: list of [B, K] per crop;
    teacher_out: list of 2 global [B, K].  Returns (loss, new_center)."""
    t_sm = [jax.nn.softmax((t - center) / teacher_temp, axis=-1)
            for t in teacher_out]
    loss = dino_pair_ce(student_out, t_sm, student_temp=student_temp)
    # center EMA over the (globally batched) teacher outputs
    t_cat = jnp.concatenate(teacher_out, axis=0)
    batch_center = jnp.mean(t_cat, axis=0, keepdims=True)
    new_center = center * center_momentum + batch_center * (1 - center_momentum)
    return loss, jax.lax.stop_gradient(new_center)


class DINOWrapper(BYOLWrapper):
    is_supervised = False
    use_momentum = True
    strategy_name = "dino"  # drives both the host strategy and the
    #                         device-multicrop configs (BYOLWrapper hook)

    def init_model(self, seed: int = 0):
        from ..models.classifier import init_classifier
        self.vit_cfg = self.build_vit_config()
        apla_cfg = self.build_apla_config()
        dino_args = self.model_params.get("DINO", {})
        proj_size = int(dino_args.get("projection_size", 4096))
        key = jax.random.PRNGKey(seed)
        k_bb, k_head = jax.random.split(key)
        bb_trainable, bb_frozen = init_classifier(
            k_bb, self.vit_cfg, n_classes=1, apla_cfg=apla_cfg,
            freeze_backbone=bool(self.model_params.get("freeze_backbone",
                                                       False)))
        head = init_dino_head(k_head, self.vit_cfg.embed_dim, proj_size)
        trainable = {"backbone": bb_trainable.get("backbone", {}),
                     "head": head}
        if self.model_params.get("pretrained"):
            from ..utils.pretrained import maybe_load_pretrained_backbone
            t2 = {"backbone": trainable["backbone"]}
            f2 = {"backbone": bb_frozen["backbone"]} \
                if "backbone" in bb_frozen else {}
            t2, f2 = maybe_load_pretrained_backbone(
                t2, f2, self.model_params, self.vit_cfg)
            trainable["backbone"] = t2.get("backbone", {})
            if "backbone" in f2:
                bb_frozen["backbone"] = f2["backbone"]
        # transfer learning: adopt a previous run's checkpoint into
        # the student before the teacher copy (reference
        # DINO/wrappers.py pretrained_path block)
        tl_path = self.transfer_learning_params.get("pretrained_path")
        if tl_path:
            from ..train.checkpoint import transfer_into
            trainable, bb_frozen = transfer_into(
                trainable, bb_frozen, tl_path, where="dino")
        teacher = deepcopy(trainable)
        self.proj_size = proj_size
        self.dino_args = dino_args

        repl = replicated_sharding(self.mesh)
        from ..parallel.mesh import shard_params
        policy = self.system_params.get("param_sharding", "replicated")
        if policy == "pp":
            self.trainable = shard_params(trainable, self.mesh, policy="pp")
            self.teacher = shard_params(teacher, self.mesh, policy="pp")
        else:
            self.trainable = jax.device_put(trainable, repl)
            self.teacher = jax.device_put(teacher, repl)
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
        self.momentum_schedule = cosine_with_warmup_table(
            float(self.dino_args.get("moving_average_decay", 0.99)), 1.0,
            max(total_iters, 1))
        # wd cosine decay (reference DINO/trainer.py:8-11)
        self.wd_schedule = cosine_with_warmup_table(
            float(opt.optimizer.params.get("weight_decay", 1e-5)), 1e-4,
            max(total_iters, 1))
        self.teacher_temp_schedule = make_teacher_temp_schedule(
            float(self.dino_args.get("warmup_teacher_temp", 0.04)),
            float(self.dino_args.get("teacher_temp", 0.07)),
            int(self.dino_args.get("warmup_teacher_temp_epochs",
                                   min(30, self.training_params.epochs))),
            int(self.training_params.epochs))
        state = DINOTrainState(
            step=jnp.zeros((), jnp.int32), trainable=self.trainable,
            teacher=self.teacher,
            center=jnp.zeros((1, self.proj_size), jnp.float32),
            opt_state=self.tx.init(self.trainable))
        if self.system_params.get("param_sharding") == "pp":
            self.state = state  # trainable/teacher already stage-sharded
        else:
            self.state = jax.device_put(state,
                                        replicated_sharding(self.mesh))


def make_dino_train_step(vit_cfg, tx, n_global: int, n_local: int,
                         student_temp=0.1, center_momentum=0.9,
                         freeze_last_layer: bool = False,
                         device_crop_cfgs=None, accum_steps: int = 1,
                         pipeline=None, token_sharding=None):
    """Jitted DINO step.  `views` = (global_stack [G*B,H,W,C],
    local_stack [L*B,h,w,C] or None).  With `device_crop_cfgs`,
    `global_stack` is the raw uint8 batch and all crops are generated on
    device (data/device_augs.device_multicrop).

    `accum_steps`: the teacher (no grad) runs on the full batch — the
    centering EMA keeps exact full-batch reference semantics — while the
    student fwd+bwd scans over microbatches, accumulating grads before one
    optimizer/EMA update."""

    def train_step(state: DINOTrainState, frozen, global_stack, local_stack,
                   lr, wd, momentum, teacher_temp, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if device_crop_cfgs is not None:
            from ..data.device_augs import device_multicrop
            step_rng, crop_rng = jax.random.split(step_rng)
            global_stack, local_stack = device_multicrop(
                global_stack, crop_rng, device_crop_cfgs, n_global,
                compute_dtype=vit_cfg.compute_dtype)
        r_g, r_l = jax.random.split(step_rng)

        # teacher: globals only, full batch, no grad (reference
        # models.py:178-182); centering EMA over the full batch
        t_bb = jax.lax.stop_gradient(state.teacher.get("backbone"))
        t_head = jax.lax.stop_gradient(state.teacher["head"])
        emb_t = _encode(t_bb, frozen, global_stack, vit_cfg, None,
                        deterministic=True, pipeline=pipeline,
                        token_sharding=token_sharding)
        t_out = jax.lax.stop_gradient(dino_head_forward(emb_t, t_head))
        t_chunks = list(jnp.split(t_out, n_global))
        t_sm = [jax.lax.stop_gradient(
                    jax.nn.softmax((t - state.center) / teacher_temp, -1))
                for t in t_chunks]
        batch_center = jnp.mean(t_out, axis=0, keepdims=True)
        new_center = jax.lax.stop_gradient(
            state.center * center_momentum
            + batch_center * (1 - center_momentum))

        def student_loss(trainable, g_c, l_c, t_sm_c, rg, rl):
            # student: one fixed-shape forward per resolution
            emb_g = _encode(trainable.get("backbone"), frozen, g_c,
                            vit_cfg, rg, deterministic=False,
                            pipeline=pipeline, token_sharding=token_sharding)
            outs = dino_head_forward(emb_g, trainable["head"])
            student_out = list(jnp.split(outs, n_global))
            if l_c is not None:
                emb_l = _encode(trainable.get("backbone"), frozen, l_c,
                                vit_cfg, rl, deterministic=False,
                                pipeline=pipeline,
                                token_sharding=token_sharding)
                outs_l = dino_head_forward(emb_l, trainable["head"])
                student_out += list(jnp.split(outs_l, n_local))
            return dino_pair_ce(student_out, t_sm_c,
                                student_temp=student_temp)

        if accum_steps == 1:
            loss, grads = jax.value_and_grad(student_loss)(
                state.trainable, global_stack, local_stack, t_sm, r_g, r_l)
        else:
            B = global_stack.shape[0] // n_global
            assert B % accum_steps == 0, (B, accum_steps)
            mb = B // accum_steps

            def micro_split(x, n_crops):
                x = x.reshape((n_crops, accum_steps, mb) + x.shape[1:])
                x = jnp.moveaxis(x, 1, 0)
                return x.reshape((accum_steps, n_crops * mb) + x.shape[3:])

            g_m = micro_split(global_stack, n_global)
            l_m = (micro_split(local_stack, n_local)
                   if local_stack is not None else None)
            t_sm_m = [t.reshape((accum_steps, mb) + t.shape[1:])
                      for t in t_sm]
            rg_m = jax.random.split(r_g, accum_steps)
            rl_m = jax.random.split(r_l, accum_steps)
            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.trainable)

            def body(acc, xs):
                acc_loss, acc_g = acc
                if l_m is not None:
                    g_i, ts_i, rg_i, rl_i, l_i = xs
                else:
                    g_i, ts_i, rg_i, rl_i = xs
                    l_i = None
                with accum_scan_trace():
                    loss_i, g_i_grad = jax.value_and_grad(student_loss)(
                        state.trainable, g_i, l_i, list(ts_i), rg_i, rl_i)
                return (acc_loss + loss_i,
                        jax.tree.map(jnp.add, acc_g, g_i_grad)), None

            xs = (g_m, tuple(t_sm_m), rg_m, rl_m)
            if l_m is not None:
                xs = xs + (l_m,)
            (loss_sum, grads), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zero_g), xs)
            loss = loss_sum / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
        if freeze_last_layer:
            # cancel last-layer grads (reference DINO/trainer.py:84-89)
            grads = jax.tree_util.tree_map_with_path(
                lambda path, g: (jnp.zeros_like(g)
                                 if any(getattr(p, "key", None) == "last_v"
                                        for p in path) else g), grads)
        opt_state = set_lr(state.opt_state, lr, wd)
        updates, opt_state = tx.update(grads, opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        m = jnp.float32(momentum) if not hasattr(momentum, "astype") \
            else momentum.astype(jnp.float32)
        teacher = jax.tree.map(
            lambda t, s: t * m + s.astype(t.dtype) * (1.0 - m),
            state.teacher, trainable)
        new_state = state.replace(step=state.step + 1, trainable=trainable,
                                  teacher=teacher, center=new_center,
                                  opt_state=opt_state)
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    return jax.jit(train_step, donate_argnums=(0,))


class DINOTrainer(BYOLTrainer):
    """Reference DINOTrainer (`DINO/trainer.py`): BYOL loop + wd decay +
    last-layer freeze for epoch 1; feature extractor = TEACHER backbone
    (DINO_to_classifier, trainer.py:62-68)."""

    feature_branch = "teacher"

    def __init__(self, wrapper, freeze_last_for=1):
        super().__init__(wrapper, use_momentum=True)
        self.freeze_last_for = int(freeze_last_for)
        # crop counts from the strategy in effect (user file wins)
        from .multicrop import resolve_strategy_spec
        spec = resolve_strategy_spec(wrapper.parameters,
                                     wrapper.strategy_name)
        self.n_global = int(spec["n_global"])
        self.n_local = int(spec["n_local"])
        self._steps = {}

    def _get_step(self, freeze: bool):
        if freeze not in self._steps:
            self._steps[freeze] = make_dino_train_step(
                self.vit_cfg, self.wrapper.tx, self.n_global, self.n_local,
                freeze_last_layer=freeze,
                device_crop_cfgs=getattr(self.wrapper,
                                         "ssl_device_crop_cfgs", None),
                accum_steps=int(self.wrapper.training_params.get(
                    "accum_steps", 1)),
                pipeline=getattr(self.wrapper, "pipeline_spec", None),
                token_sharding=getattr(self.wrapper, "token_sharding",
                                       None))
        return self._steps[freeze]

    def _stack_views(self, batch):
        from ..parallel.mesh import shard_batch
        views = batch["image"]
        if not isinstance(views, list):
            # device-multicrop path: raw uint8 batch, crops built in-step
            return shard_batch(views, self.mesh), None
        global_stack = np.concatenate(views[:self.n_global], axis=0)
        local_views = views[self.n_global:]
        local_stack = (np.concatenate(local_views, axis=0)
                       if local_views else None)
        g = shard_batch(global_stack, self.mesh)
        l = shard_batch(local_stack, self.mesh) if local_stack is not None \
            else None
        return g, l

    def train(self):
        import time
        from ..utils.logging import cyan, gray
        if self.restore_session:
            self.load_session()
        loader = self.wrapper.dataloaders.trainloader
        steps_per_epoch = len(loader)
        val_interval = max(int(self.val_every * steps_per_epoch), 1)
        print(cyan(f"DINO training {self.model_name}: {self.epochs} epochs"))
        t0 = time.time()
        for epoch in range(self.epoch0, self.epochs):
            loader.set_epoch(epoch)
            self.epoch = epoch
            freeze = (epoch + 1) <= self.freeze_last_for
            step_fn = self._get_step(freeze)
            t_temp = float(self.wrapper.teacher_temp_schedule[
                min(epoch, len(self.wrapper.teacher_temp_schedule) - 1)])
            for batch in loader:
                lr = self.scheduler.lr(self.iters)
                wd = float(self.wrapper.wd_schedule[
                    min(self.iters, len(self.wrapper.wd_schedule) - 1)])
                mom = self.momentum_at(self.iters)
                g, l = self._stack_views(batch)
                self.state, m = step_fn(self.state, self.frozen, g, l,
                                        lr, wd, mom, t_temp, self.rng)
                self.iters += 1
                if self.iters % self.log_every == 0 or self.iters == 1:
                    loss = float(m["loss"])
                    self.logger.log({"train_loss": loss, "lr": lr,
                                     "wd": wd, "teacher_temp": t_temp},
                                    self.iters)
                    print(gray(f"it {self.iters:6d} ep {epoch:3d} "
                               f"loss {loss:.4f} lr {lr:.2e}"))
                if self.iters % val_interval == 0:
                    self.epoch_step(epoch)
                    self._last_val_iter = self.iters
        if getattr(self, "_last_val_iter", -1) != self.iters:
            self.epoch_step(self.epochs - 1)
        self.save_session(self.epochs - 1)
        self.logger.finish()
