"""Jitted supervised train / eval steps.

The reference's hot loop (`trainer.py:106-151` global_step) becomes ONE
compiled function: forward, loss, backward over the trainable pytree only,
clip, optimizer update.  Data-parallel gradient reduction is inserted by XLA
from the shardings — there is no DDP object and no explicit allreduce.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models.classifier import classifier_forward
from ..ops.pallas_apla_attn import accum_scan_trace
from .optim import set_lr
from .train_state import TrainState


def make_train_step(vit_cfg, tx, criterion: Callable,
                    device_aug_cfg=None, accum_steps: int = 1,
                    skip_nonfinite: bool = False,
                    pipeline=None, token_sharding=None) -> Callable:
    """Returns train_step(state, frozen, batch, lr, rng) -> (state, metrics).

    `frozen` is passed as an argument (not closed over) so the same compiled
    step serves any frozen-weight set and shardings stay explicit.
    `device_aug_cfg`: run the augmentation tail on device (batch['image']
    arrives as resized uint8) — fused by XLA into the step.
    `accum_steps`: split the batch into this many microbatches and run them
    through a `lax.scan`, averaging grads before ONE optimizer update —
    numerically the same update as the full batch, but per-image step cost
    on v5e RISES with batch (b64 1.77 ms/img vs b32 1.42, BASELINE.md
    round-2 sweep), so scanning microbatches is strictly faster for the
    same recipe semantics.

    `pipeline` (`parallel.pipeline.PipelineSpec`): run the ViT trunk as a
    collective pipeline over the mesh model axis (stage-sharded blocks +
    ppermute microbatch rotation) — `system_params.pipeline_parallel`.

    `token_sharding` (`NamedSharding`): sequence parallelism — the token
    stream is constrained to this sharding every layer so LN/MLP run
    token-parallel over the model axis — `system_params.sequence_parallel`
    (composes with tensor_parallel; Megatron TP+SP).

    `skip_nonfinite` (`training_params.skip_nonfinite_updates`): when the
    loss or any gradient is NaN/Inf, the optimizer update and state
    advance are suppressed for that step (params and optimizer state keep
    their previous values; `metrics['nonfinite']` flags it) — a bad batch
    cannot poison a long bf16 run.  The reference has no such guard
    (torch GradScaler only covers fp16 overflow).
    """

    def fwd_bwd(trainable, frozen, images, labels, step_rng):
        if device_aug_cfg is not None:
            from ..data.device_augs import device_augment
            step_rng, aug_rng = jax.random.split(step_rng)
            images = device_augment(images, aug_rng, device_aug_cfg,
                                    compute_dtype=vit_cfg.compute_dtype)

        def loss_fn(trainable):
            logits = classifier_forward(
                trainable, frozen, images, vit_cfg,
                rng=step_rng, deterministic=False, pipeline=pipeline,
                token_sharding=token_sharding)
            loss = criterion(logits, labels)
            return loss, logits

        return jax.value_and_grad(loss_fn, has_aux=True)(trainable)

    def train_step(state: TrainState, frozen, batch, lr, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        images, labels = batch["image"], batch["label"]

        if accum_steps == 1:
            (loss, logits), grads = fwd_bwd(state.trainable, frozen,
                                            images, labels, step_rng)
        else:
            B = images.shape[0]
            assert B % accum_steps == 0, (B, accum_steps)
            mb = B // accum_steps
            im = images.reshape((accum_steps, mb) + images.shape[1:])
            lb = labels.reshape((accum_steps, mb) + labels.shape[1:])
            rngs = jax.random.split(step_rng, accum_steps)

            def body(acc, xs):
                im_i, lb_i, rng_i = xs
                with accum_scan_trace():
                    (loss_i, logits_i), g_i = fwd_bwd(
                        state.trainable, frozen, im_i, lb_i, rng_i)
                acc_loss, acc_g = acc
                acc_g = jax.tree.map(jnp.add, acc_g, g_i)
                return (acc_loss + loss_i, acc_g), logits_i

            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.trainable)
            (loss_sum, grads), logits_mb = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zero_g),
                (im, lb, rngs))
            loss = loss_sum / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            logits = logits_mb.reshape((B,) + logits_mb.shape[2:])

        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm, "logits": logits}
        if skip_nonfinite:
            finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)

            def keep(new, old):
                return jax.tree.map(
                    lambda n, o: jnp.where(finite, n, o), new, old)
            trainable = keep(trainable, state.trainable)
            opt_state = keep(opt_state, state.opt_state)
            metrics["nonfinite"] = (~finite).astype(jnp.int32)
        new_state = state.replace(step=state.step + 1, trainable=trainable,
                                  opt_state=opt_state)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def _usable_pipeline(pipeline, batch_dim: int):
    """The pipeline schedule needs the per-device batch divisible by the
    microbatch count; eval/kNN batch shapes vary (padded final batches), so
    fall back to the plain trunk per compiled shape when it doesn't."""
    if pipeline is None:
        return None
    n_data = pipeline.mesh.shape[pipeline.data_axis]
    if batch_dim % (n_data * pipeline.n_micro) == 0:
        return pipeline
    return None


def make_eval_step(vit_cfg, criterion: Callable, pipeline=None,
                   token_sharding=None) -> Callable:
    """Returns eval_step(trainable, frozen, batch) -> (losses [B], logits).

    Losses are PER-SAMPLE so the host can trim padding (short final val
    batches are padded to the compiled shape) before averaging — a padded
    mean would bias val_loss, which drives ReduceLROnPlateau.

    `pipeline`/`token_sharding`: keep the training run's PP/SP placement in
    eval (without them a pp run would replicate eval compute over the model
    axis and re-gather the stage-sharded blocks every layer)."""

    def eval_step(trainable, frozen, batch):
        logits = classifier_forward(
            trainable, frozen, batch["image"], vit_cfg, deterministic=True,
            pipeline=_usable_pipeline(pipeline, batch["image"].shape[0]),
            token_sharding=token_sharding)
        losses = jax.vmap(lambda lg, lb: criterion(lg[None], lb[None]))(
            logits, batch["label"])
        return losses, logits

    return jax.jit(eval_step)


def make_embed_step(vit_cfg, pipeline=None, token_sharding=None) -> Callable:
    """Returns embed_step(trainable, frozen, images) -> L2-normalised
    embeddings — used by the kNN feature bank (reference trainer.py:347-393)."""

    def embed_step(trainable, frozen, images):
        _, emb = classifier_forward(
            trainable, frozen, images, vit_cfg,
            deterministic=True, return_embedding=True,
            pipeline=_usable_pipeline(pipeline, images.shape[0]),
            token_sharding=token_sharding)
        emb = emb.astype(jnp.float32)
        return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)

    return jax.jit(embed_step)
