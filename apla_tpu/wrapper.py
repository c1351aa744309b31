"""DefaultWrapper — the DI container that builds model/data/optim/sched/loss
(reference `src/defaults/wrappers.py`).  The wrapper constructs, the trainer
consumes; the split is kept from the reference architecture.

TPU specifics: one process drives the whole mesh (no DDP/process-per-device);
`use_mixed_precision: true` selects bf16 compute (no GradScaler — bf16 needs
no loss scaling on TPU).
"""

from __future__ import annotations

from copy import deepcopy

import jax
import jax.numpy as jnp

from .apla.core import AplaConfig, count_params
from .data import datasets as datasets_mod
from .data.loader import DataLoader
from .models.classifier import init_classifier
from .models.vit import VIT_BUILDERS
from .parallel.mesh import make_mesh, replicated_sharding
from .train.losses import get_criterion
from .train.metrics import ClassificationMetrics, MultiLabelClassificationMetrics
from .train.optim import build_optimizer
from .train.schedules import LRScheduler
from .train.train_state import TrainState
from .utils.config import EDict


class DefaultWrapper:
    is_supervised = True

    def __init__(self, parameters: EDict):
        parameters = EDict(deepcopy(dict(parameters)))
        parameters = self.update_augmentation_strategy(parameters)
        self.parameters = parameters
        self.dataset_params = parameters.dataset_params
        self.dataloader_params = parameters.dataloader_params
        self.model_params = parameters.model_params
        self.optimization_params = parameters.optimization_params
        self.training_params = parameters.training_params
        self.system_params = parameters.get("system_params", EDict())
        self.log_params = parameters.get("log_params", EDict())
        self.transfer_learning_params = parameters.get(
            "transfer_learning_params", EDict())

    # overridden by SSL wrappers (reference wrappers.py:343-379)
    def update_augmentation_strategy(self, parameters):
        return parameters

    # ------------------------------------------------------------------ #
    def instantiate(self, seed: int = 0):
        self.dataloaders = self.init_dataloaders()
        trainset = self.dataloaders.trainloader.dataset
        self.task = trainset.task
        self.is_multiclass = trainset.is_multiclass
        n_classes = trainset.n_classes
        if not self.is_multiclass and n_classes <= 2:
            n_classes = 1  # binary multi-label (reference wrappers.py:57-60)
        self.model_params.n_classes = n_classes
        self.model_params.knn_nhood = trainset.knn_nhood
        self.model_params.target_metric = trainset.target_metric

        self.mesh = self.init_mesh()
        self.init_model(seed)
        self.init_optimization()
        self.criterion = get_criterion(self.task, self.is_multiclass)
        self.metric_class = (ClassificationMetrics if self.is_multiclass
                             else MultiLabelClassificationMetrics)

    # ------------------------------------------------------------------ #
    def init_dataloaders(self) -> EDict:
        DataSet = datasets_mod.get_dataset_class(self.dataset_params.dataset)
        trainset = DataSet(self.dataset_params, mode="train")
        valset = DataSet(self.dataset_params, mode="val")
        testset = DataSet(self.dataset_params, mode="test")

        fbank_loader = None
        if self.training_params.get("knn_eval") or not self.is_supervised:
            fbank_set = DataSet(self.dataset_params, mode="train")
            fbank_set.transform = valset.transform
            fbank_set.resizing = valset.resizing
            fbank_set.is_multi_crop = False
            fb_params = dict(self.dataloader_params["valloader"])
            fb_params["shuffle"] = False
            fbank_loader = DataLoader(fbank_set, **fb_params)

        if not self.is_supervised:
            trainset.num_augmentations = 2

        # device-side augmentation: host workers only decode+resize uint8;
        # the geometric/photometric tail runs on-device inside the train
        # step (data/device_augs.py)
        self.device_aug_cfg = None
        if self.dataset_params.get("device_augment") and self.is_supervised:
            from .data.device_augs import DeviceAugConfig
            tt = self.dataset_params.get("train_transforms", {})
            rrc = tt.get("RandomResizedCrop", {})
            cj = tt.get("ColorJitter", {})
            rs = tt.get("Resize", {})
            trainset.raw_mode = True
            trainset.raw_size = int(rs.get("height", 256)) \
                if rs.get("apply") else 256
            self.device_aug_cfg = DeviceAugConfig(
                out_size=int(rrc.get("size", 224)),
                crop_scale=tuple(rrc.get("scale", (0.8, 1.2))),
                hflip_p=float(tt.get("HorizontalFlip", {}).get("p", 0.5)
                              if tt.get("HorizontalFlip", {}).get("apply")
                              else 0.0),
                jitter_p=float(cj.get("p", 0.8) if cj.get("apply") else 0.0),
                brightness=float(cj.get("brightness", 0.2)),
                contrast=float(cj.get("contrast", 0.2)),
                saturation=float(cj.get("saturation", 0.1)),
                hue=float(cj.get("hue", 0.0)),
                grayscale_p=float(
                    tt.get("RandomGrayscale", {}).get("p", 0.0)
                    if tt.get("RandomGrayscale", {}).get("apply") else 0.0),
                mean=tuple(trainset.mean), std=tuple(trainset.std))

        # mixup/cutmix collate (reference wrappers.py:138-141 advanced_aug)
        train_collate = None
        tt = self.dataset_params.get("train_transforms")
        if isinstance(tt, dict) and tt.get("advanced_aug"):
            from .data.mixup import AdvancedAugCollate
            aug_params = dict(tt.get("advanced_aug_params", {}))
            aug_params["num_classes"] = trainset.n_classes
            train_collate = AdvancedAugCollate(aug_params)

        trainloader = DataLoader(trainset,
                                 collate_fn=train_collate,
                                 **self.dataloader_params["trainloader"])
        testloader = DataLoader(testset, **self.dataloader_params["testloader"])
        if len(valset) > 0:
            valloader = DataLoader(valset, **self.dataloader_params["valloader"])
        else:
            valloader = testloader
        return EDict(trainloader=trainloader, valloader=valloader,
                     testloader=testloader, fbank_loader=fbank_loader)

    # ------------------------------------------------------------------ #
    def init_mesh(self):
        n_devices = self.system_params.get("n_devices")  # None => all
        n_model = int(self.system_params.get("tensor_parallel", 1) or 1)
        n_pp = int(self.system_params.get("pipeline_parallel", 1) or 1)
        self.pipeline_spec = None
        self.token_sharding = None
        if (n_pp > 1 or self.system_params.get("sequence_parallel")) \
                and not getattr(self, "consumes_pipeline", True):
            # wrappers whose train steps do not take the PP/SP placements
            # must reject the knobs — a silent pass-through would
            # replicate all compute over the model axis
            raise ValueError(
                f"pipeline_parallel / sequence_parallel are not supported "
                f"by {type(self).__name__} (its step doesn't consume the "
                "placement) — use param_sharding fsdp for memory")
        if n_pp > 1:
            # pipeline stages live on the mesh 'model' axis (mutually
            # exclusive with tensor parallelism over the same axis)
            assert n_model == 1, \
                "pipeline_parallel and tensor_parallel both use the mesh " \
                "model axis — pick one"
            if self.system_params.get("sequence_parallel"):
                raise ValueError(
                    "sequence_parallel composes with tensor_parallel, not "
                    "pipeline_parallel — pick one of PP or TP(+SP)")
            policy = self.system_params.get("param_sharding")
            if policy is None:
                self.system_params["param_sharding"] = "pp"
                print("pipeline_parallel > 1: defaulting param_sharding "
                      "to 'pp'")
            elif policy != "pp":
                print(f"WARNING: pipeline_parallel={n_pp} with "
                      f"param_sharding '{policy}' — the pipeline reshards "
                      "the stacked blocks every step (use 'pp')")
            total = n_devices or len(jax.devices())
            assert total % n_pp == 0, (total, n_pp)
            mesh = make_mesh(n_data=total // n_pp, n_model=n_pp)
            from .parallel.pipeline import PipelineSpec
            n_micro = int(self.system_params.get("pp_microbatches",
                                                 n_pp) or n_pp)
            self.pipeline_spec = PipelineSpec(mesh, n_pp, n_micro)
            return mesh
        if n_model > 1:
            # a model axis without the 'tp' placement would replicate all
            # compute across it (throughput silently halved) — default the
            # placement policy to 'tp' when the user left it UNSET, and
            # warn (without overriding) when another policy was explicit
            policy = self.system_params.get("param_sharding")
            if policy is None:
                self.system_params["param_sharding"] = "tp"
                print("tensor_parallel > 1: defaulting param_sharding "
                      "to 'tp'")
            elif policy != "tp":
                print(f"WARNING: tensor_parallel={n_model} with "
                      f"param_sharding '{policy}' replicates all compute "
                      "across the model axis (use 'tp' unless this is a "
                      "numerics A/B)")
            # data axis takes the rest; n_devices (if given) is the TOTAL
            total = n_devices or len(jax.devices())
            assert total % n_model == 0, (total, n_model)
            mesh = make_mesh(n_data=total // n_model, n_model=n_model)
            if self.system_params.get("sequence_parallel"):
                # Megatron-style SP composing with TP: the token stream is
                # constrained token-sharded over the model axis each layer
                # (LN/MLP token-parallel; XLA gathers around attention)
                from jax.sharding import NamedSharding, PartitionSpec as P
                self.token_sharding = NamedSharding(
                    mesh, P("data", "model", None))
                print("sequence_parallel: token stream sharded over the "
                      "model axis")
            return mesh
        assert not self.system_params.get("sequence_parallel"), \
            "sequence_parallel needs a model axis — set tensor_parallel N"
        return make_mesh(n_data=n_devices)

    def build_vit_config(self):
        mp = self.model_params
        tp = EDict(mp.get("transformers_params", EDict()))
        builder = VIT_BUILDERS[mp.backbone_type]
        block_conf = tp.get("block_conf", EDict())
        img_size = tp.get("img_size", [224])
        img_size = img_size[0] if isinstance(img_size, (list, tuple)) else img_size
        use_mp = self.training_params.get("use_mixed_precision", True)
        if tp.get("fused_vmem_mb"):
            # config-surfaced form of the APLA_FUSED_VMEM_MB env knob (the
            # fused kernel's fit gate reads the env at call time); 15 +
            # accum_steps 8 makes the fused kernel a ViT-giant win
            # (BASELINE.md round-3e)
            import os
            os.environ["APLA_FUSED_VMEM_MB"] = str(tp["fused_vmem_mb"])
        return builder(
            img_size=int(img_size),
            patch_size=int(tp.get("patch_size", 16)),
            drop_rate=float(tp.get("drop_rate", 0.0)),
            attn_drop_rate=float(tp.get("attn_drop_rate", 0.0)),
            drop_path_rate=float(tp.get("drop_path_rate", 0.0)),
            has_layerscale=bool(block_conf.get("has_layerscale", False)),
            layerscale_init=float(block_conf.get("layerscale_init_values", 1e-5)),
            num_register_tokens=int(tp.get("num_register_tokens", 0)),
            compute_dtype=jnp.bfloat16 if use_mp else jnp.float32,
            use_flash=bool(tp.get("is_memory_efficient", False)),
            use_fused_apla=bool(tp.get("use_fused_apla", False)),
            # TPU perf knobs (see BASELINE.md round-2 step anatomy):
            # tanh-approx GELU (flax default; exact erf costs ~12% step
            # time) and the remat policy
            gelu_tanh=bool(tp.get("gelu_tanh", False)),
            remat=tp.get("remat", "dots"),
        )

    def build_apla_config(self):
        adaptation = self.model_params.get("adaptation")
        if not adaptation or adaptation.get("mode") != "apla":
            return None
        p = adaptation.get("params", EDict())
        return AplaConfig(partial_size=p.get("partial_size", 32),
                          inds_path=p.get("inds_path"),
                          seed=int(p.get("seed", 0)))

    def init_model(self, seed: int = 0):
        self.vit_cfg = self.build_vit_config()
        apla_cfg = self.build_apla_config()
        key = jax.random.PRNGKey(seed)
        trainable, frozen = init_classifier(
            key, self.vit_cfg, int(self.model_params.n_classes),
            apla_cfg=apla_cfg,
            freeze_backbone=bool(self.model_params.get("freeze_backbone",
                                                       False)))
        # pretrained backbone import (reference vit builders download
        # dinov2 checkpoints; here a local .pth is converted if provided)
        if self.model_params.get("pretrained"):
            from .utils.pretrained import maybe_load_pretrained_backbone
            trainable, frozen = maybe_load_pretrained_backbone(
                trainable, frozen, self.model_params, self.vit_cfg)
        # transfer learning: strict checkpoint adoption at wrapper init
        # (reference wrappers.py:177-179 load_from_pretrained)
        tl_path = self.transfer_learning_params.get("pretrained_path")
        if tl_path:
            from .train.checkpoint import transfer_into
            trainable, frozen = transfer_into(trainable, frozen, tl_path,
                                              where="supervised")
        # optional W8A8 quantization of the frozen backbone (APLA's frozen
        # weights take no gradients, so int8 costs nothing downstream;
        # measured int8 matmul = 1.54x bf16 on v5e)
        if self.model_params.get("quantize_frozen") and "backbone" in frozen:
            from .ops.quant import quantize_frozen_backbone
            frozen = quantize_frozen_backbone(frozen)
            print("Quantized frozen backbone kernels to int8 (W8A8)")

        # place over the mesh: trainable always replicated (tiny under
        # APLA; XLA psums its grads), frozen per the sharding policy —
        # 'fsdp' shards the frozen backbone over the data axis, cutting
        # per-chip HBM by the mesh size (ZeRO-3-style; see parallel/mesh.py)
        from .parallel.mesh import shard_params
        policy = self.system_params.get("param_sharding", "replicated")
        if policy == "pp":
            # pipeline: the TRAINABLE stacked blocks are stage-sharded too
            # (each stage owns its layers' APLA slices + optimizer state)
            self.trainable = shard_params(trainable, self.mesh, policy="pp")
        else:
            self.trainable = jax.device_put(trainable,
                                            replicated_sharding(self.mesh))
        self.frozen = shard_params(frozen, self.mesh, policy=policy)
        if policy != "replicated":
            print(f"Frozen params placed with policy '{policy}' over "
                  f"mesh {dict(self.mesh.shape)}")
        n_train = count_params(self.trainable)
        n_total = n_train + count_params(self.frozen)
        print(f"Model: {self.model_params.backbone_type} "
              f"trainable={n_train:,} / total={n_total:,} "
              f"({100.0 * n_train / max(n_total, 1):.2f}%)")

    def init_optimization(self):
        opt = self.optimization_params.default
        self.tx = build_optimizer(
            opt.optimizer.type, dict(opt.optimizer.params), self.trainable,
            grad_clip=self.training_params.get("grad_clipping"))
        steps_per_epoch = len(self.dataloaders.trainloader)
        self.scheduler = LRScheduler(
            opt.scheduler.type, opt.scheduler.get("params", {}),
            max_lr=opt.optimizer.params.lr,
            steps_per_epoch=steps_per_epoch,
            epochs=self.training_params.epochs)
        state = TrainState.create(self.trainable, self.tx)
        if self.system_params.get("param_sharding") == "pp":
            # trainable (and its optax mirrors, built with zeros_like) are
            # already stage-sharded — a blanket replicate would undo it
            self.state = state
        else:
            self.state = jax.device_put(state, replicated_sharding(self.mesh))

    @property
    def is_rank0(self):
        return jax.process_index() == 0
