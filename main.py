#!/usr/bin/env python
"""CLI entrypoint — surface parity with the reference `src/main.py`:

  python main.py --params_path params/.../apla.yml [--test] [--knn]
                 [--byol|--simsiam|--dino|--dinov2] [--batch_size N] ...

Differences by design: no `mp.spawn` process-per-GPU launcher — one
controller drives the whole TPU mesh (`launch.py` disappears); `--gpu`
becomes `--n_devices`.
"""

from __future__ import annotations

import argparse
import os


def parse_arguments():
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("--params_path", type=str, required=True)
    # train args (reference main.py:20-38)
    p.add_argument("--n_devices", type=int, help="mesh data-axis size")
    p.add_argument("--gpu", type=str,
                   help="reference-compat alias: comma list of device ids ('0,1') -> mesh data-axis size")
    p.add_argument("--param_sharding", type=str,
                   choices=["replicated", "fsdp", "tp", "pp"],
                   help="frozen-param placement policy over the mesh")
    p.add_argument("--tensor_parallel", type=int,
                   help="size of the mesh 'model' axis (Megatron-style TP "
                        "over attention heads / MLP; composes with "
                        "--param_sharding tp)")
    p.add_argument("--pipeline_parallel", type=int,
                   help="pipeline stages over the mesh 'model' axis "
                        "(GPipe-style collective pipelining of the block "
                        "trunk; mutually exclusive with --tensor_parallel)")
    p.add_argument("--pp_microbatches", type=int,
                   help="microbatches per device-local batch in the "
                        "pipeline schedule (default = #stages; bubble "
                        "fraction is (S-1)/(M+S-1))")
    p.add_argument("--sequence_parallel", action="store_true", default=False,
                   help="shard the token stream over the mesh model axis "
                        "(Megatron-style SP; requires --tensor_parallel N)")
    p.add_argument("--batch_size", type=int)
    p.add_argument("--val_every", type=float)
    p.add_argument("--log_every", type=int)
    p.add_argument("--mixed_precision", action="store_true", default=False)
    p.add_argument("--num_workers", type=str)
    p.add_argument("--prefetch_factor", type=str)
    p.add_argument("--lr", type=float)
    p.add_argument("--warmup", type=int)
    p.add_argument("--epochs", type=int)
    p.add_argument("--wd", type=float)
    p.add_argument("--dpr", type=float)   # drop path rate
    p.add_argument("--dr", type=float)    # drop rate
    p.add_argument("--adr", type=float)   # attn drop rate
    # general run args (reference main.py:40-48)
    p.add_argument("--model_name", type=str)
    p.add_argument("--pretrained_path", type=str)
    p.add_argument("--save_dir", type=str)
    p.add_argument("--debug", action="store_true", default=False)
    p.add_argument("--dry", action="store_true", default=False)
    p.add_argument("--job_id", type=str)
    p.add_argument("--offline", action="store_true", default=False)
    p.add_argument("--test", action="store_true", default=False)
    p.add_argument("--knn", action="store_true", default=False)
    # SSL args (reference main.py:50-54)
    p.add_argument("--byol", action="store_true", default=False)
    p.add_argument("--simsiam", action="store_true", default=False)
    p.add_argument("--dino", action="store_true", default=False)
    p.add_argument("--dinov2", action="store_true", default=False)
    return p.parse_args()


def update_params_from_args(params, args):
    """CLI overrides of YAML keys (reference main.py:58-158)."""
    if args.warmup:
        params.optimization_params.default.scheduler.params.LinearWarmup\
            .warmup_iters = args.warmup
    if args.epochs:
        params.training_params.epochs = args.epochs
    if args.num_workers:
        for ld in ("trainloader", "valloader", "testloader"):
            params.dataloader_params[ld].num_workers = int(args.num_workers)
    if args.prefetch_factor:
        pf = None if args.prefetch_factor == "None" else int(args.prefetch_factor)
        for ld in ("trainloader", "valloader", "testloader"):
            params.dataloader_params[ld].prefetch_factor = pf
    if args.pretrained_path:
        params.transfer_learning_params.pretrained_path = args.pretrained_path
    if args.lr:
        params.optimization_params.default.optimizer.params.lr = args.lr
    if args.wd is not None:
        params.optimization_params.default.optimizer.params.weight_decay = args.wd
    if args.dpr is not None:
        params.model_params.transformers_params.drop_path_rate = args.dpr
    if args.dr is not None:
        params.model_params.transformers_params.drop_rate = args.dr
    if args.adr is not None:
        params.model_params.transformers_params.attn_drop_rate = args.adr
    if args.n_devices:
        params.system_params.n_devices = args.n_devices
    elif args.gpu:  # reference --gpu "0,1,..." (main.py:113-116)
        params.system_params.n_devices = len(
            [g for g in str(args.gpu).split(",") if g.strip()])
    if args.param_sharding:
        params.system_params.param_sharding = args.param_sharding
    if args.tensor_parallel:
        params.system_params.tensor_parallel = args.tensor_parallel
    if args.pipeline_parallel:
        params.system_params.pipeline_parallel = args.pipeline_parallel
    if args.pp_microbatches:
        params.system_params.pp_microbatches = args.pp_microbatches
    if args.sequence_parallel:
        params.system_params.sequence_parallel = True
    if args.model_name:
        params.training_params.model_name = args.model_name
    if args.save_dir:
        params.training_params.save_dir = args.save_dir
    if args.batch_size:
        for ld in ("trainloader", "valloader", "testloader"):
            params.dataloader_params[ld].batch_size = args.batch_size
    if args.val_every is not None:
        params.training_params.val_every = args.val_every
    if args.log_every is not None:
        params.training_params.log_every = args.log_every
    if args.job_id is not None:
        params.training_params.job_id = args.job_id
    if args.mixed_precision:
        params.training_params.use_mixed_precision = True
    # dry/debug/offline flow through training_params so trainers (and their
    # loggers) see them at construction time, not after
    params.training_params.is_dry = args.dry
    params.training_params.is_debug = args.debug
    params.training_params.offline = args.offline
    if args.knn:
        assert args.test, "--test --knn should be used together"
        for ld in ("trainloader", "valloader", "testloader"):
            params.dataloader_params[ld].shuffle = False
        params.training_params.knn_eval = True
        params.model_params.freeze_backbone = True
    return params


def main(parameters, args):
    assert not (args.byol and args.simsiam), \
        "BYOL or SimSiam can be on but not both"
    if args.byol or args.simsiam or args.dino or args.dinov2:
        from apla_tpu.ssl import get_ssl_wrapper_and_trainer
        WrapperCls, TrainerCls = get_ssl_wrapper_and_trainer(args)
        wrapper = WrapperCls(parameters)
    else:
        from apla_tpu.wrapper import DefaultWrapper
        from apla_tpu.train.trainer import Trainer as TrainerCls
        wrapper = DefaultWrapper(parameters)
    wrapper.instantiate()

    trainer = TrainerCls(wrapper)

    if args.test or args.knn:
        assert args.pretrained_path, "--test requires --pretrained_path"
        trainer.test(chpt_path=args.pretrained_path)
    else:
        trainer.train()
        if getattr(trainer, "_preempted", False):
            # preemption saved a checkpoint and must exit promptly — do
            # not burn the grace period on a test-set evaluation
            print("Preempted: checkpoint saved, skipping test.")
            return
        if wrapper.is_supervised:
            trainer.test()


def maybe_init_multihost() -> bool:
    """Multi-host bootstrap (replaces the reference's mp.spawn/NCCL launch,
    launch.py:49-58, at pod scale): one process per host, same
    single-controller code — after `jax.distributed.initialize()`,
    jax.devices() is the GLOBAL device list the mesh builds over.

    Gated on APLA_MULTIHOST because initialize() blocks on the coordinator:
      APLA_MULTIHOST=1                      auto-detect (TPU pods / Slurm /
                                            Open MPI)
      APLA_MULTIHOST=host:port,N,i          explicit coordinator address,
                                            process count, process id (CPU
                                            clusters, tests)
    Returns True when the distributed runtime was initialised."""
    spec = os.environ.get("APLA_MULTIHOST")
    if not spec:
        return False
    import jax
    if "," in spec:
        addr, num, pid = spec.split(",")
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=int(num),
                                   process_id=int(pid))
    else:
        jax.distributed.initialize()
    return True


def run_cli():
    """Console entry point (pyproject [project.scripts])."""
    import jax

    maybe_init_multihost()

    # persistent compile cache: remote/TPU compiles are expensive; cached
    # recompiles are seconds.  Harmless on CPU.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from apla_tpu.utils.config import load_merged_params

    args = parse_arguments()
    print(f"USING PARAMS FROM PATH: {os.path.abspath(args.params_path)}")
    parameters = load_merged_params(args.params_path)
    parameters = update_params_from_args(parameters, args)
    main(parameters, args)


if __name__ == "__main__":
    run_cli()
