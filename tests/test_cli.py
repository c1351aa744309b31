"""CLI surface tests: flag -> config overrides (reference main.py:58-158)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import main as cli  # noqa: E402
from apla_tpu.utils.config import load_merged_params  # noqa: E402

PARAMS = os.path.join(os.path.dirname(__file__), "..", "params", "synthetic",
                      "vit_tiny", "apla.yml")


def parse(argv):
    old = sys.argv
    sys.argv = ["main.py"] + argv
    try:
        return cli.parse_arguments()
    finally:
        sys.argv = old


def test_overrides_applied():
    args = parse(["--params_path", PARAMS, "--lr", "0.01", "--wd", "0.0",
                  "--epochs", "7", "--batch_size", "32", "--warmup", "123",
                  "--dpr", "0.1", "--num_workers", "2", "--model_name", "x",
                  "--val_every", "0.25", "--log_every", "7"])
    params = load_merged_params(PARAMS)
    params = cli.update_params_from_args(params, args)
    opt = params.optimization_params.default
    assert opt.optimizer.params.lr == 0.01
    assert opt.optimizer.params.weight_decay == 0.0
    assert opt.scheduler.params.LinearWarmup.warmup_iters == 123
    assert params.training_params.epochs == 7
    assert params.training_params.model_name == "x"
    assert params.training_params.val_every == 0.25
    assert params.training_params.log_every == 7
    assert params.model_params.transformers_params.drop_path_rate == 0.1
    for ld in ("trainloader", "valloader", "testloader"):
        assert params.dataloader_params[ld].batch_size == 32
        assert params.dataloader_params[ld].num_workers == 2


def test_knn_requires_test():
    args = parse(["--params_path", PARAMS, "--knn"])
    params = load_merged_params(PARAMS)
    with pytest.raises(AssertionError):
        cli.update_params_from_args(params, args)


def test_knn_with_test_sets_flags():
    args = parse(["--params_path", PARAMS, "--test", "--knn"])
    params = load_merged_params(PARAMS)
    params = cli.update_params_from_args(params, args)
    assert params.training_params.knn_eval is True
    assert params.model_params.freeze_backbone is True
    assert params.dataloader_params.trainloader.shuffle is False


def test_wd_zero_is_respected():
    """--wd 0 must override (reference uses `is not None`, not truthiness)."""
    args = parse(["--params_path", PARAMS, "--wd", "0"])
    params = load_merged_params(PARAMS)
    params = cli.update_params_from_args(params, args)
    assert params.optimization_params.default.optimizer.params.weight_decay == 0


def test_yaml_perf_knobs_flow_to_vit_config(tmp_path):
    """transformers_params.gelu_tanh/remat and training_params.accum_steps
    reach the model config and the trainer step."""
    from apla_tpu.utils.config import load_merged_params
    from apla_tpu.wrapper import DefaultWrapper

    params = load_merged_params(PARAMS)
    params.model_params.transformers_params.gelu_tanh = True
    params.model_params.transformers_params.remat = "dots_batch"
    params.training_params.accum_steps = 2
    params.training_params.save_dir = str(tmp_path)
    w = DefaultWrapper(params)
    w.instantiate()
    assert w.vit_cfg.gelu_tanh is True
    assert w.vit_cfg.remat == "dots_batch"

    from apla_tpu.train.trainer import Trainer
    t = Trainer(w)
    # two training steps with accumulation: runs, loss finite
    loader = w.dataloaders.trainloader
    batch = next(iter(loader))
    dbatch = t._device_batch(batch)
    state, m = t.train_step(t.state, t.frozen, dbatch, 1e-3, t.rng)
    assert np.isfinite(float(m["loss"]))
    assert m["logits"].shape[0] == dbatch["label"].shape[0]


def test_gpu_alias_and_param_sharding():
    """--gpu '0,1' (reference compat) maps to n_devices=2; --param_sharding
    flows to system_params."""
    args = parse(["--params_path", PARAMS, "--gpu", "0,1"])
    params = load_merged_params(PARAMS)
    params = cli.update_params_from_args(params, args)
    assert params.system_params.n_devices == 2

    args = parse(["--params_path", PARAMS, "--n_devices", "4",
                  "--gpu", "0,1", "--param_sharding", "fsdp"])
    params = load_merged_params(PARAMS)
    params = cli.update_params_from_args(params, args)
    assert params.system_params.n_devices == 4  # explicit flag wins
    assert params.system_params.param_sharding == "fsdp"
