"""Multi-label classification path: BCE loss + MultiLabel metrics end-to-end
(reference init_criteria BCEWithLogits branch, wrappers.py:315-321)."""

import os

import numpy as np

from apla_tpu.train.trainer import Trainer
from apla_tpu.utils.config import load_merged_params
from apla_tpu.wrapper import DefaultWrapper

PARAMS = os.path.join(os.path.dirname(__file__), "..", "params", "synthetic",
                      "vit_tiny", "apla.yml")


def test_multilabel_training(tmp_path):
    params = load_merged_params(PARAMS)
    params.dataset_params.dataset = "SyntheticMultiLabel"
    params.training_params.epochs = 1
    params.training_params.log_every = 1
    params.training_params.save_dir = str(tmp_path)
    params.dataset_params.synthetic_size = 128
    wrapper = DefaultWrapper(params)
    wrapper.instantiate()
    assert not wrapper.is_multiclass
    from apla_tpu.train.losses import bce_with_logits
    assert wrapper.criterion is bce_with_logits
    from apla_tpu.train.metrics import MultiLabelClassificationMetrics
    assert wrapper.metric_class is MultiLabelClassificationMetrics

    trainer = Trainer(wrapper)
    trainer.train()
    results = trainer.test()
    for key in ("test_mAP", "test_precision", "test_recall", "test_f1"):
        assert key in results
        assert np.isfinite(results[key])
