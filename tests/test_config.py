import os

from apla_tpu.utils.config import (
    EDict, load_merged_params, load_param_file, update_nested_values,
)


def test_edict_dot_access():
    d = EDict({"a": {"b": 1}, "c": [{"d": 2}]})
    assert d.a.b == 1
    assert d.c[0].d == 2
    d.a.e = {"f": 3}
    assert d.a.e.f == 3


def test_update_nested_values_merge():
    base = {"x": 1, "sub": {"a": 1, "b": 2}}
    target = {"x": 9, "sub": {"b": 3, "c": 4}, "new": {"k": 5}}
    update_nested_values(base, target)
    assert base == {"x": 9, "sub": {"a": 1, "b": 3, "c": 4}, "new": {"k": 5}}


def test_update_nested_preserves_untouched_siblings():
    base = {"opt": {"lr": 0.1, "wd": 1e-5, "sched": {"type": ["A"], "p": 1}}}
    target = {"opt": {"lr": 0.2, "sched": {"type": ["A", "B"]}}}
    update_nested_values(base, target)
    assert base["opt"]["wd"] == 1e-5
    assert base["opt"]["sched"] == {"type": ["A", "B"], "p": 1}


def test_load_merged_params(tmp_path):
    common = tmp_path / "__common__.yml"
    common.write_text("model_params:\n  backbone_type: vit_base\n"
                      "optimization_params:\n  default:\n    optimizer:\n"
                      "      params:\n        lr: 0.0005\n        weight_decay: 1.0e-5\n")
    variant = tmp_path / "apla.yml"
    variant.write_text("model_params:\n  adaptation:\n    mode: apla\n"
                       "    params:\n      partial_size: 8\n"
                       "optimization_params:\n  default:\n    optimizer:\n"
                       "      params:\n        lr: 3.0e-5\n")
    params = load_merged_params(str(variant))
    assert params.model_params.backbone_type == "vit_base"
    assert params.model_params.adaptation.params.partial_size == 8
    assert params.optimization_params.default.optimizer.params.lr == 3.0e-5
    assert params.optimization_params.default.optimizer.params.weight_decay == 1.0e-5


def test_load_reference_style_json(tmp_path):
    p = tmp_path / "inds.json"
    p.write_text('{"block_0": [1, 2, 3]}')
    assert load_param_file(str(p)) == {"block_0": [1, 2, 3]}
