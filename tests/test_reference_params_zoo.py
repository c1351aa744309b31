"""Parse the reference's shipped params zoo VERBATIM (VERDICT r2 item 7).

Every YAML under /root/reference/params must load + merge through our config
system unchanged, every shipped inds-*.json must load through `load_indices`,
and our in-repo copies of the inds data files must be byte-identical to the
reference's.  (Reference layout: params/{finetune|pretrain}/dinov2/<ds>/vit_b/
{__common__.yml, apla.yml, inds-vit_b-rand_128.json} — see reference
main.py:241-253 for the merge semantics we mirror.)
"""
import glob
import json
import os

import numpy as np
import pytest

from apla_tpu.apla.core import AplaConfig, load_indices
from apla_tpu.data.transforms import build_transform
from apla_tpu.utils.config import load_merged_params

REF_PARAMS = "/root/reference/params"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_PARAMS), reason="reference params zoo not present")

ref_variants = sorted(
    p for p in glob.glob(f"{REF_PARAMS}/**/*.yml", recursive=True)
    if not p.endswith("__common__.yml"))
ref_inds = sorted(glob.glob(f"{REF_PARAMS}/**/inds-*.json", recursive=True))


@needs_ref
@pytest.mark.parametrize("path", ref_variants, ids=lambda p: os.path.relpath(p, REF_PARAMS))
def test_reference_variant_parses_and_merges(path):
    params = load_merged_params(path)
    # the merged config must carry the reference's full section set
    for section in ("dataset_params", "dataloader_params", "model_params",
                    "optimization_params", "training_params", "system_params",
                    "log_params"):
        assert section in params, f"{section} missing after merge of {path}"
    ad = params.model_params.adaptation
    assert ad["mode"] == "apla"
    ps = ad["params"]["partial_size"]
    assert ps == "full" or int(ps) > 0
    # every train/val/test transform dict must build through our factory
    for key in ("train_transforms", "val_transforms", "test_transforms"):
        td = dict(params.dataset_params[key])
        td.pop("advanced_aug", None)
        td.pop("advanced_aug_params", None)
        t = build_transform(td, mean=(0.485, 0.456, 0.406),
                            std=(0.229, 0.224, 0.225))
        assert len(t.transforms) > 0


@needs_ref
@pytest.mark.parametrize("path", ref_inds, ids=lambda p: os.path.relpath(p, REF_PARAMS))
def test_reference_inds_files_load(path):
    inds = load_indices(path, depth=12, dim=768)  # ViT-B geometry
    assert inds.shape == (12, 128)
    for row in inds:
        assert len(set(row.tolist())) == 128  # distinct channels per block


@needs_ref
def test_shipped_inds_match_reference_bytes():
    pairs = [
        ("finetune/dinov2/ImageNet/vit_b/inds-vit_b-rand_128.json",) * 2,
        ("pretrain/dinov2/ISIC2019/vit_b/inds-vit_b-rand_128.json",) * 2,
    ]
    for ref_rel, repo_rel in pairs:
        with open(os.path.join(REF_PARAMS, ref_rel), "rb") as f:
            ref_bytes = f.read()
        with open(os.path.join(REPO, "params", repo_rel), "rb") as f:
            repo_bytes = f.read()
        assert ref_bytes == repo_bytes, f"inds data drift: {repo_rel}"


def test_shipped_imagenet_config_builds_indices():
    """Our params/finetune/dinov2/ImageNet/vit_b/apla.yml must resolve its
    inds_path (relative to the repo root, where main.py runs) and produce the
    reference's fixed rank-128 indices."""
    path = os.path.join(REPO, "params/finetune/dinov2/ImageNet/vit_b/apla.yml")
    params = load_merged_params(path)
    p = params.model_params.adaptation["params"]
    assert int(p["partial_size"]) == 128
    inds_path = os.path.join(REPO, p["inds_path"])
    cfg = AplaConfig(partial_size=128, inds_path=inds_path)
    inds = load_indices(cfg.inds_path, depth=12, dim=768)
    with open(inds_path) as f:
        raw = json.load(f)
    np.testing.assert_array_equal(inds[0], np.asarray(raw["block_0"], np.int32))
    assert params.training_params.val_every == 0.2  # the ImageNet cadence
