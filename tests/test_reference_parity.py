"""Cross-implementation parity against the ACTUAL reference model code.

test_torch_parity.py checks our importer against an in-test torch replica;
this file goes further: it imports the reference's own
`src/utils/transformers/vit.py` (read-only, executed as a numerical
oracle with its unavailable heavy deps stubbed), converts its live
state_dict through `convert_torch_vit_state_dict`, and asserts our
functional forward reproduces the reference forward on random inputs.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from apla_tpu.models.vit import ViTConfig, vit_features  # noqa: E402
from apla_tpu.utils.pretrained import convert_torch_vit_state_dict  # noqa: E402

REF_SRC = "/root/reference/src"


class _C:  # inert stand-in class for stubbed transforms
    def __init__(self, *a, **k):
        pass


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__file__ = f"<stub {name}>"
    # a real ModuleSpec: later imports of libraries that probe optional
    # deps via importlib (transformers checks wandb.__spec__) would
    # otherwise die on the spec-less stub ("ValueError: __spec__ is None")
    import importlib.machinery
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class EasyDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


@pytest.fixture(scope="module")
def ref_vit_module():
    import os
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference source not available")
    # the reference imports torchvision/timm/easydict at module scope;
    # only names needed at import time are stubbed — the model maths runs
    # the reference's real code
    if "torchvision" not in sys.modules:
        transforms = _stub(
            "torchvision.transforms", RandomApply=_C, RandomResizedCrop=_C,
            Compose=_C,
            InterpolationMode=types.SimpleNamespace(BICUBIC=3, BILINEAR=2))
        tv = _stub("torchvision", transforms=transforms)
        tv.__path__ = []
    sys.modules.setdefault("timm", _stub("timm"))
    sys.modules.setdefault("wandb", _stub("wandb"))
    if "easydict" not in sys.modules:
        _stub("easydict", EasyDict=EasyDict)
    sys.path.insert(0, REF_SRC)
    try:
        from utils.transformers import vit as ref_vit
    finally:
        sys.path.remove(REF_SRC)
    return ref_vit


@pytest.mark.slow
def test_forward_parity_vs_reference_vit_small(ref_vit_module):
    import jax.numpy as jnp

    torch.manual_seed(0)
    model = ref_vit_module.vit_small(
        patch_size=16, pretrained_type="dinov2", pre_img_size=224)
    model.eval()

    params = convert_torch_vit_state_dict(model.state_dict(), depth=12)
    cfg = ViTConfig(img_size=224, patch_size=16, embed_dim=384, depth=12,
                    num_heads=6, compute_dtype=jnp.float32)

    x = np.random.default_rng(0).standard_normal((2, 224, 224, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(vit_features(params, jnp.asarray(x), cfg))
    assert ref.shape == ours.shape == (2, 384)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_forward_parity_vs_reference_vit_base_layerscale(ref_vit_module):
    """ViT-B/14 with LayerScale=1.0 — the dinov2 fine-tune geometry."""
    import jax.numpy as jnp

    torch.manual_seed(1)
    kwargs = dict(patch_size=14, pretrained_type="dinov2",
                  pre_img_size=224)
    try:
        model = ref_vit_module.vit_base(layerscale=1.0, **kwargs)
        has_ls = any("ls1" in k or "gamma" in k
                     for k in model.state_dict())
    except TypeError:
        model = ref_vit_module.vit_base(**kwargs)
        has_ls = False
    model.eval()

    params = convert_torch_vit_state_dict(model.state_dict(), depth=12,
                                          has_layerscale=has_ls)
    cfg = ViTConfig(img_size=224, patch_size=14, embed_dim=768, depth=12,
                    num_heads=12, has_layerscale=has_ls,
                    layerscale_init=1.0, compute_dtype=jnp.float32)

    x = np.random.default_rng(1).standard_normal((2, 224, 224, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(vit_features(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def _load_ref_pkg_module(fullname, ref_src):
    """Import a reference submodule while BYPASSING parent-package
    __init__ chains (they pull dataset/torchvision code): synthesise the
    parent packages with only __path__ set."""
    import importlib
    import os
    parts = fullname.split(".")
    for i in range(1, len(parts)):
        pname = ".".join(parts[:i])
        if pname not in sys.modules:
            pkg = types.ModuleType(pname)
            pkg.__path__ = [os.path.join(ref_src, *parts[:i])]
            sys.modules[pname] = pkg
    return importlib.import_module(fullname)


@pytest.mark.slow
def test_forward_parity_vs_reference_dinov2_vit(ref_vit_module):
    """The DINOv2-style trunk (register tokens, iBOT mask token) vs the
    reference's own DinoVisionTransformer (dinov2_vits.py, xformers
    fallback path)."""
    import jax.numpy as jnp

    from apla_tpu.models.vit import ViTConfig, vit_features

    # block.py imports the reference's `apla` package at module scope
    sys.path.insert(0, REF_SRC)
    try:
        ref_mod = _load_ref_pkg_module(
            "self_supervised.dinov2.dinov2_vits", REF_SRC)
    finally:
        sys.path.remove(REF_SRC)

    torch.manual_seed(0)
    model = ref_mod.vit_small(patch_size=16, num_register_tokens=4,
                              img_size=224)
    model.eval()

    sd = model.state_dict()
    # the reference wraps blocks in chunks ('blocks.0.N.'); flatten, and
    # no LayerScale params exist at the default init_values=None
    sd = {k.replace("blocks.0.", "blocks."): v for k, v in sd.items()}
    has_ls = any(".ls1." in k or ".gamma" in k for k in sd)
    params = convert_torch_vit_state_dict(sd, depth=12,
                                          has_layerscale=has_ls)
    assert "register_tokens" in params
    cfg = ViTConfig(img_size=224, patch_size=16, embed_dim=384, depth=12,
                    num_heads=6, num_register_tokens=4,
                    has_layerscale=has_ls, compute_dtype=jnp.float32)

    x = np.random.default_rng(2).standard_normal((2, 224, 224, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        out = model.forward_features(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_cls = out["x_norm_clstoken"].numpy()
    ref_patches = out["x_norm_patchtokens"].numpy()

    tokens = np.asarray(vit_features(params, jnp.asarray(x), cfg,
                                     return_all_tokens=True))
    ours_cls = tokens[:, 0]
    ours_patches = tokens[:, 1 + cfg.num_register_tokens:]
    np.testing.assert_allclose(ours_cls, ref_cls, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours_patches, ref_patches,
                               rtol=2e-4, atol=2e-4)
