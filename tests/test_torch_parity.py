"""PyTorch checkpoint import fidelity (SURVEY §7 hard part #2).

Builds a DINO-style torch ViT in-test (same maths as the reference
`src/utils/transformers/vit.py`: pre-norm blocks, exact GELU, LN eps 1e-6,
packed qkv, optional LayerScale), exports its state_dict through
`convert_torch_vit_state_dict`, and checks our functional forward matches
torch to float32 tolerance."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from apla_tpu.models.vit import ViTConfig, vit_features  # noqa: E402
from apla_tpu.utils.pretrained import convert_torch_vit_state_dict  # noqa: E402


class TorchBlock(nn.Module):
    def __init__(self, dim, heads, layerscale=None):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, dim * 4)
        self.fc2 = nn.Linear(dim * 4, dim)
        self.heads = heads
        self.ls1 = nn.Parameter(layerscale * torch.ones(dim)) \
            if layerscale else None
        self.ls2 = nn.Parameter(layerscale * torch.ones(dim)) \
            if layerscale else None

    def attn(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        a = a.softmax(dim=-1)
        x = (a @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)

    def forward(self, x):
        y = self.attn(self.norm1(x))
        if self.ls1 is not None:
            y = y * self.ls1
        x = x + y
        y = self.fc2(nn.functional.gelu(self.fc1(self.norm2(x))))
        if self.ls2 is not None:
            y = y * self.ls2
        return x + y


class TorchViT(nn.Module):
    def __init__(self, img=32, patch=8, dim=64, depth=2, heads=4,
                 layerscale=None):
        super().__init__()
        self.patch = nn.Conv2d(3, dim, patch, patch)
        n = (img // patch) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchBlock(dim, heads, layerscale) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.patch(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]

    def dinov2_state_dict(self):
        """Re-key to the dinov2/DINO naming our converter expects."""
        sd = {}
        sd["cls_token"] = self.cls_token
        sd["pos_embed"] = self.pos_embed
        sd["patch_embed.proj.weight"] = self.patch.weight
        sd["patch_embed.proj.bias"] = self.patch.bias
        sd["norm.weight"] = self.norm.weight
        sd["norm.bias"] = self.norm.bias
        for i, b in enumerate(self.blocks):
            p = f"blocks.{i}."
            sd[p + "norm1.weight"] = b.norm1.weight
            sd[p + "norm1.bias"] = b.norm1.bias
            sd[p + "norm2.weight"] = b.norm2.weight
            sd[p + "norm2.bias"] = b.norm2.bias
            sd[p + "attn.qkv.weight"] = b.qkv.weight
            sd[p + "attn.qkv.bias"] = b.qkv.bias
            sd[p + "attn.proj.weight"] = b.proj.weight
            sd[p + "attn.proj.bias"] = b.proj.bias
            sd[p + "mlp.fc1.weight"] = b.fc1.weight
            sd[p + "mlp.fc1.bias"] = b.fc1.bias
            sd[p + "mlp.fc2.weight"] = b.fc2.weight
            sd[p + "mlp.fc2.bias"] = b.fc2.bias
            if b.ls1 is not None:
                sd[p + "ls1.gamma"] = b.ls1
                sd[p + "ls2.gamma"] = b.ls2
        return sd


@pytest.mark.parametrize("layerscale", [None, 1.0])
def test_forward_parity_with_torch(layerscale):
    torch.manual_seed(0)
    model = TorchViT(layerscale=layerscale).eval()
    params = convert_torch_vit_state_dict(
        model.dinov2_state_dict(), depth=2,
        has_layerscale=layerscale is not None)
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, has_layerscale=layerscale is not None,
                    compute_dtype=jnp.float32)

    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(vit_features(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_apla_split_preserves_imported_weights():
    """build_apla on imported weights: merged roundtrip == imported."""
    from apla_tpu.apla.core import AplaConfig, build_apla, merge_apla_params
    torch.manual_seed(1)
    model = TorchViT().eval()
    params = convert_torch_vit_state_dict(model.dinov2_state_dict(), depth=2)
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    t, f = build_apla(params, cfg, AplaConfig(partial_size=8))
    merged = merge_apla_params(t, f)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_separate_qkv_import():
    """Separate q/k/v torch weights pack into the fused qkv layout and give
    the same attention output (reference AttentionSepQKV parity)."""
    torch.manual_seed(2)
    model = TorchViT().eval()
    sd = model.dinov2_state_dict()
    # re-key block 0's qkv into separate q/k/v
    sep = dict(sd)
    for i in range(2):
        w = sep.pop(f"blocks.{i}.attn.qkv.weight")
        b = sep.pop(f"blocks.{i}.attn.qkv.bias")
        d = w.shape[0] // 3
        for j, name in enumerate("qkv"):
            sep[f"blocks.{i}.attn.{name}.weight"] = w[j * d:(j + 1) * d]
            sep[f"blocks.{i}.attn.{name}.bias"] = b[j * d:(j + 1) * d]
    p1 = convert_torch_vit_state_dict(sd, depth=2)
    p2 = convert_torch_vit_state_dict(sep, depth=2)
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_))


def test_export_import_roundtrip():
    """Export our params to torch naming, re-import, compare bit-exact —
    proves a reference user can move checkpoints both ways."""
    from apla_tpu.models.vit import init_vit_params
    from apla_tpu.utils.pretrained import (convert_torch_vit_state_dict,
                                           export_torch_vit_state_dict)
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, has_layerscale=True, layerscale_init=1.0,
                    compute_dtype=jnp.float32)
    params = init_vit_params(jax.random.PRNGKey(3), cfg)
    sd = export_torch_vit_state_dict(params)
    back = convert_torch_vit_state_dict(sd, depth=2, has_layerscale=True)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # exported dict is loadable by a torch module of the same architecture
    model = TorchViT(layerscale=1.0)
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
           for k, v in sd.items()}
    remap = {}
    for k, v in tsd.items():
        k2 = k.replace("patch_embed.proj", "patch").replace("attn.qkv", "qkv")
        k2 = k2.replace("attn.proj", "proj").replace("mlp.fc", "fc")
        k2 = k2.replace("ls1.gamma", "ls1").replace("ls2.gamma", "ls2")
        remap[k2] = v
    missing, unexpected = model.load_state_dict(remap, strict=False)
    assert not unexpected, unexpected
