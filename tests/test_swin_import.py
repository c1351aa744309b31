"""HF SwinModel -> our Swin: oracle numerical parity.

A randomly-initialised `transformers.SwinModel` is the reference
implementation (same architecture family the reference's mmdet side-car
consumes); its state_dict imports via `convert_swin_hf_state_dict` and the
final-stage features must match `last_hidden_state` numerically."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_hf_swin_oracle_parity():
    from transformers import SwinConfig as HFSwinConfig, SwinModel

    from apla_tpu.models.swin import SwinConfig, swin_features
    from apla_tpu.utils.pretrained import convert_swin_hf_state_dict

    hf_cfg = HFSwinConfig(image_size=56, patch_size=4, num_channels=3,
                          embed_dim=32, depths=[2, 2], num_heads=[2, 4],
                          window_size=7, hidden_act="gelu",
                          use_absolute_embeddings=False,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0,
                          drop_path_rate=0.0)
    torch.manual_seed(0)
    hf = SwinModel(hf_cfg, add_pooling_layer=False).eval()

    x = np.random.default_rng(0).standard_normal((2, 56, 56, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = out.last_hidden_state.numpy()          # [B, L, C] (after final LN)

    params = convert_swin_hf_state_dict(hf.state_dict(), depths=(2, 2))
    cfg = SwinConfig(img_size=56, patch_size=4, embed_dim=32, depths=(2, 2),
                     num_heads=(2, 4), window_size=7,
                     compute_dtype=jnp.float32)
    feats = swin_features(params, jnp.asarray(x), cfg)
    ours = np.asarray(feats[-1])                 # [B, H, W, C] (stage norm
    #                                              = imported final LN)
    B, H, W, C = ours.shape
    ours = ours.reshape(B, H * W, C)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_hf_swin_oracle_parity_shifted_windows():
    """Deeper grid (3 stages) so stage 0/1 run SHIFTED window attention +
    masks — the hardest part to get bit-compatible."""
    from transformers import SwinConfig as HFSwinConfig, SwinModel

    from apla_tpu.models.swin import SwinConfig, swin_features
    from apla_tpu.utils.pretrained import convert_swin_hf_state_dict

    hf_cfg = HFSwinConfig(image_size=112, patch_size=4, num_channels=3,
                          embed_dim=24, depths=[2, 2, 2], num_heads=[2, 2, 4],
                          window_size=7, hidden_act="gelu",
                          use_absolute_embeddings=False,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0,
                          drop_path_rate=0.0)
    torch.manual_seed(1)
    hf = SwinModel(hf_cfg, add_pooling_layer=False).eval()

    x = np.random.default_rng(1).standard_normal((1, 112, 112, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .last_hidden_state.numpy()

    params = convert_swin_hf_state_dict(hf.state_dict(), depths=(2, 2, 2))
    cfg = SwinConfig(img_size=112, patch_size=4, embed_dim=24,
                     depths=(2, 2, 2), num_heads=(2, 2, 4), window_size=7,
                     compute_dtype=jnp.float32)
    feats = swin_features(params, jnp.asarray(x), cfg)
    ours = np.asarray(feats[-1])
    B, H, W, C = ours.shape
    np.testing.assert_allclose(ours.reshape(B, H * W, C), ref,
                               rtol=2e-4, atol=2e-4)
