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


def test_hf_dinov2_vit_oracle_parity():
    """Random HF Dinov2Model imports via convert_vit_hf_dinov2_state_dict
    and its final hidden states match our ViT trunk numerically."""
    from transformers import Dinov2Config, Dinov2Model

    from apla_tpu.models.vit import ViTConfig, vit_features
    from apla_tpu.utils.pretrained import convert_vit_hf_dinov2_state_dict

    hf_cfg = Dinov2Config(image_size=56, patch_size=14, hidden_size=64,
                          num_hidden_layers=3, num_attention_heads=2,
                          mlp_ratio=4, layerscale_value=1.0,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0,
                          drop_path_rate=0.0)
    torch.manual_seed(0)
    hf = Dinov2Model(hf_cfg).eval()

    x = np.random.default_rng(0).standard_normal((2, 56, 56, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .last_hidden_state.numpy()       # [B, 1+N, C] after final LN

    params = convert_vit_hf_dinov2_state_dict(hf.state_dict(), depth=3)
    cfg = ViTConfig(img_size=56, patch_size=14, embed_dim=64, depth=3,
                    num_heads=2, has_layerscale=True, norm_eps=1e-6,
                    compute_dtype=jnp.float32, gelu_tanh=False)
    ours = np.asarray(vit_features(params, jnp.asarray(x), cfg,
                                   return_all_tokens=True))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_hf_dinov2_ckpt_through_wrapper(tmp_path):
    """model_params.pretrained_checkpoint auto-detects HF Dinov2Model
    format and feeds the APLA split through the supervised wrapper."""
    from transformers import Dinov2Config, Dinov2Model

    from apla_tpu.utils.config import load_merged_params
    from apla_tpu.wrapper import DefaultWrapper

    import os
    PARAMS = os.path.join(os.path.dirname(__file__), "..", "params",
                          "synthetic", "vit_tiny", "apla.yml")
    hf = Dinov2Model(Dinov2Config(
        image_size=32, patch_size=8, hidden_size=192, num_hidden_layers=12,
        num_attention_heads=3, layerscale_value=1.0)).eval()
    ckpt = tmp_path / "dinov2_hf.pth"
    torch.save(hf.state_dict(), ckpt)

    params = load_merged_params(PARAMS)
    params.training_params.save_dir = str(tmp_path)
    params.model_params.pretrained = True
    params.model_params.pretrained_checkpoint = str(ckpt)
    params.model_params.transformers_params.block_conf = {
        "has_layerscale": True, "layerscale_init_values": 1.0}
    wrapper = DefaultWrapper(params)
    wrapper.instantiate()
    # imported: frozen qkv kernel matches the HF query/key/value concat
    q = hf.state_dict()["encoder.layer.0.attention.attention.query.weight"]
    got = np.asarray(
        wrapper.frozen["backbone"]["blocks"]["attn"]["qkv"]["kernel"][0])
    np.testing.assert_allclose(got[:, :192], q.numpy().T, rtol=1e-6)


def test_swin_hf_export_round_trip():
    """export -> import is the identity, and the exported dict loads into
    a real SwinModel (strict on the importable subset)."""
    import jax

    from apla_tpu.models.swin import SwinConfig, init_swin_params
    from apla_tpu.utils.pretrained import (convert_swin_hf_state_dict,
                                           export_swin_hf_state_dict)

    cfg = SwinConfig(img_size=56, patch_size=4, embed_dim=32, depths=(2, 2),
                     num_heads=(2, 4), window_size=7)
    params = init_swin_params(jax.random.PRNGKey(0), cfg)
    sd = export_swin_hf_state_dict(params)
    back = convert_swin_hf_state_dict(sd, depths=(2, 2))
    flat_a = {str(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_b = {str(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(back)[0]}
    assert set(flat_a) == set(flat_b)
    for key in flat_a:
        if "norms" in key and "norms'], SequenceKey(idx=1)" not in key:
            continue  # intermediate pyramid norms have no HF counterpart
        np.testing.assert_allclose(np.asarray(flat_a[key]),
                                   np.asarray(flat_b[key]), rtol=1e-6,
                                   err_msg=key)

    # loads into a real HF SwinModel
    from transformers import SwinConfig as HFSwinConfig, SwinModel
    hf = SwinModel(HFSwinConfig(image_size=56, patch_size=4, embed_dim=32,
                                depths=[2, 2], num_heads=[2, 4],
                                window_size=7), add_pooling_layer=False)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    missing, unexpected = hf.load_state_dict(tensors, strict=False)
    assert not unexpected, unexpected
    # only non-param buffers (relative_position_index) may be missing
    assert all("relative_position_index" in k for k in missing), missing
