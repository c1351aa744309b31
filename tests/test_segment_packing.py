"""Block-diagonal (segment-packed) attention parity — the DINOv2 local-crop
packing path (xformers BlockDiagonalMask analogue, reference
dinov2/layers/block.py:243-298).

Packing s crops into one sequence with a block-diagonal mask must compute
EXACTLY the same function as s independent forwards.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apla_tpu.models.vit import ViTConfig, vit_features
from apla_tpu.ops import pallas_mha
from apla_tpu.ops.attention import qkv_and_attend


def test_segment_masked_attention_equals_per_crop():
    B, s, T, C, H = 2, 4, 10, 32, 2
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (s * B, T, C))      # crop-major
    wk = jax.random.normal(jax.random.PRNGKey(1), (C, 3 * C)) * 0.1
    wb = jnp.zeros((3 * C,))

    per_crop = qkv_and_attend(x, wk, wb, H)        # [s*B, T, C]

    packed = x.reshape(s, B, T, C).transpose(1, 0, 2, 3) \
              .reshape(B, s * T, C)
    packed_out = qkv_and_attend(packed, wk, wb, H, segment_len=T)
    unpacked = packed_out.reshape(B, s, T, C).transpose(1, 0, 2, 3) \
                         .reshape(s * B, T, C)
    np.testing.assert_allclose(np.asarray(unpacked), np.asarray(per_crop),
                               rtol=2e-5, atol=2e-5)


def test_vmem_kernel_segment_mask():
    """The VMEM Pallas kernel's block-diagonal mask (interpret mode) matches
    per-segment jnp attention, forward and backward."""
    pallas_mha.INTERPRET = True
    try:
        B, s, T, H, D = 1, 3, 8, 2, 16
        N = s * T
        scale = D ** -0.5
        q, k, v = [jax.random.normal(jax.random.PRNGKey(i), (B, N, H, D))
                   for i in range(3)]

        def ref(q, k, v):
            outs = []
            for i in range(s):
                sl = slice(i * T, (i + 1) * T)
                logits = jnp.einsum("bnhd,bmhd->bhnm", q[:, sl], k[:, sl],
                                    preferred_element_type=jnp.float32) \
                    * scale
                a = jax.nn.softmax(logits, axis=-1)
                outs.append(jnp.einsum("bhnm,bmhd->bnhd", a, v[:, sl]))
            return jnp.concatenate(outs, axis=1)

        out = pallas_mha.vmem_mha(q, k, v, scale, segment_len=T)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref(q, k, v)),
                                   rtol=2e-3, atol=2e-3)

        g1 = jax.grad(lambda *a: jnp.sum(
            pallas_mha.vmem_mha(*a, scale, segment_len=T) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-3)
    finally:
        pallas_mha.INTERPRET = False


@pytest.mark.parametrize("apla", [False, True])
def test_vit_features_pack_segments(apla):
    """Whole-trunk parity: pack_segments=s == s independent crop forwards
    (deterministic, f32), with and without the APLA split."""
    from apla_tpu.apla.core import AplaConfig, build_apla
    from apla_tpu.models.vit import init_vit_params

    s, B = 4, 2
    cfg = ViTConfig(img_size=24, patch_size=8, embed_dim=32, depth=2,
                    num_heads=2, compute_dtype=jnp.float32)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    trainable = None
    if apla:
        t, params = build_apla(params, cfg, AplaConfig(partial_size=8))
        trainable = t
    x = jax.random.normal(jax.random.PRNGKey(1), (s * B, 24, 24, 3))

    ref = vit_features(params, x, cfg, trainable=trainable,
                       return_all_tokens=True)
    packed = vit_features(params, x, cfg, trainable=trainable,
                          return_all_tokens=True, pack_segments=s)
    assert packed.shape == ref.shape
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_dinov2_step_pack_parity():
    """The full DINOv2 SSL step with pack_local_crops produces the same
    losses as the unpacked step (f32, one collated batch)."""
    import os

    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    from apla_tpu.utils.config import load_merged_params

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = load_merged_params(
        os.path.join(repo, "params/synthetic/vit_tiny/dinov2.yml"))
    params.system_params.n_devices = 1
    params.training_params.epochs = 1
    params.training_params.is_dry = True
    params.training_params.use_mixed_precision = False   # f32 for parity
    params.dataset_params.synthetic_size = 4
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = 2
        params.dataloader_params[ld].num_workers = 0
    import tempfile
    params.training_params.save_dir = tempfile.mkdtemp(prefix="pack_")

    wrapper = DINOv2Wrapper(params)
    wrapper.instantiate()
    trainer = Dinov2Trainer(wrapper)
    loader = wrapper.dataloaders.trainloader
    loader.set_epoch(0)
    batch = next(iter(loader))  # ONE collated batch (seeded iBOT masks)
    dbatch = trainer._device_batch(batch)

    results = {}
    for packed in (False, True):
        trainer._steps = {}
        trainer._pack_local_crops = lambda packed=packed: packed
        step_fn = trainer._get_step(True)
        # the jitted step DONATES the state buffers — give each variant its
        # own copy
        state0 = jax.tree.map(jnp.array, trainer.state)
        state, m = step_fn(state0, trainer.frozen, dbatch,
                           1e-4, 0.04, 0.994, 0.04, trainer.rng)
        results[packed] = {k: float(v) for k, v in m.items()
                           if "loss" in k or k == "loss"}
    for key in results[False]:
        np.testing.assert_allclose(
            results[True][key], results[False][key], rtol=1e-4,
            err_msg=f"{key}: packed {results[True]} vs {results[False]}")


def test_dinov2_step_pack_parity_with_accum():
    """pack_local_crops composes with accum_steps: the packed accum-2 step
    equals the unpacked accum-2 step on one collated batch (micro_split
    keeps crop-major order, so per-micro packing sees whole images)."""
    import os
    import tempfile

    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    from apla_tpu.utils.config import load_merged_params

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = load_merged_params(
        os.path.join(repo, "params/synthetic/vit_tiny/dinov2.yml"))
    params.system_params.n_devices = 1
    params.training_params.epochs = 1
    params.training_params.is_dry = True
    params.training_params.use_mixed_precision = False
    params.training_params.accum_steps = 2
    params.dataset_params.synthetic_size = 4
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = 4
        params.dataloader_params[ld].num_workers = 0
    params.training_params.save_dir = tempfile.mkdtemp(prefix="packacc_")

    wrapper = DINOv2Wrapper(params)
    wrapper.instantiate()
    trainer = Dinov2Trainer(wrapper)
    loader = wrapper.dataloaders.trainloader
    loader.set_epoch(0)
    batch = next(iter(loader))
    dbatch = trainer._device_batch(batch)

    results = {}
    for packed in (False, True):
        trainer._steps = {}
        trainer._pack_local_crops = lambda packed=packed: packed
        step_fn = trainer._get_step(True)
        state0 = jax.tree.map(jnp.array, trainer.state)
        _, m = step_fn(state0, trainer.frozen, dbatch,
                       1e-4, 0.04, 0.994, 0.04, trainer.rng)
        results[packed] = float(m["loss"])
    np.testing.assert_allclose(results[True], results[False], rtol=1e-4)
