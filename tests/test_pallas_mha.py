"""Full-VMEM Pallas attention kernel parity (interpret mode on CPU; the same
kernels run compiled on TPU — see also the driver bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apla_tpu.ops import pallas_mha
from apla_tpu.ops.flash_attention import _jnp_mha


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_mha.INTERPRET = True
    yield
    pallas_mha.INTERPRET = False


def _ref(q, k, v, scale):
    return _jnp_mha(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), scale).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("n", [64, 129])
def test_vmem_mha_fwd_parity(n):
    B, H, D = 2, 3, 32
    scale = D ** -0.5
    q, k, v = [jax.random.normal(jax.random.PRNGKey(i), (B, n, H, D))
               for i in range(3)]
    out = pallas_mha.vmem_mha(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v, scale)),
                               rtol=2e-3, atol=2e-3)


def test_vmem_mha_bwd_parity():
    B, n, H, D = 1, 64, 2, 32
    scale = D ** -0.5
    q, k, v = [jax.random.normal(jax.random.PRNGKey(i), (B, n, H, D))
               for i in range(3)]

    def loss_k(q, k, v):
        return jnp.sum(pallas_mha.vmem_mha(q, k, v, scale) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(_ref(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_padding_mask_correct():
    """Padded key positions must carry exactly zero attention weight: output
    for n=100 equals output computed with explicit n=100 reference."""
    B, n, H, D = 1, 100, 2, 32
    scale = D ** -0.5
    q, k, v = [jax.random.normal(jax.random.PRNGKey(i), (B, n, H, D))
               for i in range(3)]
    out = pallas_mha.vmem_mha(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref(q, k, v, scale)),
                               rtol=2e-3, atol=2e-3)


def test_flash_block_size_divisors():
    """Padded lengths must get block sizes that divide them (518px ->
    N=1370 -> pad 1408 = 11*128, where only 128 divides)."""
    for n_pad, expected in [(1408, 128), (1536, 512), (512, 512),
                            (768, 384), (1280, 256)]:
        blk = next(b for b in (512, 384, 256, 128) if n_pad % b == 0)
        assert blk == expected, (n_pad, blk)
        assert n_pad % blk == 0
