"""Fused int8 quantize+matmul kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apla_tpu.ops import pallas_int8_matmul as pim
from apla_tpu.ops.quant import quantize_weight


@pytest.fixture(autouse=True)
def interpret():
    pim.INTERPRET = True
    yield
    pim.INTERPRET = False


def test_fused_int8_matmul_accuracy():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    M, K, N = 256, 256, 256
    x = jax.random.normal(k1, (M, K), jnp.float32)
    w = jax.random.normal(k2, (K, N), jnp.float32) * 0.05
    w_i8, sw = quantize_weight(w)
    y = pim.fused_int8_matmul(x, w_i8, sw, block_m=128, block_n=128,
                              block_k=128)
    ref = x @ w
    yn, rn = np.asarray(y), np.asarray(ref)
    cos = np.sum(yn * rn) / (np.linalg.norm(yn) * np.linalg.norm(rn))
    assert cos > 0.999, cos
    # group-wise act scales should be at least as accurate as the unfused op
    from apla_tpu.ops.quant import int8_matmul
    y_unfused = np.asarray(int8_matmul(x, w_i8, sw))
    err_fused = np.abs(yn - rn).mean()
    err_unfused = np.abs(y_unfused - rn).mean()
    assert err_fused <= err_unfused * 1.05


def test_fused_int8_multi_k_blocks():
    """Accumulation across K blocks with per-block scales must be exact
    w.r.t. blockwise dequantized math."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    M, K, N = 128, 512, 128
    x = jax.random.normal(k1, (M, K), jnp.float32)
    w = jax.random.normal(k2, (K, N), jnp.float32) * 0.02
    w_i8, sw = quantize_weight(w)
    y = pim.fused_int8_matmul(x, w_i8, sw, block_m=128, block_n=128,
                              block_k=128)
    # blockwise numpy reference
    acc = np.zeros((M, N), np.float32)
    for k0 in range(0, K, 128):
        xb = np.asarray(x[:, k0:k0 + 128])
        amax = np.abs(xb).max(axis=1, keepdims=True)
        sx = np.maximum(amax / 127.0, 1e-12)
        xi = np.clip(np.round(xb / sx), -127, 127).astype(np.int32)
        wi = np.asarray(w_i8[k0:k0 + 128]).astype(np.int32)
        acc += (xi @ wi).astype(np.float32) * sx * np.asarray(sw)[None, :]
    np.testing.assert_allclose(np.asarray(y), acc, rtol=1e-4, atol=1e-4)
