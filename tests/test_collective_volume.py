"""Machine-checked proof of the APLA collective-volume claim.

SURVEY.md's central TPU mapping (§2.9): under data parallelism the gradient
allreduce volume is proportional to the APLA rank (`partial_size`), not the
model size — the frozen weights never produce gradients, so they never ride
the ICI.  The reference gets the analogous effect from DDP only reducing
`requires_grad` tensors (src/apla/apla_vit.py:79-81 freezes everything,
then DDP reduces the surviving trainable set); here it falls out of the
pytree split + shardings.  These tests compile the real DP train step on
the 8-device mesh and parse the partitioned HLO for cross-device collective
operand bytes.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np

from apla_tpu.apla.core import AplaConfig
from apla_tpu.models.classifier import init_classifier
from apla_tpu.models.vit import ViTConfig
from apla_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
from apla_tpu.train.losses import cross_entropy
from apla_tpu.train.optim import build_optimizer
from apla_tpu.train.steps import make_train_step
from apla_tpu.train.train_state import TrainState

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1}
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute")


def _shape_bytes(spec: str) -> int:
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", spec):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str) -> int:
    """Sum the result bytes of every cross-device collective instruction
    in post-partitioning HLO (covers tuple-shaped variadic collectives —
    the result spec lists every member shape)."""
    total = 0
    pat = re.compile(
        r"= *([^=\n]*?) *(?:%?)(?:" + "|".join(_COLLECTIVES)
        + r")(?:-start)?(?:\.\d+)? *\(")
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if m:
            total += _shape_bytes(m.group(1))
    return total


def _compiled_step_hlo(partial_size, depth=2, embed_dim=64, batch=16):
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=embed_dim,
                    depth=depth, num_heads=4, compute_dtype=jnp.float32)
    mesh = make_mesh(n_data=8)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=10,
        apla_cfg=AplaConfig(partial_size=partial_size))
    tx = build_optimizer("AdamW", {"lr": 1e-3, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = jax.device_put(TrainState.create(trainable, tx),
                           replicated_sharding(mesh))
    from apla_tpu.parallel.mesh import shard_params
    frozen = shard_params(frozen, mesh, policy="replicated")
    step = make_train_step(cfg, tx, cross_entropy)
    batch_arrs = shard_batch(
        {"image": np.zeros((batch, 32, 32, 3), np.float32),
         "label": np.zeros((batch,), np.int64)}, mesh)
    compiled = step.lower(state, frozen, batch_arrs, 1e-3,
                          jax.random.PRNGKey(7)).compile()
    hlo = compiled.as_text()
    t_bytes = sum(np.asarray(x).nbytes for x in jax.tree.leaves(trainable))
    f_bytes = sum(np.asarray(x).nbytes for x in jax.tree.leaves(frozen))
    return hlo, t_bytes, f_bytes


def test_collective_volume_scales_with_rank_not_model():
    hlo8, t8, _ = _compiled_step_hlo(8)
    hlo32, t32, _ = _compiled_step_hlo(32)
    hlo64, t64, f64 = _compiled_step_hlo("full")  # full = all 64 rows
    b8, b32, b64 = (collective_bytes(h) for h in (hlo8, hlo32, hlo64))

    # collectives exist at all (the grad psum is real)
    assert b8 > 0
    # monotone in rank
    assert b8 < b32 < b64
    # the rank-driven delta matches the trainable-size delta: each extra
    # gradient element is reduced a bounded number of times (XLA may stage
    # an allreduce as reduce-scatter + all-gather, hence the x4 headroom)
    d_small = b32 - b8
    d_big = b64 - b8
    t_small = t32 - t8
    t_big = t64 - t8
    assert d_small <= 4 * t_small + 1024, (d_small, t_small)
    assert d_big <= 4 * t_big + 1024, (d_big, t_big)
    assert d_big >= t_big / 4, (d_big, t_big)
    # ...and stays far below the frozen model volume even at full rank:
    # the frozen weights never ride the interconnect
    assert b64 < f64 / 2, (b64, f64)


def test_collective_volume_independent_of_model_depth():
    """Doubling the frozen trunk must grow collective traffic only by the
    added TRAINABLE grads (rank x dim per extra block), never by the added
    frozen bytes — the model-size half of the claim."""
    hlo_d2, t_d2, f_d2 = _compiled_step_hlo(8, depth=2)
    hlo_d4, t_d4, f_d4 = _compiled_step_hlo(8, depth=4)
    b_d2 = collective_bytes(hlo_d2)
    b_d4 = collective_bytes(hlo_d4)
    added_trainable = t_d4 - t_d2          # 2 blocks x (8x64 + 8) floats
    added_frozen = f_d4 - f_d2             # 2 full transformer blocks
    assert added_frozen > 10 * added_trainable  # sanity: the gap is real
    delta = b_d4 - b_d2
    assert 0 <= delta <= 4 * added_trainable + 1024, \
        (delta, added_trainable, added_frozen)
