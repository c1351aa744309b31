"""GPipe-style collective pipeline parallelism for the ViT trunk.

The reference has data parallelism only (SURVEY §2.9: `launch.py:49-58`,
DDP at `wrappers.py:182-184`); pipeline parallelism is a beyond-parity
TPU-native feature.  On TPU the idiomatic construction is *collective
pipelining inside SPMD* (the scaling-book recipe): the trunk's stacked
block params [L, ...] are sharded over the mesh 'model' axis so each
device group holds L/S consecutive layers, the per-device batch is split
into M microbatches, and activations rotate stage→stage+1 with
`lax.ppermute` for M+S-1 ticks.  Every device computes every tick (SPMD
cannot idle), so pipeline-bubble utilisation is the usual M/(M+S-1);
larger M amortises the bubble.

Autodiff: the whole schedule lives inside ONE `jax.shard_map` with
`check_vma=True`.  Inputs are explicitly lifted (`pcast(to='varying')`,
the pvary successor) onto the axes they arrive replicated over; the
lift's transpose is `psum`, which yields
exactly the right collectives in backward — psum over 'data' for the
(stage-sharded) trainable block grads (the DP gradient reduction) and
psum over 'model' for the token-stream cotangent (stages other than 0
contribute structural zeros through the `where` transpose).  ppermute
transposes to the inverted permutation, so the backward pass runs the
reverse pipeline schedule automatically; `jax.checkpoint` remat composes
unchanged (the rematted block_fn is the per-stage body).

APLA fits pipelining unusually well: the rotating activation is the only
inter-stage traffic (one [mb, N, D] ppermute per tick per direction) and
gradients exist only for the rank-k trainable slices, so the per-stage
optimizer state is tiny and there is no cross-stage weight traffic at
all.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


# eq=False: identity semantics (hash/eq contract intact) — specs are
# CLOSED OVER by the jitted step, never used as jit static arguments, so
# value equality across instances is not needed.
@dataclasses.dataclass(frozen=True, eq=False)
class PipelineSpec:
    """Static pipeline configuration, closed over by the jitted step.

    n_stages   = size of the mesh 'model' axis (stage axis).
    n_micro    = microbatches per device-local batch (M >= 1; bubble
                 fraction is (S-1)/(M+S-1)).
    """
    mesh: Mesh
    n_stages: int
    n_micro: int
    data_axis: str = "data"
    stage_axis: str = "model"

    def __post_init__(self):
        assert self.n_stages >= 1 and self.n_micro >= 1, \
            (self.n_stages, self.n_micro)
        assert self.mesh.shape[self.stage_axis] == self.n_stages, \
            (dict(self.mesh.shape), self.n_stages)


def _pvary(x, axis_names):
    """Lift `x` onto mesh axes it arrived replicated over (transpose:
    psum).  jax.lax.pvary is deprecated in favor of pcast(to='varying')."""
    return lax.pcast(x, axis_names, to="varying")


def pipeline_blocks(x, blocks, trainable_blocks, dp_rates, block_rngs,
                    block_fn, cfg, deterministic: bool,
                    spec: PipelineSpec):
    """Run the stacked-block trunk as a collective pipeline.

    x: [B, N, D] tokens (batch sharded over the data axis, replicated
       over the stage axis).  blocks / trainable_blocks: stacked [L, ...]
       pytrees, stage-sharded on dim 0.  dp_rates: [L] stochastic-depth
       rates.  block_rngs: [L, 2] uint32 keys or None.
    Returns tokens [B, N, D] with the same sharding as x.

    block_fn(h, bp, tb, dp, cfg, rng, deterministic) is the (possibly
    rematted) single-block body from models/vit.py.
    """
    S, M = spec.n_stages, spec.n_micro
    d_ax, s_ax = spec.data_axis, spec.stage_axis
    L = jax.tree.leaves(blocks)[0].shape[0]
    assert L % S == 0, f"depth {L} not divisible by {S} stages"
    n_data = spec.mesh.shape[d_ax]
    B = x.shape[0]
    assert B % n_data == 0, (B, n_data)
    b_local = B // n_data
    assert b_local % M == 0, \
        f"per-device batch {b_local} not divisible by {M} microbatches"

    has_tb = trainable_blocks is not None
    has_rng = block_rngs is not None

    def stage_body(x_loc, blocks_loc, tb_loc, dp_loc, rngs_loc):
        # ---- per-device views: lift everything onto both mesh axes ---- #
        # (an in_spec mentioning an axis makes the value vary over it;
        # pvary adds the axes it arrived replicated over — its transpose
        # is psum, see module docstring)
        both = (d_ax, s_ax)
        stage = _pvary(lax.axis_index(s_ax), d_ax)
        x_loc = _pvary(x_loc, s_ax)
        lift = lambda t: jax.tree.map(lambda a: _pvary(a, d_ax), t)
        blocks_loc = lift(blocks_loc)
        dp_loc = lift(dp_loc)
        tb_loc = lift(tb_loc) if has_tb else None
        rngs_loc = (lift(rngs_loc) if has_rng
                    else _pvary(jnp.zeros((L // S, 2), jnp.uint32), both))

        mb = x_loc.shape[0] // M
        micro = x_loc.reshape((M, mb) + x_loc.shape[1:])

        def run_stage(h, tick):
            def body(carry, scanned):
                if has_tb:
                    bp, tb, dp, br = scanned
                else:
                    bp, dp, br = scanned
                    tb = None
                rng = None
                if has_rng and not deterministic:
                    # distinct stream per (block, microbatch tick)
                    rng = jax.random.fold_in(br, tick)
                carry = block_fn(carry, bp, tb, dp, cfg, rng, deterministic)
                return carry, None

            scanned = ((blocks_loc, tb_loc, dp_loc, rngs_loc) if has_tb
                       else (blocks_loc, dp_loc, rngs_loc))
            h, _ = lax.scan(body, h, scanned, unroll=cfg.scan_unroll)
            return h

        perm = [(s, s + 1) for s in range(S - 1)]
        zeros = _pvary(jnp.zeros((mb,) + x_loc.shape[1:], x_loc.dtype),
                          both)
        outbuf0 = _pvary(
            jnp.zeros((M, mb) + x_loc.shape[1:], x_loc.dtype), both)

        def tick_fn(carry, t):
            prev, outbuf = carry
            recv = lax.ppermute(prev, s_ax, perm) if S > 1 else prev
            feed = lax.dynamic_index_in_dim(
                micro, jnp.minimum(t, M - 1), axis=0, keepdims=False)
            x_in = jnp.where(stage == 0, feed, recv) if S > 1 else feed
            y = run_stage(x_in, t)
            out_idx = t - (S - 1)
            upd = lax.dynamic_update_index_in_dim(
                outbuf, y, jnp.clip(out_idx, 0, M - 1), axis=0)
            valid = (stage == S - 1) & (out_idx >= 0)
            outbuf = jnp.where(valid, upd, outbuf)
            return (y, outbuf), None

        ticks = _pvary(jnp.arange(M + S - 1), both)
        (_, outbuf), _ = lax.scan(tick_fn, (zeros, outbuf0), ticks)
        # Collect from the last stage and re-replicate over the stage
        # axis (stages != S-1 contribute zeros).  In backward this psum
        # transposes to a pvary: every stage sees the output cotangent,
        # and the `valid` mask routes it to the right pipeline position.
        outbuf = outbuf * (stage == S - 1).astype(outbuf.dtype)
        outbuf = lax.psum(outbuf, s_ax)
        return outbuf.reshape((M * mb,) + x_loc.shape[1:])

    stage0 = P(s_ax)       # prefix spec: dim 0 of every stacked leaf
    in_specs = (P(d_ax), stage0, stage0 if has_tb else P(), stage0,
                stage0 if has_rng else P())
    fn = jax.shard_map(stage_body, mesh=spec.mesh,
                       in_specs=in_specs, out_specs=P(d_ax))
    return fn(x, blocks, trainable_blocks, dp_rates, block_rngs)
