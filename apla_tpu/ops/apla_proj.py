"""APLA partial-trainable output projection (the framework's core op).

Reference semantics (`src/apla/appla_attn.py:50-83`): the attention output
projection `out = x @ W^T + b` is split so that only `partial_size` of the
`dim` output channels (rows of the torch weight, selected by `inds`) are
trainable; the rest stay frozen.  The reference realises this with two dense
matmuls plus two activation scatters and relies on `requires_grad`.

TPU-native formulation (no activation permutes, no wasted gradient FLOPs):

  forward:   W = W_frozen.at[:, inds].set(W_t);  out = x @ W + b
             (one full [d, d] matmul on the MXU plus an O(d*k) weight scatter)
  backward:  dx  = g @ W^T                        (needed regardless)
             dW_t = x^T @ g[..., inds]            (FLOPs ~ B*N*d*k, not B*N*d*d)
             db_t = sum(g[..., inds])
             dW_frozen is NEVER computed — the frozen matrix is not a
             differentiable input of the custom VJP.

Weights use the JAX convention: kernel `[d_in, d_out]`, so the torch "rows of
W[out, in]" become columns here.  `inds` holds the trainable output-channel
indices (shape `[k]`, int32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def apla_proj(x, w_t, b_t, w_frozen, b_frozen, inds):
    """Partial-trainable linear projection.

    Args:
      x:        [..., d_in] input activations.
      w_t:      [d_in, k] trainable columns of the kernel.
      b_t:      [k] trainable bias entries.
      w_frozen: [d_in, d_out] full kernel; columns listed in `inds` are
                shadowed by `w_t` (their stored values are ignored).
      b_frozen: [d_out] full bias; entries in `inds` shadowed by `b_t`.
      inds:     [k] int32 trainable output-channel indices.

    Returns:
      [..., d_out] projection output.
    """
    out, _ = _apla_proj_fwd(x, w_t, b_t, w_frozen, b_frozen, inds)
    return out


def _assemble(w_t, b_t, w_frozen, b_frozen, inds):
    w = w_frozen.at[:, inds].set(w_t.astype(w_frozen.dtype))
    b = b_frozen.at[inds].set(b_t.astype(b_frozen.dtype))
    return w, b


def _apla_proj_fwd(x, w_t, b_t, w_frozen, b_frozen, inds):
    w, b = _assemble(w_t, b_t, w_frozen, b_frozen, inds)
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype) + b.astype(x.dtype)
    return out, (x, w, inds, w_t, b_t)


def _apla_proj_bwd(res, g):
    x, w, inds, w_t, b_t = res
    wt_dtype, bt_dtype = w_t.dtype, b_t.dtype
    # dx: full matmul against the assembled kernel — required by the residual
    # stream no matter what is trainable.
    dx = jnp.dot(g, w.astype(g.dtype).T, preferred_element_type=g.dtype)
    # Gather only the k trainable output-channel grads, then a thin matmul:
    # FLOPs scale with the APLA rank k, not with d_out.
    g_t = jnp.take(g, inds, axis=-1)                      # [..., k]
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g_t.reshape(-1, g_t.shape[-1])
    dw_t = jnp.dot(x2.T, g2, preferred_element_type=jnp.float32).astype(wt_dtype)
    db_t = jnp.sum(g2.astype(jnp.float32), axis=0).astype(bt_dtype)
    # Frozen kernel/bias and inds receive no cotangent (None -> symbolic zero):
    # XLA never materialises a [d_in, d_out] gradient for the frozen matrix.
    return (dx, dw_t, db_t, None, None, None)


apla_proj.defvjp(_apla_proj_fwd, _apla_proj_bwd)
