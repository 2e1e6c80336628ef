"""Attention kernels for the UNet's long-sequence self-attention.

SD's UNet self-attention runs at N = 4096 spatial tokens (64x64 latents).
A naive einsum materializes (B, H, N, N) float32 scores — at the Stage-1
vmapped concept batch that alone is tens of GB (the observed HBM blowup).
Two memory-bounded implementations:

* ``flash_attention`` — Pallas TPU kernel.  One grid cell = one (batch*head,
  query-block): the query block, the full K/V (bf16, ~2 MB at N=4096,
  D<=128) and the f32 score block (BLOCK_Q x N <= 8 MB) all fit VMEM, so a
  single-pass softmax per block suffices — no online rescaling needed at SD
  sizes.  Backward is provided via custom_vjp using the chunked
  implementation (recompute, no N^2 residuals).
* ``mha_chunked`` — pure-jnp lax.scan over query blocks with a
  rematerialized body: peak memory is one block's scores in both forward
  and backward.  Runs everywhere (CPU tests, interpret mode) and is the
  flash backward.

Both take (B, N, H, D) and return (B, N, H, D).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# chunked jnp attention (differentiable, memory-bounded)
# ---------------------------------------------------------------------------


def mha_chunked(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                scale: Optional[float] = None,
                block_q: int = 512) -> jnp.ndarray:
    """Softmax attention with query-block scanning.

    q: (B, N, H, D); k, v: (B, M, H, D) → (B, N, H, D).
    The scan body is rematerialized so backward recomputes block scores
    instead of storing (N, M) residuals.
    """
    B, N, H, D = q.shape
    M = k.shape[1]
    scale = scale if scale is not None else D**-0.5
    block_q = min(block_q, N)
    pad = _round_up(N, block_q) - N
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_blocks = q.shape[1] // block_q
    qb = q.reshape(B, n_blocks, block_q, H, D)

    @jax.checkpoint
    def block(qi):
        s = jnp.einsum("bqhd,bkhd->bhqk", qi * scale, k)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    def body(_, qi):
        return None, block(qi)

    _, out = jax.lax.scan(body, None, jnp.moveaxis(qb, 1, 0))
    out = jnp.moveaxis(out, 0, 1).reshape(B, -1, H, D)
    return out[:, :N]


# ---------------------------------------------------------------------------
# pallas flash kernel
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # block shapes carry a leading singleton batch dim: (1, BLOCK_Q, Dp) etc.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BLOCK_Q, M)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _flash_forward(q, k, v, scale, block_q: int = 512,
                   interpret: bool = False):
    B, N, H, D = q.shape
    M = k.shape[1]
    Dp = _round_up(D, 128)
    Np = _round_up(N, block_q)
    # fold heads into the grid batch axis; pad head dim to lanes
    def fold(x, L):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, L, D)
        return jnp.pad(x, ((0, 0), (0, 0), (0, Dp - D)))

    qf = fold(q, N)
    if Np != N:
        qf = jnp.pad(qf, ((0, 0), (0, Np - N), (0, 0)))
    kf, vf = fold(k, M), fold(v, M)

    grid = (B * H, Np // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, M, Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, M, Dp), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, Dp), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    out = out[:, :N, :D].reshape(B, H, N, D)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: Optional[float] = None):
    """Pallas TPU flash attention, (B, N, H, D) x (B, M, H, D) → (B, N, H, D).

    Backward runs the chunked jnp path (recompute; no N² residuals)."""
    s = scale if scale is not None else q.shape[-1] ** -0.5
    return _flash_forward(q, k, v, s)


def _flash_fwd(q, k, v, scale):
    return flash_attention(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    q, k, v = res
    s = scale if scale is not None else q.shape[-1] ** -0.5
    _, vjp = jax.vjp(lambda q, k, v: mha_chunked(q, k, v, s), q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def _flash_min_seq() -> int:
    """Sequences at least this long route to the memory-bounded kernels.
    Read at trace time (not import time) so runtime.trace_env_knobs can
    key program memos on it."""
    return int(os.environ.get("EMCID_TPU_FLASH_MIN_SEQ", 1024))


def attention(q, k, v, scale: Optional[float] = None) -> jnp.ndarray:
    """Attention dispatch: pallas flash on TPU / chunked scan elsewhere for
    long sequences; fused einsum softmax for short ones (77-token cross-attn
    is already MXU-shaped)."""
    N, M = q.shape[1], k.shape[1]
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    if (max(N, M) < _flash_min_seq()
            or os.environ.get("EMCID_TPU_NO_FLASH") == "1"):
        s = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)
    if jax.default_backend() in ("tpu", "axon"):
        # v2 (online softmax + pallas backward) wins on long-K self-attn
        # (level-0 bwd 1.5x); short-K cross-attn (M=77) is overhead-bound in
        # v2's small masked block — the single-pass v1 kernel is faster there
        if M >= 256 and os.environ.get("EMCID_TPU_ATTN", "v2") == "v2":
            from emcid_tpu.ops.flash_v2 import flash_attention_v2

            return flash_attention_v2(q, k, v, scale)
        return flash_attention(q, k, v, scale)
    return mha_chunked(q, k, v, scale)
