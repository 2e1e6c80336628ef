"""Flash attention v2 — online-softmax Pallas TPU kernels tuned for SD's
small head dims (D = 40/80/160 on 128-lane hardware).

Layout strategy (the whole point of v2): the lane dimension is always 128,
so any matmul with D on the lanes burns ``128/D`` of the MXU.  That is
unavoidable for Q·Kᵀ (the contraction is over D), but NOT for the P·V
product or for most of the backward:

* **forward** — scores are computed transposed, ``sᵀ = K·Qᵀ`` (BK × BQ), so
  the softmax reduces over *sublanes* (cheap register adds) and the output
  accumulates as ``oᵀ = Vᵀ·p`` with D on the **sublanes** of Vᵀ — a
  (D̃ × BK) @ (BK × BQ) matmul with zero lane padding (D̃ = D rounded to 16).
  Per-block running (m, l) implement the online softmax; the logsumexp is
  saved for the backward.
* **backward** — two kernels (dQ over q-blocks; dK/dV over k-blocks), both
  reusing the transposed score recompute and the saved logsumexp (no second
  normalization pass).  dQᵀ = K̃ᵀ·dSᵀ again has D on sublanes (no waste);
  dK/dV accumulate in standard layout (their contraction is over BQ).

All wrappers take/return the UNet's native (B, N, H, D).
Correctness is validated against the einsum reference in interpret mode on
CPU (tests/test_attention.py) and on device.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ceil(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _ceil(x, m) * m


def _fit_block(cap: int, n: int) -> int:
    """Largest 128-multiple block <= cap minimizing total padded length.

    For power-of-two n this reproduces ``min(cap, n)``.  For the train_res
    grids the sequence is NOT a power of two (384 px -> 48^2 = 2304 tokens):
    a blind cap-sized block pads 2304 -> 4096 on the q axis (and 3072 on
    the k axis at BK=1024) — 2.4x physical work.  Blocks of 1152/768 tile
    2304 exactly; padding-aware choice keeps the train_res attention win.

    Blocks below 512 are never considered for sequences >= 512: the v5e
    sweep showed small blocks losing to padding at every measured shape
    (grid overhead + less latency hiding), so a 128-block that happens to
    tile exactly (e.g. 1664 = 13*128) would still be a net loss vs a
    896-block with 7.7% padding.
    """
    nr = _round_up(n, 128)
    lo = min(512, nr)
    best_b, best = lo, None
    for b in range(lo, min(cap, nr) + 1, 128):
        key = (_round_up(nr, b), -b)  # least padding, then largest block
        if best is None or key < best:
            best, best_b = key, b
    return best_b


def _blocks(N: int, M: int, D: int, bwd: bool = False) -> Tuple[int, int]:
    # swept on v5e at the level-0 shape (B=24, N=M=4096, H=8, D=40),
    # scanned-program slope timing: fwd BQ/BK 2048/1024 -> 12.6 ms,
    # 1024/1024 -> 13.2, 1024/2048 -> 13.1, 512/2048 -> 13.7; 2048/2048 and
    # 4096/1024 fail to compile (VMEM). Two VMEM constraints:
    # * the BACKWARD kernels hold two (BK, BQ) f32 temporaries — BQ=2048
    #   exceeds the 16 MB scoped limit there, so bwd stays at 1024/1024
    #   (26.6 ms fwd+bwd);
    # * the FORWARD's o_acc is (Dt, BQ) f32 — fine at the UNet's D=40/80,
    #   but the VAE decoder's single-head D=512 attention needs BQ=1024.
    # An explicit env var wins verbatim; the default is padding-aware
    # (_fit_block), identical to the swept values at power-of-two N/M.
    if bwd:
        bq_env = os.environ.get("EMCID_TPU_FLASH_BQ_BWD")
        bk_env = os.environ.get("EMCID_TPU_FLASH_BK_BWD")
        bq = int(bq_env) if bq_env else _fit_block(1024, N)
        bk = int(bk_env) if bk_env else _fit_block(1024, M)
    else:
        bq_default = 2048 if D <= 128 else 1024
        bq_env = os.environ.get("EMCID_TPU_FLASH_BQ")
        bk_env = os.environ.get("EMCID_TPU_FLASH_BK")
        bq = int(bq_env) if bq_env else _fit_block(bq_default, N)
        bk = int(bk_env) if bk_env else _fit_block(1024, M)
    return min(bq, _round_up(N, 128)), min(bk, _round_up(M, 128))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(k_ref, qt_ref, vt_ref, ot_ref, lse_ref, o_acc, m_s, l_s, *,
                scale: float, M: int, BK: int):
    mk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(mk == 0)
    def _():
        o_acc[:] = jnp.zeros_like(o_acc)
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)

    k = k_ref[0]          # (BK, Dp)   lanes = Dp = 128
    qt = qt_ref[0]        # (Dp, BQ)
    vt = vt_ref[0]        # (Dt, BK)   sublanes = Dt
    s_t = jax.lax.dot_general(
        k, qt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale             # (BK, BQ)
    if M % BK:            # mask zero-padded K rows (last block only)
        row = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0) + mk * BK
        s_t = jnp.where(row < M, s_t, NEG_INF)

    m_prev, l_prev = m_s[:], l_s[:]
    m_blk = jnp.max(s_t, axis=0, keepdims=True)          # (1, BQ)
    m_new = jnp.maximum(m_prev, m_blk)
    p = jnp.exp(s_t - m_new)                             # (BK, BQ) f32
    corr = jnp.exp(m_prev - m_new)                       # (1, BQ)
    l_s[:] = l_prev * corr + jnp.sum(p, axis=0, keepdims=True)
    m_s[:] = m_new
    o_acc[:] = o_acc[:] * corr + jax.lax.dot_general(
        vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (Dt, BQ)

    @pl.when(mk == nk - 1)
    def _():
        l = jnp.maximum(l_s[:], 1e-30)
        ot_ref[0] = (o_acc[:] / l).astype(ot_ref.dtype)
        lse_ref[0] = m_s[:] + jnp.log(l)


def _fwd(q, k, v, scale: float, interpret: bool = False):
    """(B, N, H, D) x2(M) → (out (B, N, H, D), lse (BH, 1, Np))."""
    B, N, H, D = q.shape
    M = k.shape[1]
    BQ, BK = _blocks(N, M, D)
    Dp = _round_up(D, 128)   # lane-padded (QK contraction)
    Dt = _round_up(D, 16)    # sublane-padded (PV output)
    Np, Mp = _round_up(N, BQ), _round_up(M, BK)

    def to_bh(x, L):  # (B, L, H, D) -> (B*H, L, D)
        return jnp.swapaxes(x, 1, 2).reshape(B * H, L, D)

    kf = to_bh(k, M)
    kf = jnp.pad(kf, ((0, 0), (0, Mp - M), (0, Dp - D)))
    qt = jnp.pad(jnp.swapaxes(to_bh(q, N), 1, 2),
                 ((0, 0), (0, Dp - D), (0, Np - N)))
    vt = jnp.pad(jnp.swapaxes(to_bh(v, M), 1, 2),
                 ((0, 0), (0, Dt - D), (0, Mp - M)))

    grid = (B * H, Np // BQ, Mp // BK)
    ot, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, M=M, BK=BK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BK, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, Dp, BQ), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, Dt, BK), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, Dt, BQ), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, BQ), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Dt, Np), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, Np), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Dt, BQ), jnp.float32),
            pltpu.VMEM((1, BQ), jnp.float32),
            pltpu.VMEM((1, BQ), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kf, qt, vt)
    out = ot[:, :D, :N].reshape(B, H, D, N)
    return jnp.transpose(out, (0, 3, 1, 2)), lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(k_ref, kt_ref, v_ref, qt_ref, dot_ref, lse_ref, delta_ref,
               dqt_ref, dq_acc, *, scale: float, M: int, BK: int):
    mk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(mk == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    s_t = jax.lax.dot_general(
        k_ref[0], qt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                            # (BK, BQ)
    if M % BK:
        row = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0) + mk * BK
        s_t = jnp.where(row < M, s_t, NEG_INF)
    p_t = jnp.exp(s_t - lse_ref[0])                      # (BK, BQ)
    dp_t = jax.lax.dot_general(
        v_ref[0], dot_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (BK, BQ)
    ds_t = (p_t * (dp_t - delta_ref[0])).astype(kt_ref.dtype)
    dq_acc[:] += jax.lax.dot_general(
        kt_ref[0], ds_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (Dt, BQ)

    @pl.when(mk == nk - 1)
    def _():
        dqt_ref[0] = (dq_acc[:] * scale).astype(dqt_ref.dtype)


def _dkv_kernel(k_ref, v_ref, qt_ref, q_ref, dot_ref, do_ref, lse_ref,
                delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                scale: float, M: int, BK: int):
    nq = pl.program_id(2)
    nqs = pl.num_programs(2)
    mk = pl.program_id(1)

    @pl.when(nq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    s_t = jax.lax.dot_general(
        k_ref[0], qt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                            # (BK, BQ)
    if M % BK:
        row = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0) + mk * BK
        s_t = jnp.where(row < M, s_t, NEG_INF)
    p_t = jnp.exp(s_t - lse_ref[0])                      # (BK, BQ)
    dv_acc[:] += jax.lax.dot_general(
        p_t.astype(do_ref.dtype), do_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (BK, Dp)
    dp_t = jax.lax.dot_general(
        v_ref[0], dot_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds_t = (p_t * (dp_t - delta_ref[0])).astype(q_ref.dtype)
    dk_acc[:] += jax.lax.dot_general(
        ds_t, q_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (BK, Dp)

    @pl.when(nq == nqs - 1)
    def _():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd(res, g, scale: float, interpret: bool = False):
    q, k, v, lse, o = res
    B, N, H, D = q.shape
    M = k.shape[1]
    BQ, BK = _blocks(N, M, D, bwd=True)
    Dp = _round_up(D, 128)
    Dt = _round_up(D, 16)
    Np, Mp = _round_up(N, BQ), _round_up(M, BK)

    def to_bh(x, L):
        return jnp.swapaxes(x, 1, 2).reshape(B * H, L, D)

    qf = jnp.pad(to_bh(q, N), ((0, 0), (0, Np - N), (0, Dp - D)))
    kf = jnp.pad(to_bh(k, M), ((0, 0), (0, Mp - M), (0, Dp - D)))
    vf = jnp.pad(to_bh(v, M), ((0, 0), (0, Mp - M), (0, Dp - D)))
    dof = jnp.pad(to_bh(g, N), ((0, 0), (0, Np - N), (0, Dp - D)))
    qt = jnp.swapaxes(qf, 1, 2)                       # (BH, Dp, Np)
    # derive from kf (already padded) instead of re-reading/transposing k:
    # the Dp-D pad rows are zero, so truncating to Dt rows is exact
    kt = jnp.swapaxes(kf, 1, 2)[:, :Dt, :]            # (BH, Dt, Mp)
    dot_ = jnp.swapaxes(dof, 1, 2)                    # (BH, Dp, Np)

    # delta_i = sum_d dO_i * O_i (O saved as a residual by the forward —
    # it is the primal output, so this costs no extra compute)
    delta = jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)
    delta = jnp.swapaxes(delta, 1, 2).reshape(B * H, 1, N)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Np - N)))
    # lse was padded to the FORWARD's Np; the backward may block differently
    if lse.shape[2] > Np:
        lse = lse[:, :, :Np]
    elif lse.shape[2] < Np:
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, Np - lse.shape[2])))

    grid_q = (B * H, Np // BQ, Mp // BK)
    dqt = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, M=M, BK=BK),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, BK, Dp), lambda b, i, j: (b, j, 0)),   # k
            pl.BlockSpec((1, Dt, BK), lambda b, i, j: (b, 0, j)),   # kt
            pl.BlockSpec((1, BK, Dp), lambda b, i, j: (b, j, 0)),   # v
            pl.BlockSpec((1, Dp, BQ), lambda b, i, j: (b, 0, i)),   # qt
            pl.BlockSpec((1, Dp, BQ), lambda b, i, j: (b, 0, i)),   # dOt
            pl.BlockSpec((1, 1, BQ), lambda b, i, j: (b, 0, i)),    # lse
            pl.BlockSpec((1, 1, BQ), lambda b, i, j: (b, 0, i)),    # delta
        ],
        out_specs=pl.BlockSpec((1, Dt, BQ), lambda b, i, j: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B * H, Dt, Np), q.dtype),
        scratch_shapes=[pltpu.VMEM((Dt, BQ), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kf, kt, vf, qt, dot_, lse, delta)

    grid_kv = (B * H, Mp // BK, Np // BQ)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, M=M, BK=BK),
        grid=grid_kv,
        in_specs=[
            pl.BlockSpec((1, BK, Dp), lambda b, j, i: (b, j, 0)),   # k
            pl.BlockSpec((1, BK, Dp), lambda b, j, i: (b, j, 0)),   # v
            pl.BlockSpec((1, Dp, BQ), lambda b, j, i: (b, 0, i)),   # qt
            pl.BlockSpec((1, BQ, Dp), lambda b, j, i: (b, i, 0)),   # q
            pl.BlockSpec((1, Dp, BQ), lambda b, j, i: (b, 0, i)),   # dOt
            pl.BlockSpec((1, BQ, Dp), lambda b, j, i: (b, i, 0)),   # dO
            pl.BlockSpec((1, 1, BQ), lambda b, j, i: (b, 0, i)),    # lse
            pl.BlockSpec((1, 1, BQ), lambda b, j, i: (b, 0, i)),    # delta
        ],
        out_specs=[
            pl.BlockSpec((1, BK, Dp), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, BK, Dp), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Mp, Dp), q.dtype),
            jax.ShapeDtypeStruct((B * H, Mp, Dp), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((BK, Dp), jnp.float32),
            pltpu.VMEM((BK, Dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kf, vf, qt, qf, dot_, dof, lse, delta)

    def from_t(xt):  # (BH, Dt, Np) -> (B, N, H, D)
        x = xt[:, :D, :N].reshape(B, H, D, N)
        return jnp.transpose(x, (0, 3, 1, 2))

    def from_std(x):  # (BH, Mp, Dp) -> (B, M, H, D)
        x = x[:, :M, :D].reshape(B, H, M, D)
        return jnp.swapaxes(x, 1, 2)

    return from_t(dqt), from_std(dk), from_std(dv)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_v2(q, k, v, scale: Optional[float] = None,
                       interpret: bool = False):
    """Online-softmax Pallas flash attention, (B,N,H,D)x(B,M,H,D)→(B,N,H,D).

    Forward saves the logsumexp; backward is two Pallas kernels (dQ; dK/dV)
    — no N² residuals, no full jnp recompute."""
    s = scale if scale is not None else q.shape[-1] ** -0.5
    out, _ = _fwd(q, k, v, s, interpret=interpret)
    return out


def _v2_fwd(q, k, v, scale, interpret):
    s = scale if scale is not None else q.shape[-1] ** -0.5
    out, lse = _fwd(q, k, v, s, interpret=interpret)
    return out, (q, k, v, lse, out)


def _v2_bwd(scale, interpret, res, g):
    s = scale if scale is not None else res[0].shape[-1] ** -0.5
    return _bwd(res, g, s, interpret=interpret)


flash_attention_v2.defvjp(_v2_fwd, _v2_bwd)
