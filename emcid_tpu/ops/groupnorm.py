"""Fused GroupNorm(+SiLU) — single-pass Pallas TPU kernels.

Motivation (PERF.md, round-4 graph-glue audit): after the flash-v2
attention kernels, the residual gap between the UNet's kernel-sum and its
wall time is the GroupNorm reduce chains — XLA lowers GroupNorm to a
stats *reduce* pass plus a *normalize* pass fused into the consumer, i.e.
at least two HBM reads of every activation, and drags the adjacent conv
fusions with it.  These kernels do the whole op in ONE HBM read and one
write per element:

* **forward** — grid cell = (batch item, channel chunk of whole groups).
  The (S, Cc) slab lives in VMEM; a chunked f32 sum/sum-sq sweep builds
  per-channel moments, a tiny membership matmul (Cc×Gc on the MXU) folds
  them to per-group mean/rstd and broadcasts back, and a second VMEM-only
  sweep writes ``silu((x - μ)·r·γ + β)``.  Per-group (μ, r) are saved for
  the backward (B×2×G f32 — negligible).
* **backward** — same grid, batch innermost so the per-channel dγ/dβ
  accumulators revisit their output block consecutively.  The SiLU
  derivative, the two per-group reductions of the GroupNorm VJP, and dx
  are produced from one read each of x and the cotangent.

Parity: flax ``nn.GroupNorm`` semantics — contiguous channel groups,
float32 statistics, fast (E[x²]−E[x]²) variance — matching the reference
UNet's ``torch.nn.GroupNorm`` usage (the reference edits diffusers'
UNet2DConditionModel in place, e.g. /root/reference/emcid/compute_z.py
Stage-1 forwards); the fused path normalizes in f32 where flax-with-bf16
rounds to bf16 first, a strictly-tighter rounding (bounded in
tests/test_groupnorm.py against an f64 oracle).

Used by models/unet.py behind ``EMCID_TPU_FUSED_GN=1`` (default off until
the on-chip A/B in scripts/prof_gn.py justifies flipping it).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BUDGET = 12 * 1024 * 1024  # VMEM to spend on double-buffered big blocks


def _row_chunk(S: int, cap: int = 512) -> int:
    """Largest divisor of S that is <= cap (f32 temps stay ~R*Cc*4)."""
    r = min(S, cap)
    while S % r:
        r -= 1
    return r


def _pick_chunk(S: int, C: int, G: int, itemsize: int, n_big: int
                ) -> Optional[int]:
    """Channel-chunk size: k whole groups, k | G, so group statistics are
    complete within one block.  ``n_big`` = number of (S, Cc) blocks the
    kernel holds (fwd: x+y = 2; bwd: x+g+dx = 3), each double-buffered.

    Hardware conformance (measured on-chip, PERF.md round 4 — the TPU
    lowering rejects what the CPU interpret mode accepts): the trailing
    block dim must be a multiple of 128 lanes or equal the full array
    dim, so chunks that are neither are skipped; `fits()` returns False
    when no conforming chunk exists and the caller falls back to XLA."""
    cg = C // G
    for k in sorted((d for d in range(1, G + 1) if G % d == 0),
                    reverse=True):
        cc = k * cg
        if cc != C and cc % 128:
            continue
        if cc * S * itemsize * 2 * n_big <= _BUDGET:
            return cc
    return None


def _membership(cc: int, cg: int) -> jnp.ndarray:
    """(Cc, Gc) one-hot channel→group matrix (contiguous groups)."""
    gc = cc // cg
    c = jax.lax.broadcasted_iota(jnp.int32, (cc, gc), 0)
    g = jax.lax.broadcasted_iota(jnp.int32, (cc, gc), 1)
    return (c // cg == g).astype(jnp.float32)


def _dot(a, b):
    # Precision.HIGHEST is load-bearing: these tiny membership matmuls
    # fold LARGE f32 per-channel sums into group statistics, and the
    # MXU's default bf16-rounded passes cost ~0.4% relative on the sums —
    # measured on-chip as a systematic dx bias (group dx-sums O(10^2-10^3)
    # instead of ~0) while CPU interpret mode, which computes f32 exactly,
    # passed (PERF.md round 4, prof_gn2).  The matmuls are (Cc, Gc)-sized;
    # the 6-pass bf16x6 cost of HIGHEST is negligible (bf16x3 would be
    # Precision.HIGH, the tensorfloat-like tier — ADVICE r4).
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _slot(gc: int) -> int:
    """Stats-slot width: Gc rounded up to 128 lanes so the (1, 2, W)
    stats block always conforms to the TPU lowering (the bare (1, 2, Gc)
    block failed on-chip whenever Gc < G — PERF.md round 4)."""
    return -(-gc // 128) * 128


def _pad_lanes(v: jnp.ndarray, W: int) -> jnp.ndarray:
    """(1, Gc) → (1, W) zero-padded."""
    gc = v.shape[-1]
    if gc == W:
        return v
    return jnp.concatenate([v, jnp.zeros((1, W - gc), v.dtype)], axis=1)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, sc_ref, bi_ref, y_ref, st_ref, *,
                S: int, Cg: int, eps: float, act: str, R: int):
    Cc = x_ref.shape[-1]
    M = _membership(Cc, Cg)
    nR = S // R

    def moments(i, carry):
        s, sq = carry
        xc = x_ref[0, pl.ds(i * R, R), :].astype(jnp.float32)
        return (s + jnp.sum(xc, axis=0, keepdims=True),
                sq + jnp.sum(xc * xc, axis=0, keepdims=True))

    zero = jnp.zeros((1, Cc), jnp.float32)
    s, sq = jax.lax.fori_loop(0, nR, moments, (zero, zero))

    n = float(S * Cg)
    mean_g = _dot(s, M) / n                                   # (1, Gc)
    var_g = jnp.maximum(_dot(sq, M) / n - mean_g * mean_g, 0.0)
    r_g = jax.lax.rsqrt(var_g + eps)
    W = st_ref.shape[-1]
    st_ref[0, 0:1, :] = _pad_lanes(mean_g, W)
    st_ref[0, 1:2, :] = _pad_lanes(r_g, W)

    mean_c = _dot(mean_g, M.T)                                # (1, Cc)
    r_c = _dot(r_g, M.T)
    a = r_c * sc_ref[...].astype(jnp.float32)
    b = bi_ref[...].astype(jnp.float32) - mean_c * a

    def normalize(i, _):
        xc = x_ref[0, pl.ds(i * R, R), :].astype(jnp.float32)
        y = xc * a + b
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        y_ref[0, pl.ds(i * R, R), :] = y.astype(y_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nR, normalize, 0)


def _fwd_call(x3, scale, bias, G: int, eps: float, act: str,
              interpret: bool):
    B, S, C = x3.shape
    Cg = C // G
    Cc = _pick_chunk(S, C, G, x3.dtype.itemsize, n_big=2)
    assert Cc is not None, "caller must check fits()"
    nC = C // Cc
    Gc = Cc // Cg
    R = _row_chunk(S)
    sc2 = scale.astype(jnp.float32).reshape(1, C)
    bi2 = bias.astype(jnp.float32).reshape(1, C)

    W = _slot(Gc)
    y, st = pl.pallas_call(
        functools.partial(_fwd_kernel, S=S, Cg=Cg, eps=eps, act=act, R=R),
        grid=(B, nC),
        in_specs=[
            pl.BlockSpec((1, S, Cc), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, Cc), lambda b, j: (0, j)),
            pl.BlockSpec((1, Cc), lambda b, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, S, Cc), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, 2, W), lambda b, j: (b, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, C), x3.dtype),
            jax.ShapeDtypeStruct((B, 2, nC * W), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x3, sc2, bi2)
    # canonical (B, 2, G) — fwd and bwd may pick DIFFERENT chunkings
    # (n_big 2 vs 3), so the saved stats cannot carry the fwd's slot pad
    st = st.reshape(B, 2, nC, W)[..., :Gc].reshape(B, 2, G)
    return y, st


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, g_ref, sc_ref, bi_ref, st_ref,
                dx_ref, dsc_ref, dbi_ref, *,
                S: int, Cg: int, act: str, R: int):
    b = pl.program_id(1)
    Cc = x_ref.shape[-1]
    Gc = Cc // Cg
    M = _membership(Cc, Cg)
    nR = S // R

    mean_c = _dot(st_ref[0, 0:1, 0:Gc], M.T)                  # (1, Cc)
    r_c = _dot(st_ref[0, 1:2, 0:Gc], M.T)
    sc = sc_ref[...].astype(jnp.float32)

    def dz_xhat(i):
        xc = x_ref[0, pl.ds(i * R, R), :].astype(jnp.float32)
        gc = g_ref[0, pl.ds(i * R, R), :].astype(jnp.float32)
        xhat = (xc - mean_c) * r_c
        if act == "silu":
            z = xhat * sc + bi_ref[...].astype(jnp.float32)
            sig = jax.nn.sigmoid(z)
            dz = gc * sig * (1.0 + z * (1.0 - sig))
        else:
            dz = gc
        return dz, xhat

    def sums(i, carry):
        a1, a2 = carry
        dz, xhat = dz_xhat(i)
        return (a1 + jnp.sum(dz, axis=0, keepdims=True),
                a2 + jnp.sum(dz * xhat, axis=0, keepdims=True))

    zero = jnp.zeros((1, Cc), jnp.float32)
    a1, a2 = jax.lax.fori_loop(0, nR, sums, (zero, zero))

    n = float(S * Cg)
    u_c = _dot(_dot(a1 * sc, M), M.T) / n        # group-mean of dxhat
    w_c = _dot(_dot(a2 * sc, M), M.T) / n        # group-mean of dxhat·xhat

    def write_dx(i, _):
        dz, xhat = dz_xhat(i)
        dx = r_c * (dz * sc - u_c - xhat * w_c)
        dx_ref[0, pl.ds(i * R, R), :] = dx.astype(dx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nR, write_dx, 0)

    @pl.when(b == 0)
    def _():
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)

    dsc_ref[...] += a2
    dbi_ref[...] += a1


def _bwd_reference(x3, g3, scale, bias, st, G: int, act: str):
    """jnp mirror of ``_bwd_kernel`` (same f32 math, consumes the
    forward's saved per-group (mean, rstd)) — used when the backward
    kernel has no VMEM-conforming chunk, so the fused FORWARD stays
    usable at shapes like the 512-res level-0 (24, 4096, 320) where the
    fwd fits (2 big blocks) but the bwd (3 blocks) does not."""
    B, S, C = x3.shape
    Cg = C // G
    x = x3.astype(jnp.float32)
    g = g3.astype(jnp.float32)
    mean_c = jnp.repeat(st[:, 0, :], Cg, axis=-1)[:, None, :]   # (B,1,C)
    r_c = jnp.repeat(st[:, 1, :], Cg, axis=-1)[:, None, :]
    sc = scale.astype(jnp.float32).reshape(1, 1, C)
    xhat = (x - mean_c) * r_c
    if act == "silu":
        z = xhat * sc + bias.astype(jnp.float32).reshape(1, 1, C)
        sig = jax.nn.sigmoid(z)
        dz = g * sig * (1.0 + z * (1.0 - sig))
    else:
        dz = g
    dxhat = dz * sc
    n = float(S * Cg)

    def gmean(t):                                              # (B,1,C)
        gsum = jnp.sum(t.reshape(B, S, G, Cg), axis=(1, 3)) / n
        return jnp.repeat(gsum, Cg, axis=-1)[:, None, :]

    dx = (r_c * (dxhat - gmean(dxhat) - xhat * gmean(dxhat * xhat))
          ).astype(x3.dtype)
    dsc = jnp.sum(dz * xhat, axis=(0, 1))
    dbi = jnp.sum(dz, axis=(0, 1))
    return dx, dsc, dbi


def _bwd_call(x3, g3, scale, bias, st, G: int, act: str,
              interpret: bool):
    # no eps parameter: the backward never recomputes rstd — it reads the
    # (mean, rstd) saved by the forward from st
    B, S, C = x3.shape
    Cg = C // G
    Cc = _pick_chunk(S, C, G, x3.dtype.itemsize, n_big=3)
    if Cc is None:
        return _bwd_reference(x3, g3, scale, bias, st, G, act)
    nC = C // Cc
    Gc = Cc // Cg
    R = _row_chunk(S)
    sc2 = scale.astype(jnp.float32).reshape(1, C)
    bi2 = bias.astype(jnp.float32).reshape(1, C)

    # re-slot the canonical (B, 2, G) stats to THIS chunking's padded
    # lane layout (the bwd chunk may differ from the fwd's)
    W = _slot(Gc)
    st_in = st.reshape(B, 2, nC, Gc)
    if W != Gc:
        st_in = jnp.pad(st_in, ((0, 0), (0, 0), (0, 0), (0, W - Gc)))
    st_in = st_in.reshape(B, 2, nC * W)

    dx, dsc, dbi = pl.pallas_call(
        functools.partial(_bwd_kernel, S=S, Cg=Cg, act=act, R=R),
        grid=(nC, B),
        in_specs=[
            pl.BlockSpec((1, S, Cc), lambda j, b: (b, 0, j)),
            pl.BlockSpec((1, S, Cc), lambda j, b: (b, 0, j)),
            pl.BlockSpec((1, Cc), lambda j, b: (0, j)),
            pl.BlockSpec((1, Cc), lambda j, b: (0, j)),
            pl.BlockSpec((1, 2, W), lambda j, b: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, S, Cc), lambda j, b: (b, 0, j)),
            pl.BlockSpec((1, Cc), lambda j, b: (0, j)),
            pl.BlockSpec((1, Cc), lambda j, b: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, C), x3.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x3, g3, sc2, bi2, st_in)
    return dx, dsc.reshape(C), dbi.reshape(C)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def fits(shape: Tuple[int, ...], num_groups: int,
         itemsize: int = 2) -> bool:
    """True when the fused FORWARD's VMEM chunking works for (..., C)
    ``shape``.  The backward is not gated here: when its 3-big-block
    chunking does not fit (e.g. 512-res level-0 (24, 4096, 320) bf16),
    ``_bwd_call`` transparently falls back to the jnp mirror
    ``_bwd_reference`` — so the fused forward's one-pass win is kept even
    at shapes whose backward must go through XLA."""
    C = shape[-1]
    S = 1
    for d in shape[1:-1]:
        S *= d
    if C % num_groups:
        return False
    return _pick_chunk(S, C, num_groups, itemsize, 2) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def gn_act_pallas(x, scale, bias, num_groups: int, eps: float,
                  act: str = "none", interpret: bool = False):
    """Fused GroupNorm(+act) Pallas kernel, (..., C) → (..., C)."""
    y, _ = _vjp_fwd(x, scale, bias, num_groups, eps, act, interpret)
    return y


def _vjp_fwd(x, scale, bias, num_groups, eps, act, interpret):
    shape = x.shape
    B, C = shape[0], shape[-1]
    x3 = x.reshape(B, -1, C)
    y, st = _fwd_call(x3, scale, bias, num_groups, eps, act, interpret)
    return y.reshape(shape), (x3, scale, bias, st)


def _vjp_bwd(num_groups, eps, act, interpret, res, g):
    x3, scale, bias, st = res
    g3 = g.reshape(x3.shape)
    dx, dsc, dbi = _bwd_call(x3, g3, scale, bias, st, num_groups, act,
                             interpret)
    return (dx.reshape(g.shape), dsc.astype(scale.dtype),
            dbi.astype(bias.dtype))


gn_act_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def gn_act_reference(x, scale, bias, *, num_groups: int, eps: float,
                     act: str = "none"):
    """jnp mirror of the kernel math (f32 stats + f32 normalize/act) —
    the non-TPU path and the test oracle for the Pallas kernels."""
    shape = x.shape
    B, C = shape[0], shape[-1]
    cg = C // num_groups
    xg = x.reshape(B, -1, num_groups, cg).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.maximum(jnp.mean(xg * xg, axis=(1, 3), keepdims=True)
                      - mean * mean, 0.0)
    xhat = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = (xhat.reshape(B, -1, C) * scale.astype(jnp.float32)
         + bias.astype(jnp.float32))
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype).reshape(shape)


def geo_wins(shape: Tuple[int, ...]) -> bool:
    """Measured-win frontier for the per-geometry gate
    (``EMCID_TPU_FUSED_GN=geo``): the fused one-pass forward wins where
    GroupNorm is bandwidth-bound — many tokens, narrow channels — and
    loses where XLA's consumer fusion already covers it.  On-chip A/B
    (PERF.md round-4/5 "fused GroupNorm"): 2.35x at (24, 4096, 320)
    [512-res level-0]; 0.36x at (24, 1024, 1280) [level-2].  The
    frontier S >= 2048, C <= 640 admits the level-0/1 sites at 512- and
    384-res grids (S=4096/2304, C=320/640) and excludes every measured
    loss; refine from scripts/prof_gn3.py data."""
    C = shape[-1]
    S = 1
    for d in shape[1:-1]:
        S *= d
    return S >= 2048 and C <= 640


def group_norm_act(x, scale, bias, *, num_groups: int, eps: float,
                   act: str = "none", geo_only: bool = False):
    """Dispatch: fused Pallas kernel on TPU backends when the shape fits
    the VMEM chunking, jnp reference elsewhere (CPU tests, odd shapes).
    ``geo_only`` additionally requires the geometry to be on the measured
    win frontier (``geo_wins``) — the EMCID_TPU_FUSED_GN=geo mode, which
    also shrinks the Pallas-site count of full-UNet programs (the
    all-sites variant crashed the tunnel's remote compiler, PERF.md)."""
    if (jax.default_backend() in ("tpu", "axon")
            and fits(x.shape, num_groups, x.dtype.itemsize)
            and (not geo_only or geo_wins(x.shape))):
        return gn_act_pallas(x, scale, bias, num_groups, eps, act)
    return gn_act_reference(x, scale, bias, num_groups=num_groups, eps=eps,
                            act=act)
