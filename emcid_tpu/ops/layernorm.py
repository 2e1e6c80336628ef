"""Fused LayerNorm — single-pass Pallas TPU kernels.

Companion to ops/groupnorm.py (see its module docstring for the traffic
argument): the UNet's transformer blocks hold 3 LayerNorms each (48 sites,
15 of them at the level-0 (24, 4096, 320) slab), and XLA lowers each as a
stats reduce plus a consumer-fused normalize — ≥2 HBM reads per element.
These kernels do one read + one write:

* **forward** — grid cell = (batch, row chunk).  Row statistics are
  chunk-local (the reduction is over channels only), so there is no
  cross-chunk coupling at all: f32 row moments via lane reductions,
  normalize, affine, write.  Nothing is saved for the backward — the
  row stats are recomputed from the VMEM-resident x chunk.
* **backward** — same grid; the LN VJP's two row reductions and dx come
  from one read each of x and the cotangent; dγ/dβ accumulate into a
  PER-BATCH partial block (only the row-chunk dim revisits state, so the
  batch dim stays Megacore-parallel); XLA sums the B partials outside.

Parity: flax ``nn.LayerNorm`` semantics (f32 stats, fast variance), the
UNet's norm1/2/3 — the reference runs these through diffusers
``BasicTransformerBlock`` (diffusers/models/attention.py, ``self.norm1/2/3
= nn.LayerNorm(dim)``) whose torch default eps is 1e-5; models/unet.py
passes eps=1e-5 accordingly (reference call path:
/root/reference/emcid/compute_z.py:397-418 via pipe.unet).  Used by
models/unet.py behind EMCID_TPU_FUSED_LN=1 (default off until
scripts/prof_gn.py measures it on-chip).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BUDGET = 12 * 1024 * 1024


def _pick_rows(S: int, C: int, itemsize: int, n_big: int) -> Optional[int]:
    """Row-chunk R | S with the n_big (R, C) blocks double-buffered in
    VMEM; prefer larger chunks (fewer grid steps).

    Hardware conformance (measured on-chip, PERF.md round 4): the
    second-to-last block dim must be a multiple of 8 sublanes or equal
    the full array dim — non-conforming R is skipped and `fits()` falls
    back to XLA when none exists."""
    best = None
    for r in range(min(S, 1024), 0, -1):
        if r % 8 and r != S:
            continue
        if S % r == 0 and r * C * itemsize * 2 * n_big <= _BUDGET:
            best = r
            break
    return best


def _rowstats(xc: jnp.ndarray, eps: float):
    mean = jnp.mean(xc, axis=-1, keepdims=True)                # (R, 1)
    var = jnp.maximum(jnp.mean(xc * xc, axis=-1, keepdims=True)
                      - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def _fwd_kernel(x_ref, sc_ref, bi_ref, y_ref, *, C: int, eps: float,
                act: str):
    xc = x_ref[0].astype(jnp.float32)                          # (R, C)
    mean, r = _rowstats(xc, eps)
    y = (xc - mean) * r * sc_ref[...].astype(jnp.float32) \
        + bi_ref[...].astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    y_ref[0] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, sc_ref, bi_ref, dx_ref, dsc_ref, dbi_ref, *,
                C: int, eps: float, act: str):
    i = pl.program_id(1)
    xc = x_ref[0].astype(jnp.float32)
    gc = g_ref[0].astype(jnp.float32)
    sc = sc_ref[...].astype(jnp.float32)
    mean, r = _rowstats(xc, eps)
    xhat = (xc - mean) * r
    if act == "silu":
        z = xhat * sc + bi_ref[...].astype(jnp.float32)
        sig = jax.nn.sigmoid(z)
        dz = gc * sig * (1.0 + z * (1.0 - sig))
    else:
        dz = gc
    dxhat = dz * sc
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)               # (R, 1)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[0] = (r * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)

    # dγ/dβ accumulate into a PER-BATCH partial block, so only the
    # row-chunk dim (i) revisits state and the batch dim stays parallel
    # (Megacore); XLA sums the B partials outside the kernel.  The
    # partials live as (B, 1, C) — a bare (B, C) block of (1, C) has a
    # 1-sublane leading dim the TPU lowering rejects (PERF.md round 4)
    @pl.when(i == 0)
    def _():
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)

    dsc_ref[0] += jnp.sum(dz * xhat, axis=0, keepdims=True)
    dbi_ref[0] += jnp.sum(dz, axis=0, keepdims=True)


def _fwd_call(x3, scale, bias, eps, act, interpret):
    B, S, C = x3.shape
    R = _pick_rows(S, C, x3.dtype.itemsize, n_big=2)
    assert R is not None, "caller must check fits()"
    sc2 = scale.astype(jnp.float32).reshape(1, C)
    bi2 = bias.astype(jnp.float32).reshape(1, C)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, C=C, eps=eps, act=act),
        grid=(B, S // R),
        in_specs=[
            pl.BlockSpec((1, R, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x3.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x3, sc2, bi2)


def _bwd_call(x3, g3, scale, bias, eps, act, interpret):
    B, S, C = x3.shape
    R = _pick_rows(S, C, x3.dtype.itemsize, n_big=3)
    assert R is not None, "caller must check fits()"
    sc2 = scale.astype(jnp.float32).reshape(1, C)
    bi2 = bias.astype(jnp.float32).reshape(1, C)
    dx, dsc, dbi = pl.pallas_call(
        functools.partial(_bwd_kernel, C=C, eps=eps, act=act),
        grid=(B, S // R),
        in_specs=[
            pl.BlockSpec((1, R, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, R, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, R, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, C), x3.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # only the row-chunk dim revisits the per-batch dγ/dβ block
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x3, g3, sc2, bi2)
    return dx, dsc.reshape(B, C).sum(axis=0), dbi.reshape(B, C).sum(axis=0)


def fits(shape: Tuple[int, ...], itemsize: int = 2) -> bool:
    C = shape[-1]
    S = 1
    for d in shape[1:-1]:
        S *= d
    return (_pick_rows(S, C, itemsize, 2) is not None
            and _pick_rows(S, C, itemsize, 3) is not None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ln_act_pallas(x, scale, bias, eps: float, act: str = "none",
                  interpret: bool = False):
    """Fused LayerNorm(+act) Pallas kernel, (..., C) → (..., C)."""
    y, _ = _vjp_fwd(x, scale, bias, eps, act, interpret)
    return y


def _vjp_fwd(x, scale, bias, eps, act, interpret):
    x3 = x.reshape(x.shape[0], -1, x.shape[-1])
    y = _fwd_call(x3, scale, bias, eps, act, interpret)
    return y.reshape(x.shape), (x3, scale, bias)


def _vjp_bwd(eps, act, interpret, res, g):
    x3, scale, bias = res
    dx, dsc, dbi = _bwd_call(x3, g.reshape(x3.shape), scale, bias, eps, act,
                             interpret)
    return (dx.reshape(g.shape), dsc.astype(scale.dtype),
            dbi.astype(bias.dtype))


ln_act_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def ln_act_reference(x, scale, bias, *, eps: float, act: str = "none"):
    """jnp mirror of the kernel math — non-TPU path and test oracle."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mean * mean, 0.0)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)
         * scale.astype(jnp.float32) + bias.astype(jnp.float32))
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def layer_norm_act(x, scale, bias, *, eps: float, act: str = "none"):
    """Dispatch: Pallas on TPU backends when the shape fits, jnp mirror
    elsewhere."""
    if (jax.default_backend() in ("tpu", "axon")
            and fits(x.shape, x.dtype.itemsize)):
        return ln_act_pallas(x, scale, bias, eps, act)
    return ln_act_reference(x, scale, bias, eps=eps, act=act)
