"""TPU profile: attention variants + UNet forward MFU (round-2 perf work).

Times, on the real chip:
  1. attention at the three SD self-attn shapes (bf16) — ours (pallas flash),
     official jax pallas flash, chunked jnp, plain einsum — fwd and fwd+bwd;
  2. the full SD-v1.4 UNet forward at the Stage-1 batch (B=24) with
     cost_analysis FLOPs -> achieved TFLOP/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/prof_attn.py
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import emcid_tpu  # noqa: F401  (persistent compile cache)


def timeit(fn, *args, reps=5):
    """fn must return a SCALAR (or tiny array): the tunneled backend pays
    real HTTP transfer cost per byte materialized, so timing a full-output
    transfer measures the tunnel, not the chip."""
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0].astype(np.float32))  # host sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = float(np.asarray(out).ravel()[0].astype(np.float32))
    return (time.time() - t0) / reps


def attn_flops(B, N, M, H, D):
    return 2 * 2 * B * H * N * M * D  # QK^T + PV, fwd only


def main():
    print("backend:", jax.default_backend(), flush=True)
    from emcid_tpu.ops.attention import flash_attention, mha_chunked

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash,
        )
    except Exception as e:  # pragma: no cover
        jax_flash = None
        print("no official flash:", e)

    shapes = [
        (24, 4096, 8, 40),
        (24, 1024, 8, 80),
        (24, 256, 8, 160),
    ]
    rng = np.random.RandomState(0)
    for B, N, H, D in shapes:
        q = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        gf = attn_flops(B, N, N, H, D) / 1e12
        print(f"--- shape B={B} N={N} H={H} D={D}  fwd TFLOP={gf:.3f}",
              flush=True)

        def report(name, fn, *args):
            try:
                t = timeit(fn, *args)
                print(f"  {name:24s} {t * 1e3:8.2f} ms   {gf / t:7.1f} TFLOP/s",
                      flush=True)
            except Exception as e:
                print(f"  {name:24s} FAILED: {type(e).__name__}: {e}",
                      flush=True)

        ours = jax.jit(
            lambda q, k, v: flash_attention(q, k, v, D**-0.5)
            .astype(jnp.float32).sum()
        )
        report("ours-flash fwd", ours, q, k, v)

        if jax_flash is not None:
            qt = jnp.swapaxes(q, 1, 2)
            kt = jnp.swapaxes(k, 1, 2)
            vt = jnp.swapaxes(v, 1, 2)
            off = jax.jit(
                lambda q, k, v: jax_flash(q, k, v, sm_scale=D**-0.5)
                .astype(jnp.float32).sum()
            )
            report("jax-flash fwd", off, qt, kt, vt)

            def off_grad(q, k, v):
                f = lambda q, k, v: jax_flash(
                    q, k, v, sm_scale=D**-0.5).astype(jnp.float32).sum()
                return jax.grad(f, argnums=0)(q, k, v).astype(
                    jnp.float32).sum()

            report("jax-flash fwd+bwd", jax.jit(off_grad), qt, kt, vt)

        chunk = jax.jit(
            lambda q, k, v: mha_chunked(q, k, v, D**-0.5)
            .astype(jnp.float32).sum()
        )
        report("chunked fwd", chunk, q, k, v)

        def ours_grad(q, k, v):
            f = lambda q, k, v: flash_attention(
                q, k, v, D**-0.5).astype(jnp.float32).sum()
            return jax.grad(f, argnums=0)(q, k, v).astype(jnp.float32).sum()

        report("ours-flash fwd+bwd", jax.jit(ours_grad), q, k, v)

        if N <= 1024:
            def ein(q, k, v):
                s = jnp.einsum("bqhd,bkhd->bhqk", q * (D**-0.5), k)
                p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(v.dtype)
                return jnp.einsum("bhqk,bkhd->bqhd", p, v).astype(
                    jnp.float32).sum()

            report("einsum fwd", jax.jit(ein), q, k, v)

    # ---- full UNet forward -------------------------------------------------
    from emcid_tpu.models.configs import sd_v14_unet
    from emcid_tpu.models.unet import UNet2DCondition

    unet = UNet2DCondition(sd_v14_unet(), dtype=jnp.bfloat16)
    up = unet.init_params(jax.random.PRNGKey(0), batch=1, context_len=77)
    B = 24
    lat = jnp.asarray(rng.randn(B, 64, 64, 4), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jnp.asarray(rng.randn(B, 77, 768), jnp.float32)

    fwd = jax.jit(
        lambda p, l, t, c: unet.apply({"params": p}, l, t, c).sample
        .astype(jnp.float32).sum()
    )
    print("--- UNet fwd B=24 bf16 (compiling...)", flush=True)
    lowered = fwd.lower(up, lat, t, ctx)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        flops = ca.get("flops", 0.0) if isinstance(ca, dict) else 0.0
    except Exception as e:
        print("cost_analysis failed:", e)
        flops = 0.0
    tsec = timeit(lambda *a: compiled(*a), up, lat, t, ctx, reps=3)
    print(f"  UNet fwd: {tsec * 1e3:.1f} ms, cost_analysis {flops / 1e12:.2f} "
          f"TFLOP -> {flops / tsec / 1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
