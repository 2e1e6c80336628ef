"""Graph-glue audit for the Stage-1 UNet program (VERDICT r3 lever (b)).

PERF.md "Where the time goes" attributes ~50 ms of a 201 ms UNet forward
to non-kernel glue (GroupNorm/SiLU/layout).  Component bwd probes are
impractical on the tunneled backend (round-3 negative result), so this
audit inspects the *graph* we hand XLA, which is target-independent:

  1. StableHLO op census of the UNet forward and forward+ctx-grad at SD
     shapes (B=24, 64x64 latents) — counts of convert / transpose /
     reshape / broadcast / dot / conv / reduce ops;
  2. every `transpose` with its operand shape and byte volume — reshapes
     that preserve contiguity lower to bitcasts on TPU, transposes are
     the ones that can cost HBM round-trips;
  3. every f32<->bf16 `convert` bucketed by element count, to bound the
     upcast traffic at norms.

Run on CPU (no TPU client): lowering only, no compile/execute.

  JAX_PLATFORMS=cpu python -u scripts/glue_audit.py
"""

from __future__ import annotations

import collections
import re
import sys


def census(text: str, label: str):
    ops = collections.Counter()
    for m in re.finditer(r"stablehlo\.(\w+)", text):
        ops[m.group(1)] += 1
    print(f"\n== {label}: {sum(ops.values())} stablehlo ops ==")
    for name, n in ops.most_common(18):
        print(f"  {name:24s} {n}")

    # transposes with shapes: stablehlo.transpose ... : (tensor<...>) -> ...
    vol = collections.Counter()
    for m in re.finditer(
            r"stablehlo\.transpose.*?tensor<([0-9x]+)x(\w+)>", text):
        dims, dt = m.group(1), m.group(2)
        n = 1
        for d in dims.split("x"):
            n *= int(d)
        bytes_per = {"bf16": 2, "f16": 2, "f32": 4, "f64": 8,
                     "i32": 4, "i64": 8}.get(dt, 4)
        vol[(dims, dt)] += 1
        vol[("TOTAL_MB", "")] += 0  # keep key present
        vol[("_total_bytes", "")] += n * bytes_per
    total_mb = vol.pop(("_total_bytes", ""), 0) / 1e6
    vol.pop(("TOTAL_MB", ""), None)
    print(f"  -- transposes: {sum(vol.values())} sites, "
          f"{total_mb:.1f} MB moved per execution --")
    for (dims, dt), n in vol.most_common(10):
        print(f"     {n:3d}x  {dims} {dt}")

    # converts bucketed by element count
    conv = collections.Counter()
    for m in re.finditer(
            r"stablehlo\.convert.*?tensor<([0-9x]*)x?(\w+)>\s*$", text,
            re.M):
        dims = m.group(1)
        n = 1
        for d in dims.split("x"):
            if d:
                n *= int(d)
        bucket = ("scalar" if n <= 1 else
                  "small<1M" if n < 1 << 20 else "large>=1M")
        conv[bucket] += 1
    print(f"  -- converts: {dict(conv)} --")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from emcid_tpu.models.configs import sd_v14_unet
    from emcid_tpu.models.unet import UNet2DCondition

    cfg = sd_v14_unet()
    unet = UNet2DCondition(cfg, dtype=jnp.bfloat16)

    B, HW = (int(sys.argv[1]) if len(sys.argv) > 1 else 24), 64
    x = jax.ShapeDtypeStruct((B, HW, HW, 4), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((B,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((B, 77, 768), jnp.bfloat16)

    params = jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, HW, HW, 4), jnp.bfloat16),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 77, 768), jnp.bfloat16))["params"])

    def fwd(params, x, t, ctx):
        return unet.apply({"params": params}, x, t, ctx).sample

    def fwd_ctx_grad(params, x, t, ctx):
        def loss(ctx):
            return fwd(params, x, t, ctx).astype(jnp.float32).sum()
        return jax.grad(loss)(ctx)

    lo = jax.jit(fwd).lower(params, x, t, ctx)
    census(lo.as_text(), f"UNet fwd (B={B})")

    lo = jax.jit(fwd_ctx_grad).lower(params, x, t, ctx)
    census(lo.as_text(), f"UNet fwd + ctx-grad (B={B})")


if __name__ == "__main__":
    main()
