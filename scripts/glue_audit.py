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

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

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


def conv_census(text: str, label: str):
    """Per-convolution audit of a lowered program (lever (a) analysis).

    The backward of a stride-2 conv lowers to a convolution with
    ``lhs_dilate = [2, 2]`` (zero-insertion on the incoming cotangent); if
    the backend computes it densely over the dilated domain, only
    ``ceil(k/2)^2 / k^2`` of the MACs touch non-zero taps (4/9 for 3x3).
    This census bounds that waste: for every stablehlo.convolution we
    report shapes, stride, lhs_dilate and *physical* GFLOPs (dense over
    the dilated domain), and summarize the dilated share so the value of
    a hand-written Pallas dgrad (phase-decomposed into stride-1 convs)
    can be priced without a TPU probe.
    """
    pat = re.compile(
        r"stablehlo\.convolution\(.*?x\[([^\]]*)\]->.*?"
        r"window = \{stride = \[([0-9, ]+)\].*?"
        r"lhs_dilate = \[([0-9, ]+)\].*?"
        r": \(tensor<([0-9x]+)x(\w+)>, tensor<([0-9x]+)x\w+>\)"
        r" -> tensor<([0-9x]+)x", re.S)
    rows = []
    for m in pat.finditer(text):
        rhs_dims = [d.strip() for d in m.group(1).split(",")]
        stride = [int(s) for s in m.group(2).split(",")]
        ldil = [int(s) for s in m.group(3).split(",")]
        rhs = [int(d) for d in m.group(6).split("x")]
        out = [int(d) for d in m.group(7).split("x")]
        k_spatial, c_in = 1, 1
        for name, d in zip(rhs_dims, rhs):
            if name == "i":
                c_in = d
            elif name != "o":
                k_spatial *= d
        phys = 2.0 * k_spatial * c_in
        for d in out:
            phys *= d
        # useful fraction when lhs-dilated: AVERAGE nonzero taps per window
        # across output phases is k/d taps of k per dim (windows alternate
        # between ceil(k/d) and floor(k/d) nonzero taps), i.e. 1/d per dim
        useful = 1.0
        ks = [d for name, d in zip(rhs_dims, rhs) if name not in ("i", "o")]
        for k, dl in zip(ks, ldil):
            useful *= 1.0 / dl
        rows.append((m.group(4), m.group(5), tuple(rhs), tuple(out),
                     tuple(stride), tuple(ldil), phys / 1e9, useful))

    tot = sum(r[6] for r in rows)
    dil = [r for r in rows if any(d > 1 for d in r[5])]
    dil_phys = sum(r[6] for r in dil)
    dil_waste = sum(r[6] * (1 - r[7]) for r in dil)
    print(f"\n== conv census: {label} ==")
    print(f"  {len(rows)} convolutions, {tot:.1f} physical GFLOP total")
    print(f"  lhs-dilated (strided dgrads): {len(dil)} sites, "
          f"{dil_phys:.1f} GFLOP physical, {dil_waste:.1f} GFLOP on "
          f"zero taps ({100 * dil_waste / tot if tot else 0:.1f}% of all "
          "conv work, IF lowered densely)")
    agg = collections.Counter()
    for r in rows:
        agg[(r[2], r[3], r[4], r[5], r[1])] += 1
    for (rhs, out, stride, ldil, dt), n in sorted(
            agg.items(), key=lambda kv: -kv[1])[:24]:
        one = next(r for r in rows
                   if (r[2], r[3], r[4], r[5], r[1])
                   == (rhs, out, stride, ldil, dt))
        tag = " DILATED" if any(d > 1 for d in ldil) else ""
        print(f"  {n:3d}x rhs={'x'.join(map(str, rhs))} "
              f"out={'x'.join(map(str, out))} stride={stride} "
              f"lhs_dil={ldil} {dt} {one[6]:.2f}GF{tag}")


def main():
    import jax
    from emcid_tpu.runtime import force_cpu_platform
    force_cpu_platform()
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
    txt = lo.as_text()
    census(txt, f"UNet fwd (B={B})")
    conv_census(txt, f"UNet fwd (B={B})")

    lo = jax.jit(fwd_ctx_grad).lower(params, x, t, ctx)
    txt = lo.as_text()
    census(txt, f"UNet fwd + ctx-grad (B={B})")
    conv_census(txt, f"UNet fwd + ctx-grad (B={B})")


if __name__ == "__main__":
    main()
