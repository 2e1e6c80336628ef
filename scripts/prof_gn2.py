"""On-chip COMPILED-mode parity check for the fused GroupNorm kernels.

Motivation (round-4 prof_gn rung-1 output): slope-timed grad probes showed
the compiled GN backward's dL/dx summing to O(10^3) where the XLA arm sums
to ~0 (GroupNorm dx is group-mean-subtracted, so its sum is a projection
residual).  Interpret mode passes to 2e-4 elementwise — this probe decides
whether the HARDWARE lowering of the bwd kernel is numerically wrong, per
shape class:

* (24, 2304, 320)  — product 384-res level-0; bwd chunks full-C
* (24, 1024, 1280) — bwd picks the PARTIAL 640-lane chunk
* (24, 576, 640)   — 384-res level-1
* (24, 4096, 320)  — fwd kernel + _bwd_reference fallback (bwd kernel
                      does not fit; exercises the fits()-split path)

Each shape is ONE small jitted program returning device-side
max|Δ| for fwd / dx / dscale / dbias (fused vs gn_act_reference), plus
the two dx sums.  Cheap remote compiles — no UNet-sized programs.

Run: python -u scripts/prof_gn2.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import emcid_tpu  # noqa: F401  (persistent compile cache)
    import jax
    import jax.numpy as jnp

    from emcid_tpu.ops.groupnorm import (
        _pick_chunk, gn_act_pallas, gn_act_reference,
    )

    rng = np.random.RandomState(0)
    shapes = [(24, 2304, 320), (24, 1024, 1280), (24, 576, 640),
              (24, 4096, 320)]
    for B, S, C in shapes:
        x = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
        sc = jnp.asarray(rng.randn(C), jnp.float32) * 0.2 + 1.0
        bi = jnp.asarray(rng.randn(C), jnp.float32) * 0.1
        cc3 = _pick_chunk(S, C, 32, 2, 3)
        tag = f"bwd-chunk={cc3 if cc3 is not None else 'REF-FALLBACK'}"

        def lp(x, sc, bi):
            return gn_act_pallas(x, sc, bi, 32, 1e-5, "silu",
                                 False).astype(jnp.float32).sum()

        def lr(x, sc, bi):
            return gn_act_reference(
                x, sc, bi, num_groups=32, eps=1e-5,
                act="silu").astype(jnp.float32).sum()

        def diff(x, sc, bi):
            yp = gn_act_pallas(x, sc, bi, 32, 1e-5, "silu", False)
            yr = gn_act_reference(x, sc, bi, num_groups=32, eps=1e-5,
                                  act="silu")
            gp = jax.grad(lp, argnums=(0, 1, 2))(x, sc, bi)
            gr = jax.grad(lr, argnums=(0, 1, 2))(x, sc, bi)
            dfwd = jnp.abs(yp.astype(jnp.float32)
                           - yr.astype(jnp.float32)).max()
            dd = [jnp.abs(a.astype(jnp.float32)
                          - b.astype(jnp.float32)).max()
                  for a, b in zip(gp, gr)]
            sums = (gp[0].astype(jnp.float32).sum(),
                    gr[0].astype(jnp.float32).sum())
            return (dfwd, *dd, *sums)

        try:
            out = [float(np.asarray(v)) for v in jax.jit(diff)(x, sc, bi)]
            print(f"({B},{S},{C}) [{tag}] max|Δfwd|={out[0]:.3e} "
                  f"max|Δdx|={out[1]:.3e} max|Δdsc|={out[2]:.3e} "
                  f"max|Δdbi|={out[3]:.3e}  "
                  f"dx-sum pallas/xla {out[4]:.4g}/{out[5]:.4g}",
                  flush=True)
        except Exception as e:
            print(f"({B},{S},{C}) [{tag}] FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
