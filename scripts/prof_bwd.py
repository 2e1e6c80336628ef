"""TPU probe: where the Stage-1 backward loses to the forward.

PERF.md round-2 candidate #1: UNet fwd runs at 79 TF/s, fwd+ctx-grad at
~58 TF/s on the backward leg.  This probe times the backward of each
component class in isolation (input-grad only — Stage-1 freezes the UNet
weights) with scanned slope timing:

  - bare 3×3 conv dL/dx at each level shape (stride 1)
  - the stride-2 downsample conv dL/dx (dgrad becomes a dilated conv)
  - the post-upsample conv dL/dx
  - GroupNorm(+SiLU) fwd vs fwd+bwd
  - flash-v2 attention fwd vs fwd+bwd (for reference)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/prof_bwd.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    import emcid_tpu  # noqa: F401

    rng = np.random.RandomState(0)

    def slope_time(make_fn, lo=2, hi=8):
        """Compiled scan of N iterations; (t_hi - t_lo)/(hi - lo)."""
        fns = {}
        for n in (lo, hi):
            fns[n] = jax.jit(make_fn(n))
            _ = np.asarray(fns[n]())  # compile + run once
        ts = {}
        for n in (lo, hi):
            t0 = time.time()
            _ = np.asarray(fns[n]())
            ts[n] = time.time() - t0
        return (ts[hi] - ts[lo]) / (hi - lo)

    B = 24

    def conv_probe(hw, cin, cout, stride, label, k=3):
        x = jnp.asarray(rng.randn(B, hw, hw, cin), jnp.bfloat16)
        conv = nn.Conv(cout, (k, k), strides=(stride, stride),
                       padding=((1, 1), (1, 1)) if k == 3 else "VALID",
                       dtype=jnp.bfloat16)
        params = conv.init(jax.random.PRNGKey(0), x)

        def fwd_loss(x):
            return conv.apply(params, x).astype(jnp.float32).sum()

        flops_fwd = 2 * k * k * cin * cout * (hw // stride) ** 2 * B / 1e12

        def mk_fwd(n):
            def run():
                def body(c, _):
                    return c + fwd_loss(x + c * 0), None
                out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return out
            return run

        def mk_fb(n):
            g = jax.grad(lambda x: fwd_loss(x))

            def run():
                def body(c, _):
                    return c + g(x * (1 + c * 0)).astype(jnp.float32).sum(), None
                out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return out
            return run

        tf = slope_time(mk_fwd)
        tb = slope_time(mk_fb)  # fwd + dgrad (input grad only)
        print(f"{label:38s} fwd {tf*1e3:7.2f} ms ({flops_fwd/tf:6.1f} TF/s)"
              f"  fwd+dx {tb*1e3:7.2f} ms  bwd≈{(tb-tf)*1e3:6.2f} ms "
              f"({flops_fwd/max(tb-tf,1e-9):6.1f} TF/s)", flush=True)

    # level shapes of the SD UNet
    conv_probe(64, 320, 320, 1, "conv3x3 s1 (64,320)")
    conv_probe(32, 640, 640, 1, "conv3x3 s1 (32,640)")
    conv_probe(16, 1280, 1280, 1, "conv3x3 s1 (16,1280)")
    # stride-2 downsamplers (dgrad = dilated conv — the suspect)
    conv_probe(64, 320, 320, 2, "conv3x3 s2 down (64->32,320)")
    conv_probe(32, 640, 640, 2, "conv3x3 s2 down (32->16,640)")
    conv_probe(16, 1280, 1280, 2, "conv3x3 s2 down (16->8,1280)")

    # GroupNorm + SiLU at level-0 shape
    x = jnp.asarray(rng.randn(B, 64, 64, 320), jnp.bfloat16)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16)
    gp = gn.init(jax.random.PRNGKey(0), x)

    def gn_loss(x):
        return jax.nn.silu(gn.apply(gp, x)).astype(jnp.float32).sum()

    def mk(n, grad):
        f = jax.grad(gn_loss) if grad else gn_loss

        def run():
            def body(c, _):
                r = f(x * (1 + c * 0))
                r = r.astype(jnp.float32).sum() if grad else r
                return c + r, None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return out
        return run

    tf = slope_time(lambda n: mk(n, False))
    tb = slope_time(lambda n: mk(n, True))
    gb = B * 64 * 64 * 320 * 2 / 1e9  # bytes r+w per pass (bf16)
    print(f"{'groupnorm+silu (64,320)':38s} fwd {tf*1e3:7.2f} ms "
          f"({gb/tf:5.0f} GB/s)  fwd+bwd {tb*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
