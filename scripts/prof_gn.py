"""TPU A/B: fused GroupNorm(+SiLU) Pallas kernel vs the stock XLA lowering.

Three rungs, cheapest first (each rung is ~2 remote compiles on the
tunneled backend — stop early if rung 1 already says "no win"):

1. bare op at the four SD UNet geometries (fwd and fwd+vjp);
2. one full UNet forward, EMCID_TPU_FUSED_GN=0 vs 1;
3. UNet fwd + ctx-grad (the Stage-1 hot shape), 0 vs 1.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/prof_gn.py
Optional: PROF_GN_RUNGS=1,2,3 to select rungs.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, *args, lo=2, hi=8):
    """Slope-timed per-iteration cost of ``fn(*args)``.

    The tunneled backend pays ~0.5 s per dispatch, so averaging a few
    raw calls of a 1-500 ms program measures the tunnel, not the kernel.
    Instead the op runs inside a ``fori_loop`` with a RUNTIME trip count
    (one compile serves every n); per-iteration cost is the slope
    (t_hi - t_lo) / (hi - lo).  The loop carry feeds each iteration so
    XLA cannot hoist or CSE the body.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(n, *args):
        def body(_, c):
            a0 = args[0] * jnp.asarray(1 + c * 0, args[0].dtype)
            return c + jnp.asarray(fn(a0, *args[1:]), jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    val = float(np.asarray(run(lo, *args)))  # compile + warm run
    ts = {}
    for n in (lo, hi):
        t0 = time.time()
        out = float(np.asarray(run(n, *args)))
        ts[n] = time.time() - t0
    return (ts[hi] - ts[lo]) / (hi - lo), out / hi


def rung1():
    import jax
    import jax.numpy as jnp

    from emcid_tpu.ops.groupnorm import gn_act_pallas, gn_act_reference
    from emcid_tpu.ops.layernorm import ln_act_pallas, ln_act_reference

    rng = np.random.RandomState(0)
    # LayerNorm at the transformer-block token shapes (512-res grids plus
    # the train_res-384 product grids: 48^2=2304 / 24^2=576 tokens)
    for B, S, C in [(24, 4096, 320), (24, 1024, 640),
                    (24, 2304, 320), (24, 576, 640)]:
        x = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
        sc = jnp.asarray(rng.randn(C), jnp.float32) * 0.2 + 1.0
        bi = jnp.asarray(rng.randn(C), jnp.float32) * 0.1
        gb = B * S * C * 2 / 1e9

        def l_pallas(x, sc, bi):
            return ln_act_pallas(x, sc, bi, 1e-6, "none",
                                 False).astype(jnp.float32).sum()

        def l_xla(x, sc, bi):
            return ln_act_reference(x, sc, bi, eps=1e-6).astype(
                jnp.float32).sum()

        def gl_pallas(x, sc, bi):
            return jax.grad(l_pallas)(x, sc, bi).astype(jnp.float32).sum()

        def gl_xla(x, sc, bi):
            return jax.grad(l_xla)(x, sc, bi).astype(jnp.float32).sum()

        for nm, fp, fx in [("LN fwd", l_pallas, l_xla),
                           ("LN fwd+dx", gl_pallas, gl_xla)]:
            try:
                tp, vp = timeit(fp, x, sc, bi)
                tx, vx = timeit(fx, x, sc, bi)
                print(f"({B},{S},{C}) {nm}: pallas {tp * 1e3:6.2f} ms "
                      f"({2 * gb / tp:5.0f} GB/s rd+wr)  "
                      f"xla {tx * 1e3:6.2f} ms  "
                      f"speedup {tx / tp:4.2f}x  "
                      f"sums {vp:.6g}/{vx:.6g}", flush=True)
            except Exception as e:
                print(f"({B},{S},{C}) {nm}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

        # on-chip numeric parity (compiled, NOT interpret mode): device-side
        # max|pallas - xla| on the full tensor and on dL/dx — the CPU tests
        # only certify interpret mode, a default flip needs this too
        if (B, S, C) == (24, 4096, 320):
            def ln_diff(x, sc, bi):
                a = ln_act_pallas(x, sc, bi, 1e-6, "none", False)
                b = ln_act_reference(x, sc, bi, eps=1e-6)
                da = jax.grad(l_pallas)(x, sc, bi)
                db = jax.grad(l_xla)(x, sc, bi)
                return (jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32)).max(),
                        jnp.abs(da.astype(jnp.float32)
                                - db.astype(jnp.float32)).max())
            try:
                df, dg = jax.jit(ln_diff)(x, sc, bi)
                print(f"({B},{S},{C}) LN parity: max|Δfwd|="
                      f"{float(np.asarray(df)):.3e} max|Δdx|="
                      f"{float(np.asarray(dg)):.3e}", flush=True)
            except Exception as e:
                print(f"({B},{S},{C}) LN parity FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    # (B, S, C): SD level-0..3 resnet norms + the 960-ch up-block concat,
    # at 512-res grids and at the train_res-384 product grids (where the
    # conformance-fixed kernels lower with full-C blocks)
    shapes = [(24, 4096, 320), (24, 4096, 640), (24, 1024, 1280),
              (24, 4096, 960), (24, 256, 1280),
              (24, 2304, 320), (24, 2304, 640), (24, 576, 640),
              (24, 576, 1280)]
    for B, S, C in shapes:
        x = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
        sc = jnp.asarray(rng.randn(C), jnp.float32) * 0.2 + 1.0
        bi = jnp.asarray(rng.randn(C), jnp.float32) * 0.1
        gb = B * S * C * 2 / 1e9  # bf16 read GB (the one-pass lower bound)

        def f_pallas(x, sc, bi):
            return gn_act_pallas(x, sc, bi, 32, 1e-5, "silu",
                                 False).astype(jnp.float32).sum()

        def f_xla(x, sc, bi):
            return gn_act_reference(
                x, sc, bi, num_groups=32, eps=1e-5,
                act="silu").astype(jnp.float32).sum()

        def g_pallas(x, sc, bi):
            gs = jax.grad(f_pallas, argnums=(0,))(x, sc, bi)
            return gs[0].astype(jnp.float32).sum()

        def g_xla(x, sc, bi):
            gs = jax.grad(f_xla, argnums=(0,))(x, sc, bi)
            return gs[0].astype(jnp.float32).sum()

        for nm, fp, fx in [("fwd", f_pallas, f_xla),
                           ("fwd+dx", g_pallas, g_xla)]:
            try:
                tp, vp = timeit(fp, x, sc, bi)
                tx, vx = timeit(fx, x, sc, bi)
                print(f"({B},{S},{C}) {nm}: pallas {tp * 1e3:6.2f} ms "
                      f"({2 * gb / tp:5.0f} GB/s rd+wr)  "
                      f"xla {tx * 1e3:6.2f} ms  "
                      f"speedup {tx / tp:4.2f}x  "
                      f"sums {vp:.6g}/{vx:.6g}", flush=True)
            except Exception as e:
                print(f"({B},{S},{C}) {nm}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

        # compiled-mode parity at the standard level-0 shape and at the
        # 960-ch concat geometry (exercises the channel-chunk path)
        if (B, S, C) in ((24, 4096, 320), (24, 4096, 960)):
            def gn_diff(x, sc, bi):
                a = gn_act_pallas(x, sc, bi, 32, 1e-5, "silu", False)
                b = gn_act_reference(x, sc, bi, num_groups=32, eps=1e-5,
                                     act="silu")
                da = jax.grad(f_pallas, argnums=(0,))(x, sc, bi)[0]
                db = jax.grad(f_xla, argnums=(0,))(x, sc, bi)[0]
                return (jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32)).max(),
                        jnp.abs(da.astype(jnp.float32)
                                - db.astype(jnp.float32)).max())
            try:
                df, dg = jax.jit(gn_diff)(x, sc, bi)
                print(f"({B},{S},{C}) GN parity: max|Δfwd|="
                      f"{float(np.asarray(df)):.3e} max|Δdx|="
                      f"{float(np.asarray(dg)):.3e}", flush=True)
            except Exception as e:
                print(f"({B},{S},{C}) GN parity FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


def _unet_setup():
    import jax
    import jax.numpy as jnp

    from emcid_tpu.models.configs import sd_v14_unet
    from emcid_tpu.models.unet import UNet2DCondition

    unet = UNet2DCondition(sd_v14_unet(), dtype=jnp.bfloat16)
    params = unet.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    B = 24
    # PROF_GN_LATENT=48 measures the train_res-384 product grid
    hw = int(os.environ.get("PROF_GN_LATENT", "64"))
    sample = jnp.asarray(rng.randn(B, hw, hw, 4), jnp.bfloat16)
    t = jnp.asarray(rng.randint(0, 1000, (B,)), jnp.int32)
    ctx = jnp.asarray(rng.randn(B, 77, 768), jnp.bfloat16)
    return unet, params, sample, t, ctx


def rung23(rungs):
    import jax
    import jax.numpy as jnp

    unet, params, sample, t, ctx = _unet_setup()

    # sample first so timeit's loop-carry perturbation hits an array
    def fwd(sample, params, t, ctx):
        return unet.apply({"params": params}, sample, t,
                          ctx).sample.astype(jnp.float32).sum()

    def fwd_ctxgrad(sample, params, t, ctx):
        g = jax.grad(
            lambda c: unet.apply({"params": params}, sample, t,
                                 c).sample.astype(jnp.float32).sum())(ctx)
        return g.astype(jnp.float32).sum()

    legs = []
    if "2" in rungs:
        legs.append(("UNet fwd B=24", fwd, 2, 6))
    if "3" in rungs:
        legs.append(("UNet fwd+ctx-grad B=24", fwd_ctxgrad, 1, 4))
    for nm, f, lo, hi in legs:
        row = [nm]
        for gn, ln in (("0", "0"), ("1", "0"), ("0", "1"), ("1", "1")):
            os.environ["EMCID_TPU_FUSED_GN"] = gn
            os.environ["EMCID_TPU_FUSED_LN"] = ln
            try:
                tt, vv = timeit(f, sample, params, t, ctx, lo=lo, hi=hi)
                # vv is the f32 sum-loss: must agree across flag configs
                # (weak whole-program parity on top of rung1's exact diff)
                row.append(f"GN={gn} LN={ln} {tt * 1e3:7.1f} ms "
                           f"sum={vv:.6g}")
            except Exception as e:
                row.append(f"GN={gn} LN={ln} FAILED {type(e).__name__}: "
                           f"{str(e)[:160]}")
        print("  |  ".join(row), flush=True)


def main():
    import emcid_tpu  # noqa: F401  (persistent compile cache)

    rungs = os.environ.get("PROF_GN_RUNGS", "1,2,3")
    if "1" in rungs:
        rung1()
    if "2" in rungs or "3" in rungs:
        rung23(rungs)


if __name__ == "__main__":
    main()
