"""TPU sweep: flash v2 block sizes at the level-0 self-attn shape.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/prof_blocks.py
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import emcid_tpu  # noqa: F401
    from emcid_tpu.ops.flash_v2 import flash_attention_v2

    rng = np.random.RandomState(0)
    B, N, H, D = 24, 4096, 8, 40
    q = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
    gf = 2 * 2 * B * H * N * N * D / 1e12

    def timeit(fn, *args, reps=5):
        out = fn(*args)
        _ = float(np.asarray(out))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _ = float(np.asarray(out))
        return (time.time() - t0) / reps

    for bq, bk in [(256, 1024), (512, 1024), (512, 2048), (256, 2048),
                   (512, 4096), (1024, 1024), (128, 4096), (256, 4096)]:
        os.environ["EMCID_TPU_FLASH_BQ"] = str(bq)
        os.environ["EMCID_TPU_FLASH_BK"] = str(bk)
        # the backward kernels read their own knobs — sweep them in lockstep
        # so the fwd+bwd column actually varies with the row
        os.environ["EMCID_TPU_FLASH_BQ_BWD"] = str(bq)
        os.environ["EMCID_TPU_FLASH_BK_BWD"] = str(bk)

        def fwd(q, k, v):
            return flash_attention_v2(q, k, v, D**-0.5).astype(
                jnp.float32).sum()

        def fb(q, k, v):
            f = lambda q, k, v: flash_attention_v2(
                q, k, v, D**-0.5).astype(jnp.float32).sum()
            gs = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
            return sum(x.astype(jnp.float32).sum() for x in gs)

        try:
            t1 = timeit(jax.jit(fwd), q, k, v)
            t2 = timeit(jax.jit(fb), q, k, v)
            print(f"BQ={bq:5d} BK={bk:5d}: fwd {t1 * 1e3:7.2f} ms "
                  f"({gf / t1:6.1f} TF/s)  fwd+bwd {t2 * 1e3:7.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"BQ={bq} BK={bk}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
