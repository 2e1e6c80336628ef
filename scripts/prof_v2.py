"""TPU bench: flash v1 vs v2 at SD shapes + UNet fwd + one optimizer chunk.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/prof_v2.py
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from __future__ import annotations

import os
import time

import numpy as np

os.environ.setdefault("EMCID_TPU_ATTN", "v2")


def timeit(fn, *args, reps=5):
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0].astype(np.float32))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = float(np.asarray(out).ravel()[0].astype(np.float32))
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    import emcid_tpu  # noqa: F401
    from emcid_tpu.ops.attention import flash_attention
    from emcid_tpu.ops.flash_v2 import flash_attention_v2

    rng = np.random.RandomState(0)
    shapes = [(24, 4096, 4096, 8, 40), (24, 1024, 1024, 8, 80),
              (24, 256, 256, 8, 160), (24, 4096, 77, 8, 40)]
    for B, N, M, H, D in shapes:
        q = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, M, H, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, M, H, D), jnp.bfloat16)
        gf = 2 * 2 * B * H * N * M * D / 1e12
        print(f"--- B={B} N={N} M={M} H={H} D={D} fwd TFLOP={gf:.3f}",
              flush=True)

        def rep(name, fn, *a):
            try:
                t = timeit(fn, *a)
                print(f"  {name:16s} {t * 1e3:8.2f} ms  {gf / t:7.1f} TFLOP/s",
                      flush=True)
            except Exception as e:
                print(f"  {name:16s} FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)

        rep("v1 fwd", jax.jit(lambda q, k, v: flash_attention(
            q, k, v, D**-0.5).astype(jnp.float32).sum()), q, k, v)
        rep("v2 fwd", jax.jit(lambda q, k, v: flash_attention_v2(
            q, k, v, D**-0.5).astype(jnp.float32).sum()), q, k, v)

        def g1(q, k, v):
            f = lambda q, k, v: flash_attention(
                q, k, v, D**-0.5).astype(jnp.float32).sum()
            gs = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
            return sum(x.astype(jnp.float32).sum() for x in gs)

        def g2(q, k, v):
            f = lambda q, k, v: flash_attention_v2(
                q, k, v, D**-0.5).astype(jnp.float32).sum()
            gs = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
            return sum(x.astype(jnp.float32).sum() for x in gs)

        rep("v1 fwd+bwd", jax.jit(g1), q, k, v)
        rep("v2 fwd+bwd", jax.jit(g2), q, k, v)

    # correctness on device at one shape
    B, N, H, D = 2, 512, 2, 40
    q = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)

    def ein(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q * D**-0.5, k)
        p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    o2 = np.asarray(jax.jit(lambda *a: flash_attention_v2(*a, D**-0.5))(q, k, v))
    oref = np.asarray(jax.jit(ein)(q, k, v))
    print("device fwd max err:", np.abs(o2 - oref).max(), flush=True)
    g2v = jax.jit(lambda q, k, v: jax.grad(
        lambda q, k, v: (flash_attention_v2(q, k, v, D**-0.5) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v))(q, k, v)
    grv = jax.jit(lambda q, k, v: jax.grad(
        lambda q, k, v: (ein(q, k, v) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v))(q, k, v)
    for a, b, n in zip(g2v, grv, "qkv"):
        print(f"device d{n} max err:",
              np.abs(np.asarray(a) - np.asarray(b)).max(), flush=True)

    # ---- UNet fwd with v2 --------------------------------------------------
    from emcid_tpu.models.configs import sd_v14_unet
    from emcid_tpu.models.unet import UNet2DCondition

    unet = UNet2DCondition(sd_v14_unet(), dtype=jnp.bfloat16)
    up = unet.init_params(jax.random.PRNGKey(0), batch=1, context_len=77)
    lat = jnp.asarray(rng.randn(24, 64, 64, 4), jnp.float32)
    t = jnp.full((24,), 500, jnp.int32)
    ctx = jnp.asarray(rng.randn(24, 77, 768), jnp.float32)
    fwd = jax.jit(lambda p, l, t, c: unet.apply(
        {"params": p}, l, t, c).sample.astype(jnp.float32).sum())
    print("--- UNet fwd B=24 bf16 + v2 attention (compiling)", flush=True)
    tsec = timeit(fwd, up, lat, t, ctx, reps=3)
    print(f"  UNet fwd: {tsec * 1e3:.1f} ms "
          f"({15.89 / tsec:.1f} TFLOP/s useful)", flush=True)

    # ---- optimizer chunk (remat=none + v2) --------------------------------
    from emcid_tpu.engine.compute_z import (
        ConceptBatch, ZOptimizer, prepare_concept_batch,
    )
    from emcid_tpu.hparams import EMCIDHyperParams
    from emcid_tpu.models import CLIPTextEncoder, SD_V14_TEXT
    from emcid_tpu.models.scheduler import sd_schedule
    from emcid_tpu.text import make_tiny_tokenizer

    steps, n_concepts, n_prompts = 20, 8, 3
    words = [f"w{i}" for i in range(9)] + ["photo", "of", "a", "an", "image"]
    tok = make_tiny_tokenizer(words, model_max_length=77)
    text = CLIPTextEncoder(SD_V14_TEXT, dtype=jnp.bfloat16)
    tp = text.init_params(jax.random.PRNGKey(0))
    sched = sd_schedule()
    hp = EMCIDHyperParams.from_dict({
        "layers": [7, 8, 9, 10], "clamp_norm_factor": 1.5,
        "layer_selection": "all", "fact_token": "subject_last",
        "v_num_grad_steps": steps, "v_lr": 0.2,
        "v_weight_decay": 5e-4, "mom2_adjustment": True,
        "mom2_update_weight": 4000,
        "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
        "layer_module_tmp": "text_model.encoder.layers.{}",
        "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
        "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
        "ln_f_module": "text_model.final_layer_norm",
        "mom2_dataset": "ccs_filtered", "mom2_n_samples": 100000,
        "mom2_dtype": "float32", "objective": "ablate-dest",
        "esd_mu": "None", "cal_text_repr_loss": True,
        "text_repr_loss_scale_factor": 0.01,
    })
    requests = [
        {"prompts": ["a photo of a {}", "an image of a {}", "{}"],
         "source": f"w{i}", "dest": f"w{i + 1}", "seed_train": i}
        for i in range(n_concepts)
    ]
    mean = rng.randn(n_concepts, 1, n_prompts, 64, 64, 4).astype(
        np.float32) * 0.18
    logvar = np.full(mean.shape, -6.0, np.float32)
    arrays, _, _ = prepare_concept_batch(tok, requests, hp)
    batch = ConceptBatch(
        source_ids=jnp.asarray(arrays["source_ids"]),
        dest_ids=jnp.asarray(arrays["dest_ids"]),
        inject_mask=jnp.asarray(arrays["inject_mask"]),
        source_lookup=jnp.asarray(arrays["source_lookup"]),
        dest_lookup=jnp.asarray(arrays["dest_lookup"]),
        latents_mean=jnp.asarray(mean),
        latents_logvar=jnp.asarray(logvar),
    )
    optz = ZOptimizer(text, unet, sched, hp, layer=hp.layers[-1],
                      remat="none")
    t0 = time.time()
    zs, *_ = optz.run(tp, up, batch, jax.random.PRNGKey(0))
    _ = np.asarray(zs)
    print(f"  chunk compile+run {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    zs, *_ = optz.run(tp, up, batch, jax.random.PRNGKey(1))
    _ = np.asarray(zs)
    dt = time.time() - t0
    print(f"  optimizer: {dt:.2f}s / {steps} steps = "
          f"{dt / steps * 1e3:.0f} ms/step (v1+full was 1265, "
          f"v1+none 1029)", flush=True)


if __name__ == "__main__":
    main()
