"""On-chip session B (round 5): fused-GN harvest + compiler-ceiling attack.

Stages ordered safe→risky (a remote-compiler crash can degrade the
tunnel worker for ~30 min, PERF.md — the crash-prone compiles go LAST so
their failure cannot cost the earlier measurements):

  1. bare-op fused-GN A/B at the 384-res grids (the product train_res)
     + re-confirm the 512-res level-0 win;
  2. resnet-sandwich composite (GN+SiLU → 3x3 conv → GN+SiLU → conv)
     fused-vs-stock, fwd and fwd+input-grad — the fusion-context A/B the
     full-UNet crash blocked;
  3. full-UNet fwd / fwd+ctx-grad A/B under EMCID_TPU_FUSED_GN=geo
     (a handful of Pallas sites instead of all 61 — sized to dodge the
     compile ceiling that killed the =1 variant);
  4. Stage-1 C=8 @384 step-slope, geo vs off — the default-flip number;
  5. C=12 / C=16 @384 remat=none Stage-1 (round-3/4 crashed at 512);
  6. SDXL Stage-1 resolution ladder 512→768→1024 at C=2 — either a
     measurement or a minimal repro localizing the ceiling.

    nohup python -u scripts/onchip_r5b.py > /tmp/onchip_r5b.log 2>&1 &
    echo $! > /tmp/onchip_r5b.pid
"""

import dataclasses
import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

RESULTS = {}
OUT = Path("results/onchip_r5b.json")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def flush(key, val):
    RESULTS[key] = val
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(RESULTS, indent=1))


def stage(name):
    def deco(fn):
        def run(*a, **k):
            log(f"==== stage {name} ====")
            try:
                fn(*a, **k)
            except Exception as e:
                log(f"stage {name} FAILED: {type(e).__name__}: "
                    f"{str(e)[:300]}")
                flush(f"{name}:error", f"{type(e).__name__}: {str(e)[:300]}")
            gc.collect()
        return run
    return deco


def main():
    import jax
    import jax.numpy as jnp

    import emcid_tpu  # noqa: F401
    from emcid_tpu.ops.groupnorm import gn_act_pallas, gn_act_reference

    log(f"backend {jax.default_backend()} devices {jax.devices()}")

    def timeit(fn, *args, reps=10):
        # materialize to host (block_until_ready is unreliable on axon);
        # .sum() handles array outputs (grads), not just scalars
        out = fn(*args)
        _ = float(np.asarray(out).sum())
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _ = float(np.asarray(out).sum())
        return (time.time() - t0) / reps

    # ---- 1: bare-op A/B ---------------------------------------------------
    @stage("bareop")
    def s1():
        rng = np.random.RandomState(0)
        rows = {}
        for (B, S, C, G) in ((24, 2304, 320, 32), (24, 4096, 320, 32),
                             (24, 576, 640, 32), (24, 2304, 640, 32)):
            x = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)
            sc = jnp.asarray(rng.randn(C), jnp.float32)
            bi = jnp.asarray(rng.randn(C), jnp.float32)
            w = jnp.asarray(rng.randn(B, S, C), jnp.bfloat16)

            def f_fused(x):
                return (gn_act_pallas(x, sc, bi, G, 1e-5, "silu")
                        .astype(jnp.float32) * w).sum()

            def f_ref(x):
                return (gn_act_reference(x, sc, bi, num_groups=G, eps=1e-5,
                                         act="silu")
                        .astype(jnp.float32) * w).sum()

            row = {}
            for nm, f in (("fused", f_fused), ("xla", f_ref)):
                try:
                    row[f"fwd_{nm}"] = timeit(jax.jit(f), x)
                    row[f"fb_{nm}"] = timeit(jax.jit(jax.grad(f)), x)
                except Exception as e:
                    row[f"{nm}_err"] = f"{type(e).__name__}: {str(e)[:120]}"
            rows[f"{B}x{S}x{C}"] = row
            log(f"  ({B},{S},{C}) G={G}: " + " ".join(
                f"{k}={v * 1e3:.2f}ms" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items()))
        flush("bareop", rows)
    s1()

    # ---- 2: resnet-sandwich composite ---------------------------------
    @stage("sandwich")
    def s2():
        from flax import linen as nn

        rng = np.random.RandomState(1)
        rows = {}
        for (B, H, W, C, G) in ((24, 48, 48, 320, 32), (24, 64, 64, 320, 32)):
            x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
            k1 = jnp.asarray(rng.randn(3, 3, C, C) * 0.02, jnp.bfloat16)
            k2 = jnp.asarray(rng.randn(3, 3, C, C) * 0.02, jnp.bfloat16)
            sc = jnp.ones((C,), jnp.float32)
            bi = jnp.zeros((C,), jnp.float32)

            def conv(h, k):
                return jax.lax.conv_general_dilated(
                    h, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            def net(x, gn):
                h = gn(x)
                h = conv(h, k1)
                h = gn(h)
                h = conv(h, k2)
                return h.astype(jnp.float32).sum()

            def gn_fused(h):
                return gn_act_pallas(h, sc, bi, G, 1e-5, "silu")

            def gn_xla(h):
                y = nn.GroupNorm(num_groups=G, epsilon=1e-5,
                                 dtype=jnp.bfloat16, name="gn").apply(
                    {"params": {"scale": sc, "bias": bi}}, h)
                return y * jax.nn.sigmoid(y)

            row = {}
            for nm, g in (("fused", gn_fused), ("xla", gn_xla)):
                try:
                    f = lambda x: net(x, g)
                    row[f"fwd_{nm}"] = timeit(jax.jit(f), x)
                    row[f"fb_{nm}"] = timeit(jax.jit(jax.grad(f)), x)
                except Exception as e:
                    row[f"{nm}_err"] = f"{type(e).__name__}: {str(e)[:120]}"
            rows[f"{B}x{H}x{W}x{C}"] = row
            log(f"  ({B},{H},{W},{C}): " + " ".join(
                f"{k}={v * 1e3:.2f}ms" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items()))
        flush("sandwich", rows)
    s2()

    # ---- shared SD models for 3-5 ---------------------------------------
    from emcid_tpu.models import CLIPTextEncoder, SD_V14_TEXT
    from emcid_tpu.models.configs import sd_v14_unet
    from emcid_tpu.models.scheduler import sd_schedule
    from emcid_tpu.models.unet import UNet2DCondition
    from emcid_tpu.text import make_tiny_tokenizer

    tok = make_tiny_tokenizer(
        [f"w{i}" for i in range(20)] + ["photo", "of", "a", "an", "image"],
        model_max_length=77)
    text = CLIPTextEncoder(SD_V14_TEXT, dtype=jnp.bfloat16)
    tp = text.init_params(jax.random.PRNGKey(0))
    unet = UNet2DCondition(sd_v14_unet(), dtype=jnp.bfloat16)
    up = unet.init_params(jax.random.PRNGKey(1))
    sched = sd_schedule()

    # ---- 3: full-UNet A/B under geo -------------------------------------
    @stage("unet_geo")
    def s3():
        rng = np.random.RandomState(2)
        B, hw = 24, 48  # 384-res grid
        lat = jnp.asarray(rng.randn(B, hw, hw, 4), jnp.bfloat16)
        t = jnp.asarray(rng.randint(0, 999, (B,)), jnp.int32)
        ctx = jnp.asarray(rng.randn(B, 77, 768), jnp.bfloat16)
        rows = {}
        for mode in ("0", "geo"):
            os.environ["EMCID_TPU_FUSED_GN"] = mode

            # params as runtime args, NOT baked constants (the 3.44 GB
            # baked-constant program was a real r4 bug class)
            def fwd(p, lat, t, ctx):
                return unet.apply({"params": p}, lat, t,
                                  ctx).sample.astype(jnp.float32).sum()

            def ctxgrad(p, lat, t, ctx):
                return jax.grad(fwd, argnums=3)(p, lat, t, ctx).astype(
                    jnp.float32).sum()

            row = {}
            row["fwd"] = timeit(jax.jit(fwd), up, lat, t, ctx, reps=5)
            row["ctxgrad"] = timeit(jax.jit(ctxgrad), up, lat, t, ctx,
                                    reps=5)
            rows[mode] = row
            log(f"  UNet B={B} {hw}^2 GN={mode}: fwd {row['fwd'] * 1e3:.1f}ms"
                f" ctxgrad {row['ctxgrad'] * 1e3:.1f}ms")
        os.environ["EMCID_TPU_FUSED_GN"] = "0"
        flush("unet_geo_384", rows)
    s3()

    # ---- 4: Stage-1 C=8 @384 slope, geo vs off ---------------------------
    from emcid_tpu.engine.compute_z import (
        ConceptBatch, ZOptimizer, prepare_concept_batch,
    )
    from emcid_tpu.hparams import EMCIDHyperParams

    def hp_for(steps):
        return EMCIDHyperParams.from_dict({
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

    def stage1_batch(C, hw):
        reqs = [
            {"prompts": ["a photo of a {}", "an image of a {}", "{}"],
             "source": f"w{i}", "dest": f"w{i + 1}", "seed_train": i}
            for i in range(C)
        ]
        hp = hp_for(4)
        arrays, _, _ = prepare_concept_batch(tok, reqs, hp)
        rng = np.random.RandomState(0)
        arrays["latents_mean"] = rng.randn(
            C, 1, 3, hw, hw, 4).astype(np.float32) * 0.18
        arrays["latents_logvar"] = np.full(
            (C, 1, 3, hw, hw, 4), -6.0, np.float32)
        return ConceptBatch(**{k: jnp.asarray(arrays[k])
                               for k in ConceptBatch._fields})

    def stage1_slope(C, hw, steps=10, pool=25, label=""):
        """One optimizer (one compile), warm run then timed run — the
        prof_remat pattern; ms/step includes the per-step dispatch, which
        is identical on both sides of every A/B here."""
        batch = stage1_batch(C, hw)
        hp = hp_for(steps)
        optz = ZOptimizer(text, unet, sched, hp, layer=hp.layers[-1],
                          eps_pool=pool, lr_sched="const")
        optz.hbm_fallback = False  # report the OOM, don't mask it
        t0 = time.time()
        zs, *_ = optz.run(tp, up, batch, jax.random.PRNGKey(0))
        _ = np.asarray(zs)
        t_compile = time.time() - t0
        t0 = time.time()
        zs, *_ = optz.run(tp, up, batch, jax.random.PRNGKey(1))
        _ = np.asarray(zs)
        dt = time.time() - t0
        ms = dt / steps * 1e3
        log(f"  stage1 {label} C={C} @{hw * 8}res: {ms:.0f} ms/step "
            f"({dt:.1f}s/{steps} steps; compile+run {t_compile:.0f}s)")
        return ms

    @stage("stage1_geo")
    def s4():
        rows = {}
        for mode in ("0", "geo"):
            os.environ["EMCID_TPU_FUSED_GN"] = mode
            rows[mode] = stage1_slope(8, 48, label=f"GN={mode}")
        os.environ["EMCID_TPU_FUSED_GN"] = "0"
        flush("stage1_geo_384_ms_per_step", rows)
    s4()

    # ---- 5: C=12/16 @384 ----------------------------------------------
    @stage("c_sweep")
    def s5():
        os.environ["EMCID_TPU_FUSED_GN"] = "0"
        rows = {}
        for C in (12, 16):
            try:
                rows[str(C)] = stage1_slope(C, 48, label=f"C={C}")
            except Exception as e:
                rows[str(C)] = f"{type(e).__name__}: {str(e)[:200]}"
                log(f"  C={C} FAILED: {rows[str(C)]}")
        flush("c_sweep_384_ms_per_step", rows)
    s5()

    # ---- 6: SDXL Stage-1 resolution ladder ------------------------------
    @stage("sdxl_ladder")
    def s6():
        nonlocal tp, up
        del tp, up
        gc.collect()
        from emcid_tpu.engine.sdxl import compute_z_sdxl_text_encoders
        from emcid_tpu.hparams import load_hparams
        from emcid_tpu.models.sdxl import build_random_sdxl_pipeline

        hp = load_hparams(
            "sdxl-dest_s-100_c-1.2_ly-8-11_ly2-26-31_lr-0.1_wd-8e-03"
            "_txt-align-0.01",
            hparams_dir="/root/reference/hparams")
        dev = jax.devices()[0]
        cpu = jax.devices("cpu")[0]
        log("  building random SDXL pipeline on CPU")
        with jax.default_device(cpu):
            xl = build_random_sdxl_pipeline(dtype=jnp.bfloat16)

        def upload_bf16(tree):
            def one(x):
                a = np.asarray(x)
                if a.dtype == np.float32:
                    a = a.astype(jnp.bfloat16)
                return jax.device_put(a, dev)
            return jax.tree.map(one, tree)

        xl = dataclasses.replace(
            xl, unet_params=upload_bf16(xl.unet_params),
            text_params=upload_bf16(xl.text_params),
            text_params_2=upload_bf16(xl.text_params_2),
            vae_params=upload_bf16(xl.vae_params))
        C, P = 2, 3
        reqs = [
            {"prompts": ["a photo of a {}", "an image of a {}", "{}"],
             "source": f"w{i}", "dest": f"w{i + 1}", "seed_train": i}
            for i in range(C)
        ]
        rng = np.random.RandomState(0)
        rows = {}
        for res in (512, 768, 1024):
            lhw = res // 8
            mean = rng.randn(C, 1, P, lhw, lhw, 4).astype(np.float32) * 0.13
            logvar = np.full(mean.shape, -6.0, np.float32)

            def s1(steps):
                hp_v = dataclasses.replace(hp, v_num_grad_steps=steps)
                t0 = time.time()
                z1, _ = compute_z_sdxl_text_encoders(
                    xl, reqs, hp_v, mean, logvar,
                    rng=jax.random.PRNGKey(0), height=res, width=res,
                    verbose=False)
                _ = np.asarray(z1)
                return time.time() - t0

            try:
                log(f"  SDXL stage-1 @{res}^2: compiling")
                s1(2)
                t6 = s1(6)
                ms = t6 / 6 * 1e3
                rows[str(res)] = ms
                log(f"  SDXL stage-1 C={C} @{res}^2: {ms:.0f} ms/step")
            except Exception as e:
                rows[str(res)] = f"{type(e).__name__}: {str(e)[:200]}"
                log(f"  SDXL stage-1 @{res}^2 FAILED: {rows[str(res)]}")
            flush("sdxl_stage1_ladder", rows)
    s6()

    log("session B complete")


if __name__ == "__main__":
    main()
