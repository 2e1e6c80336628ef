"""Real-checkpoint parity harness: certify a local SD checkpoint end-to-end.

Two halves:

* ``scripts/make_goldens_torch.py`` (runs in an environment WITH diffusers)
  writes a ``goldens.npz``: fixed inputs + torch reference outputs for the
  CLIP text encoder, UNet, VAE decode/encode, and a PNDM latent trajectory
  driven by a synthetic eps function (scheduler math isolated from the
  UNet).
* ``python -m emcid_tpu.cli.workflows validate --checkpoint_dir ...
  --goldens goldens.npz`` loads the checkpoint through our converters and
  asserts every output within tolerance — one command certifies a local
  SD-v1.4 checkout (VERDICT round-1 item 5; reference model list SURVEY §1).

``make_self_goldens`` produces the same npz from OUR models (used by the
offline test of the harness mechanics, and as a regression baseline once a
real checkpoint has been validated).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np


def _fixed_inputs(text_cfg, latent_hw: int = 32, ctx_len: int = 77,
                  hidden: int = 768, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.RandomState(seed)
    ids = np.full((2, ctx_len), 49407, np.int64)
    ids[:, 0] = 49406
    ids[0, 1:6] = [320, 1125, 539, 320, 2368]    # "a photo of a cat"
    ids[1, 1:6] = [320, 1125, 539, 320, 1929]    # "a photo of a dog"
    return {
        "input_ids": ids,
        "latents": rng.randn(2, latent_hw, latent_hw, 4).astype(np.float32),
        "timesteps": np.array([17, 501], np.int64),
        "context": rng.randn(2, ctx_len, hidden).astype(np.float32),
        "vae_latents": rng.randn(1, latent_hw, latent_hw, 4).astype(
            np.float32),
        "image": rng.rand(1, latent_hw * 8, latent_hw * 8, 3).astype(
            np.float32) * 2 - 1,
    }


def synthetic_eps(latents: np.ndarray, t: int) -> np.ndarray:
    """Deterministic fake eps for scheduler-only parity: a fixed elementwise
    map of (latent, t) both sides can compute without a UNet."""
    return np.tanh(latents * 0.7 + float(t) / 1000.0).astype(np.float32)


def pndm_trajectory_ours(schedule, shape, num_steps: int = 8,
                         seed: int = 3) -> np.ndarray:
    import jax.numpy as jnp

    from emcid_tpu.models.scheduler import (
        ddim_timesteps, pndm_init, pndm_step,
    )

    rng = np.random.RandomState(seed)
    lat = jnp.asarray(rng.randn(*shape).astype(np.float32))
    ts = ddim_timesteps(schedule, num_steps)
    ts_prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)
    # diffusers skip-prk PNDM duplicates the second timestep and Heun-
    # corrects the first transition (same arrays scan_sampler builds);
    # the torch golden script iterates sched.timesteps, which includes
    # the duplicate, so both sides simulate N+1 steps
    ts_eval = np.concatenate([ts[:1], ts[1:2], ts[1:]])
    ts_tr = np.concatenate([ts[:1], ts[:1], ts[1:]])
    ts_tr_prev = np.concatenate([ts_prev[:1], ts_prev[:1], ts_prev[1:]])
    state = pndm_init(lat.shape, lat.dtype)
    traj = []
    for te, t, tp in zip(ts_eval, ts_tr, ts_tr_prev):
        eps = jnp.asarray(synthetic_eps(np.asarray(lat), int(te)))
        state, lat = pndm_step(schedule, state, lat, eps, int(t), int(tp))
        traj.append(np.asarray(lat))
    return np.stack(traj)


def make_self_goldens(components, out_path, num_pndm_steps: int = 8) -> Dict:
    """Goldens from OUR models (harness self-test / regression baseline)."""
    import jax.numpy as jnp

    cfg = components.text_encoder.config
    hw = components.unet.config.sample_size
    inp = _fixed_inputs(cfg, latent_hw=hw, ctx_len=cfg.max_position_embeddings,
                        hidden=cfg.hidden_size)
    inp["input_ids"] = np.clip(inp["input_ids"], 0, cfg.vocab_size - 1)
    out = dict(inp)
    t_out = components.text_encoder.apply(
        {"params": components.text_params}, jnp.asarray(inp["input_ids"]))
    out["text_hidden"] = np.asarray(t_out.last_hidden_state, np.float32)
    out["text_pooled"] = np.asarray(t_out.pooled_output, np.float32)
    eps = components.unet.apply(
        {"params": components.unet_params}, jnp.asarray(inp["latents"]),
        jnp.asarray(inp["timesteps"], jnp.int32),
        jnp.asarray(inp["context"])).sample
    out["unet_eps"] = np.asarray(eps, np.float32)
    dec = components.vae.apply({"params": components.vae_params},
                               jnp.asarray(inp["vae_latents"]),
                               method="decode")
    out["vae_decode"] = np.asarray(dec, np.float32)
    dist = components.vae.apply({"params": components.vae_params},
                                jnp.asarray(inp["image"]), method="encode")
    out["vae_enc_mean"] = np.asarray(dist.mean, np.float32)
    out["vae_enc_logvar"] = np.asarray(dist.logvar, np.float32)
    out["pndm_traj"] = pndm_trajectory_ours(
        components.schedule, inp["latents"].shape[:1] + (hw, hw, 4),
        num_pndm_steps)
    out["pndm_steps"] = np.asarray(num_pndm_steps)
    if out_path is not None:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        np.savez(out_path, **out)
    return out


def validate_against_goldens(components, goldens, rtol=None,
                             atol=None, verbose: bool = True) -> Dict[str, float]:
    """Compare the loaded checkpoint's outputs against a goldens npz.

    Returns {check: max_abs_err}; raises AssertionError on failure.
    Default tolerances assume the checkpoint loaded in bf16 (the deploy
    dtype) — pass tighter ones for f32 runs."""
    import jax.numpy as jnp

    if isinstance(goldens, (str, Path)):
        goldens = dict(np.load(goldens))
    errs: Dict[str, float] = {}
    # bf16 params → ~1e-2 relative on unit-scale activations
    atol = 3e-2 if atol is None else atol
    rtol = 3e-2 if rtol is None else rtol

    def check(name, got, want, a=None, r=None):
        got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
        errs[name] = float(np.abs(got - want).max())
        np.testing.assert_allclose(got, want, rtol=r or rtol, atol=a or atol,
                                   err_msg=name)
        if verbose:
            print(f"  {name:14s} max|err| {errs[name]:.2e}  OK")

    t_out = components.text_encoder.apply(
        {"params": components.text_params},
        jnp.asarray(goldens["input_ids"], jnp.int32))
    check("text_hidden", t_out.last_hidden_state, goldens["text_hidden"])
    check("text_pooled", t_out.pooled_output, goldens["text_pooled"])
    eps = components.unet.apply(
        {"params": components.unet_params}, jnp.asarray(goldens["latents"]),
        jnp.asarray(goldens["timesteps"], jnp.int32),
        jnp.asarray(goldens["context"])).sample
    check("unet_eps", eps, goldens["unet_eps"])
    dec = components.vae.apply({"params": components.vae_params},
                               jnp.asarray(goldens["vae_latents"]),
                               method="decode")
    check("vae_decode", dec, goldens["vae_decode"])
    dist = components.vae.apply({"params": components.vae_params},
                                jnp.asarray(goldens["image"]),
                                method="encode")
    check("vae_enc_mean", dist.mean, goldens["vae_enc_mean"])
    check("vae_enc_logvar", dist.logvar, goldens["vae_enc_logvar"])
    traj = pndm_trajectory_ours(
        components.schedule, goldens["pndm_traj"].shape[1:],
        int(goldens["pndm_steps"]))
    # scheduler math is model-free → tight tolerance regardless of dtype
    check("pndm_traj", traj, goldens["pndm_traj"], a=1e-4, r=1e-4)
    if verbose:
        print("checkpoint certified against goldens ✓")
    return errs


def cmd_validate(args):
    import sys

    # same platform rule as workflows._setup: tiny smoke runs default to
    # CPU (remote-TPU compiles dominate a tiny validation run otherwise)
    if getattr(args, "platform", None) == "cpu" or (
            args.tiny and getattr(args, "platform", None) is None):
        import jax

        from emcid_tpu.runtime import force_cpu_platform
        force_cpu_platform()

    from emcid_tpu.models.loader import build_tiny_pipeline, load_pipeline

    if args.tiny:
        comps = build_tiny_pipeline(seed=args.seed)
    elif args.checkpoint_dir:
        import jax.numpy as jnp

        comps = load_pipeline(args.checkpoint_dir,
                              dtype=jnp.float32 if args.f32 else jnp.bfloat16)
    else:
        sys.exit("validate: pass --checkpoint_dir (local HF checkpoint) "
                 "or --tiny")
    if args.make_self_goldens:
        make_self_goldens(comps, args.make_self_goldens)
        print(f"self-goldens written to {args.make_self_goldens}")
        return
    if not args.goldens:
        sys.exit("validate: pass --goldens goldens.npz (generate one with "
                 "scripts/make_goldens_torch.py in a diffusers environment, "
                 "or --make_self_goldens PATH for a regression baseline)")
    validate_against_goldens(
        comps, args.goldens,
        rtol=(1e-4 if args.f32 else None),
        atol=(1e-4 if args.f32 else None),
    )


# open_clip vision towers whose head count is NOT width//64 (head_width
# 80 for ViT-H-14, 104 for ViT-bigG-14, 88 for ViT-g-14) — keyed by
# tower width
_OPENCLIP_VISION_HEADS = {1280: 16, 1664: 16, 1408: 16}
# widths where width//64 IS the right head count (ViT-B/L families) — any
# other width falls back to width//64 with a warning so a heads mismatch
# is diagnosable instead of a confusing golden failure
_OPENCLIP_HEADS_BY_64 = {512, 640, 768, 896, 1024}


def validate_openclip(checkpoint, goldens, rtol=2e-3, atol=2e-3,
                      act: str = "gelu", vision_heads: Optional[int] = None,
                      verbose: bool = True) -> Dict[str, float]:
    """Compare the open_clip converters against goldens from
    scripts/make_goldens_openclip.py (a REAL open_clip checkpoint run
    through the original torch implementation — ADVICE round-1 item).

    Text heads default to hidden//64 (open_clip's convention for the CLIP
    families, incl. bigG's 1280/64=20); vision heads use a known-width
    table for the head_width!=64 towers (ViT-H-14, ViT-bigG-14) with
    ``vision_heads`` as the explicit override.  ``act='quick_gelu'`` for
    OpenAI-pretrained checkpoints."""
    import dataclasses

    import jax.numpy as jnp
    import torch

    from emcid_tpu.models.clip_text import CLIPTextEncoder
    from emcid_tpu.models.configs import CLIPTextConfig
    from emcid_tpu.models.convert_openclip import (
        openclip_text_from_torch, openclip_vision_from_torch,
    )
    from emcid_tpu.models.vision import CLIPVisionConfig, CLIPVisionEncoder

    sd = torch.load(checkpoint, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v for k, v in sd.items()}
    g = dict(np.load(goldens))
    errs: Dict[str, float] = {}

    # ---- text tower -------------------------------------------------------
    H = sd["ln_final.weight"].shape[0]
    vocab, _ = sd["token_embedding.weight"].shape
    ctx = sd["positional_embedding"].shape[0]
    inter = sd["transformer.resblocks.0.mlp.c_fc.weight"].shape[0]
    L = 0
    while f"transformer.resblocks.{L}.attn.in_proj_weight" in sd:
        L += 1
    proj = sd["text_projection"].shape[1] if "text_projection" in sd else None
    cfg = CLIPTextConfig(
        vocab_size=vocab, hidden_size=H, intermediate_size=inter,
        num_hidden_layers=L, num_attention_heads=H // 64,
        max_position_embeddings=ctx, hidden_act=act,
        projection_dim=proj, eos_token_id=vocab - 1,
    )
    text = CLIPTextEncoder(cfg)
    tparams = openclip_text_from_torch(
        {k: np.asarray(v) for k, v in sd.items()
         if not k.startswith("visual.")})
    ids = jnp.asarray(g["input_ids"], jnp.int32)
    out = text.apply({"params": tparams}, ids)
    errs["text_embeds"] = float(
        np.abs(np.asarray(out.pooled_output) - g["text_embeds"]).max())
    np.testing.assert_allclose(np.asarray(out.pooled_output),
                               g["text_embeds"], rtol=rtol, atol=atol,
                               err_msg="text_embeds")
    if verbose:
        print(f"  text_embeds   max|err| {errs['text_embeds']:.2e}  OK")

    # ---- vision tower -----------------------------------------------------
    vsd = {k: np.asarray(v) for k, v in sd.items() if k.startswith("visual.")}
    if vsd:
        Hv = vsd["visual.ln_post.weight"].shape[0]
        patch = vsd["visual.conv1.weight"].shape[-1]
        interv = vsd["visual.transformer.resblocks.0.mlp.c_fc.weight"].shape[0]
        Lv = 0
        while f"visual.transformer.resblocks.{Lv}.attn.in_proj_weight" in vsd:
            Lv += 1
        heads_v = (vision_heads if vision_heads is not None
                   else _OPENCLIP_VISION_HEADS.get(Hv, Hv // 64))
        if (vision_heads is None and Hv not in _OPENCLIP_VISION_HEADS
                and Hv not in _OPENCLIP_HEADS_BY_64):
            print(f"[validate_openclip] WARNING: vision width {Hv} is not "
                  f"in the known-heads table; assuming {Hv // 64} heads "
                  "(width//64). If the tower uses head_width != 64 pass "
                  "--vision_heads explicitly — a wrong head count shows up "
                  "as a large image_embeds golden mismatch.")
        vcfg = CLIPVisionConfig(
            hidden_size=Hv, num_hidden_layers=Lv,
            num_attention_heads=heads_v, intermediate_size=interv,
            image_size=int(g["image_size"]), patch_size=patch,
            projection_dim=vsd["visual.proj"].shape[1],
            hidden_act=act,
        )
        vision = CLIPVisionEncoder(vcfg)
        vparams = openclip_vision_from_torch(vsd)
        emb = vision.apply({"params": vparams},
                           jnp.asarray(g["pixel_values"]))
        errs["image_embeds"] = float(
            np.abs(np.asarray(emb) - g["image_embeds"]).max())
        np.testing.assert_allclose(np.asarray(emb), g["image_embeds"],
                                   rtol=rtol, atol=atol,
                                   err_msg="image_embeds")
        if verbose:
            print(f"  image_embeds  max|err| {errs['image_embeds']:.2e}  OK")
    if verbose:
        print("open_clip converters certified ✓")
    return errs
