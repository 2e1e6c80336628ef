"""Generate parity goldens from a local HF Stable-Diffusion checkpoint
using the ORIGINAL torch implementations (transformers CLIP + diffusers
UNet/VAE/PNDM).

Run this in an environment that has torch + transformers + diffusers and a
local SD-v1.4-style checkout (no network needed):

    python scripts/make_goldens_torch.py --checkpoint_dir /path/to/sd-v1-4 \
        --out goldens_sd14.npz

then certify the TPU-native load path with:

    python -m emcid_tpu.cli.workflows validate \
        --checkpoint_dir /path/to/sd-v1-4 --goldens goldens_sd14.npz

The fixed inputs and the synthetic-eps PNDM trajectory protocol must match
emcid_tpu/cli/validate.py (same _fixed_inputs seeds, same tanh eps).
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--latent_hw", type=int, default=32)
    ap.add_argument("--pndm_steps", type=int, default=8)
    args = ap.parse_args()

    import torch
    from diffusers import AutoencoderKL, PNDMScheduler, UNet2DConditionModel
    from transformers import CLIPTextModel

    from emcid_tpu.cli.validate import _fixed_inputs, synthetic_eps

    text = CLIPTextModel.from_pretrained(
        args.checkpoint_dir, subfolder="text_encoder").eval()
    unet = UNet2DConditionModel.from_pretrained(
        args.checkpoint_dir, subfolder="unet").eval()
    vae = AutoencoderKL.from_pretrained(
        args.checkpoint_dir, subfolder="vae").eval()

    cfg = text.config
    inp = _fixed_inputs(cfg, latent_hw=args.latent_hw,
                        ctx_len=cfg.max_position_embeddings,
                        hidden=cfg.hidden_size)
    out = dict(inp)
    with torch.no_grad():
        t_out = text(torch.from_numpy(inp["input_ids"]))
        out["text_hidden"] = t_out.last_hidden_state.numpy()
        out["text_pooled"] = t_out.pooler_output.numpy()
        # NHWC (ours) <-> NCHW (torch)
        lat = torch.from_numpy(inp["latents"].transpose(0, 3, 1, 2))
        ctx = torch.from_numpy(inp["context"])
        eps = unet(lat, torch.from_numpy(inp["timesteps"]), ctx).sample
        out["unet_eps"] = eps.numpy().transpose(0, 2, 3, 1)
        dec = vae.decode(torch.from_numpy(
            inp["vae_latents"].transpose(0, 3, 1, 2))).sample
        out["vae_decode"] = dec.numpy().transpose(0, 2, 3, 1)
        dist = vae.encode(torch.from_numpy(
            inp["image"].transpose(0, 3, 1, 2))).latent_dist
        out["vae_enc_mean"] = dist.mean.numpy().transpose(0, 2, 3, 1)
        out["vae_enc_logvar"] = dist.logvar.numpy().transpose(0, 2, 3, 1)

    # ---- PNDM trajectory with the synthetic eps --------------------------
    sched = PNDMScheduler.from_pretrained(args.checkpoint_dir,
                                          subfolder="scheduler")
    sched.set_timesteps(args.pndm_steps)
    rng = np.random.RandomState(3)
    lat = rng.randn(2, args.latent_hw, args.latent_hw, 4).astype(np.float32)
    lat_t = torch.from_numpy(lat.transpose(0, 3, 1, 2))
    traj = []
    for t in sched.timesteps:
        eps_np = synthetic_eps(
            lat_t.numpy().transpose(0, 2, 3, 1), int(t))
        eps_t = torch.from_numpy(eps_np.transpose(0, 3, 1, 2))
        lat_t = sched.step(eps_t, t, lat_t).prev_sample
        traj.append(lat_t.numpy().transpose(0, 2, 3, 1))
    out["pndm_traj"] = np.stack(traj)
    out["pndm_steps"] = np.asarray(args.pndm_steps)

    np.savez(args.out, **out)
    print(f"goldens written to {args.out}")


if __name__ == "__main__":
    main()
