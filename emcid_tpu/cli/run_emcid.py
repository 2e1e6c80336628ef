"""The product CLI (reference scripts/run_emcid.py:27-129).

Instruction JSON: {requests, hparams, model_ckpt in {sd-v1.4, sdxl-1.0},
mom2_weight[, mom2_weight_2], edit_weight, val_prompts, out_dir, sample_num}.
Flow: pre-edit generation of val prompts → apply EMCID → post-edit
generation; images land in out_dir/{pre,post}_edit/.

Model source (no hub access in this build):
  --checkpoint_dir: local HF-format SD checkpoint (converted on load)
  --random-init:    full-architecture random weights (perf/dry runs)
  --tiny:           tiny random pipeline (smoke tests)
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def save_images(images: np.ndarray, out_dir: Path, names):
    out_dir.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    for img, name in zip(images, names):
        Image.fromarray(img).save(out_dir / name)


def _main_sdxl(args, instruction, hparams, requests, mom2_weight,
               edit_weight, val_prompts, out_dir, sample_num):
    """SDXL leg of the CLI (instruction model_ckpt='sdxl-1.0' with
    mom2_weight_2, reference run_emcid.py SDXL branch)."""
    import dataclasses

    from emcid_tpu.engine.sdxl import (
        apply_emcid_to_sdxl_text_encoders,
        resolve_covariances_sdxl,
        sdxl_training_latents,
    )
    from emcid_tpu.models.sdxl import (
        build_random_sdxl_pipeline,
        build_tiny_sdxl_pipeline,
        generate_sdxl,
    )

    mom2_weight_2 = instruction.get("mom2_weight_2")
    if args.tiny:
        words = []
        for r in requests:
            words += r["source"].lower().split() + r["dest"].lower().split()
        comps = build_tiny_sdxl_pipeline(seed=args.seed, words=words)
        res = comps.unet.config.sample_size * comps.vae_scale
        steps = min(args.steps, 4)
        n1 = comps.text_encoder.config.num_hidden_layers
        n2 = comps.text_encoder_2.config.num_hidden_layers
        if max(hparams.layers) >= n1 - 1 or max(hparams.layers_2) >= n2 - 1:
            hparams = dataclasses.replace(
                hparams,
                layers=list(range(max(0, n1 - 3), n1 - 1)),
                layers_2=list(range(max(0, n2 - 3), n2 - 1)),
                v_num_grad_steps=min(hparams.v_num_grad_steps, 4),
            )
            print(f"[tiny] remapped layers to {hparams.layers}/{hparams.layers_2}")
    elif getattr(args, "random_init", False):
        comps = build_random_sdxl_pipeline(seed=args.seed)
        res = 1024
        steps = args.steps
    elif args.checkpoint_dir:
        from emcid_tpu.models.sdxl import load_sdxl_pipeline

        comps = load_sdxl_pipeline(args.checkpoint_dir)
        res = 1024
        steps = args.steps
    else:
        raise SystemExit(
            "SDXL model source: pass --checkpoint_dir (HF-format SDXL "
            "dir), --random-init, or --tiny")

    # SDXL family default is DDIM (sample_latents_sdxl's own default);
    # --sampler overrides explicitly
    gen_kwargs = dict(num_inference_steps=steps, height=res, width=res,
                      sampler=args.sampler or "ddim")
    names, prompts, seeds = [], [], []
    for i, vp in enumerate(val_prompts):
        for s in range(sample_num):
            prompts.append(vp)
            seeds.append(args.seed + s)
            names.append(f"prompt{i}_seed{args.seed + s}.png")
    if prompts:
        print(f"pre-edit generation: {len(prompts)} images")
        save_images(generate_sdxl(comps, prompts, seeds, **gen_kwargs),
                    out_dir / "pre_edit", names)

    covs_1, covs_2 = resolve_covariances_sdxl(
        comps, hparams, stats_dir_1=args.stats_dir, stats_dir_2=args.stats_dir)
    mean, logvar = sdxl_training_latents(
        comps, requests, hparams, height=res, width=res,
        num_inference_steps=steps, verbose=True)
    cache_name = (f"{args.cache_dir}/{instruction['hparams']}/"
                  if args.cache_dir else None)
    d1, d2, edited = apply_emcid_to_sdxl_text_encoders(
        comps, requests, hparams, mean, logvar, covs_1, covs_2,
        mom2_weight=mom2_weight, mom2_weight_2=mom2_weight_2,
        edit_weight=edit_weight, cache_name=cache_name,
        height=res, width=res)
    if prompts:
        print(f"post-edit generation: {len(prompts)} images")
        save_images(generate_sdxl(edited, prompts, seeds, **gen_kwargs),
                    out_dir / "post_edit", names)
    print(f"Done. Results in {out_dir}")
    return edited, (d1, d2)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--instruction_path", required=True)
    parser.add_argument("--checkpoint_dir", default=None,
                        help="local HF-format SD checkpoint directory")
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny random pipeline (smoke test)")
    parser.add_argument("--hparams_dir", default=None)
    parser.add_argument("--stats_dir", default=None)
    parser.add_argument("--cache_dir", default=None,
                        help="z-vector cache directory")
    parser.add_argument("--steps", type=int, default=50,
                        help="sampler inference steps")
    parser.add_argument("--sampler", default=None,
                        choices=["pndm", "ddim", "dpm++"],
                        help="default resolves per model family (pndm for "
                        "SD — the reference default — ddim for SDXL); "
                        "dpm++ reaches PNDM-50 quality in 20-25 steps")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="force a jax platform (tiny smoke runs are "
                        "faster on cpu: remote TPU compiles dominate)")
    parser.add_argument("--no-mesh", action="store_true",
                        help="disable the default device mesh (multi-device "
                        "hosts shard generation and Stage-1 automatically)")
    args = parser.parse_args(argv)

    if args.platform == "cpu" or (args.tiny and args.platform is None):
        import jax

        from emcid_tpu.runtime import force_cpu_platform
        force_cpu_platform()

    with open(args.instruction_path) as f:
        instruction = json.load(f)

    requests = instruction["requests"]
    model_ckpt = instruction.get("model_ckpt", "sd-v1.4")
    mom2_weight = instruction.get("mom2_weight")
    edit_weight = instruction.get("edit_weight")
    val_prompts = instruction.get("val_prompts", [])
    out_dir = Path(instruction.get("out_dir", "results/run_emcid"))
    sample_num = int(instruction.get("sample_num", 5))

    from emcid_tpu.hparams import load_hparams
    from emcid_tpu.engine.editor import apply_emcid
    from emcid_tpu.models.loader import (
        build_random_pipeline, build_tiny_pipeline, load_pipeline,
    )
    from emcid_tpu.models.pipeline import generate

    hparams = load_hparams(instruction["hparams"], hparams_dir=args.hparams_dir)
    print(f"Loaded hparams {instruction['hparams']}: layers {hparams.layers}")
    if model_ckpt.startswith("sdxl"):
        return _main_sdxl(args, instruction, hparams, requests, mom2_weight,
                          edit_weight, val_prompts, out_dir, sample_num)
    if model_ckpt not in ("sd-v1.4", "sd-v1.5"):
        raise SystemExit(f"unknown model_ckpt {model_ckpt!r}")

    if args.tiny:
        # include the request/val vocabulary so tiny runs tokenize sensibly
        words = []
        for r in requests:
            words += r["source"].lower().split() + r["dest"].lower().split()
        comps = build_tiny_pipeline(seed=args.seed, words=words)
        res = comps.unet.config.sample_size * comps.vae_scale
        steps = min(args.steps, 8)
        # remap edit layers into the tiny encoder's depth
        n_layers = comps.text_encoder.config.num_hidden_layers
        if max(hparams.layers) >= n_layers:
            k = min(len(hparams.layers), n_layers)
            import dataclasses

            hparams = dataclasses.replace(
                hparams, layers=list(range(n_layers - k, n_layers))
            )
            print(f"[tiny] remapped edit layers to {hparams.layers}")
    elif args.checkpoint_dir:
        comps = load_pipeline(args.checkpoint_dir)
        res = 512
        steps = args.steps
    elif args.random_init:
        comps = build_random_pipeline(model_ckpt, seed=args.seed)
        res = 512
        steps = args.steps
    else:
        raise SystemExit(
            "no model source: pass --checkpoint_dir (local HF checkpoint), "
            "--random-init, or --tiny (no hub access in this build)"
        )

    from emcid_tpu.parallel import default_mesh

    mesh = default_mesh(disable=args.no_mesh)
    if mesh is not None:
        print(f"[run_emcid] data mesh over {mesh.devices.size} devices")
    gen_kwargs = dict(num_inference_steps=steps, height=res, width=res,
                      sampler=args.sampler or "pndm", mesh=mesh)
    names, prompts, seeds = [], [], []
    for i, vp in enumerate(val_prompts):
        for s in range(sample_num):
            prompts.append(vp)
            seeds.append(args.seed + s)
            names.append(f"prompt{i}_seed{args.seed + s}.png")

    if prompts:
        print(f"pre-edit generation: {len(prompts)} images")
        imgs = generate(comps, prompts, seeds, **gen_kwargs)
        save_images(imgs, out_dir / "pre_edit", names)

    cache_name = (
        f"{args.cache_dir}/{instruction['hparams']}/" if args.cache_dir else None
    )
    edited, deltas = apply_emcid(
        comps, requests, hparams,
        mom2_weight=mom2_weight, edit_weight=edit_weight,
        cache_name=cache_name, stats_dir=args.stats_dir,
        num_inference_steps=steps, mesh=mesh,
    )

    if prompts:
        print(f"post-edit generation: {len(prompts)} images")
        imgs = generate(edited, prompts, seeds, **gen_kwargs)
        save_images(imgs, out_dir / "post_edit", names)

    print(f"Done. Results in {out_dir}")
    return edited, deltas


if __name__ == "__main__":
    main()
