"""Benchmark workflow launchers — the reference's ``sh_scripts/*.sh`` +
per-experiment argparse mains, as one CLI:

    python -m emcid_tpu.cli.workflows aice        --hparam ... --edit_nums 1,5,10
    python -m emcid_tpu.cli.workflows road|timed  --hparam ... --seed_num 1
    python -m emcid_tpu.cli.workflows artists     --hparam ... --num_artists 10
    python -m emcid_tpu.cli.workflows debias      --hparam ... --max_iter 10
    python -m emcid_tpu.cli.workflows coco        --hparam ... --sub 1000
    python -m emcid_tpu.cli.workflows i2p         --hparam ...
    python -m emcid_tpu.cli.workflows layer_stats --model sd-text --layers 0-11
    python -m emcid_tpu.cli.workflows sequential  --hparam ...

Model sources mirror run_emcid: --checkpoint_dir (local HF checkpoint),
--random-init, or --tiny (smoke).  The env-var knobs of the shell wrappers
(GPU_RANK/HPARAM/MOM2/EDIT_WEIGHT, reference sh_scripts/AICE_test.sh:3-7)
become flags: --hparam --mom2_weight --edit_weight; device selection is
jax-level (JAX_PLATFORMS / mesh), not per-process ranks.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
from pathlib import Path


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--hparam", required=False,
                   default="dest_s-200_c-1.5_ly-7-11_lr-0.2_wd-5e-04_txt-align-0.01")
    p.add_argument("--hparams_dir", default=None)
    p.add_argument("--mom2_weight", type=float, default=None)
    p.add_argument("--edit_weight", type=float, default=None)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--data_dir", default=None)
    p.add_argument("--cache_dir", default=None)
    p.add_argument("--results_dir", default=None)
    p.add_argument("--stats_dir", default=None)
    p.add_argument("--steps", type=int, default=50,
                   help="sampler inference steps")
    p.add_argument("--sampler", default=None,
                   choices=["pndm", "ddim", "dpm++"],
                   help="default pndm (the reference SD default); dpm++ "
                   "reaches PNDM-50 quality in 20-25 steps")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-mesh", action="store_true",
                   help="disable the default device mesh (multi-device "
                   "hosts shard generation/Stage-1/stats automatically)")


def _setup(args):
    if args.platform == "cpu" or (args.tiny and args.platform is None):
        import jax

        from emcid_tpu.runtime import force_cpu_platform
        force_cpu_platform()
    from emcid_tpu.hparams import load_hparams
    from emcid_tpu.models.loader import (
        build_random_pipeline, build_tiny_pipeline, load_pipeline,
    )

    hparams = load_hparams(args.hparam, hparams_dir=args.hparams_dir)
    if args.tiny:
        comps = build_tiny_pipeline(seed=args.seed)
        gen_kwargs = dict(num_inference_steps=min(args.steps, 4),
                          height=16, width=16)
        import dataclasses

        n = comps.text_encoder.config.num_hidden_layers
        if max(hparams.layers) >= n:
            k = min(len(hparams.layers), n)
            hparams = dataclasses.replace(hparams,
                                          layers=list(range(n - k, n)),
                                          v_num_grad_steps=min(
                                              hparams.v_num_grad_steps, 4))
    elif args.checkpoint_dir:
        comps = load_pipeline(args.checkpoint_dir)
        gen_kwargs = dict(num_inference_steps=args.steps, height=512, width=512)
    elif getattr(args, "random_init", False):
        comps = build_random_pipeline(seed=args.seed)
        gen_kwargs = dict(num_inference_steps=args.steps, height=512, width=512)
    else:
        raise SystemExit("no model source: --checkpoint_dir / --random-init / --tiny")
    gen_kwargs["sampler"] = getattr(args, "sampler", None) or "pndm"
    # multi-device hosts get the data mesh by default (VERDICT r2: the mesh
    # must be a product property, not a tests-only demo); generate() and
    # apply_emcid both accept mesh=None transparently on one device
    from emcid_tpu.parallel import default_mesh

    mesh = default_mesh(disable=getattr(args, "no_mesh", False))
    if mesh is not None:
        gen_kwargs["mesh"] = mesh
        print(f"[workflows] data mesh over {mesh.devices.size} devices")
    return comps, hparams, gen_kwargs, mesh


def _vit_scorer(args):
    from emcid_tpu.evals.scorers import make_vit_scorer

    if getattr(args, "vit_checkpoint", None):
        import torch

        sd = torch.load(args.vit_checkpoint, map_location="cpu",
                        weights_only=True)
        return make_vit_scorer(torch_state_dict=sd)
    print("[workflows] no --vit_checkpoint: using a randomly initialized ViT "
          "scorer (structure-only smoke run)")
    return make_vit_scorer()


def cmd_aice(args):
    from emcid_tpu.evals.iceb import emcid_test_text_encoder_imgnet

    comps, hparams, gen_kwargs, mesh = _setup(args)
    scorer = _vit_scorer(args)
    edit_nums = [int(x) for x in args.edit_nums.split(",")]
    for n in edit_nums:  # the reference sweeps descending (test.py:753-786)
        emcid_test_text_encoder_imgnet(
            comps, scorer, hparams, args.hparam, num_edit=n,
            mom2_weight=args.mom2_weight, edit_weight=args.edit_weight,
            dataset_name=args.dataset, data_dir=args.data_dir,
            cache_dir=args.cache_dir, results_dir=args.results_dir,
            gen_kwargs=gen_kwargs,
            specificity_classes=args.specificity_classes,
            apply_kwargs=dict(
                stats_dir=args.stats_dir, mesh=mesh,
                num_inference_steps=gen_kwargs["num_inference_steps"]),
        )


def cmd_refact(args, dataset):
    from emcid_tpu.dsets import TIMEDRoadRequestDataset
    from emcid_tpu.evals.refact_benchmark import emcid_test

    comps, hparams, gen_kwargs, mesh = _setup(args)
    ds = TIMEDRoadRequestDataset(dataset, data_dir=args.data_dir)
    requests = ds.requests[: args.num_requests] if args.num_requests else ds.requests
    emcid_test(
        comps, requests, hparams, args.hparam, dataset,
        mom2_weight=args.mom2_weight, edit_weight=args.edit_weight,
        seed_num=args.seed_num, oracle=args.oracle, method=args.method,
        results_dir=args.results_dir or "results", gen_kwargs=gen_kwargs,
        apply_kwargs=dict(
            stats_dir=args.stats_dir, mesh=mesh,
            num_inference_steps=gen_kwargs["num_inference_steps"]),
        cache_name=(f"{args.cache_dir}/{args.hparam}/{dataset}/"
                    if args.cache_dir else None),
    )


def cmd_artists(args):
    from emcid_tpu.dsets import ArtistRequestsDataset, load_artist_eval_prompts
    from emcid_tpu.engine.editor import apply_emcid
    from emcid_tpu.evals.artists_eval import generate_artist_images

    comps, hparams, gen_kwargs, mesh = _setup(args)
    ds = ArtistRequestsDataset(data_dir=args.data_dir,
                               num_artists=args.num_artists, dest=args.dest)
    rows = load_artist_eval_prompts(args.num_artists, data_dir=args.data_dir)
    out = Path(args.results_dir or "results") / "images" / "artists" / (
        f"{args.hparam}_n{args.num_artists}")
    generate_artist_images(comps, rows, out / "pre", gen_kwargs=gen_kwargs)
    edited, _ = apply_emcid(
        comps, ds.requests, hparams,
        mom2_weight=args.mom2_weight, edit_weight=args.edit_weight,
        cache_name=(f"{args.cache_dir}/{args.hparam}/artists/"
                    if args.cache_dir else None),
        stats_dir=args.stats_dir, mesh=mesh,
        num_inference_steps=gen_kwargs["num_inference_steps"],
    )
    generate_artist_images(edited, rows, out / "post", gen_kwargs=gen_kwargs)
    print(f"images in {out}; score with evals.artists_eval.eval_artists")


def cmd_debias(args):
    from emcid_tpu.dsets import DebiasRequestDataset

    comps, hparams, gen_kwargs, mesh = _setup(args)
    ds = DebiasRequestDataset(data_dir=args.data_dir)
    requests = ds.requests[: args.num_requests] if args.num_requests else ds.requests
    scorer = _clip_scorer(args, comps)
    if args.method == "uce":
        # iterative UCE ratio-feedback loop (reference uce_train.py:597-843)
        from emcid_tpu.engine.uce import edit_model_debias

        edited, weights, init_ratios, ratios = edit_model_debias(
            comps, scorer,
            [r["source"] for r in requests],
            [r["dests"] for r in requests],
            max_iters=args.max_iter, num_samples=args.num_samples,
            gen_kwargs=gen_kwargs, mesh=mesh,
        )
        print("init ratios:", [np.round(r, 3).tolist() for r in init_ratios])
        print("final ratios:", [np.round(r, 3).tolist() for r in ratios])
        return
    from emcid_tpu.engine.debias import apply_emcid_to_text_encoder_debias

    edited, deltas, factors = apply_emcid_to_text_encoder_debias(
        comps, requests, hparams, scorer,
        mom2_weight=args.mom2_weight, edit_weight=args.edit_weight,
        cache_name=(f"{args.cache_dir}/{args.hparam}/debias/"
                    if args.cache_dir else None),
        max_iter=args.max_iter, num_samples=args.num_samples,
        gen_kwargs=gen_kwargs, stats_dir=args.stats_dir, mesh=mesh,
        num_inference_steps=gen_kwargs["num_inference_steps"],
    )
    print("factors:", factors)


def _clip_scorer(args, comps):
    from emcid_tpu.models.vision import (
        CLIPScorer, CLIPVisionEncoder, CLIP_VIT_L14_VISION, TINY_CLIP_VISION,
        clip_vision_from_torch,
    )
    import dataclasses

    import jax

    from emcid_tpu.models.clip_text import CLIPTextEncoder

    if getattr(args, "clip_checkpoint", None):
        import torch

        sd = torch.load(args.clip_checkpoint, map_location="cpu",
                        weights_only=True)
        vision = CLIPVisionEncoder(CLIP_VIT_L14_VISION)
        vp = clip_vision_from_torch(sd)
        from emcid_tpu.models.configs import SD_V14_TEXT
        from emcid_tpu.models.convert_hf import clip_text_from_torch

        tc = dataclasses.replace(SD_V14_TEXT, projection_dim=768)
        text = CLIPTextEncoder(tc)
        tp = clip_text_from_torch(sd)
        return CLIPScorer(text, tp, vision, vp, comps.tokenizer)
    print("[workflows] no --clip_checkpoint: using a randomly initialized "
          "CLIP scorer (structure-only smoke run)")
    cfg = TINY_CLIP_VISION if args.tiny else CLIP_VIT_L14_VISION
    vision = CLIPVisionEncoder(cfg)
    vp = vision.init_params(jax.random.PRNGKey(5))
    tc = dataclasses.replace(comps.text_encoder.config,
                             projection_dim=cfg.projection_dim)
    text = CLIPTextEncoder(tc)
    tp = text.init_params(jax.random.PRNGKey(6),
                          seq_len=comps.tokenizer.model_max_length)
    return CLIPScorer(text, tp, vision, vp, comps.tokenizer)


def cmd_coco(args):
    from emcid_tpu.dsets import load_coco_30k
    from emcid_tpu.evals.coco_eval import generate_coco

    comps, hparams, gen_kwargs, mesh = _setup(args)
    rows = load_coco_30k(data_dir=args.data_dir, sub=args.sub)
    out = Path(args.results_dir or "results") / "images" / "coco" / args.tag
    generate_coco(comps, rows, out, gen_kwargs=gen_kwargs,
                  batch_size=args.batch_size)
    print(f"{len(rows)} COCO images in {out}")
    if args.fid_ref_dir:
        # COCO-30k FID against the real-image folder (reference
        # scripts/test_fid_score.py:27-43, pytorch-fid dims=2048)
        from emcid_tpu.evals.scorers import fid_between_folders
        from emcid_tpu.models.inception import make_fid_extractor

        if args.inception_weights is None:
            print("[workflows] no --inception_weights: FID uses a randomly "
                  "initialized InceptionV3 (structure-only smoke run)")
        extractor = make_fid_extractor(args.inception_weights,
                                       batch_size=args.batch_size)
        fid = fid_between_folders(args.fid_ref_dir, out, extractor,
                                  batch_size=args.batch_size)
        print(f"FID({args.fid_ref_dir}, {out}) = {fid:.4f}")


def cmd_i2p(args):
    from emcid_tpu.dsets.global_concepts import load_i2p_prompts
    from emcid_tpu.evals.i2p_eval import (
        detect_nude_classes, generate_i2p_imgs, i2p_nudity_summary,
    )

    comps, hparams, gen_kwargs, mesh = _setup(args)
    rows = load_i2p_prompts(data_dir=args.data_dir)
    if args.num_requests:
        rows = rows[: args.num_requests]
    out = Path(args.results_dir or "results") / "images" / "i2p" / args.tag
    generate_i2p_imgs(comps, rows, out, gen_kwargs=gen_kwargs)
    if args.detector_cmd or args.detections_csv:
        # full leg: detector subprocess (reference emcid_test.py:419-422;
        # cmd contract documented at detect_nude_classes) → count summary
        # (reference eval_i2p_nudity.py:80-122 keys)
        csv_path = args.detections_csv or (out.parent
                                           / f"{args.tag}_nudity.csv")
        dets = detect_nude_classes(out, csv_path,
                                   detector_cmd=args.detector_cmd)
        cnt = i2p_nudity_summary(
            dets, out_json=out.parent / f"i2p_nudity_{args.tag}_cnt.json")
        print(f"{len(rows)} I2P images in {out}; nudity counts: "
              f"total={cnt['total']} over {cnt['total_images']} images")
    else:
        print(f"{len(rows)} I2P images in {out}; pass --detector_cmd "
              f"'python path/to/nudenet_wrapper.py' (see "
              f"scripts/fake_nudenet.py for the contract) or "
              f"--detections_csv to summarize")


def cmd_mend(args):
    """Concept rectification (reference sh_scripts/rectification launcher)."""
    from emcid_tpu.evals.rectification import emcid_test_imgnet_mend

    comps, hparams, gen_kwargs, mesh = _setup(args)
    scorer = _vit_scorer(args)
    emcid_test_imgnet_mend(
        comps, scorer, hparams, args.hparam, num_edit=args.num_edit,
        method=args.method, mom2_weight=args.mom2_weight,
        edit_weight=args.edit_weight, data_dir=args.data_dir,
        cache_dir=args.cache_dir, results_dir=args.results_dir,
        gen_kwargs=gen_kwargs,
        specificity_classes=args.specificity_classes,
        apply_kwargs=dict(
            stats_dir=args.stats_dir, mesh=mesh,
            num_inference_steps=gen_kwargs["num_inference_steps"]),
    )


def cmd_layer_stats(args):
    """Covariance pre-cache CLI (reference emcid/layer_stats.py main, :34-134)."""
    from emcid_tpu.dsets.stat_dataset import TokenizedDataset, make_synthetic_captions
    from emcid_tpu.engine.layer_stats import layer_stats_text_encoder

    comps, hparams, _, mesh = _setup(args)
    lo, hi = (int(x) for x in args.layers.split("-"))
    if args.captions_file:
        captions = TokenizedDataset.from_ccs_file(args.captions_file).captions
    else:
        print("[workflows] no --captions_file: synthetic caption corpus")
        captions = make_synthetic_captions(args.sample_size)
    for layer in range(lo, hi + 1):
        layer_name = hparams.rewrite_module_tmp.format(layer)
        layer_stats_text_encoder(
            comps.text_encoder, comps.text_params, comps.tokenizer,
            layer_name, stats_dir=args.stats_dir or "data/stats",
            sample_size=args.sample_size, captions=captions,
            ds_name=hparams.mom2_dataset, mesh=mesh,
        )
        print(f"cached stats for {layer_name}")


def cmd_sequential(args):
    from emcid_tpu.experiments.sequential import sequential_editing

    comps, hparams, gen_kwargs, mesh = _setup(args)
    prompts_tmp = ["An image of {}", "A photo of {}", "{}"]
    chain = ["Joe Biden", "Hillary Clinton", "Morgan Freeman"]
    source = "The Current United States president"
    rounds = [
        [{"source": source, "dest": dest, "prompts": prompts_tmp[:],
          "seed_train": 2024}]
        for dest in chain
    ]
    sequential_editing(
        comps, rounds, hparams,
        val_prompts=["An image of the current United States president"],
        save_dir=Path(args.results_dir or "results") / "emcid" / "sequential",
        mom2_weight=args.mom2_weight, edit_weight=args.edit_weight,
        sample_num=args.sample_num, gen_kwargs=gen_kwargs,
        apply_kwargs=dict(
            stats_dir=args.stats_dir, mesh=mesh,
            num_inference_steps=gen_kwargs["num_inference_steps"]),
    )


def cmd_plots(args):
    """Figure generation from result files (reference scripts/plot_metrics.py
    __main__ + experiments/ablation.py plotters, parameterized: summaries in,
    one figure out)."""
    import re as _re

    from emcid_tpu.evals import plotting as P

    def _labeled(pairs):
        out = {}
        for item in pairs or []:
            label, _, path = item.partition("=")
            out[label if path else Path(item).stem] = path or item
        return out

    if args.figure == "artists":
        P.plot_artists_lpips_clip(
            _labeled(args.summary), args.out, max_x=args.max_x,
            orig_summary_path=args.orig_summary)
    elif args.figure == "coco":
        P.plot_coco_multi(_labeled(args.summary), args.out,
                          plot_lpips=args.plot_lpips, max_x=args.max_x,
                          direction=args.direction)
    elif args.figure == "debias_ratios":
        P.plot_debias_ratios(args.csv, args.out)
    elif args.figure == "edit_weight_ablation":
        # one summary holds keys edit{n}_weight{w}[_ew{e}] across the sweep
        rows = P.load_summary_records(args.summary[0])
        points = {r["edit_weight"]: r for r in rows
                  if args.num_edit is None or r["num_edit"] == args.num_edit}
        P.plot_ablation_curves(points, args.out, xlabel="edit_weight")
    elif args.figure in ("token_ablation", "layer_ablation"):
        # per-variant summary files; variant parsed from the directory name
        # ("..._tok{t}" / "...ly{a}-{b}", reference ablation.py:577-696)
        import glob as _glob

        points, cells = {}, {}
        for path in _glob.glob(args.glob):
            rows = P.load_summary_records(path)
            if not rows:
                continue
            rec = max(rows, key=lambda r: r["num_edit"])
            if args.figure == "token_ablation":
                m = _re.search(r"_tok(\d+)", path)
                if m:
                    points[int(m.group(1))] = rec
            else:
                m = _re.search(r"ly(\d+)-(\d+)", path)
                if m:
                    cells[(int(m.group(1)), int(m.group(2)))] = rec
        if args.figure == "token_ablation":
            P.plot_ablation_curves(points, args.out,
                                   xlabel="num_edit_tokens")
        else:
            P.plot_layer_ablation(cells, args.out)
    print(f"figure written to {args.out}")


def cmd_certify_levers(args):
    """One-command real-weight lever certification (VERDICT r4 next #2;
    RUNBOOK step 2b): converter goldens (optional) + every guarded
    deviation's pre-registered KEEP/RESTORE decision rule against this
    checkpoint's own Stage-1 z deltas and MC noise floor."""
    from pathlib import Path

    comps, hparams, gen_kwargs, mesh = _setup(args)
    if args.goldens:
        from emcid_tpu.cli.validate import validate_against_goldens

        validate_against_goldens(comps, args.goldens)
    from emcid_tpu.evals.lever_cert import certify_levers, default_requests

    if args.tiny:
        # tiny tokenizer vocabulary (models/loader.py build_tiny_pipeline)
        pairs = [("cat", "dog"), ("w0", "w1"), ("w2", "w3"),
                 ("w4", "w5"), ("w6", "w7"), ("w8", "w9")]
        requests = [
            {"prompts": ["a photo of {}", "an image of a {}", "{}"],
             "source": s, "dest": d, "seed_train": i}
            for i, (s, d) in enumerate(pairs[: args.n_concepts])
        ]
    else:
        requests = default_requests(args.n_concepts)
    out = Path(args.results_dir or "results") / "lever_cert.json"
    certify_levers(comps, hparams, requests=requests,
                   num_inference_steps=gen_kwargs["num_inference_steps"],
                   out_path=str(out))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("aice")
    _add_common(p)
    p.add_argument("--edit_nums", default="1,5,10")
    p.add_argument("--dataset", default="imgnet_aug")
    p.add_argument("--specificity_classes", type=int, default=None)
    p.add_argument("--vit_checkpoint", default=None)

    for name in ("road", "timed"):
        p = sub.add_parser(name)
        _add_common(p)
        p.add_argument("--seed_num", type=int, default=1)
        p.add_argument("--num_requests", type=int, default=None)
        p.add_argument("--oracle", action="store_true")
        p.add_argument("--method", default="emcid",
                       choices=["emcid", "contrast"])

    p = sub.add_parser("artists")
    _add_common(p)
    p.add_argument("--num_artists", type=int, default=10)
    p.add_argument("--dest", default="art")

    p = sub.add_parser("debias")
    _add_common(p)
    p.add_argument("--num_requests", type=int, default=None)
    p.add_argument("--max_iter", type=int, default=10)
    p.add_argument("--num_samples", type=int, default=25)
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--method", default="emcid", choices=["emcid", "uce"])

    p = sub.add_parser("validate")
    _add_common(p)
    p.add_argument("--goldens", default=None,
                   help="goldens npz from scripts/make_goldens_torch.py")
    p.add_argument("--make_self_goldens", default=None,
                   help="write a self-goldens npz instead of validating")
    p.add_argument("--f32", action="store_true",
                   help="load the checkpoint in float32 (tight tolerances)")

    p = sub.add_parser("certify_levers")
    _add_common(p)
    p.add_argument("--goldens", default=None,
                   help="also run the converter goldens first (npz from "
                   "scripts/make_goldens_torch.py)")
    p.add_argument("--n_concepts", type=int, default=4)

    p = sub.add_parser("validate_openclip")
    p.add_argument("--checkpoint", required=True,
                   help="open_clip torch state_dict (.bin/.pt)")
    p.add_argument("--goldens", required=True,
                   help="npz from scripts/make_goldens_openclip.py")
    p.add_argument("--act", default="gelu", choices=["gelu", "quick_gelu"],
                   help="quick_gelu for OpenAI-pretrained checkpoints")
    p.add_argument("--vision_heads", type=int, default=None,
                   help="override vision-tower head count (head_width!=64 "
                   "models outside the known-width table)")

    p = sub.add_parser("coco")
    _add_common(p)
    p.add_argument("--sub", type=int, default=None)
    p.add_argument("--tag", default="sd_orig")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--fid_ref_dir", default=None,
                   help="real-image folder; computes FID(ref, generated)")
    p.add_argument("--inception_weights", default=None,
                   help="torch .pth (torchvision/pytorch-fid) or converted "
                        ".npz InceptionV3 weights")

    p = sub.add_parser("i2p")
    _add_common(p)
    p.add_argument("--num_requests", type=int, default=None)
    p.add_argument("--tag", default="post_edit")
    p.add_argument("--detector_cmd", default=None,
                   help="external NudeNet wrapper invoked as "
                   "'{cmd} {img_dir} {out_csv}' (scripts/fake_nudenet.py "
                   "documents the CSV contract)")
    p.add_argument("--detections_csv", default=None,
                   help="existing detections CSV (reference "
                   "detectNudeClasses schema) to summarize")

    p = sub.add_parser("mend")
    _add_common(p)
    p.add_argument("--num_edit", type=int, default=140)
    p.add_argument("--method", default="emcid", choices=["emcid", "uce"])
    p.add_argument("--specificity_classes", type=int, default=None)
    p.add_argument("--vit_checkpoint", default=None)

    p = sub.add_parser("layer_stats")
    _add_common(p)
    p.add_argument("--layers", default="0-11")
    p.add_argument("--sample_size", type=int, default=100000)
    p.add_argument("--captions_file", default=None)

    p = sub.add_parser("sequential")
    _add_common(p)
    p.add_argument("--sample_num", type=int, default=10)

    p = sub.add_parser("plots")
    p.add_argument("--figure", required=True,
                   choices=["artists", "coco", "debias_ratios",
                            "edit_weight_ablation", "token_ablation",
                            "layer_ablation"])
    p.add_argument("--out", required=True)
    p.add_argument("--summary", action="append",
                   help="summary JSON path, optionally 'label=path'; "
                        "repeatable for multi-curve figures")
    p.add_argument("--csv", help="ratios CSV for debias_ratios")
    p.add_argument("--glob", help="per-variant summary glob for "
                                  "token/layer ablation figures")
    p.add_argument("--orig_summary", default=None)
    p.add_argument("--max_x", type=int, default=300)
    p.add_argument("--plot_lpips", action="store_true")
    p.add_argument("--direction", default="vertical",
                   choices=["vertical", "horizontal"])
    p.add_argument("--num_edit", type=int, default=None)

    args = parser.parse_args(argv)
    if args.cmd == "aice":
        cmd_aice(args)
    elif args.cmd in ("road", "timed"):
        cmd_refact(args, args.cmd)
    elif args.cmd == "artists":
        cmd_artists(args)
    elif args.cmd == "debias":
        cmd_debias(args)
    elif args.cmd == "validate_openclip":
        from emcid_tpu.cli.validate import validate_openclip

        validate_openclip(args.checkpoint, args.goldens,
                          act=args.act,
                          vision_heads=args.vision_heads)
    elif args.cmd == "validate":
        from emcid_tpu.cli.validate import cmd_validate

        cmd_validate(args)
    elif args.cmd == "certify_levers":
        cmd_certify_levers(args)
    elif args.cmd == "coco":
        cmd_coco(args)
    elif args.cmd == "i2p":
        cmd_i2p(args)
    elif args.cmd == "mend":
        cmd_mend(args)
    elif args.cmd == "layer_stats":
        cmd_layer_stats(args)
    elif args.cmd == "sequential":
        cmd_sequential(args)
    elif args.cmd == "plots":
        cmd_plots(args)


if __name__ == "__main__":
    main()
