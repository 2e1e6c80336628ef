"""High-level edit orchestration: the functional equivalent of the
reference's ``apply_emcid_to_text_encoder`` end-to-end flow
(emcid_main.py:769-815 + compute_z + layer_stats), wired for pipelines.

``apply_emcid(components, requests, hparams)`` resolves, in order:
  1. covariances per edited layer — stats npz cache → caption sweep →
     synthetic-caption fallback (offline smoke; warns);
  2. per-concept z vectors — npz cache → Stage-1 optimization in fixed-size
     concept blocks (vmapped, one compiled program reused per block);
  3. the fused Stage-2 insert;
returning (edited components, deltas).  The caller keeps the original
components for restore (functional params — the reference's
weights_copy dance, emcid_main.py:858-865/1076-1078, is free here).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emcid_tpu.engine.compute_z import (
    ConceptBatch,
    ZOptimizer,
    prepare_concept_batch,
)
from emcid_tpu.engine.emcid import (
    execute_emcid_text_encoder,
    load_z_list,
    save_z_cache,
)
from emcid_tpu.engine.layer_stats import get_cov_text_encoder
from emcid_tpu.engine.training_images import training_latents_for_requests
from emcid_tpu.globals_cfg import STATS_DIR
from emcid_tpu.models.pipeline import SDComponents


def resolve_covariances_for(
    text_encoder,
    text_params,
    tokenizer,
    hparams,
    stats_dir=None,
    captions: Optional[Sequence[str]] = None,
    allow_synthetic: bool = True,
    mesh=None,
    model_name: str = "text_encoder",
    verbose: bool = True,
) -> List[jnp.ndarray]:
    """Per-layer second moments: cache → provided captions → synthetic.

    Model-level entry shared by the SD pipeline edit (``resolve_covariances``)
    and the bare CLIP-model edit (engine.clip_edit)."""
    covs = []
    for layer in hparams.layers:
        layer_name = hparams.rewrite_module_tmp.format(layer)
        try:
            C = get_cov_text_encoder(
                text_encoder, text_params, tokenizer, layer_name,
                mom2_dataset=hparams.mom2_dataset,
                mom2_n_samples=hparams.mom2_n_samples,
                mom2_dtype=hparams.mom2_dtype,
                stat_dir=stats_dir or STATS_DIR,
                captions=captions,
                mesh=mesh,
                model_name=model_name,
                verbose=verbose,
            )
        except FileNotFoundError:
            if not allow_synthetic:
                raise
            if verbose:
                print(
                    f"[emcid_tpu] no stats cache for {layer_name} and no "
                    "caption corpus — computing covariance over a synthetic "
                    "corpus (smoke-run fallback; supply data/ccs_filtered.json "
                    "for faithful statistics)"
                )
            from emcid_tpu.dsets.stat_dataset import make_synthetic_captions

            C = get_cov_text_encoder(
                text_encoder, text_params, tokenizer, layer_name,
                mom2_dataset="synthetic",
                mom2_n_samples=min(hparams.mom2_n_samples, 2000),
                mom2_dtype=hparams.mom2_dtype,
                stat_dir=stats_dir or STATS_DIR,
                captions=make_synthetic_captions(
                    min(hparams.mom2_n_samples, 2000)
                ),
                mesh=mesh,
                model_name=model_name,
                verbose=verbose,
            )
        covs.append(C)
    return covs


def resolve_covariances(
    components: SDComponents,
    hparams,
    stats_dir=None,
    captions: Optional[Sequence[str]] = None,
    allow_synthetic: bool = True,
    mesh=None,
    verbose: bool = True,
) -> List[jnp.ndarray]:
    """Per-layer second moments for a pipeline's text encoder."""
    return resolve_covariances_for(
        components.text_encoder, components.text_params,
        components.tokenizer, hparams, stats_dir=stats_dir,
        captions=captions, allow_synthetic=allow_synthetic, mesh=mesh,
        verbose=verbose,
    )


# ZOptimizer memo: a fresh instance re-traces (and on the remote-compile
# tunnel, re-compiles) its jitted step program; benchmark loops that edit
# one request at a time (refact edit/restore, debias per-dest, sequential
# rounds) would otherwise pay that once PER REQUEST.  Cached only for the
# common fim/text_projection-free path — array-valued extras are baked
# into the trace as constants, so those instances are built fresh.
_OPTZ_CACHE: Dict = {}


def _get_optimizer(components, hparams, fim=None, text_projection=None,
                   eps_pool: int = 0, lr_sched: str = "const") -> ZOptimizer:
    if fim is not None or text_projection is not None:
        return ZOptimizer(
            components.text_encoder, components.unet, components.schedule,
            hparams, layer=hparams.layers[-1], fim=fim,
            text_projection=text_projection, eps_pool=eps_pool,
            lr_sched=lr_sched,
        )
    import dataclasses as _dc
    import json as _json

    hp_key = _json.dumps(_dc.asdict(hparams), sort_keys=True, default=str)
    sched = components.schedule
    # Flax modules are stateless (params arrive as call args), so two
    # pipelines with equal configs/dtypes/schedules share a program; the
    # schedule tables are baked into the trace, so key on the FULL betas
    # table (endpoints alone can't discriminate linear vs scaled_linear —
    # both share betas[0]/betas[-1] while the interior differs)
    import numpy as _np

    key = (
        components.text_encoder.config, components.unet.config,
        str(components.unet.dtype),
        str(getattr(components.text_encoder, "dtype", None)),
        sched.num_train_timesteps, sched.prediction_type,
        _np.asarray(sched.betas, _np.float64).tobytes(),
        hp_key, hparams.layers[-1], eps_pool, lr_sched,
    )
    from emcid_tpu.runtime import trace_env_knobs

    key = key + (trace_env_knobs(),)
    if key not in _OPTZ_CACHE:
        if len(_OPTZ_CACHE) >= 8:  # bound: drop the oldest program set
            _OPTZ_CACHE.pop(next(iter(_OPTZ_CACHE)))
        _OPTZ_CACHE[key] = ZOptimizer(
            components.text_encoder, components.unet, components.schedule,
            hparams, layer=hparams.layers[-1], eps_pool=eps_pool,
            lr_sched=lr_sched,
        )
    return _OPTZ_CACHE[key]


def resolve_train_res(components, train_res: Optional[int] = None) -> int:
    """Training-image/Stage-1 resolution for this pipeline.

    Precedence: explicit ``train_res`` kwarg > ``EMCID_TPU_TRAIN_RES`` env
    (0 = the pipeline's native size, i.e. the reference protocol) >
    PRODUCT DEFAULT.  The product default is 384 — but ONLY at the
    measured native-512 protocol shape (SD-v1.x): on-chip, the z trained
    at 384 agrees with the native-512 z at per-concept cos 0.990±0.003 /
    norm ratio 1.003, ABOVE the 0.942 MC seed-noise floor of the native
    protocol itself, for ≈0.56x the gen+Stage-1 FLOPs (PERF.md round 4,
    scripts/prof_trainres.py).  Every other native size (tiny test
    pipelines, SDXL-1024) keeps the reference resolution until measured.

    The chosen resolution must survive the UNet's stride-2 chain with
    clean halvings or the up-path skip concats mismatch (e.g. 400 ->
    50x50 latents -> 50/25/13/7 crashes at the 13-vs-14 skip); SD
    (3 downsamples, vae_scale 8) needs multiples of 64.
    """
    native = components.unet.config.sample_size * components.vae_scale
    if train_res is None:
        env = os.environ.get("EMCID_TPU_TRAIN_RES")
        if env is not None:
            train_res = int(env or 0)
        else:
            train_res = 384 if native == 512 else 0
    if not train_res:
        return int(native)
    factor = components.vae_scale * (
        2 ** (len(components.unet.config.block_out_channels) - 1))
    if train_res % factor:
        raise ValueError(
            f"train_res={train_res} must be divisible by "
            f"vae_scale * 2^n_downsamples = {factor}")
    return int(train_res)


def compute_zs_for_requests(
    components: SDComponents,
    requests: Sequence[Dict],
    hparams,
    cache_name: Optional[str] = None,
    # measured sweet spot on a 16 GB v5e at SD shapes: C=8 is the largest
    # block whose remat="none" residuals fit HBM; bigger blocks trip the
    # remat="full" fallback (+~33%/step).  See PERF.md "HBM footprint".
    block_size: int = 8,
    rng_seed: int = 0,
    num_inference_steps: int = 50,
    fim: Optional[np.ndarray] = None,
    mesh=None,
    clip_align=None,
    train_sampler: str = "dpm++",
    train_steps: Optional[int] = None,
    eps_dest_pool: Optional[int] = None,
    z_sched: Optional[str] = None,
    cfg_interval: Optional[float] = None,
    train_res: Optional[int] = None,
    verbose: bool = True,
) -> np.ndarray:
    """All concepts' z vectors (R, T, H): cache hits + blocked Stage-1 runs.

    ``train_res`` (or ``EMCID_TPU_TRAIN_RES``) lowers the TRAINING-image
    resolution below the pipeline's native size (reference protocol: the
    pipe default, 512 for SD — compute_z.py:384-418); Stage-1 then also
    optimizes at the smaller latent grid.  Guarded deviation (quadratic
    FLOP lever: 384 ≈ 0.56x gen+Stage-1 cost).  PRODUCT DEFAULT
    (resolve_train_res, flipped round 4 after the on-chip z-agreement
    measurement, PERF.md): 384 at the measured native-512 protocol shape
    only — every other native size (tiny pipelines, SDXL-1024) keeps the
    reference resolution until measured.  ``EMCID_TPU_TRAIN_RES=0`` or
    ``train_res=<native>`` restores the reference protocol exactly;
    guards tests/test_train_res.py + test_deviation_guards.py.  Eval
    generation is never affected.

    ``eps_dest_pool=K`` precomputes the stop-gradient eps_dest forwards
    over a K-draw pool instead of one fresh forward per step (~-25% step
    time; see ZOptimizer.eps_pool for the deviation statement and guard).
    PRODUCT DEFAULT: K=25 (guards green, tests/test_eps_pool.py); pass 0
    to reproduce the reference's fresh-resampling protocol exactly, or set
    ``EMCID_TPU_EPS_POOL`` to change the default.

    Training images default to DPM-Solver++(2M) at ≤25 steps — measured to
    match PNDM-50 sample quality (models/scheduler.py:193; PERF.md) at half
    the diffusion cost, with an edit-efficacy parity guard in
    tests/test_train_sampler.py.  ``train_sampler="pndm"`` with
    ``train_steps=None`` reproduces the reference protocol exactly
    (compute_z.py:384-418 uses the pipe's default scheduler at the eval
    step count).

    Variant dispatch matches the reference's routing (emcid_main.py:911-945):
    ``sld_supervision`` requests go through the SLD-supervised per-request
    path (compute_z_text_encoder_global); ``txt_img_align_scale_factor`` and
    the request-level ``txt_img_align`` flag enable the image-side alignment
    term inside the batched optimizer (reference compute_z v1 path,
    compute_z.py:1360-1775); ``use_new_compute_z`` multi-token targets are
    the ``num_edit_tokens`` > 1 dimension of the same program.

    With ``mesh``, the concept axis of each Stage-1 block shards over the
    device mesh (models replicated); blocks pad to ``block_size`` so one
    compiled program serves every block and every shard divides evenly.
    """
    z_list, missing = load_z_list(requests, cache_name, hparams)
    if missing and getattr(hparams, "sld_supervision", False):
        from emcid_tpu.engine.compute_z_variants import (
            compute_z_text_encoder_global,
        )

        for i in missing:
            z = compute_z_text_encoder_global(
                components, requests[i], hparams, hparams.layers[-1],
                rng=jax.random.PRNGKey(rng_seed + i), verbose=verbose,
            )
            z_list[i] = z
            if cache_name is not None:
                save_z_cache(cache_name, requests[i], z, hparams, idx=i)
        missing = []
    # image-side txt-img alignment (reference v1 routing: active when the
    # hparams scale is nonzero AND a request carries the flag)
    tia_scale = getattr(hparams, "txt_img_align_scale_factor", 0.0)
    tia_flags = [bool(r.get("txt_img_align")) for r in requests]
    tia_active = bool(tia_scale) and any(tia_flags)
    if tia_active and clip_align is None:
        raise ValueError(
            "txt_img_align requested (hparams.txt_img_align_scale_factor="
            f"{tia_scale}, flagged requests present) but no clip_align="
            "(vision_model, vision_params, text_projection) was supplied — "
            "refusing to silently optimize the wrong objective"
        )
    if missing and getattr(hparams, "use_ewc", False) and fim is None:
        # standalone-call parity with the reference's in-path FIM auto-load
        # (compute_z.py:478-486); apply_emcid passes fim= explicitly so the
        # last layer's covariance is not resolved twice
        import dataclasses

        from emcid_tpu.engine.fim import resolve_fim

        last_only = dataclasses.replace(hparams, layers=[hparams.layers[-1]])
        cov = resolve_covariances(components, last_only, verbose=verbose)[-1]
        fim = resolve_fim(components, hparams, cov=np.asarray(cov),
                          mesh=mesh, verbose=verbose)
    if missing:
        if mesh is not None:
            from emcid_tpu.parallel import pad_to_multiple, replicate

            block_size = pad_to_multiple(block_size, mesh.devices.size)
            text_params = replicate(components.text_params, mesh)
            unet_params = replicate(components.unet_params, mesh)
        else:
            text_params = components.text_params
            unet_params = components.unet_params
        import os

        if eps_dest_pool is None:
            K = int(os.environ.get("EMCID_TPU_EPS_POOL", 25))
            # the pool only pays when it amortizes: K entries cost one
            # eps_dest forward each, so a run of <= K steps is cheaper (and
            # reference-exact) with fresh sampling
            eps_dest_pool = K if hparams.v_num_grad_steps > K else 0
        if z_sched is None:
            # PRODUCT DEFAULT: cosine fast protocol (0.6x steps at a
            # cosine-decayed lr peaking at 2x v_lr) — measured to reach the
            # reference protocol's final loss at SD shapes (PERF.md round-4
            # table; guards tests/test_z_schedule.py).  "const" restores
            # the reference protocol exactly; only engages >= 50 steps.
            z_sched = os.environ.get("EMCID_TPU_Z_SCHED", "cosine")
        optz = _get_optimizer(
            components, hparams, fim=fim,
            text_projection=(np.asarray(clip_align[2])
                             if tia_active else None),
            eps_pool=int(eps_dest_pool), lr_sched=z_sched,
        )
        res = resolve_train_res(components, train_res)
        if train_steps is None:
            # dpm++ reaches PNDM-50 quality by ~25 steps; never raise the
            # step count above what the caller asked for (tiny smoke runs
            # pass 2-4 steps)
            train_steps = (min(num_inference_steps, 25)
                           if train_sampler == "dpm++"
                           else num_inference_steps)
        for start in range(0, len(missing), block_size):
            idxs = missing[start:start + block_size]
            block = [requests[i] for i in idxs]
            # multi-block runs pad every block to block_size so ONE compiled
            # shape serves all of them (an odd tail shape costs a full XLA
            # compile — minutes on a remote TPU); a run that fits in a
            # single block keeps its exact size — benchmark loops that edit
            # one request at a time (road/timed restore cycles) would
            # otherwise pay block_size× the image generation for nothing
            target = block_size if len(missing) > block_size else len(block)
            if mesh is not None:
                from emcid_tpu.parallel import pad_to_multiple

                target = pad_to_multiple(target, mesh.devices.size)
            pad = target - len(block)
            if pad:
                block = block + [block[-1]] * pad
            t0 = time.time()
            dest_img_emb = tia_w = None
            if tia_active:
                # v1 path: concepts whose request carries txt_img_align
                # train ablate-dest on DEST-prompt images (reference
                # compute_z.py:1440-1446); unflagged concepts in the same
                # block keep the main path's SOURCE images — the flag list
                # is per-request, not block-wide
                mean, logvar, imgs = training_latents_for_requests(
                    components, block, hparams, height=res, width=res,
                    num_inference_steps=train_steps, sampler=train_sampler,
                    cfg_interval=cfg_interval, mesh=mesh,
                    use_dest_prompts=[
                        bool(r.get("txt_img_align")) for r in block
                    ],
                    return_images=True,
                    verbose=verbose,
                )
                from emcid_tpu.models.vision import (
                    CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, preprocess_for_model,
                )

                vision, vision_params, _ = clip_align
                px = preprocess_for_model(
                    (np.asarray(imgs) + 1.0) / 2.0,
                    vision.config.image_size, CLIP_IMAGE_MEAN,
                    CLIP_IMAGE_STD)
                emb = vision.apply({"params": vision_params}, px)
                C_blk = len(block)
                P = len(block[0]["prompts"])
                dest_img_emb = np.asarray(emb, np.float32).reshape(
                    C_blk, -1, P, emb.shape[-1])[:, 0]  # first sample/prompt
                tia_w = np.asarray(
                    [1.0 if requests[i].get("txt_img_align") else 0.0
                     for i in idxs]
                    + [0.0] * pad, np.float32)
            else:
                mean, logvar = training_latents_for_requests(
                    components, block, hparams, height=res, width=res,
                    num_inference_steps=train_steps, sampler=train_sampler,
                    cfg_interval=cfg_interval, mesh=mesh, verbose=verbose,
                )
            arrays, _, _ = prepare_concept_batch(
                components.tokenizer, block, hparams
            )
            arrays["latents_mean"] = np.asarray(mean)
            arrays["latents_logvar"] = np.asarray(logvar)
            if mesh is None:
                put = jnp.asarray
            else:
                from emcid_tpu.parallel import shard_batch

                put = lambda x: shard_batch(jnp.asarray(x), mesh)
            batch = ConceptBatch(**{
                k: put(arrays[k]) for k in ConceptBatch._fields
            })
            zs, delta, z0, losses = optz.run(
                text_params, unet_params, batch,
                jax.random.PRNGKey(rng_seed + start),
                dest_img_emb=dest_img_emb, tia_weight=tia_w,
            )
            zs = np.asarray(zs)
            if pad:
                zs = zs[: len(idxs)]
            for k, i in enumerate(idxs):
                z_list[i] = zs[k]
                if cache_name is not None:
                    save_z_cache(cache_name, requests[i], zs[k], hparams,
                                 idx=i)
            if verbose:
                from emcid_tpu.profiling import StepReport, stage1_step_flops

                rep = StepReport(
                    seconds=time.time() - t0,
                    steps=max(hparams.v_num_grad_steps, 1),
                    flops_per_step=stage1_step_flops(
                        components.unet.config, len(block),
                        len(block[0]["prompts"]),
                        # train_res shrinks the latent grid — report the
                        # grid Stage-1 actually ran, not the native size
                        latent_hw=res // components.vae_scale,
                        remat=optz.remat,
                        eps_dest_pooled=bool(optz.eps_pool)),
                )
                print(
                    f"stage1 block {start // block_size}: {len(idxs)} concepts "
                    f"in {rep.seconds:.1f}s ({rep}; incl. image gen), "
                    f"final loss {float(losses[-1]):.5f}"
                )
    stacked = np.stack([np.asarray(z) for z in z_list])
    if stacked.ndim == 2:
        stacked = stacked[:, None, :]
    return stacked


def apply_emcid(
    components: SDComponents,
    requests: Sequence[Dict],
    hparams,
    mom2_weight: Optional[float] = None,
    edit_weight: Optional[float] = None,
    cache_name: Optional[str] = None,
    stats_dir=None,
    stats_captions: Optional[Sequence[str]] = None,
    block_size: int = 8,
    solve_method: str = "f32_ir",
    num_inference_steps: int = 50,
    mesh=None,
    clip_align=None,
    fim_dir="data/fim_stats",
    train_sampler: str = "dpm++",
    train_steps: Optional[int] = None,
    eps_dest_pool: Optional[int] = None,
    z_sched: Optional[str] = None,
    cfg_interval: Optional[float] = None,
    train_res: Optional[int] = None,
    rng_seed: int = 0,
    verbose: bool = True,
) -> Tuple[SDComponents, Dict]:
    """Full two-stage edit of a pipeline's text encoder.

    Returns (edited_components, deltas).  ``components`` is unchanged
    (functional restore = keep using it).  With ``mesh``, training-image
    generation and the Stage-1 concept blocks shard over the device mesh.

    ``hparams.use_ewc`` resolves the Fisher diag automatically (npz cache →
    compute; engine.fim.resolve_fim), matching the reference's in-path FIM
    auto-load (compute_z.py:478-486) — the shipped ``*_ewc-1e7_*`` hparams
    run end-to-end without the caller threading a FIM array.
    """
    t0 = time.time()
    covs = resolve_covariances(
        components, hparams, stats_dir=stats_dir, captions=stats_captions,
        mesh=mesh, verbose=verbose,
    )
    fim = None
    if getattr(hparams, "use_ewc", False):
        from emcid_tpu.engine.fim import resolve_fim

        fim = resolve_fim(components, hparams, cov=np.asarray(covs[-1]),
                          fim_dir=fim_dir, mesh=mesh, verbose=verbose)
    zs = compute_zs_for_requests(
        components, requests, hparams, cache_name=cache_name,
        block_size=block_size, num_inference_steps=num_inference_steps,
        fim=fim, mesh=mesh, clip_align=clip_align,
        train_sampler=train_sampler, train_steps=train_steps,
        eps_dest_pool=eps_dest_pool, z_sched=z_sched,
        cfg_interval=cfg_interval, train_res=train_res, rng_seed=rng_seed,
        verbose=verbose,
    )
    deltas, new_text_params = execute_emcid_text_encoder(
        components.text_encoder, components.text_params,
        components.tokenizer, requests, hparams,
        zs=zs, covs=covs, mom2_weight=mom2_weight, edit_weight=edit_weight,
        solve_method=solve_method, verbose=verbose,
    )
    edited = components.replace_text_params(new_text_params)
    if getattr(hparams, "add_uce_edit", False):
        # UCE-hybrid (the shipped *_uce.json hparams; reference
        # emcid_test.py:377-414): follow the closed-form text-encoder edit
        # with the UCE cross-attn edit for the same concepts
        from emcid_tpu.engine.uce import edit_model_uce

        edited = edit_model_uce(
            edited,
            [r["source"] for r in requests],
            [r.get("dest") or " " for r in requests],
        )
        if verbose:
            print("applied UCE cross-attn hybrid edit")
    if verbose:
        print(
            f"Edited {len(requests)} concept(s) across layers "
            f"{list(hparams.layers)} in {time.time() - t0:.1f}s"
        )
    return edited, deltas
