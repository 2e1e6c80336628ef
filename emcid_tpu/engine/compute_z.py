"""Stage-1: per-concept optimization of the target representation z.

Algorithm parity with the reference ``compute_z_text_encoder``
(compute_z.py:315-649): optimize a delta added to the last-subject-token
hidden state at the last edited layer, minimizing

    MSE( UNet(noisy_latents, t, edited_source_text_repr),
         UNet(noisy_latents, t, dest_text_repr) )            [ablate-dest]
  + v_weight_decay * |delta| / |z0|^2                        [or EWC]
  + text_repr_loss_scale * MSE(edited_pooler, dest_pooler)   [txt-align]

with Adam(lr=v_lr) for v_num_grad_steps steps and an L2-ball projection
|delta| <= clamp_norm_factor * |z0| after every step.  Objectives:
ablate-dest / ablate-source (same loss, different training images),
esd (target = eps_dest - mu*(eps_source_frozen - eps_dest)),
use_sampled_noise (target = the true noise), no_noise_loss (reg only).

TPU-first redesign (the reference runs one concept at a time, one python
Adam step per iteration, re-encoding constants every step):

* constants are hoisted: dest/source text representations and poolers are
  computed once (the reference recomputes them under no_grad every step,
  compute_z.py:500-507); VAE posteriors are encoded once and re-sampled
  per step from (mean, logvar);
* one jit'd step = inject delta → text encoder fwd → 2-3 UNet fwds → loss →
  optax adam → clamp, with ``lax.fori_loop`` over steps — zero host sync
  inside the optimization;
* **vmap over concepts**: a whole block of concepts optimizes in one
  program, turning the per-concept UNet forwards into large MXU-shaped
  batches; blocks shard over the device mesh on the concept axis.

Record/replay seam (SURVEY.md §7 "RNG parity"): ``noise_and_timesteps``
optionally supplies the exact (noise, timestep, posterior-eps, sample-index)
sequence, so given the same training images the optimization is
deterministic and comparable against any other implementation.
"""

from __future__ import annotations

import os

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from emcid_tpu.models.clip_text import causal_attention_mask
from emcid_tpu.models.scheduler import Schedule, add_noise
from emcid_tpu.text.token_range import find_token_range


def _is_hbm_exhausted(e: Exception) -> bool:
    """True for an XLA RESOURCE_EXHAUSTED (HBM OOM) runtime error.

    A plain substring check covers both the typed XlaRuntimeError (the
    status name is in the message) and an OOM wrapped by another layer of
    the tunneled backend."""
    return "RESOURCE_EXHAUSTED" in str(e)


class ConceptBatch(NamedTuple):
    """Device arrays for a block of C concepts, P prompts each, T edit tokens."""

    source_ids: jnp.ndarray  # (C, P, S) int32
    dest_ids: jnp.ndarray  # (C, P, S) int32
    inject_mask: jnp.ndarray  # (C, T, P, S) f32 — delta_t lands on these tokens
    source_lookup: jnp.ndarray  # (C, P) int32 — last subject token per prompt
    dest_lookup: jnp.ndarray  # (C, P) int32
    latents_mean: jnp.ndarray  # (C, Simg, P, h, w, c) VAE posterior mean (scaled)
    latents_logvar: jnp.ndarray  # (C, Simg, P, h, w, c)


def prepare_concept_batch(
    tokenizer,
    requests: Sequence[Dict],
    hparams,
    max_length: Optional[int] = None,
) -> Tuple[Dict[str, np.ndarray], List[List[str]], List[List[str]]]:
    """Host-side tokenization + token-index localization for a concept block.

    Returns (arrays, source_prompts, dest_prompts); latents are attached by
    the caller after encoding training images.
    """
    max_length = max_length or tokenizer.model_max_length
    C = len(requests)
    P = len(requests[0]["prompts"])
    T = getattr(hparams, "num_edit_tokens", 1)
    S = max_length

    source_ids = np.zeros((C, P, S), np.int32)
    dest_ids = np.zeros((C, P, S), np.int32)
    inject_mask = np.zeros((C, T, P, S), np.float32)
    source_lookup = np.zeros((C, P), np.int32)
    dest_lookup = np.zeros((C, P), np.int32)
    src_prompts_all, dst_prompts_all = [], []

    for c, request in enumerate(requests):
        assert len(request["prompts"]) == P, "uniform prompt count per block"
        src_prompts = [p.format(request["source"]) for p in request["prompts"]]
        if hparams.objective == "esd":
            dst_prompts = ["" for _ in request["prompts"]]
        else:
            dst_prompts = [p.format(request["dest"]) for p in request["prompts"]]
        src_prompts_all.append(src_prompts)
        dst_prompts_all.append(dst_prompts)
        s_enc = tokenizer(src_prompts, padding="max_length", truncation=True,
                          max_length=S)
        d_enc = tokenizer(dst_prompts, padding="max_length", truncation=True,
                          max_length=S)
        source_ids[c] = s_enc["input_ids"]
        dest_ids[c] = d_enc["input_ids"]
        for p in range(P):
            n_real = int(s_enc["attention_mask"][p].sum())
            _, end = find_token_range(
                tokenizer, s_enc["input_ids"][p, :n_real], request["source"]
            )
            source_lookup[c, p] = end - 1
            inject_mask[c, 0, p, end - 1] = 1.0
            if T > 1:
                eos = n_real - 1
                for t in range(1, T):
                    inject_mask[c, t, p, min(eos + t - 1, S - 1)] = 1.0
            if hparams.objective == "esd":
                dn = int(d_enc["attention_mask"][p].sum())
                dest_lookup[c, p] = dn - 1
            else:
                dn = int(d_enc["attention_mask"][p].sum())
                _, dend = find_token_range(
                    tokenizer, d_enc["input_ids"][p, :dn], request["dest"]
                )
                dest_lookup[c, p] = dend - 1

    return (
        dict(source_ids=source_ids, dest_ids=dest_ids,
             inject_mask=inject_mask, source_lookup=source_lookup,
             dest_lookup=dest_lookup),
        src_prompts_all,
        dst_prompts_all,
    )


@dataclass
class ZOptimizer:
    """Compiled Stage-1 optimizer for a fixed (model shapes, hparams, layer).

    Build once, call ``run`` on successive concept blocks of the same shape —
    the underlying program is compiled a single time.
    """

    text_model: Any
    unet: Any
    schedule: Schedule
    hparams: Any
    layer: int
    fim: Optional[np.ndarray] = None  # EWC Fisher diag (hidden,)
    # (hidden, embed) CLIP text projection — required for txt_img_align
    # (reference v1 uses CLIPTextModelWithProjection, compute_z.py:1376-1380)
    text_projection: Optional[np.ndarray] = None
    compute_dtype: Any = jnp.float32

    # device programs are capped at this many optimization steps: one long
    # scan (~100 steps ≈ minutes of device time) trips the runtime watchdog
    # on the tunneled TPU, so the step loop is chunked at the host with the
    # (delta, opt_state, rng) carry threaded between executions
    chunk_steps: int = field(default_factory=lambda: int(
        os.environ.get("EMCID_TPU_Z_CHUNK", 20)))

    # finite eps_dest pool (0 = off): precompute the stop-gradient
    # eps_dest (and eps_src for esd) UNet forwards over a K-sample
    # (noise, timestep, image) pool and re-draw pool indices per step,
    # instead of a fresh eps_dest forward every step.  The per-step cost
    # drops from 3 to 2 forward-equivalents (eps_dest was 210 ms of the
    # 782 ms step, PERF.md) at a one-time cost of K forwards.  This is an
    # ALGORITHMIC deviation from the reference (compute_z.py:493-534
    # resamples fresh every step): the loss becomes a K·P-sample
    # Monte-Carlo estimate of the same expectation.  Parity guard:
    # tests/test_eps_pool.py (tiny-AICE efficacy + z-direction agreement).
    # Ignored when a record/replay noise_override is supplied.
    eps_pool: int = field(default_factory=lambda: int(
        os.environ.get("EMCID_TPU_EPS_POOL", 0)))

    # Stage-1 lr protocol: "const" = reference-exact (Adam at v_lr for
    # v_num_grad_steps); "cosine" = the guarded fast protocol (cosine decay
    # peaking at z_peak*v_lr over z_frac*v_num_grad_steps steps; only
    # engages for runs >= 50 steps).  See run() for the deviation note.
    lr_sched: str = field(default_factory=lambda: os.environ.get(
        "EMCID_TPU_Z_SCHED", "const"))
    # env supplies the DEFAULT only (instance-time read); explicit
    # constructor args win — same precedence as every other knob
    z_frac: float = field(default_factory=lambda: float(
        os.environ.get("EMCID_TPU_Z_FRAC", 0.6)))
    z_peak: float = field(default_factory=lambda: float(
        os.environ.get("EMCID_TPU_Z_PEAK", 2.0)))

    # UNet-forward rematerialization policy for the backward pass:
    #   "full" — jax.checkpoint: backward recomputes the whole forward
    #            (lowest memory; +1 forward of FLOPs per step);
    #   "none" — store residuals (fastest: the UNet weights are frozen, so
    #            the transpose only needs input grads ≈ 1x forward, and the
    #            recompute forward disappears — per-step cost drops from ~4
    #            to ~3 forward-equivalents IF the activations fit HBM);
    #   "dots" — checkpoint_dots policy: save matmul outputs, recompute the
    #            elementwise glue (middle ground);
    #   "level0" — selective: recompute only the FULL-RESOLUTION block
    #            interiors (checkpoint_name seams in models/unet.py), store
    #            the rest — the level-0 interiors are most of residual HBM
    #            for ~13% of a forward's FLOPs, targeting C=12-16 blocks
    #            (PERF.md round-2 candidate #3; opt-in until measured
    #            on-chip).
    # Measured on v5e (C=8, P=3, SD shapes, bf16): "none" fits 15.75 GB HBM
    # and runs 1.23x faster than "full" (1.03 vs 1.27 s/step) — flash
    # attention's custom_vjp already recomputes the N^2 internals, so stored
    # residuals are only conv/dense inputs.  "dots" fails to compile at
    # these shapes (compiler OOM).
    remat: str = field(default_factory=lambda: os.environ.get(
        "EMCID_TPU_Z_REMAT", "none"))
    # False surfaces RESOURCE_EXHAUSTED instead of escalating the remat
    # ladder (probes want the raw OOM; the product default stays True)
    hbm_fallback: bool = True

    def __post_init__(self):
        self._run = jax.jit(self._run_impl, static_argnames=("steps",))
        self._build_pool = jax.jit(self._build_pool_impl)

    # -- pieces ------------------------------------------------------------
    def _text_fwd(self, params, ids2d):
        """(N, S) ids → (hidden (N,S,H), pooled (N,H))."""
        out = self.text_model.apply({"params": params}, ids2d)
        return out.last_hidden_state, out.pooled_output

    def _edited_fwd(self, params, ids2d, delta, mask2d):
        """Inject (T,H) delta at mask positions; returns hidden+pooled+z_now.

        mask2d: (T, N, S).  The injection point is the *layer output* of
        ``self.layer`` (reference layer_module_tmp hook, compute_z.py:353-373).
        """
        inj = jnp.einsum("tns,th->nsh", mask2d, delta)
        out = self.text_model.apply(
            {"params": params}, ids2d,
            inject_layer=self.layer,
            inject_delta=inj,
            capture=("layer_out",),
        )
        return out.last_hidden_state, out.pooled_output, out.taps["layer_out"][self.layer]

    def _build_pool_impl(self, text_params, unet_params, batch: ConceptBatch,
                         keys: jnp.ndarray):
        """Precompute the eps_dest (and esd eps_src) pool: for each of the
        ``keys`` (one per pool entry), sample (image, posterior, noise,
        timestep) per (concept, prompt) exactly as a fresh step would, run
        the stop-gradient UNet forward(s) once, and stash
        (noisy, t, eps_dest[, eps_src]) — shapes (K, C, P, ...)."""
        hp = self.hparams
        C, P, S = batch.source_ids.shape
        n_train_ts = self.schedule.num_train_timesteps
        flat = lambda x: x.reshape((C * P,) + x.shape[2:])

        dest_hidden, _ = self._text_fwd(text_params, flat(batch.dest_ids))
        is_esd = hp.objective == "esd"
        if is_esd:
            source_hidden, _ = self._text_fwd(text_params,
                                              flat(batch.source_ids))

        def draw(key, lat_mean, lat_logvar):
            """One concept's (noisy, t) draw — mirrors concept_loss."""
            k_img, k_post, k_noise, k_t = jax.random.split(key, 4)
            Simg = lat_mean.shape[0]
            img_idx = jax.random.randint(k_img, (P,), 0, Simg)
            mean = lat_mean[img_idx, jnp.arange(P)]
            logvar = lat_logvar[img_idx, jnp.arange(P)]
            latents = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                k_post, mean.shape, mean.dtype)
            noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
            timesteps = jax.random.randint(k_t, (P,), 0, n_train_ts)
            return add_noise(self.schedule, latents, noise, timesteps), timesteps

        def entry(carry, key):
            keys = jax.random.split(key, C)
            noisy, ts = jax.vmap(draw)(keys, batch.latents_mean,
                                       batch.latents_logvar)  # (C,P,...)
            eps_d = self.unet.apply(
                {"params": unet_params}, flat(noisy), flat(ts), dest_hidden
            ).sample.reshape(noisy.shape)
            out = dict(noisy=noisy, t=ts, eps_dest=eps_d)
            if is_esd:
                out["eps_src"] = self.unet.apply(
                    {"params": unet_params}, flat(noisy), flat(ts),
                    source_hidden
                ).sample.reshape(noisy.shape)
            return carry, out

        _, pool = jax.lax.scan(entry, None, keys)
        return pool  # dict of (K, C, P, ...) arrays

    # -- main --------------------------------------------------------------
    def _run_impl(self, text_params, unet_params, batch: ConceptBatch,
                  rng: jnp.ndarray,
                  steps: int,
                  step_offset: jnp.ndarray,
                  lrs: Optional[jnp.ndarray] = None,
                  carry_in=None,
                  noise_override: Optional[jnp.ndarray] = None,
                  ts_override: Optional[jnp.ndarray] = None,
                  dest_img_emb: Optional[jnp.ndarray] = None,
                  tia_weight: Optional[jnp.ndarray] = None,
                  pool: Optional[Dict[str, jnp.ndarray]] = None):
        hp = self.hparams
        if dest_img_emb is not None:
            if self.text_projection is None:
                raise ValueError(
                    "txt_img_align requires a text_projection matrix "
                    "(hidden, embed) on the ZOptimizer")
            text_proj = jnp.asarray(self.text_projection, jnp.float32)
        C, P, S = batch.source_ids.shape
        T = batch.inject_mask.shape[1]
        H = self.text_model.config.hidden_size
        n_train_ts = self.schedule.num_train_timesteps

        flat = lambda x: x.reshape((C * P,) + x.shape[2:])

        # ---- hoisted constants (recomputed per-step in the reference) ----
        dest_hidden, dest_pooled = self._text_fwd(text_params, flat(batch.dest_ids))
        dest_hidden = dest_hidden.reshape(C, P, S, H)
        dest_pooled = dest_pooled.reshape(C, P, H)
        need_source_repr = hp.objective == "esd"
        if need_source_repr:
            source_hidden, _ = self._text_fwd(text_params, flat(batch.source_ids))
            source_hidden = source_hidden.reshape(C, P, S, H)
        else:
            source_hidden = dest_hidden  # unused

        # z0 = unedited layer output at the edit tokens, FIRST prompt
        # (reference records source_init from prompt 0, compute_z.py:360-365)
        out0 = self.text_model.apply(
            {"params": text_params}, batch.source_ids[:, 0],
            capture=("layer_out",), stop_at_layer=self.layer,
        )
        layer_out0 = out0.taps["layer_out"][self.layer]  # (C, S, H)
        # per edit token t: position in prompt 0
        mask0 = batch.inject_mask[:, :, 0, :]  # (C, T, S)
        z0 = jnp.einsum("cts,csh->cth", mask0, layer_out0)  # (C, T, H)
        z0_norm = jnp.linalg.norm(z0.reshape(C, -1), axis=-1)  # (C,) global
        fim = None
        if hp.use_ewc:
            if self.fim is None:
                raise ValueError("use_ewc=True requires a FIM array")
            fim = jnp.asarray(self.fim, dtype=jnp.float32)

        # Adam with the per-step learning rate supplied as a scan input:
        # numerically identical to optax.adam(lr) for a constant array, and
        # one compiled program serves every schedule (the lr enters as
        # device data, not a compile-time constant — a fresh compile per
        # schedule would cost minutes on the tunneled TPU backend)
        opt = optax.scale_by_adam()

        def concept_loss(delta, data, key):
            """Loss for one concept (vmapped).  delta (T, H); data is a dict
            of per-concept slices (vmap maps over the leading axis of each)."""
            src_ids = data["src_ids"]
            inj_mask = data["inj_mask"]
            d_hidden = data["d_hidden"]
            d_pooled = data["d_pooled"]
            s_hidden = data["s_hidden"]
            lat_mean = data["lat_mean"]
            lat_logvar = data["lat_logvar"]
            z0n = data["z0n"]
            src_look = data["src_look"]
            dst_look = data["dst_look"]
            k_img, k_post, k_noise, k_t = jax.random.split(key, 4)
            use_pool = "pool_noisy" in data
            if use_pool:
                # finite-pool mode: re-draw a pool index per prompt; the
                # (noisy, t) pair AND its stop-gradient eps_dest come from
                # the precomputed pool (see eps_pool field)
                K = data["pool_noisy"].shape[0]
                pidx = jax.random.randint(k_img, (P,), 0, K)
                pr = jnp.arange(P)
                noise = None  # use_sampled_noise never runs pooled
                timesteps = data["pool_t"][pidx, pr]
                noisy = data["pool_noisy"][pidx, pr]
            else:
                # sample image index per prompt (reference compute_z.py:493-496)
                Simg = lat_mean.shape[0]
                img_idx = jax.random.randint(k_img, (P,), 0, Simg)
                mean = lat_mean[img_idx, jnp.arange(P)]
                logvar = lat_logvar[img_idx, jnp.arange(P)]
                latents = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                    k_post, mean.shape, mean.dtype
                )
                if noise_override is None:
                    noise = jax.random.normal(k_noise, latents.shape,
                                              latents.dtype)
                    timesteps = jax.random.randint(k_t, (P,), 0, n_train_ts)
                else:
                    # record/replay path: externally supplied slices
                    noise, timesteps = data["noise"], data["timesteps"]
                noisy = add_noise(self.schedule, latents, noise, timesteps)

            edited_hidden, edited_pooled, _ = self._edited_fwd(
                text_params, src_ids, delta, inj_mask
            )

            # rematerialization of the UNet forward for the backward pass
            # (w.r.t. the text context): see the ``remat`` field.  Flash
            # attention internals always recompute (custom_vjp), so "none"
            # stores only conv/dense inputs.
            tag_hw = (noisy.shape[1] if self.remat == "level0" else 0)

            def unet_fwd(ctx, noisy, timesteps):
                return self.unet.apply(
                    {"params": unet_params}, noisy, timesteps, ctx,
                    remat_tag_hw=tag_hw,
                ).sample

            if self.remat == "full":
                unet_fwd = jax.checkpoint(unet_fwd)
            elif self.remat == "dots":
                unet_fwd = jax.checkpoint(
                    unet_fwd,
                    policy=jax.checkpoint_policies.checkpoint_dots,
                )
            elif self.remat == "level0":
                # selective remat: store everything EXCEPT the full-resolution
                # block interiors (models/unet.py remat_tag_hw) — they are the
                # bulk of residual HBM but cheap to recompute (the flash
                # custom_vjp already recomputes the N^2 internals, and the
                # stored attention output keeps the pallas forward itself
                # from re-running)
                unet_fwd = jax.checkpoint(
                    unet_fwd,
                    policy=jax.checkpoint_policies
                    .save_anything_except_these_names("unet_interior"),
                )
            elif self.remat != "none":
                raise ValueError(f"unknown remat policy {self.remat!r}")

            def unet_eps(ctx):
                return unet_fwd(ctx, noisy, timesteps)

            aux = {}
            if hp.no_noise_loss:
                mse = 0.0
            else:
                eps_edit = unet_eps(edited_hidden)
                if use_pool:
                    eps_dest = data["pool_eps_dest"][pidx, pr]
                else:
                    eps_dest = jax.lax.stop_gradient(unet_eps(d_hidden))
                if hp.objective == "esd":
                    if use_pool:
                        eps_src = data["pool_eps_src"][pidx, pr]
                    else:
                        eps_src = jax.lax.stop_gradient(unet_eps(s_hidden))
                    mu = float(hp.esd_mu) if hp.esd_mu not in (None, "None") else 1.0
                    target = eps_dest - mu * (eps_src - eps_dest)
                    mse = jnp.mean((eps_edit - target) ** 2)
                elif hp.use_sampled_noise:
                    mse = jnp.mean((noise - eps_edit) ** 2)
                else:  # ablate-dest / ablate-source
                    mse = jnp.mean((eps_edit - eps_dest) ** 2)
            # safe norm: grad of |delta| at delta=0 must be 0, not NaN
            # (delta starts at exactly 0; torch subgradients give 0 there)
            d_norm = jnp.sqrt(jnp.sum(delta**2) + 1e-12)
            if hp.use_ewc:
                reg = jnp.sum(float(hp.ewc_lambda) * fim * delta**2) / (
                    2.0 * z0n**2
                )
            else:
                reg = hp.v_weight_decay * d_norm / z0n**2
            loss = mse + reg
            if hp.cal_text_repr_loss:
                if hp.align_object_token:
                    e_obj = edited_hidden[jnp.arange(P), src_look]
                    d_obj = d_hidden[jnp.arange(P), dst_look]
                    talign = jnp.mean((e_obj - d_obj) ** 2)
                else:  # simple pooler alignment (the shipped default)
                    talign = jnp.mean((edited_pooled - d_pooled) ** 2)
                loss = loss + hp.text_repr_loss_scale_factor * talign
                aux["talign"] = talign
            if "dest_img_emb" in data:
                # image-side alignment (reference compute_z v1 path,
                # compute_z.py:1454-1610): CLIP-project the edited pooler
                # and pull it toward the dest images' CLIP embedding;
                # per-concept 0/1 weight honors the request-level flag
                emb = data["dest_img_emb"]  # (P, E)
                e_txt = edited_pooled.astype(jnp.float32) @ text_proj
                if hp.txt_img_align_loss_metric == "cos":
                    cos = jnp.sum(
                        e_txt / jnp.linalg.norm(e_txt, axis=-1,
                                                keepdims=True)
                        * emb / jnp.linalg.norm(emb, axis=-1, keepdims=True),
                        axis=-1)
                    tia = -(jnp.mean(cos) - 1.0)
                elif hp.txt_img_align_loss_metric == "l2":
                    tia = jnp.mean((e_txt - emb) ** 2)
                else:
                    raise ValueError(
                        f"txt_img_align_loss_metric "
                        f"{hp.txt_img_align_loss_metric!r} not supported")
                loss = loss + (hp.txt_img_align_scale_factor
                               * data["tia_weight"] * tia)
                aux["tia"] = tia
            aux["mse"] = mse
            aux["reg"] = reg
            return loss, aux

        per_concept = jax.vmap(jax.value_and_grad(concept_loss, has_aux=True),
                               in_axes=(0, 0, 0))

        def step(carry, xs):
            step_idx, lr_t = xs
            delta, opt_state, key = carry
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, C)
            data = dict(
                src_ids=flatbatch_src, inj_mask=batch.inject_mask,
                d_hidden=dest_hidden, d_pooled=dest_pooled,
                s_hidden=source_hidden, lat_mean=batch.latents_mean,
                lat_logvar=batch.latents_logvar, z0n=z0_norm,
                src_look=batch.source_lookup, dst_look=batch.dest_lookup,
            )
            if noise_override is not None:
                data["noise"] = noise_override[step_idx]
                data["timesteps"] = ts_override[step_idx]
            if pool is not None:
                data["pool_noisy"] = pool_c["noisy"]
                data["pool_t"] = pool_c["t"]
                data["pool_eps_dest"] = pool_c["eps_dest"]
                if "eps_src" in pool_c:
                    data["pool_eps_src"] = pool_c["eps_src"]
            if dest_img_emb is not None:
                data["dest_img_emb"] = jnp.asarray(dest_img_emb,
                                                   jnp.float32)
                data["tia_weight"] = (
                    jnp.asarray(tia_weight, jnp.float32)
                    if tia_weight is not None else jnp.ones((C,), jnp.float32)
                )
            (loss, aux), grads = per_concept(delta, data, keys)
            updates, opt_state = opt.update(grads, opt_state, delta)
            updates = jax.tree.map(lambda u: -lr_t * u, updates)
            delta = optax.apply_updates(delta, updates)
            # L2-ball projection per concept (reference compute_z.py:638-642)
            max_norm = hp.clamp_norm_factor * z0_norm  # (C,)
            d_norm = jnp.linalg.norm(delta.reshape(C, -1), axis=-1)
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(d_norm, 1e-12))
            delta = delta * scale[:, None, None]
            return (delta, opt_state, key), loss.mean()

        flatbatch_src = batch.source_ids
        if pool is not None:
            # vmap maps data leaves over the leading concept axis —
            # (K, C, P, ...) → (C, K, P, ...); loop-invariant, hoisted out
            # of the scan by XLA
            pool_c = {k: jnp.swapaxes(v, 0, 1) for k, v in pool.items()}
        if lrs is None:
            lrs = jnp.full((steps,), hp.v_lr, jnp.float32)
        if carry_in is None:
            delta0 = jnp.zeros((C, T, H), dtype=jnp.float32)
            carry = (delta0, opt.init(delta0), rng)
        else:
            delta0, opt_state0 = carry_in
            carry = (delta0, opt_state0, rng)
        (delta, opt_state, _), losses = jax.lax.scan(
            step, carry, (step_offset + jnp.arange(steps), lrs)
        )
        zs = z0 + delta
        return zs, delta, z0, losses, opt_state

    def run(self, text_params, unet_params, batch: ConceptBatch,
            rng: Optional[jax.Array] = None,
            noise_override=None, ts_override=None,
            dest_img_emb=None, tia_weight=None):
        """Optimize a concept block → (zs (C,T,H), delta, z0, loss curve).

        Host-chunked: the device executes at most ``chunk_steps`` steps per
        program (watchdog-safe); the (delta, opt_state) carry and a freshly
        split rng thread across chunks, so the trajectory is identical to a
        single fused scan.

        ``dest_img_emb`` (C, P, E) + per-concept ``tia_weight`` (C,) enable
        the image-side txt-img alignment term (reference v1 path)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        total = self.hparams.v_num_grad_steps
        hp = self.hparams
        # Stage-1 learning-rate protocol.  "const" is the reference protocol
        # (Adam at hp.v_lr for all v_num_grad_steps; compute_z.py:376-379).
        # "cosine" is the guarded fast protocol: a cosine-decay schedule
        # peaking at z_peak*v_lr over z_frac*v_num_grad_steps steps —
        # same-or-lower final loss in fewer steps (PERF.md round-4 table;
        # parity guard tests/test_z_schedule.py).  Only engages for
        # protocol-sized runs (>=50 steps): tiny smoke runs and the
        # record/replay seam stay step-exact.
        sched = self.lr_sched
        if sched == "cosine" and total >= 50 and noise_override is None:
            frac = float(self.z_frac)
            peak = hp.v_lr * float(self.z_peak)
            total = max(1, int(round(frac * total)))
            lr_values = (0.5 * peak * (1.0 + np.cos(
                np.pi * np.arange(total) / total))).astype(np.float32)
        else:
            lr_values = np.full(max(total, 1), hp.v_lr, np.float32)
        pool = None
        if (self.eps_pool and total and noise_override is None
                and not hp.no_noise_loss and not hp.use_sampled_noise):
            rng, pool_key = jax.random.split(rng)
            K = int(self.eps_pool)
            keys = jax.random.split(pool_key, K)
            # watchdog-safe: ≤ ~15 s of device time per pool-build program
            # (1 fwd per entry; 2 for esd), same estimate as the step chunks
            per_entry = (2.0 if hp.objective == "esd" else 1.0)
            kchunk = K
            if jax.default_backend() not in ("cpu",):
                try:
                    from emcid_tpu.profiling import unet_fwd_flops

                    B = batch.source_ids.shape[0] * batch.source_ids.shape[1]
                    hw = batch.latents_mean.shape[-2]
                    est = per_entry * unet_fwd_flops(
                        self.unet.config, B, hw) / 50e12
                    kchunk = max(1, min(K, int(15.0 / max(est, 1e-3))))
                except Exception:
                    pass
            try:
                parts = [
                    self._build_pool(text_params, unet_params, batch,
                                     keys[i:i + kchunk])
                    for i in range(0, K, kchunk)
                ]
                pool = jax.tree.map(
                    lambda *xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0],
                    *parts)
                # force async dispatch errors (OOM) to surface HERE, not at
                # a later materialization inside the step loop where the
                # remat ladder cannot cure a poisoned pool
                np.asarray(jax.tree.leaves(pool)[0].ravel()[0])
            except Exception as e:
                if not self.hbm_fallback or not _is_hbm_exhausted(e):
                    raise
                # graceful degrade: fresh per-step eps_dest resampling IS
                # the reference-exact protocol (compute_z.py:493-534) —
                # slower (+1 fwd-equivalent/step) but always correct
                print("[emcid_tpu] eps_dest pool build exhausted HBM; "
                      "falling back to fresh per-step resampling")
                pool = None
        chunk = max(1, min(self.chunk_steps, total)) if total else 1
        # watchdog guard: a single device execution beyond ~60 s crashes the
        # tunneled TPU worker (observed: 80 steps x 0.78 s => worker
        # restart).  Cap each chunk at ~15 s using the analytic step-FLOP
        # estimate at a conservative 50 TFLOP/s.
        if total and jax.default_backend() not in ("cpu",):
            try:
                from emcid_tpu.profiling import stage1_step_flops

                C = batch.source_ids.shape[0]
                P = batch.source_ids.shape[1]
                hw = batch.latents_mean.shape[-2]
                est_s = stage1_step_flops(
                    self.unet.config, C, P, latent_hw=hw,
                    remat=self.remat) / 50e12
                chunk = max(1, min(chunk, int(15.0 / max(est_s, 1e-3))))
            except Exception:
                pass
        carry = None
        losses_all = []
        done = 0
        zs = delta = z0 = None
        while done < total or (total == 0 and zs is None):
            n = min(chunk, total - done) if total else 0
            rng, sub = jax.random.split(rng)
            while True:
                try:
                    zs, delta, z0, losses, opt_state = self._run(
                        text_params, unet_params, batch, sub,
                        steps=n, step_offset=jnp.asarray(done),
                        lrs=jnp.asarray(lr_values[done:done + n]
                                        if n else lr_values[:0]),
                        carry_in=carry,
                        noise_override=noise_override,
                        ts_override=ts_override,
                        dest_img_emb=dest_img_emb, tia_weight=tia_weight,
                        pool=pool,
                    )
                    # with async dispatch the OOM can surface at a later
                    # materialization point OUTSIDE this try, bypassing the
                    # fallback — force a device→host round-trip of one
                    # scalar so execution errors surface here
                    if n:
                        np.asarray(losses[-1])
                    break
                except Exception as e:  # HBM fallback: "none" stores all
                    # fwd residuals and sits near the 16 GB edge at SD
                    # shapes — whether it fits depends on what else is
                    # resident (e.g. the sampler executables after
                    # training-image generation).  Escalate to full
                    # rematerialization (+~25% step time) and retry the
                    # SAME chunk with the SAME rng subkey: the
                    # (delta, opt_state) carry is functional and the key is
                    # reused, so the trajectory is identical to a run that
                    # fit in HBM from the start.
                    if (not self.hbm_fallback or not _is_hbm_exhausted(e)
                            or self.remat == "full"):
                        raise
                    # escalation ladder: "none" -> "level0" (recompute only
                    # the full-res interiors, ~+7% step) -> "full" (+~25%)
                    nxt = "level0" if self.remat == "none" else "full"
                    print(f"[emcid_tpu] stage-1 remat={self.remat!r} "
                          f"exhausted HBM; retrying with remat={nxt!r}")
                    self.remat = nxt
                    self._run = jax.jit(self._run_impl,
                                        static_argnames=("steps",))
            losses_all.append(losses)
            carry = (delta, opt_state)
            done += n
            if total == 0:
                break
        losses = (jnp.concatenate(losses_all) if losses_all
                  else jnp.zeros((0,)))
        return zs, delta, z0, losses


def compute_z_text_encoder_batch(
    text_model,
    text_params,
    unet,
    unet_params,
    schedule: Schedule,
    tokenizer,
    requests: Sequence[Dict],
    hparams,
    layer: int,
    latents_mean: np.ndarray,
    latents_logvar: np.ndarray,
    rng: Optional[jax.Array] = None,
    fim: Optional[np.ndarray] = None,
    verbose: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Convenience wrapper: prepare + run one concept block.

    latents_mean/logvar: (C, Simg, P, h, w, c) scaled VAE posterior of the
    training images (see engine.training_images for how they are produced).

    Returns (zs (C, T, H), loss curve (steps,)).
    """
    arrays, _, _ = prepare_concept_batch(tokenizer, requests, hparams)
    batch = ConceptBatch(
        source_ids=jnp.asarray(arrays["source_ids"]),
        dest_ids=jnp.asarray(arrays["dest_ids"]),
        inject_mask=jnp.asarray(arrays["inject_mask"]),
        source_lookup=jnp.asarray(arrays["source_lookup"]),
        dest_lookup=jnp.asarray(arrays["dest_lookup"]),
        latents_mean=jnp.asarray(latents_mean),
        latents_logvar=jnp.asarray(latents_logvar),
    )
    optz = ZOptimizer(text_model, unet, schedule, hparams, layer, fim=fim)
    zs, delta, z0, losses = optz.run(text_params, unet_params, batch, rng)
    if verbose:
        C = zs.shape[0]
        final = (f"{float(losses[-1]):.6f}" if len(losses)
                 else "n/a (0 steps)")
        print(
            f"Init norm {float(jnp.linalg.norm(z0.reshape(C, -1), axis=-1).mean()):.3f} | "
            f"Delta norm {float(jnp.linalg.norm(delta.reshape(C, -1), axis=-1).mean()):.3f} | "
            f"final loss {final}"
        )
    return np.asarray(zs), np.asarray(losses)
