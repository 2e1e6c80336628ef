"""Causal tracing over the text encoder: which layers store a concept?

Behavioral port of the reference's tracing (experiments/causal_trace.py:
174-340 trace_with_patch_text_encoder, 408-480 calculate_hidden_flow,
517-661 state/window sweeps, 1122-1135 collect_embedding_std) — the method
that justified editing layers [7..11] (SURVEY.md §1 LX).

Protocol: a 2-row batch — row 0 clean, row 1 with Gaussian noise added to
the *subject-token embeddings* (scale = 3x the embedding std over subjects);
at each patched (layer, token), row 1's hidden state is restored from row 0.
Images are generated from both rows; restoration quality is scored offline
(CLIP/ViT — evals.scorers).  The corruption/patch seams are the
``embed_noise`` / ``patch_spec`` arguments of CLIPTextEncoder — explicit
function inputs instead of forward hooks, so the whole (layer × token) sweep
batches through one compiled encoder + sampler program per cell row.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emcid_tpu.models.pipeline import SDComponents, decode_latents, generate
from emcid_tpu.text.token_range import find_token_range


def layername_text_encoder(layer: int, kind: Optional[str] = None) -> str:
    """Dotted layer names (reference causal_trace.py:689-708)."""
    if kind == "embed":
        return "text_model.embeddings"
    base = f"text_model.encoder.layers.{layer}"
    if kind in (None, ""):
        return base
    if kind == "mlp":
        return f"{base}.mlp"
    if kind == "attn":
        return f"{base}.self_attn"
    raise ValueError(kind)


def collect_embedding_std(components: SDComponents,
                          subjects: Sequence[str]) -> float:
    """Std of token+position embeddings over subject prompts
    (reference causal_trace.py:1122-1135) — sets the corruption scale."""
    tok = components.tokenizer
    vals = []
    for s in subjects:
        enc = tok([s], padding="max_length", truncation=True,
                  max_length=tok.model_max_length)
        emb = components.text_encoder.apply(
            {"params": components.text_params},
            jnp.asarray(enc["input_ids"]), method="embed",
        )
        n = int(np.asarray(enc["attention_mask"][0]).sum())
        vals.append(np.asarray(emb[0, :n]).reshape(-1))
    return float(np.concatenate(vals).std())


def corrupted_embeddings(
    components: SDComponents,
    prompt: str,
    subject: str,
    noise_scale: float,
    patch_spec: Optional[Dict[int, np.ndarray]] = None,
    rng_seed: int = 1,
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(2, S, H) final text states: row 0 clean, row 1 subject-corrupted
    (+ optionally patched).  Noise is a fixed pseudorandom stream
    (reference uses RandomState(1), causal_trace.py:214)."""
    tok = components.tokenizer
    enc = tok([prompt, prompt], padding="max_length", truncation=True,
              max_length=tok.model_max_length)
    ids = np.asarray(enc["input_ids"])
    n_real = int(np.asarray(enc["attention_mask"][0]).sum())
    tr = find_token_range(tok, ids[0, :n_real], subject)
    S = ids.shape[1]
    H = components.text_encoder.config.hidden_size
    noise = np.zeros((2, S, H), np.float32)
    rs = np.random.RandomState(rng_seed)
    noise[1, tr[0]:tr[1]] = noise_scale * rs.randn(tr[1] - tr[0], H)
    spec = None
    if patch_spec:
        spec = {
            int(l): jnp.asarray(
                np.stack([np.zeros(S, np.float32), m.astype(np.float32)])
            )
            for l, m in patch_spec.items()
        }
    out = components.text_encoder.apply(
        {"params": components.text_params}, jnp.asarray(ids),
        embed_noise=jnp.asarray(noise), patch_spec=spec,
    )
    return out.last_hidden_state, tr


def trace_with_patch_text_encoder(
    components: SDComponents,
    prompt: str,
    subject: str,
    states_to_patch: Sequence[Tuple[int, int]],
    noise_scale: float,
    seed: int = 0,
    gen_kwargs: Optional[dict] = None,
) -> np.ndarray:
    """Generate (clean, corrupted+patched) image pair for one patch set.

    states_to_patch: list of (layer, token_index).
    Returns images (2, H, W, 3) uint8 — image 0 clean, image 1 traced.
    """
    from emcid_tpu.models.pipeline import _get_sampler, initial_latents

    tok = components.tokenizer
    S = tok.model_max_length
    patch: Dict[int, np.ndarray] = {}
    for layer, token in states_to_patch:
        patch.setdefault(int(layer), np.zeros(S, np.float32))[int(token)] = 1.0
    ctx, _ = corrupted_embeddings(components, prompt, subject, noise_scale,
                                  patch_spec=patch or None)
    gk = dict(num_inference_steps=10, height=512, width=512)
    gk.update(gen_kwargs or {})
    lat = initial_latents([seed, seed], gk["height"], gk["width"],
                          components.latent_channels, components.vae_scale)
    uncond, _ = corrupted_embeddings(components, "", "[EOS]", 0.0)
    run = _get_sampler(components.unet, components.schedule,
                       gk["num_inference_steps"], "ddim", True)
    lat = run(components.unet_params, lat, ctx, uncond, jnp.float32(7.5))
    return decode_latents(components, lat)


def trace_important_states(
    components: SDComponents,
    prompt: str,
    subject: str,
    noise_scale: float,
    layers: Optional[Sequence[int]] = None,
    tokens: Optional[Sequence[int]] = None,
    window: int = 1,
    seed: int = 0,
    score_fn=None,
    gen_kwargs: Optional[dict] = None,
) -> np.ndarray:
    """(token × layer) restoration sweep (reference causal_trace.py:517-661).

    For each (token t, center layer l): corrupt the subject embeddings,
    restore the window of layers around l at token t, generate, and score
    the traced image with ``score_fn(image) -> float``.  Returns the
    (len(tokens), len(layers)) heatmap.

    TPU-first: all token cells of one layer run as ONE batch — rows 1..K all
    patch from the clean row 0 (the reference generates each cell with its
    own pipe() call, causal_trace.py:554-661), so a sweep is len(layers)
    sampler calls instead of len(layers)*len(tokens).
    """
    from emcid_tpu.models.pipeline import _get_sampler, initial_latents

    n_layers = components.text_encoder.config.num_hidden_layers
    layers = list(layers if layers is not None else range(n_layers))
    tok = components.tokenizer
    enc = tok([prompt])
    n_real = int(np.asarray(enc["attention_mask"][0]).sum())
    tokens = list(tokens if tokens is not None else range(n_real))
    if score_fn is None:
        raise ValueError("score_fn is required (e.g. a ViT/CLIP scorer)")

    gk = dict(num_inference_steps=10, height=512, width=512)
    gk.update(gen_kwargs or {})
    S = tok.model_max_length
    B = 1 + len(tokens)  # clean row 0 + one corrupted+patched row per token
    enc_b = tok([prompt] * B, padding="max_length", truncation=True,
                max_length=S)
    ids = np.asarray(enc_b["input_ids"])
    tr = find_token_range(tok, ids[0, :n_real], subject)
    H = components.text_encoder.config.hidden_size
    rs = np.random.RandomState(1)
    base_noise = noise_scale * rs.randn(tr[1] - tr[0], H).astype(np.float32)
    noise = np.zeros((B, S, H), np.float32)
    noise[1:, tr[0]:tr[1]] = base_noise  # same corruption for every row

    uncond, _ = corrupted_embeddings(components, "", "[EOS]", 0.0)
    uncond_b = jnp.broadcast_to(uncond[0:1], (B,) + uncond.shape[1:])
    lat0 = initial_latents([seed] * B, gk["height"], gk["width"],
                           components.latent_channels, components.vae_scale)
    run = _get_sampler(components.unet, components.schedule,
                       gk["num_inference_steps"], "ddim", True)

    heat = np.zeros((len(tokens), len(layers)), np.float32)
    for li, l in enumerate(layers):
        spec = {}
        for lw in range(max(0, l - window // 2),
                        min(n_layers, l - window // 2 + window)):
            m = np.zeros((B, S), np.float32)
            for ti, t in enumerate(tokens):
                m[1 + ti, t] = 1.0
            spec[int(lw)] = jnp.asarray(m)
        ctx = components.text_encoder.apply(
            {"params": components.text_params}, jnp.asarray(ids),
            embed_noise=jnp.asarray(noise), patch_spec=spec,
        ).last_hidden_state
        lat = run(components.unet_params, lat0, ctx, uncond_b,
                  jnp.float32(7.5))
        imgs = decode_latents(components, lat)
        for ti in range(len(tokens)):
            heat[ti, li] = float(score_fn(imgs[1 + ti]))
    return heat


def save_trace_images(
    components: SDComponents,
    prompt: str,
    subject: str,
    noise_scale: float,
    out_dir,
    class_name: str,
    idx: int,
    layers: Optional[Sequence[int]] = None,
    tokens: Optional[Sequence[int]] = None,
    window: int = 1,
    kind: str = "x",
    seed: int = 0,
    gen_kwargs: Optional[dict] = None,
):
    """Generate and save traced images under the ImageItem filename codec
    (evals/folder_sweep.py; reference causal_trace.py:264-332) for offline
    scoring: ``{class}_{idx}_{kind}_clean.png`` / ``..._corrupt.png`` /
    ``..._l{L}_restore_{token}.png`` / ``..._s{S}_w{W}_restore_{token}.png``.
    """
    from pathlib import Path

    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    base = trace_with_patch_text_encoder(
        components, prompt, subject, [], noise_scale, seed,
        gen_kwargs=gen_kwargs,
    )
    Image.fromarray(base[0]).save(out_dir / f"{class_name}_{idx}_{kind}_clean.png")
    Image.fromarray(base[1]).save(out_dir / f"{class_name}_{idx}_{kind}_corrupt.png")

    tok = components.tokenizer
    enc = tok([prompt])
    ids = enc["input_ids"][0][: int(np.asarray(enc["attention_mask"][0]).sum())]
    tok_strs = [tok.decode([int(i)]) or f"t{p}" for p, i in enumerate(ids)]
    n_layers = components.text_encoder.config.num_hidden_layers
    layers = list(layers if layers is not None else range(n_layers))
    tokens = list(tokens if tokens is not None else range(len(ids)))
    for t in tokens:
        for l in layers:
            patch = [
                (lw, t) for lw in range(max(0, l - window // 2),
                                        min(n_layers, l - window // 2 + window))
            ]
            imgs = trace_with_patch_text_encoder(
                components, prompt, subject, patch, noise_scale, seed,
                gen_kwargs=gen_kwargs,
            )
            token_label = tok_strs[t].replace(" ", "") or f"t{t}"
            if window == 1:
                name = f"{class_name}_{idx}_{kind}_l{l}_restore_{token_label}.png"
            else:
                name = (f"{class_name}_{idx}_{kind}_s{patch[0][0]}_w{window}"
                        f"_restore_{token_label}.png")
            Image.fromarray(imgs[1]).save(out_dir / name)
    return out_dir


def calculate_hidden_flow_text_encoder(
    components: SDComponents,
    prompt: str,
    subject: str,
    score_fn,
    noise_scale: Optional[float] = None,
    window: int = 1,
    seed: int = 0,
    gen_kwargs: Optional[dict] = None,
) -> Dict[str, object]:
    """Full hidden-flow bundle (reference causal_trace.py:408-480): clean
    score, corrupted score, and the restoration heatmap."""
    if noise_scale is None:
        noise_scale = 3.0 * collect_embedding_std(components, [subject])
    base = trace_with_patch_text_encoder(
        components, prompt, subject, [], noise_scale, seed,
        gen_kwargs=gen_kwargs,
    )
    clean_score = float(score_fn(base[0]))
    corrupt_score = float(score_fn(base[1]))
    heat = trace_important_states(
        components, prompt, subject, noise_scale, window=window, seed=seed,
        score_fn=score_fn, gen_kwargs=gen_kwargs,
    )
    tok = components.tokenizer
    enc = tok([prompt])
    n_real = int(np.asarray(enc["attention_mask"][0]).sum())
    ids = enc["input_ids"][0][:n_real]
    return {
        "prompt": prompt,
        "subject": subject,
        "tokens": [tok.decode([int(i)]) for i in ids],
        "subject_range": find_token_range(tok, ids, subject),
        "clean_score": clean_score,
        "corrupt_score": corrupt_score,
        "scores": heat,
        "window": window,
        "noise_scale": noise_scale,
    }
