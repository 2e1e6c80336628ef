"""UCE baseline: closed-form cross-attention K/V editing
(reference emcid/uce_train.py:215-593).

Algorithm: for every cross-attn projection W in {to_v, to_k} x 16 blocks,

    W_new = (lam*W + eps * sum_i v_i c_i^T + p * sum_r v_r c_r^T)
            @ inv(lam*I + eps * sum_i c_i c_i^T + p * sum_r c_r c_r^T)

where c = text-encoder embedding rows of the *old* concept (tokens from the
last real token through an EOS window aligned with the new concept), and
v = W @ (new-concept rows); technique "tensor" removes the projection of v
onto the old direction (uce_train.py:369-379).  ``edit_model_uce_modified``
replaces retain-text preservation with the cached second-moment covariance:
``+ p*lam2*W@C`` / ``+ p*lam2*C`` (uce_train.py:484-591).

TPU-native observation: the normal matrix ``mat2`` lives in context space
(768²) and is *identical for all 32 projections* — the reference rebuilds
and inverts it inside the per-layer loop (uce_train.py:292-418); here it is
accumulated once, Cholesky-factored once, and every projection's update is
one batched matmul against the shared factorization.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emcid_tpu.models.pipeline import SDComponents, encode_prompts, generate
from emcid_tpu.models.unet import cross_attn_kv_layer_names
from emcid_tpu.runtime import pdot, precise_matmuls


def unet_param_path(torch_name: str) -> Tuple[str, ...]:
    """HF UNet dotted module name → Flax param path.

    ``up_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k`` →
    ``("up_blocks_1_attentions_0", "transformer_blocks_0", "attn2", "to_k")``.
    """
    parts = torch_name.split(".")
    out: List[str] = []
    if parts[0] in ("down_blocks", "up_blocks"):
        out.append("_".join(parts[:4]))
        rest = parts[4:]
    elif parts[0] == "mid_block":
        out.append("_".join(parts[:3]))
        rest = parts[3:]
    else:
        rest = parts
    i = 0
    while i < len(rest):
        p = rest[i]
        if i + 1 < len(rest) and rest[i + 1].isdigit():
            # to_out.0, transformer_blocks.0, net.2 ...
            nxt = rest[i + 1]
            if p == "net" and i + 2 < len(rest):
                out.append(f"{p}_{nxt}_{rest[i + 2]}")
                i += 3
                continue
            out.append(f"{p}_{nxt}")
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out)


def get_unet_weight(params, torch_name: str) -> jnp.ndarray:
    """(out, in) torch-oriented weight from the UNet pytree."""
    node = params
    for p in unet_param_path(torch_name):
        node = node[p]
    return node["kernel"].T


def set_unet_weight(params, torch_name: str, value) -> Dict:
    path = unet_param_path(torch_name)

    def _set(node, depth):
        node = dict(node)
        if depth == len(path):
            node["kernel"] = jnp.asarray(value).T.astype(node["kernel"].dtype)
            return node
        node[path[depth]] = _set(node[path[depth]], depth + 1)
        return node

    return _set(params, 0)


def _aligned_context_rows(
    components: SDComponents, old_text: str, new_text: str
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Old/new text-embedding rows over the aligned post-final-token window
    (reference uce_train.py:297-345): final token index = n_real − 2; both
    slices truncated to equal length."""
    tok = components.tokenizer
    enc = tok([old_text, new_text], padding="max_length", truncation=True,
              max_length=tok.model_max_length)
    emb = encode_prompts(components, [old_text, new_text])
    S = emb.shape[1]
    fi_old = int(enc["attention_mask"][0].sum()) - 2
    fi_new = int(enc["attention_mask"][1].sum()) - 2
    farthest = max(fi_old, fi_new)
    old_rows = emb[0, fi_old: S - max(0, farthest - fi_old)]
    new_rows = emb[1, fi_new: S - max(0, farthest - fi_new)]
    return old_rows.astype(jnp.float32), new_rows.astype(jnp.float32)


@jax.jit
@precise_matmuls
def _uce_solve_all(mat2, mat1_stack):
    """Shared UCE normal-equation solver: one Cholesky of mat2, batched
    cho_solve over stacked right-hand sides (W_new^T per projection).
    Module-level so repeated calls (and debias iterations) reuse one
    compiled program instead of re-jitting per call site."""
    L = jax.scipy.linalg.cholesky(mat2, lower=True)
    return jax.vmap(
        lambda b: jax.scipy.linalg.cho_solve((L, True), b)
    )(jnp.swapaxes(mat1_stack, -1, -2))


def edit_model_uce(
    components: SDComponents,
    old_texts: Sequence[str],
    new_texts: Sequence[str],
    retain_texts: Optional[Sequence[str]] = None,
    lamb: float = 0.1,
    erase_scale: float = 0.1,
    preserve_scale: float = 0.1,
    with_to_k: bool = True,
    technique: str = "tensor",
    layers_to_edit: Optional[Sequence[int]] = None,
    mom2_cov: Optional[np.ndarray] = None,
    mom2_lamb2: float = 1.0,
) -> SDComponents:
    """Closed-form UCE edit of the UNet cross-attn projections.

    ``mom2_cov`` switches to the mom2-regularized variant
    (edit_model_uce_modified): preservation = ``p*lam2*(W@C, C)`` instead of
    retain-text sums.  Returns components with edited unet params
    (functional; originals stay with the caller).
    """
    new_texts = [t if t != "" else " " for t in new_texts]
    kv_names = cross_attn_kv_layer_names(components.unet.config)
    # ordering parity with the reference: all to_v first, then all to_k
    v_names = [n for n in kv_names if n.endswith(".to_v")]
    k_names = [n for n in kv_names if n.endswith(".to_k")]
    proj_names = v_names + (k_names if with_to_k else [])
    if layers_to_edit is not None:
        proj_names = [proj_names[i] for i in layers_to_edit]

    params = components.unet_params
    weights = {n: get_unet_weight(params, n).astype(jnp.float32)
               for n in proj_names}
    ctx_dim = next(iter(weights.values())).shape[1]

    # shared normal matrix (context space) + per-projection cross terms
    mat2 = jnp.zeros((ctx_dim, ctx_dim), jnp.float32)
    mat1 = {n: lamb * w for n, w in weights.items()}
    mat2 = mat2 + lamb * jnp.eye(ctx_dim, dtype=jnp.float32)

    for old_text, new_text in zip(old_texts, new_texts):
        c, new_rows = _aligned_context_rows(components, old_text, new_text)
        mat2 = mat2 + erase_scale * pdot(c.T, c)
        for n, w in weights.items():
            new_v = pdot(new_rows, w.T)  # (rows, out)
            if technique == "tensor":
                o = pdot(c, w.T).reshape(-1)
                u = o / jnp.linalg.norm(o)
                proj = jnp.sum(u * new_v.reshape(-1))
                v = (new_v.reshape(-1) - proj * u).reshape(new_v.shape)
            else:  # "replace"
                v = new_v
            mat1[n] = mat1[n] + erase_scale * pdot(v.T, c)

    if mom2_cov is not None:
        C = jnp.asarray(mom2_cov, jnp.float32)
        mat2 = mat2 + preserve_scale * mom2_lamb2 * C
        for n, w in weights.items():
            mat1[n] = mat1[n] + preserve_scale * mom2_lamb2 * pdot(w, C)
    else:
        if retain_texts is None:
            # the reference ALWAYS preserves the empty prompt when no
            # retain texts are given (uce_train.py:275 ret_texts=[''];
            # the preserve loop at :392 runs unconditionally)
            retain_texts = [""]
        for text in retain_texts:
            enc_rows = encode_prompts(components, [text])[0].astype(jnp.float32)
            mat2 = mat2 + preserve_scale * pdot(enc_rows.T, enc_rows)
            for n, w in weights.items():
                v = pdot(enc_rows, w.T)
                mat1[n] = mat1[n] + preserve_scale * pdot(v.T, enc_rows)

    # group projections by out-dim so stacks are rectangular
    # (one factorization serves every projection: _uce_solve_all)
    new_params = params
    by_dim: Dict[int, List[str]] = {}
    for n in proj_names:
        by_dim.setdefault(weights[n].shape[0], []).append(n)
    for dim, names in by_dim.items():
        stack = jnp.stack([mat1[n] for n in names])
        solved = _uce_solve_all(mat2, stack)  # (L, in, out)
        for i, n in enumerate(names):
            new_params = set_unet_weight(new_params, n, solved[i].T)
    return components.replace_unet_params(new_params)


def edit_text_encoder_uce(
    components: SDComponents,
    old_texts: Sequence[str],
    new_texts: Sequence[str],
    hparams,
    retain_texts: Optional[Sequence[str]] = None,
    lamb: float = 0.1,
    erase_scale: float = 0.1,
    preserve_scale: float = 0.1,
) -> SDComponents:
    """UCE applied to the text encoder's fc2 layers instead of cross-attn
    (reference uce_train.py:30-212): contexts are fc2 *inputs* at the aligned
    window, values are fc2 outputs of the new concept."""
    from emcid_tpu.models.naming import get_weight, set_weight

    tok = components.tokenizer
    model = components.text_encoder
    params = components.text_params
    new_texts = [t if t != "" else " " for t in new_texts]

    new_params = params
    for layer in hparams.layers:
        mod_name = hparams.rewrite_module_tmp.format(layer)
        w = get_weight(params, mod_name).astype(jnp.float32)  # (out, in)
        in_dim = w.shape[1]
        mat1 = lamb * w
        mat2 = lamb * jnp.eye(in_dim, dtype=jnp.float32)
        for old_text, new_text in zip(old_texts, new_texts):
            enc = tok([old_text, new_text], padding="max_length",
                      truncation=True, max_length=tok.model_max_length)
            out = model.apply(
                {"params": params}, jnp.asarray(enc["input_ids"]),
                capture=("fc2_in",), stop_at_layer=layer,
            )
            fc2_in = out.taps["fc2_in"][layer].astype(jnp.float32)
            S = fc2_in.shape[1]
            fi_old = int(np.asarray(enc["attention_mask"][0]).sum()) - 2
            fi_new = int(np.asarray(enc["attention_mask"][1]).sum()) - 2
            far = max(fi_old, fi_new)
            c = fc2_in[0, fi_old: S - max(0, far - fi_old)]
            k_new = fc2_in[1, fi_new: S - max(0, far - fi_new)]
            v = pdot(k_new, w.T)
            mat1 = mat1 + erase_scale * pdot(v.T, c)
            mat2 = mat2 + erase_scale * pdot(c.T, c)
        # reference uce_train.py:61 defaults ret_texts=[''] and its
        # preserve loop (:177) runs unconditionally — the empty prompt is
        # ALWAYS preserved when no retain texts are given
        for text in (retain_texts if retain_texts else [""]):
            enc = tok([text], padding="max_length", truncation=True,
                      max_length=tok.model_max_length)
            out = model.apply(
                {"params": params}, jnp.asarray(enc["input_ids"]),
                capture=("fc2_in",), stop_at_layer=layer,
            )
            c = out.taps["fc2_in"][layer][0].astype(jnp.float32)
            v = pdot(c, w.T)
            mat1 = mat1 + preserve_scale * pdot(v.T, c)
            mat2 = mat2 + preserve_scale * pdot(c.T, c)
        with jax.default_matmul_precision("highest"):
            # eager-only block: no jitted program runs under this context,
            # so no trace-context duplication (ADVICE r4)
            w_new = jnp.linalg.solve(mat2.T, mat1.T).T
        new_params = set_weight(new_params, mod_name, w_new)
    return components.replace_text_params(new_params)


# ---------------------------------------------------------------------------
# Iterative UCE debias (reference uce_train.py:597-843: get_ratios +
# edit_model_debias)
# ---------------------------------------------------------------------------


def _aligned_rows_multi(
    components: SDComponents, old_text: str, new_texts: Sequence[str]
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Old-context rows + per-class rows over the shared aligned window
    (reference uce_train.py:784-806): final index = n_real - 2 per text,
    window end trimmed by the farthest final index across old + all new."""
    tok = components.tokenizer
    texts = [old_text] + list(new_texts)
    enc = tok(texts, padding="max_length", truncation=True,
              max_length=tok.model_max_length)
    emb = encode_prompts(components, texts).astype(jnp.float32)
    S = emb.shape[1]
    fis = [int(np.asarray(m).sum()) - 2 for m in enc["attention_mask"]]
    far = max(fis)
    rows = [emb[i, fi: S - max(0, far - fi)] for i, fi in enumerate(fis)]
    return rows[0], rows[1:]


def debias_ratios(
    components: SDComponents,
    scorer,
    concepts: Sequence[str],
    classes: Sequence[Sequence[str]],
    prev_ratio=None,
    ratio_diff=None,
    max_ratio_gap: float = 0.05,
    num_samples: int = 10,
    num_seeds: int = 5,
    seed: int = 0,
    gen_kwargs: Optional[dict] = None,
    mesh=None,
) -> List[np.ndarray]:
    """CLIP-classified class ratios per concept (reference get_ratios,
    uce_train.py:597-629): generate num_seeds x num_samples images of each
    concept with the CURRENT model, argmax CLIP probs over the class texts.
    Concepts whose previous max gap is below ``max_ratio_gap`` are bypassed.
    """
    from emcid_tpu.engine.debias import classify_ratio

    rng = np.random.RandomState(seed)
    seeds = rng.randint(5000, size=num_seeds)
    gk = dict(num_inference_steps=20, guidance_scale=7.5)
    gk.update(gen_kwargs or {})
    ratios: List[np.ndarray] = []
    for idx, concept in enumerate(concepts):
        if ratio_diff is not None and ratio_diff[idx] < max_ratio_gap:
            ratios.append(prev_ratio[idx])
            continue
        prompts, im_seeds = [], []
        for s in seeds:
            prompts += [concept] * num_samples
            im_seeds += [int(s) * 1009 + j for j in range(num_samples)]
        imgs = generate(components, prompts, im_seeds, mesh=mesh, **gk)
        ratios.append(np.asarray(
            classify_ratio(scorer, imgs, list(classes[idx]))))
    return ratios


def edit_model_debias(
    components: SDComponents,
    scorer,
    old_texts: Sequence[str],
    new_texts: Sequence[Sequence[str]],
    retain_texts: Optional[Sequence[str]] = None,
    add: bool = True,
    lamb: float = 0.1,
    erase_scale: float = 0.1,
    preserve_scale: float = 0.1,
    with_to_k: bool = True,
    layers_to_edit: Optional[Sequence[int]] = None,
    max_bias_diff: float = 0.05,
    max_iters: int = 30,
    weight_step: float = 0.1,
    num_samples: int = 1,
    num_seeds: int = 5,
    seed: int = 0,
    gen_kwargs: Optional[dict] = None,
    mesh=None,
    verbose: bool = True,
) -> Tuple[SDComponents, List[np.ndarray], List[np.ndarray], List[np.ndarray]]:
    """Iterative UCE debias loop (reference edit_model_debias,
    uce_train.py:641-843).

    Per outer iteration: measure per-concept class ratios with CLIP on
    images from the CURRENT model, stop when every concept's max deviation
    from uniform is < ``max_bias_diff``; otherwise set per-class weights
    ``0.1 * (desired - ratio)`` (zeroed + moved to the retain set once
    attained) and re-solve every cross-attn K/V projection from its CURRENT
    weight with value targets ``o + w_j * |o|_F * u_j / |u_j|_F``.

    Returns (edited components, final weights, initial ratios, final ratios).
    The caller's components are never mutated (functional params).
    """
    # ---- format edits (reference :758-776) -------------------------------
    old_texts = list(old_texts)
    fmt_new: List[List[str]] = []
    for old_text, classes in zip(old_texts, new_texts):
        n_t = []
        for t in classes:
            if add and old_text.lower() not in t.lower():
                n_t.append(t + " " + old_text)
            else:
                n_t.append(t)
        if len(n_t) == 1:
            n_t = n_t * 2
        fmt_new.append(n_t)
    ret_texts = list(retain_texts) if retain_texts else [""]

    desired = [np.ones(len(c)) / len(c) for c in fmt_new]
    weights = [np.zeros(len(c)) for c in fmt_new]

    kv_names = cross_attn_kv_layer_names(components.unet.config)
    v_names = [n for n in kv_names if n.endswith(".to_v")]
    k_names = [n for n in kv_names if n.endswith(".to_k")]
    proj_names = v_names + (k_names if with_to_k else [])
    if layers_to_edit is not None:
        proj_names = [proj_names[i] for i in layers_to_edit]

    edited = components
    init_ratios = ratios = None
    prev_ratio = ratio_diff = None
    # text-encoder outputs are NEVER edited by UCE (only unet cross-attn
    # projections), so the context rows are loop constants — encode once
    concept_rows = [
        _aligned_rows_multi(components, old_text, classes)
        for old_text, classes in zip(old_texts, fmt_new)
    ]
    retain_rows: Dict[str, jnp.ndarray] = {}

    def rows_for(text):
        if text not in retain_rows:
            retain_rows[text] = encode_prompts(
                components, [text])[0].astype(jnp.float32)
        return retain_rows[text]

    for it in range(max_iters):
        ratios = debias_ratios(
            edited, scorer, old_texts, fmt_new,
            prev_ratio=prev_ratio, ratio_diff=ratio_diff,
            max_ratio_gap=max_bias_diff, num_samples=num_samples,
            num_seeds=num_seeds, seed=seed, gen_kwargs=gen_kwargs, mesh=mesh,
        )
        if init_ratios is None:
            init_ratios = ratios
        max_change = [float(np.abs(r - d).max())
                      for r, d in zip(ratios, desired)]
        if verbose:
            print(f"debias iter {it}: ratios "
                  f"{[np.round(r, 3).tolist() for r in ratios]}")
        if max(max_change) < max_bias_diff:
            if verbose:
                print(f"all concepts debiased at iteration {it}")
            break
        prev_ratio, ratio_diff = ratios, max_change

        weights = [weight_step * (d - r) for r, d in zip(ratios, desired)]
        weights = [w if mc > max_bias_diff else w * 0.0
                   for w, mc in zip(weights, max_change)]
        attained = [old_texts[i] for i, w in enumerate(weights) if w[0] == 0]
        if attained:
            ret_texts = sorted(set(ret_texts) | set(attained))

        # ---- closed-form re-solve from the CURRENT weights ----------------
        params = edited.unet_params
        cur = {n: get_unet_weight(params, n).astype(jnp.float32)
               for n in proj_names}
        ctx_dim = next(iter(cur.values())).shape[1]
        mat1 = {n: lamb * w for n, w in cur.items()}
        mat2 = lamb * jnp.eye(ctx_dim, dtype=jnp.float32)
        for cnt, (c, class_rows) in enumerate(concept_rows):
            mat2 = mat2 + erase_scale * pdot(c.T, c)
            for n, w in cur.items():
                o = pdot(c, w.T)  # (rows, out)
                o_norm = jnp.linalg.norm(o)
                v = o
                for j, u_rows in enumerate(class_rows):
                    u = pdot(u_rows, w.T)
                    u = u / jnp.linalg.norm(u)
                    v = v + (float(weights[cnt][j]) * o_norm) * u
                mat1[n] = mat1[n] + erase_scale * pdot(v.T, c)
        for text in ret_texts:
            rows = rows_for(text)
            mat2 = mat2 + preserve_scale * pdot(rows.T, rows)
            for n, w in cur.items():
                v = pdot(rows, w.T)
                mat1[n] = mat1[n] + preserve_scale * pdot(v.T, rows)

        new_params = params
        by_dim: Dict[int, List[str]] = {}
        for n in proj_names:
            by_dim.setdefault(cur[n].shape[0], []).append(n)
        for dim, names in by_dim.items():
            solved = _uce_solve_all(mat2, jnp.stack([mat1[n] for n in names]))
            for i, n in enumerate(names):
                new_params = set_unet_weight(new_params, n, solved[i].T)
        edited = edited.replace_unet_params(new_params)
    return edited, weights, init_ratios, ratios
