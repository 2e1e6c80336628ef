"""UNet region editing: spread a closed-form edit through conv / attn-out
sub-blocks (reference emcid_main.py:551-767 apply/execute_emcid_unet,
2055-2165 layer walk; compute_z.py:1778-1988 compute_delta_unet;
compute_ks.py:146-328 conv-as-matmul region keys).

The editable weight kinds are the UNET_EDIT_TEMPLATES (globals_cfg):
``conv`` (resnet conv2, 3x3), ``attn2_to_out`` ("attn-out", 1x1 linear) and
``ff_net_2``.  A Conv2d is edited like a Linear via the pre-fold trick: with
W reshaped to (out*k², in), the product ``W_mat @ x[p]`` gives, for every
input position p, the k² contributions that fold into the k² output
positions around p — so keys are per-position module inputs inside the
(dilated) region mask, and the desired pre-fold output is the unfold of the
masked output delta with a 180°-rotated window (reference
compute_ks.py:261-318).

Stage 1 optimizes per-timestep-block deltas on the final layer's output
restricted to the region; Stage 2 walks backward through same-kind
sub-blocks (skipping kind changes, reference emcid_main.py:2076-2080) and
solves each with residual spreading, exactly like the text-encoder path.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from emcid_tpu.engine.uce import get_unet_weight as _get_linear_weight
from emcid_tpu.engine.uce import set_unet_weight as _set_linear_weight
from emcid_tpu.engine.uce import unet_param_path
from emcid_tpu.globals_cfg import UNET_EDIT_TEMPLATES
from emcid_tpu.models.pipeline import SDComponents, encode_prompts
from emcid_tpu.models.scheduler import add_noise
from emcid_tpu.ops.solve import solve_adj_k

# ---------------------------------------------------------------------------
# layer walk (reference emcid_main.py:2092-2165)
# ---------------------------------------------------------------------------

_NUM_DOWN = 4
_NUM_UP = 4


def list2name(layer: Sequence) -> str:
    """["up_blocks", 3, "attn-out", 2] → dotted module name
    (reference list2name, emcid_main.py:2091-2097)."""
    kind = layer[2]
    tmp = {
        "attn-out": "{}.{}.attentions.{}.transformer_blocks.0.attn2.to_out.0",
        "mlp": "{}.{}.attentions.{}.transformer_blocks.0.ff.net.2",
        "res-last-conv": "{}.{}.resnets.{}.conv2",
        "downsampler-conv": "{}.{}.downsamplers.0.conv",
        "upsampler-conv": "{}.{}.upsamplers.0.conv",
    }[kind]
    name = tmp.format(layer[0], layer[1], layer[3])
    if "mid_block" in name:
        name = name.replace(f"mid_block.{layer[1]}.", "mid_block.")
    return name


def backward_const_res_single(layer: List) -> List:
    """One backward step through same-resolution sub-blocks
    (reference emcid_main.py:2099-2165)."""
    group, idx, kind, sub = layer[0], layer[1], layer[2], layer[3]
    if "sampler" in kind:
        raise ValueError("Cannot backward across sampler")

    if group == "down_blocks" and idx < _NUM_DOWN - 1:
        if idx == 0 and "res" in kind and sub == 0:
            raise ValueError("at start of down_blocks, cannot backward")
        if sub == 0 and "res" in kind:
            return ["down_blocks", idx - 1, "downsampler-conv", 0]
        if "attn" in kind:
            return ["down_blocks", idx, "res-last-conv", sub]
        return ["down_blocks", idx, "attn-out", sub - 1]

    if group == "down_blocks" and idx == _NUM_DOWN - 1:
        if sub == 0:
            return ["down_blocks", idx - 1, "downsampler-conv", 0]
        return ["down_blocks", idx, "res-last-conv", sub - 1]

    if group == "mid_block":
        if "attn" in kind:
            return ["mid_block", idx, "res-last-conv", sub]
        if sub == 0:
            return ["down_blocks", _NUM_DOWN - 1, "res-last-conv", 1]
        return ["mid_block", idx, "attn-out", sub - 1]

    if group == "up_blocks" and idx > 0:
        if sub == 0 and "res" in kind:
            return ["up_blocks", idx - 1, "upsampler-conv", 0]
        if "attn" in kind:
            return ["up_blocks", idx, "res-last-conv", sub]
        return ["up_blocks", idx, "attn-out", sub - 1]

    if group == "up_blocks" and idx == 0:
        if sub == 0:
            return ["mid_block", 0, "res-last-conv", 1]
        return ["up_blocks", idx, "res-last-conv", sub - 1]

    raise ValueError("reach unexpected condition")


def retrieve_spreading_layers(hparams) -> List[Tuple[str, List]]:
    """(module_name, layer coords) list, final layer first, keeping only
    layers of the final layer's kind (others are skipped — different kernel
    sizes produce different key dims, reference emcid_main.py:2073-2081)."""
    current = list(hparams.final_layer)
    if len(current) == 3:  # shipped configs use 3 fields + implied sub idx
        current = current + [2 if current[0] == "up_blocks" else 1]
    out = [(list2name(current), list(current))]
    for _ in range(hparams.spread_sub_block_cnt):
        current = backward_const_res_single(current)
        if current[2] != out[0][1][2]:
            continue
        if getattr(hparams, "skip_res_conv", False) and "res" in current[2]:
            continue
        out.append((list2name(current), list(current)))
    return out


# ---------------------------------------------------------------------------
# conv-as-matmul machinery
# ---------------------------------------------------------------------------


def dilate(mask: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Binary dilation of (B, H, W) masks with a k×k window
    (reference compute_ks.py:146-154)."""
    k = jnp.ones((kernel_size, kernel_size, 1, 1), mask.dtype)
    out = jax.lax.conv_general_dilated(
        mask[..., None], k, (1, 1),
        [(kernel_size // 2, kernel_size // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[..., 0]
    return jnp.clip(out, 0.0, 1.0)


def conv_weight_as_matrix(kernel: jnp.ndarray) -> jnp.ndarray:
    """Flax conv kernel (kh, kw, in, out) → (out*kh*kw, in), matching the
    reference's rearrange "out_c in_c h w -> (out_c h w) in_c"."""
    kh, kw, cin, cout = kernel.shape
    return jnp.transpose(kernel, (3, 0, 1, 2)).reshape(cout * kh * kw, cin)


def matrix_as_conv_weight(mat: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    cout = mat.shape[0] // (kh * kw)
    return mat.reshape(cout, kh, kw, mat.shape[1]).transpose(1, 2, 3, 0)


def pre_fold_output_delta(output_delta: jnp.ndarray, ksz: int) -> jnp.ndarray:
    """Masked output delta (B, H, W, C) → pre-fold delta (B, H, W, C*k²):
    unfold of delta/k² with the window rotated 180°
    (reference compute_ks.py:261-300).  Channel-major ordering (c, kh, kw)
    matches conv_weight_as_matrix."""
    B, H, W, C = output_delta.shape
    patches = jax.lax.conv_general_dilated_patches(
        output_delta / (ksz**2), (ksz, ksz), (1, 1),
        [(ksz // 2, ksz // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H, W, C*ksz*ksz) ordered (c, kh, kw)
    p = patches.reshape(B, H, W, C, ksz, ksz)
    p = jnp.rot90(p, 2, axes=(4, 5))
    return p.reshape(B, H, W, C * ksz * ksz)


def _module_weight(params, name: str, kind: str):
    """(W_mat (out*k², in), ksz, bias)."""
    if "conv" in kind or "res" in kind:
        node = params
        for p in unet_param_path(name):
            node = node[p]
        kern = node["kernel"]
        return conv_weight_as_matrix(kern), kern.shape[0], node.get("bias")
    w = _get_linear_weight(params, name)
    return w, 1, None


def _set_module_weight(params, name: str, kind: str, w_mat):
    if "conv" in kind or "res" in kind:
        node = params
        path = unet_param_path(name)
        for p in path:
            node = node[p]
        kh = node["kernel"].shape[0]
        new_kern = matrix_as_conv_weight(jnp.asarray(w_mat), kh, kh)

        def _set(tree, depth):
            tree = dict(tree)
            if depth == len(path):
                tree["kernel"] = new_kern.astype(tree["kernel"].dtype)
                return tree
            tree[path[depth]] = _set(tree[path[depth]], depth + 1)
            return tree

        return _set(params, 0)
    return _set_linear_weight(params, name, w_mat)


# ---------------------------------------------------------------------------
# activation capture at regions
# ---------------------------------------------------------------------------

_SOW_LEAF = {
    "attn-out": "attn_out_in",
    "mlp": "ff2_in",
    "res-last-conv": "conv2_in",
}
_SOW_OUT_LEAF = {
    "attn-out": "attn_out_out",
    "mlp": "ff2_out",
    "res-last-conv": "conv2_out",
}


def _intermediate_path(name: str, kind: str) -> Tuple[str, ...]:
    """Module name → path into the sow'd intermediates tree."""
    path = list(unet_param_path(name))
    if kind == "attn-out":
        # .../attn2/to_out_0 → capture lives under .../attn2
        path = path[:-1]
    elif kind == "mlp":
        path = path[:-1]  # .../ff/net_2 → .../ff
    else:
        path = path[:-1]  # resnet module holds conv2_in
    return tuple(path)


def capture_module_inputs(
    components: SDComponents,
    request: Dict,
    module_name: str,
    kind: str,
    timesteps: Sequence[int],
    latents_mean: np.ndarray,
    latents_logvar: np.ndarray,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Mean module input over the given timesteps: (num_imgs, H*W or N, C_in)."""
    prompts = [p.format(request["source"]) for p in
               request.get("prompts", ["{}"])] \
        if "source_prompts" not in request else request["source_prompts"]
    ctx = encode_prompts(components, prompts)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    mean = jnp.asarray(latents_mean[0])
    logvar = jnp.asarray(latents_logvar[0])
    ipath = _intermediate_path(module_name, kind)
    leaf = _SOW_LEAF[kind]

    # params enter as jit ARGUMENTS (a closure-captured UNet is baked into
    # the program as 3.4 GB of constants at SD shapes — observed to crash
    # the remote compiler); all timesteps run in ONE scanned program
    @jax.jit
    def sweep(unet_params, mean, logvar, ctx, ts_arr, keys):
        def one(acc, tk):
            t, key = tk
            k1, k2 = jax.random.split(key)
            latents = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                k1, mean.shape, mean.dtype)
            noise = jax.random.normal(k2, latents.shape, latents.dtype)
            ts = jnp.full((latents.shape[0],), t, jnp.int32)
            noisy = add_noise(components.schedule, latents, noise, ts)
            _, state = components.unet.apply(
                {"params": unet_params}, noisy, ts, ctx,
                mutable=["intermediates"],
            )
            node = state["intermediates"]
            for p in ipath:
                node = node[p]
            return acc + node[leaf][0], None

        shape = jax.eval_shape(
            lambda: components.unet.apply(
                {"params": unet_params},
                mean, jnp.zeros((mean.shape[0],), jnp.int32), ctx,
                mutable=["intermediates"])[1])
        node = shape["intermediates"]
        for p in ipath:
            node = node[p]
        acc0 = jnp.zeros(node[leaf][0].shape, jnp.float32)
        acc, _ = jax.lax.scan(one, acc0, (ts_arr, keys))
        return acc

    keys = jnp.stack([jax.random.fold_in(rng, i)
                      for i in range(len(timesteps))])
    acc = sweep(components.unet_params, mean, logvar, ctx,
                jnp.asarray(list(timesteps), jnp.int32), keys)
    acc = acc / len(timesteps)
    if acc.ndim == 4:  # conv input NHWC → (B, H*W, C)
        B, H, W, C = acc.shape
        acc = acc.reshape(B, H * W, C)
    return acc


# ---------------------------------------------------------------------------
# Stage 1: per-time-block output delta at the final layer
# ---------------------------------------------------------------------------


def compute_delta_unet(
    components: SDComponents,
    request: Dict,
    hparams,
    latents_mean: np.ndarray,
    latents_logvar: np.ndarray,
    region_mask: np.ndarray,
    rng: Optional[jax.Array] = None,
    verbose: bool = True,
) -> np.ndarray:
    """Optimize per-timestep-block channel deltas (num_t_blocks, C_out) on
    the final layer's output inside the region
    (reference compute_delta_unet, compute_z.py:1778-1988).

    region_mask: (num_imgs, h_lat, w_lat) at latent resolution; resized to
    the module's spatial resolution.
    """
    hp = hparams
    final_name, final_layer = retrieve_spreading_layers(hp)[0]
    kind = final_layer[2]
    inject_path = _inject_path(final_name, kind)
    prompts = [p.format(request["source"]) for p in request["prompts"]] \
        if "prompts" in request else request["source_prompts"]
    ctx = encode_prompts(components, prompts)
    P = ctx.shape[0]
    mean = jnp.asarray(latents_mean[0])
    logvar = jnp.asarray(latents_logvar[0])
    n_ts = components.schedule.num_train_timesteps
    block_size = n_ts // hp.num_t_blocks

    # module spatial size: run once and look at the captured output shape
    sample = capture_module_inputs(
        components, request, final_name, kind, [0], latents_mean,
        latents_logvar)
    N = sample.shape[1]
    side = int(np.sqrt(N))
    w_mat, ksz, _ = _module_weight(components.unet_params, final_name, kind)
    C_out = w_mat.shape[0] // (ksz * ksz)
    mask = jax.image.resize(
        jnp.asarray(region_mask, jnp.float32),
        (region_mask.shape[0], side, side), "nearest",
    ).reshape(region_mask.shape[0], N, 1)

    unet = components.unet
    opt = optax.adam(hp.v_lr)

    empty_ctx = (encode_prompts(components, [""] * P)
                 if hp.objective == "esd" else None)

    # params/activations enter as jit ARGUMENTS (a closure-captured UNet
    # is baked into the program as 3.4 GB of constants at SD shapes) and
    # the step loop is scanned + host-chunked (the old per-step
    # float(loss) paid a ~0.5 s host round-trip per step on the tunnel)
    from functools import partial

    @partial(jax.jit, static_argnames=())
    def run_chunk(pu, data, carry, keys):
        def loss_fn(delta, key):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            latents = data["mean"] + jnp.exp(
                0.5 * data["logvar"]) * jax.random.normal(
                k1, data["mean"].shape, data["mean"].dtype)
            noise = jax.random.normal(k2, latents.shape, latents.dtype)
            ts = jax.random.randint(k3, (P,), 0, n_ts)
            block = jnp.clip(ts[0] // block_size, 0, hp.num_t_blocks - 1)
            noisy = add_noise(components.schedule, latents, noise, ts)
            inj = data["mask"] * delta[block][None, None, :]  # (B, N, C)

            @jax.checkpoint
            def fwd_inject(ctx):
                return unet.apply(
                    {"params": pu}, noisy, ts, ctx,
                    inject={inject_path: inj},
                ).sample

            @jax.checkpoint
            def fwd_plain(ctx):
                return unet.apply({"params": pu}, noisy, ts, ctx).sample

            eps_edit = fwd_inject(data["ctx"])
            if hp.objective == "esd":
                eps_dst = jax.lax.stop_gradient(fwd_plain(data["empty_ctx"]))
                eps_src = jax.lax.stop_gradient(fwd_plain(data["ctx"]))
                mu = (float(hp.esd_mu)
                      if hp.esd_mu not in (None, "None") else 1.0)
                target = eps_dst - mu * (eps_src - eps_dst)
            else:  # ablate-source: push masked region toward pure noise
                target = noise
            mse = jnp.sum(((eps_edit - target) * data["lat_mask"]) ** 2
                          ) / jnp.maximum(jnp.sum(data["lat_mask"]), 1.0)
            reg = hp.v_weight_decay * jnp.sqrt(jnp.sum(delta**2) + 1e-12)
            return mse + reg

        def step(carry, key):
            delta, opt_state = carry
            loss, g = jax.value_and_grad(loss_fn)(delta, key)
            updates, opt_state = opt.update(g, opt_state, delta)
            return (optax.apply_updates(delta, updates), opt_state), loss

        return jax.lax.scan(step, carry, keys)

    lat_mask = jax.image.resize(
        jnp.asarray(region_mask, jnp.float32),
        (region_mask.shape[0],) + mean.shape[1:3], "nearest",
    )[..., None]
    data = dict(mean=mean, logvar=logvar, ctx=ctx, mask=mask,
                lat_mask=lat_mask)
    if empty_ctx is not None:
        data["empty_ctx"] = jnp.asarray(empty_ctx)

    delta = jnp.zeros((hp.num_t_blocks, C_out), jnp.float32)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    all_keys = jax.random.split(rng, hp.v_num_grad_steps)
    import os as _os

    chunk = max(1, min(int(_os.environ.get("EMCID_TPU_Z_CHUNK", 20)),
                       hp.v_num_grad_steps or 1))
    if jax.default_backend() not in ("cpu",):
        try:
            from emcid_tpu.profiling import unet_fwd_flops

            fwd_eq = 4.0 if hp.objective == "esd" else 3.0
            est_s = fwd_eq * unet_fwd_flops(
                unet.config, P, mean.shape[-2]) / 50e12
            chunk = max(1, min(chunk, int(15.0 / max(est_s, 1e-3))))
        except Exception:
            pass
    carry = (delta, opt.init(delta))
    losses = []
    for start in range(0, hp.v_num_grad_steps, chunk):
        keys = all_keys[start:start + chunk]
        carry, chunk_losses = run_chunk(components.unet_params, data,
                                        carry, keys)
        np.asarray(chunk_losses[-1])  # surface device faults here
        losses.extend(np.asarray(chunk_losses).tolist())
    delta, _ = carry
    if verbose and losses:
        print(f"unet delta opt: loss {losses[0]:.5f} -> {losses[-1]:.5f}")
    return np.asarray(delta)


def _inject_path(name: str, kind: str) -> str:
    if kind == "attn-out":
        return name.rsplit(".to_out", 1)[0]  # attn2 output injection point
    if kind == "mlp":
        return name  # ...ff.net.2
    return name  # ...conv2


# ---------------------------------------------------------------------------
# Stage 2: spread + solve
# ---------------------------------------------------------------------------


def execute_emcid_unet(
    components: SDComponents,
    requests: Sequence[Dict],
    hparams,
    deltas_star: Sequence[np.ndarray],
    region_masks: Sequence[np.ndarray],
    latents: Sequence[Tuple[np.ndarray, np.ndarray]],
    cov,
    mom2_weight=None,
    num_steps_per_block: int = 2,
    verbose: bool = True,
) -> Tuple[Dict, SDComponents]:
    """Insert the optimized final-layer deltas by editing the spreading
    sub-blocks (reference execute_emcid_unet, emcid_main.py:583-767).

    deltas_star[i]: (num_t_blocks, C_out) per request; latents[i]:
    (mean, logvar) as (Simg, P, h, w, c); cov: (C_in, C_in) for the module
    kind (shared across same-kind layers).
    """
    hp = hparams
    lam = float(mom2_weight if mom2_weight is not None else hp.mom2_update_weight)
    layers = retrieve_spreading_layers(hp)
    final_name, final_coords = layers[0]
    kind = final_coords[2]
    n_ts = components.schedule.num_train_timesteps
    block_size = n_ts // hp.num_t_blocks
    sample_ts = [
        b * block_size + i * max(block_size // num_steps_per_block, 1)
        for b in range(hp.num_t_blocks) for i in range(num_steps_per_block)
    ]

    comps = components
    deltas_out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    n_layers = len(layers)
    # earliest module first (reference iterates reversed(weights), :686)
    for i, (name, coords) in enumerate(reversed(layers)):
        K_cols, src_cols = [], []
        for r, request in enumerate(requests):
            lm, lv = latents[r]
            inputs = capture_module_inputs(
                comps, request, name, coords[2], sample_ts, lm, lv,
            )  # (B, N, C_in)
            B, N, C_in = inputs.shape
            side = int(np.sqrt(N))
            mask = np.asarray(jax.image.resize(
                jnp.asarray(region_masks[r], jnp.float32),
                (region_masks[r].shape[0], side, side), "nearest",
            ).reshape(-1, N))
            w_mat, ksz, _ = _module_weight(comps.unet_params, name, coords[2])
            in_mask = mask
            if ksz > 1:
                in_mask = np.asarray(dilate(
                    jnp.asarray(mask.reshape(-1, side, side)), ksz
                ).reshape(-1, N))
            sel = in_mask.reshape(-1) > 0.5
            flat_in = np.asarray(inputs).reshape(-1, C_in)[sel]  # (R_pts, C_in)
            K_cols.append(flat_in)

            # desired pre-fold target from the final-layer delta
            # (per-time-block mean delta folded to pre-fold space)
            d_mean = np.asarray(deltas_star[r]).mean(axis=0)  # (C_out,)
            C_out = d_mean.shape[0]
            out_delta = (mask.reshape(-1, side, side, 1)
                         * d_mean[None, None, None, :])
            if ksz > 1:
                pf = np.asarray(pre_fold_output_delta(
                    jnp.asarray(out_delta), ksz))
            else:
                pf = out_delta.reshape(-1, side, side, C_out)
            pf = pf.reshape(-1, pf.shape[-1])[sel]
            src_cols.append(pf)

        K = np.concatenate(K_cols).T.astype(np.float64)  # (C_in, Npts)
        sources = np.concatenate(src_cols).T.astype(np.float64)
        # spread: 1/(n-i) of the target at each remaining layer (:740)
        resid = sources / (n_layers - i)
        adj_k = solve_adj_k(np.asarray(cov, np.float64), K, lam, method="f64")
        upd = resid @ adj_k.T  # (C_out*k², C_in)
        w_mat, ksz, _ = _module_weight(comps.unet_params, name, coords[2])
        new_w = np.asarray(w_mat, np.float64) + upd
        comps = comps.replace_unet_params(
            _set_module_weight(comps.unet_params, name, coords[2],
                               new_w.astype(np.float32)))
        deltas_out[f"{name}.weight"] = (adj_k.astype(np.float32),
                                        resid.astype(np.float32))
        if verbose:
            print(f"{name}: wrote {K.shape[1]} region keys, "
                  f"upd norm {float(np.linalg.norm(upd)):.4f}")
    return deltas_out, comps
