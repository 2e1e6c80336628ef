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

from emcid_tpu.engine.uce import set_unet_weight as _set_linear_weight
from emcid_tpu.engine.uce import unet_param_path
from emcid_tpu.globals_cfg import UNET_EDIT_TEMPLATES
from emcid_tpu.models.pipeline import SDComponents, _cached_jit, encode_prompts
from emcid_tpu.models.scheduler import add_noise
from emcid_tpu.ops.solve import solve_adj_k


def _sched_key(schedule) -> tuple:
    """Schedule → hashable memo key (full betas table, per ADVICE r3 #3 —
    endpoint-only keys alias linear and scaled_linear schedules)."""
    return (schedule.num_train_timesteps, schedule.prediction_type,
            np.asarray(schedule.betas, np.float64).tobytes())


def _unet_key(unet) -> tuple:
    return (unet.config, str(unet.dtype))

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
        # f32-exact: the patch conv must not bf16-round the delta values
        # on TPU (pin per-site, not per-entry-point — ADVICE r4)
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, H, W, C*ksz*ksz) ordered (c, kh, kw)
    p = patches.reshape(B, H, W, C, ksz, ksz)
    p = jnp.rot90(p, 2, axes=(4, 5))
    return p.reshape(B, H, W, C * ksz * ksz)


def _module_weight(params, name: str, kind: str):
    """(W_mat (out*k², in), ksz, bias).  The bias is returned for BOTH
    kinds — the reference always adds ``repeat_interleave(bias)`` to the
    pre-fold output (compute_ks.py:265-273), and ``to_out.0`` /
    ``ff.net.2`` are biased Dense layers; dropping it would shift every
    intermediate spreading layer's residual target by the per-channel
    bias difference between modules."""
    node = params
    for p in unet_param_path(name):
        node = node[p]
    if "conv" in kind or "res" in kind:
        kern = node["kernel"]
        return conv_weight_as_matrix(kern), kern.shape[0], node.get("bias")
    return node["kernel"].T, 1, node.get("bias")


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


def _capture_inputs_sweep(unet, schedule, ipath: Tuple[str, ...], leaf: str):
    """Memoized jitted timestep sweep accumulating a module's INPUT.

    Params enter as jit ARGUMENTS (a closure-captured UNet is baked into
    the program as 3.4 GB of constants at SD shapes — observed to crash
    the remote compiler); all timesteps run in ONE scanned program; the
    program is cached per (unet config, schedule, tap) so repeat calls
    across requests/layers neither retrace nor pay a fresh remote compile.
    """

    def build():
        def sweep(unet_params, mean, logvar, ctx, ts_arr, keys):
            def one(acc, tk):
                t, key = tk
                k1, k2 = jax.random.split(key)
                latents = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                    k1, mean.shape, mean.dtype)
                noise = jax.random.normal(k2, latents.shape, latents.dtype)
                ts = jnp.full((latents.shape[0],), t, jnp.int32)
                noisy = add_noise(schedule, latents, noise, ts)
                _, state = unet.apply(
                    {"params": unet_params}, noisy, ts, ctx,
                    mutable=["intermediates"],
                )
                node = state["intermediates"]
                for p in ipath:
                    node = node[p]
                return acc + node[leaf][0], None

            shape = jax.eval_shape(
                lambda: unet.apply(
                    {"params": unet_params},
                    mean, jnp.zeros((mean.shape[0],), jnp.int32), ctx,
                    mutable=["intermediates"])[1])
            node = shape["intermediates"]
            for p in ipath:
                node = node[p]
            acc0 = jnp.zeros(node[leaf][0].shape, jnp.float32)
            acc, _ = jax.lax.scan(one, acc0, (ts_arr, keys))
            return acc

        return jax.jit(sweep)

    return _cached_jit(("unet_edit.capture_in", _unet_key(unet),
                        _sched_key(schedule), ipath, leaf), build)


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
    sweep = _capture_inputs_sweep(components.unet, components.schedule,
                                  ipath, leaf)
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


def capture_block_outputs(
    components: SDComponents,
    ctx: jnp.ndarray,
    module_name: str,
    kind: str,
    latents0: jnp.ndarray,
    mask_mod: jnp.ndarray,
    num_t_blocks: int,
    rng: jax.Array,
) -> jnp.ndarray:
    """Per-time-block region-mean module OUTPUT ``(num_t_blocks, C_out)``.

    Reference protocol (compute_z.py:1855-1885): ``original_output[ti]``
    is captured lazily from the first batch element whose random training
    timestep lands in block ``ti`` — i.e. ONE image's region-mean at one
    uniform-in-block timestep, evaluated on the SAME posterior latent
    draw the optimization uses, with fresh noise.  The exact (step,
    element) realization is torch-rng-dependent, so this reproduces the
    protocol's distribution: per block, one uniform timestep, one
    uniformly-drawn image, ``latents0`` + fresh noise.

    ``EMCID_TPU_UNET_ORIG_EST=batchmean`` opts into a lower-variance
    estimator (region-mean averaged over the whole image batch) instead.
    """
    import os

    est = os.environ.get("EMCID_TPU_UNET_ORIG_EST", "single")
    n_ts = components.schedule.num_train_timesteps
    block_size = n_ts // num_t_blocks
    ipath = _intermediate_path(module_name, kind)
    leaf = _SOW_OUT_LEAF[kind]
    unet, schedule = components.unet, components.schedule

    def build():
        def sweep(unet_params, latents0, ctx, mask_mod, t0s, keys):
            def one(_, tk):
                t0, key = tk
                k2, k3, k4 = jax.random.split(key, 3)
                t = t0 + jax.random.randint(k3, (), 0, block_size)
                noise = jax.random.normal(k2, latents0.shape,
                                          latents0.dtype)
                ts = jnp.full((latents0.shape[0],), t, jnp.int32)
                noisy = add_noise(schedule, latents0, noise, ts)
                _, state = unet.apply(
                    {"params": unet_params}, noisy, ts, ctx,
                    mutable=["intermediates"],
                )
                node = state["intermediates"]
                for pp in ipath:
                    node = node[pp]
                out = node[leaf][0].astype(jnp.float32)
                if out.ndim == 4:  # conv NHWC → (B, H*W, C)
                    out = out.reshape(out.shape[0], -1, out.shape[-1])
                # region-mean per image
                num = jnp.sum(out * mask_mod, axis=1)  # (B, C)
                den = jnp.maximum(jnp.sum(mask_mod, axis=1), 1.0)
                per_img = num / den
                if est == "batchmean":
                    return None, jnp.mean(per_img, axis=0)
                b = jax.random.randint(k4, (), 0, per_img.shape[0])
                return None, per_img[b]

            _, orig = jax.lax.scan(one, None, (t0s, keys))
            return orig  # (num_t_blocks, C_out)

        return jax.jit(sweep)

    sweep = _cached_jit(("unet_edit.capture_out", _unet_key(unet),
                         _sched_key(schedule), ipath, leaf, block_size,
                         est), build)
    t0s = jnp.asarray(
        [i * block_size for i in range(num_t_blocks)], jnp.int32)
    keys = jnp.stack([jax.random.fold_in(rng, i)
                      for i in range(num_t_blocks)])
    return sweep(components.unet_params, latents0, ctx, mask_mod, t0s,
                 keys)


def _delta_opt_chunk(unet, schedule, inject_path: str, conv_kind: bool,
                     use_samp: bool, objective: str, mu: float, v_lr: float,
                     wd: float, clamp: float, num_t_blocks: int, n_ts: int,
                     P: int, side: int):
    """Memoized jitted Stage-1 step chunk for the UNet-region optimizer.

    Params/activations enter as jit ARGUMENTS (a closure-captured UNet is
    baked into the program as 3.4 GB of constants at SD shapes) and the
    step loop is scanned + host-chunked.  Every closure constant is part
    of the memo key, so repeat requests with the same hparams reuse one
    compiled program instead of paying a fresh remote compile each call.
    """
    block_size = n_ts // num_t_blocks

    def build():
        opt = optax.adam(v_lr)

        def run_chunk(pu, data, carry, keys):
            def loss_fn(delta, idxs, noise, ts):
                noisy = add_noise(schedule, data["latents"], noise, ts)
                d_sel = delta[idxs]  # (P, C_out)
                if conv_kind:
                    inj = (data["mask"].reshape(P, side, side, 1)
                           * d_sel[:, None, None, :])  # NHWC
                else:
                    inj = data["mask"] * d_sel[:, None, :]  # (P, N, C)

                @jax.checkpoint
                def fwd_inject(ctx):
                    return unet.apply(
                        {"params": pu}, noisy, ts, ctx,
                        inject={inject_path: inj},
                    ).sample

                @jax.checkpoint
                def fwd_plain(ctx):
                    return unet.apply({"params": pu}, noisy, ts,
                                      ctx).sample

                eps_edit = fwd_inject(data["ctx"])
                if objective == "esd":
                    eps_dst = jax.lax.stop_gradient(
                        fwd_plain(data["ctx_dst"]))
                    eps_src = jax.lax.stop_gradient(
                        fwd_plain(data["ctx"]))
                    target = eps_dst - mu * (eps_src - eps_dst)
                elif use_samp:
                    target = noise
                else:
                    target = jax.lax.stop_gradient(
                        fwd_plain(data["ctx_dst"]))
                mse = jnp.mean((eps_edit - target) ** 2)
                reg = (wd * jnp.sqrt(jnp.sum(d_sel**2) + 1e-12)
                       / jnp.maximum(jnp.sum(data["orig"][idxs] ** 2),
                                     1e-12))
                return mse + reg

            def step(carry, key):
                delta, opt_state = carry
                k2, k3 = jax.random.split(key)
                noise = jax.random.normal(k2, data["latents"].shape,
                                          data["latents"].dtype)
                ts = jax.random.randint(k3, (P,), 0, n_ts)
                idxs = jnp.clip(ts // block_size, 0, num_t_blocks - 1)
                loss, g = jax.value_and_grad(loss_fn)(delta, idxs, noise,
                                                      ts)
                updates, opt_state = opt.update(g, opt_state, delta)
                delta = optax.apply_updates(delta, updates)
                # per-step L2 clamp on the touched rows (reference
                # :1973-1977, incl. the full-delta-norm divisor quirk)
                sel = delta[idxs]
                sel_n = jnp.sqrt(jnp.sum(sel**2) + 1e-12)
                max_n = clamp * jnp.sqrt(
                    jnp.sum(data["orig"][idxs] ** 2) + 1e-12)
                factor = max_n / jnp.sqrt(jnp.sum(delta**2) + 1e-12)
                delta = jnp.where(sel_n > max_n,
                                  delta.at[idxs].set(sel * factor), delta)
                return (delta, opt_state), loss

            return jax.lax.scan(step, carry, keys)

        return jax.jit(run_chunk)

    return _cached_jit(("unet_edit.delta_opt", _unet_key(unet),
                        _sched_key(schedule), inject_path, conv_kind,
                        use_samp, objective, mu, v_lr, wd, clamp,
                        num_t_blocks, n_ts, P, side), build)


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
    (reference compute_delta_unet, compute_z.py:1778-1988):

    * latents are drawn from the image posterior ONCE (reference :1916
      encodes and samples before the step loop); noise/timesteps are fresh
      per step;
    * every batch element gets its OWN time-block index
      (``bisect(time_step_blocks, t)`` == ``t // block_size``, :1941);
    * objectives: esd (dest = empty prompts, target = dest − μ·(src −
      dest)); use_sampled_noise (target = true noise); default ablate
      (target = unedited model on ``request["dest_prompts"]``, :1955-1960);
    * MSE over the FULL eps map (the region enters only via the masked
      injection, :1952);
    * weight decay ``wd·|delta[idx]| / |orig[idx]|²`` against the
      region-mean original output, and a per-step L2 clamp at
      ``clamp·|orig[idx]|`` — including the reference's divisor quirk
      (:1975 scales by ``max_norm / delta.norm()``, the FULL delta norm).

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
    if hp.objective == "esd":
        dest_prompts = [""] * P
    elif "dest_prompts" in request:
        dest_prompts = request["dest_prompts"]
    elif "prompts" in request and "dest" in request:
        dest_prompts = [p.format(request["dest"]) for p in request["prompts"]]
    else:
        raise ValueError(
            "non-esd UNet region edits need request['dest_prompts'] "
            "(reference compute_z.py:1806)")
    ctx_dst = jnp.asarray(encode_prompts(components, dest_prompts))
    mean = jnp.asarray(latents_mean[0])
    logvar = jnp.asarray(latents_logvar[0])
    n_ts = components.schedule.num_train_timesteps
    block_size = n_ts // hp.num_t_blocks
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    rng, k_lat, k_orig = jax.random.split(rng, 3)

    # module spatial size from the traced shape (no compile needed)
    unet = components.unet
    ipath = _intermediate_path(final_name, kind)
    shape_tree = jax.eval_shape(
        lambda: unet.apply(
            {"params": components.unet_params}, mean,
            jnp.zeros((P,), jnp.int32), ctx, mutable=["intermediates"])[1])
    node = shape_tree["intermediates"]
    for pp in ipath:
        node = node[pp]
    out_shape = node[_SOW_OUT_LEAF[kind]][0].shape
    C_out = out_shape[-1]
    N = (out_shape[1] * out_shape[2] if len(out_shape) == 4
         else out_shape[1])
    side = int(np.sqrt(N))
    mask = jax.image.resize(
        jnp.asarray(region_mask, jnp.float32),
        (region_mask.shape[0], side, side), "nearest",
    ).reshape(region_mask.shape[0], N, 1)

    # ONE posterior draw (reference encodes + samples before the loop);
    # the original-output capture below shares it, per the reference
    latents0 = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        k_lat, mean.shape, mean.dtype)

    orig = capture_block_outputs(
        components, ctx, final_name, kind, latents0,
        mask, hp.num_t_blocks, k_orig)  # (num_t_blocks, C_out)

    opt = optax.adam(hp.v_lr)
    conv_kind = kind == "res-last-conv"
    use_samp = bool(getattr(hp, "use_sampled_noise", False))
    mu = (float(hp.esd_mu) if getattr(hp, "esd_mu", None)
          not in (None, "None") else 1.0)

    run_chunk = _delta_opt_chunk(
        unet, components.schedule, inject_path, conv_kind, use_samp,
        hp.objective, mu, float(hp.v_lr), float(hp.v_weight_decay),
        float(hp.clamp_norm_factor), hp.num_t_blocks, n_ts, P, side)

    data = dict(latents=latents0, ctx=ctx, ctx_dst=ctx_dst, mask=mask,
                orig=orig)

    delta = jnp.zeros((hp.num_t_blocks, C_out), jnp.float32)
    all_keys = jax.random.split(rng, hp.v_num_grad_steps)
    import os as _os

    chunk = max(1, min(int(_os.environ.get("EMCID_TPU_Z_CHUNK", 20)),
                       hp.v_num_grad_steps or 1))
    if jax.default_backend() not in ("cpu",):
        try:
            from emcid_tpu.profiling import unet_fwd_flops

            # esd: inject fwd+bwd + 2 plain fwds ≈ 4 fwd-equivalents;
            # use_sampled_noise: no plain fwd at all ≈ 2; default: 3
            fwd_eq = (4.0 if hp.objective == "esd"
                      else 2.0 if use_samp else 3.0)
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


def _region_inputs_sweep(unet, schedule, ipath: Tuple[str, ...], leaf: str):
    """Memoized jitted block-mean module-INPUT sweep for ``_region_io``
    (one compiled program per (unet config, schedule, tap) — the desired
    pass and every (layer, request) key pass reuse it instead of
    retracing a fresh closure per call)."""

    def build():
        def sweep(unet_params, latents0, ctx, ts_arr, keys):
            num_imgs = latents0.shape[0]

            def one(_, tk):
                t, key = tk
                noise = jax.random.normal(key, latents0.shape,
                                          latents0.dtype)
                ts = jnp.full((num_imgs,), t, jnp.int32)
                noisy = add_noise(schedule, latents0, noise, ts)
                _, state = unet.apply({"params": unet_params}, noisy, ts,
                                      ctx, mutable=["intermediates"])
                node = state["intermediates"]
                for pp in ipath:
                    node = node[pp]
                x = node[leaf][0].astype(jnp.float32)
                if x.ndim == 4:
                    x = x.reshape(x.shape[0], -1, x.shape[-1])
                return None, x

            _, xs = jax.lax.scan(one, None, (ts_arr.reshape(-1), keys))
            # (n_blocks, per_block, num_imgs, N, C_in) → block-mean
            xs = xs.reshape(ts_arr.shape + xs.shape[1:])
            return xs.mean(axis=1)

        return jax.jit(sweep)

    return _cached_jit(("unet_edit.region_in", _unet_key(unet),
                        _sched_key(schedule), ipath, leaf), build)


def _region_io(
    components: SDComponents,
    request: Dict,
    hparams,
    name: str,
    kind: str,
    lm: np.ndarray,
    lv: np.ndarray,
    region_mask: np.ndarray,
    rng: jax.Array,
    delta: Optional[np.ndarray] = None,
    num_step_per_block: int = 4,
):
    """Region keys / pre-fold outputs for ONE request at ONE module
    (reference get_module_input_output_at_regions, compute_ks.py:157-327):

    * latents drawn from the posterior ONCE; ``block_size //
      num_step_per_block``-strided timesteps per time block (untruncated
      range → 4 or 5 draws), fresh noise each (:183-256);
    * module INPUTS averaged over the block's draws, selected at the
      ksz-DILATED region points → keys ``(Npts, C_in)`` in (block, img,
      point) column order;
    * ``orig_pre_fold = keys @ W(out·k², in)^T + bias_rep`` (:262-273);
    * with ``delta``: masked per-block output delta, pre-folded
      (unfold/k² + 180° window rotation) and selected at the same points
      → ``desired = orig + delta_pf`` (:275-318).
    """
    hp = hparams
    prompts = [p.format(request["source"]) for p in request["prompts"]] \
        if "prompts" in request else request["source_prompts"]
    ctx = encode_prompts(components, prompts)
    mean = jnp.asarray(lm[0])
    logvar = jnp.asarray(lv[0])
    num_imgs = mean.shape[0]
    n_ts = components.schedule.num_train_timesteps
    n_blocks = hp.num_t_blocks
    block_size = n_ts // n_blocks
    # reference compute_ks.py:188-191: range(left, right, stride) with NO
    # truncation — ceil(block_size/stride) draws per block (5 when the
    # block size is not divisible by num_step_per_block); blocks are even
    # (get_accum_time_blocks), so every block has the same count
    stride = max(block_size // num_step_per_block, 1)
    ts_list = [list(range(b * block_size, (b + 1) * block_size, stride))
               for b in range(n_blocks)]

    rng, k_lat = jax.random.split(rng)
    latents0 = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        k_lat, mean.shape, mean.dtype)

    ipath = _intermediate_path(name, kind)
    leaf = _SOW_LEAF[kind]
    unet = components.unet
    sweep = _region_inputs_sweep(unet, components.schedule, ipath, leaf)

    ts_arr = jnp.asarray(ts_list, jnp.int32)  # (n_blocks, per_block)
    keys_rng = jnp.stack([jax.random.fold_in(rng, i)
                          for i in range(ts_arr.size)])
    inputs_b = np.asarray(sweep(components.unet_params, latents0, ctx,
                                ts_arr, keys_rng))
    N = inputs_b.shape[2]
    side = int(np.sqrt(N))

    w_mat, ksz, bias = _module_weight(components.unet_params, name, kind)
    w_mat = np.asarray(w_mat, np.float32)  # (out*k², in)
    C_in = w_mat.shape[1]
    mask = np.asarray(jax.image.resize(
        jnp.asarray(region_mask, jnp.float32),
        (region_mask.shape[0], side, side), "nearest"))
    in_mask = mask
    if ksz > 1:
        in_mask = np.asarray(dilate(jnp.asarray(mask), ksz))
    sel = in_mask.reshape(num_imgs, N) > 0.5  # same points for every block

    cols = []
    for b in range(n_blocks):
        for img in range(num_imgs):
            cols.append(inputs_b[b, img][sel[img]])
    l_inputs = np.concatenate(cols)  # (Npts, C_in)
    if bias is not None:
        bias_rep = np.repeat(np.asarray(bias, np.float32), ksz * ksz)
    else:
        bias_rep = 0.0
    orig_pf = l_inputs @ w_mat.T + bias_rep  # (Npts, out*k²)

    desired = None
    if delta is not None:
        delta = np.asarray(delta, np.float32)  # (n_blocks, C_out)
        C_out = delta.shape[1]
        out_delta = (mask.reshape(1, num_imgs, side, side, 1)
                     * delta[:, None, None, None, :]
                     ).reshape(n_blocks * num_imgs, side, side, C_out)
        if ksz > 1:
            pf = np.asarray(pre_fold_output_delta(
                jnp.asarray(out_delta), ksz))
        else:
            pf = out_delta
        pf = pf.reshape(n_blocks, num_imgs, N, -1)
        pf_cols = []
        for b in range(n_blocks):
            for img in range(num_imgs):
                pf_cols.append(pf[b, img][sel[img]])
        desired = orig_pf + np.concatenate(pf_cols)
    return l_inputs, orig_pf, desired


def execute_emcid_unet(
    components: SDComponents,
    requests: Sequence[Dict],
    hparams,
    deltas_star: Sequence[np.ndarray],
    region_masks: Sequence[np.ndarray],
    latents: Sequence[Tuple[np.ndarray, np.ndarray]],
    cov,
    mom2_weight=None,
    num_steps_per_block: int = 4,
    rng: Optional[jax.Array] = None,
    verbose: bool = True,
) -> Tuple[Dict, SDComponents]:
    """Insert the optimized final-layer deltas by editing the spreading
    sub-blocks (reference execute_emcid_unet, emcid_main.py:583-767):

    * the DESIRED pre-fold targets are computed ONCE at the final layer on
      the pristine model (delta pre-folded into the target, :680-685);
    * each spreading layer (earliest first = reversed(weights), :688)
      recomputes its keys AND its current pre-fold output on the
      PROGRESSIVELY EDITED model, so ``sources = desired − cur`` lets
      later layers compensate earlier edits' drift (:705-711);
    * ``resid = sources / (L − idx)`` spreads the residual (:736);
    * per-(block, img, region-point) columns — the time-block structure is
      NOT collapsed.

    deltas_star[i]: (num_t_blocks, C_out) per request; latents[i]:
    (mean, logvar) as (Simg, P, h, w, c); cov: (C_in, C_in) shared, or a
    {layer_name: cov} dict for per-layer statistics (the reference loads
    per-layer covs, :713-723).
    """
    hp = hparams
    lam = float(mom2_weight if mom2_weight is not None
                else hp.mom2_update_weight)
    layers = retrieve_spreading_layers(hp)
    final_name, final_coords = layers[0]
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    # desired pre-fold targets at the final layer, pristine model
    desired_cols = []
    for r, request in enumerate(requests):
        lm, lv = latents[r]
        _, _, desired = _region_io(
            components, request, hp, final_name, final_coords[2], lm, lv,
            region_masks[r], jax.random.fold_in(rng, r),
            delta=deltas_star[r], num_step_per_block=num_steps_per_block)
        desired_cols.append(desired)
    final_desired = np.concatenate(desired_cols).T.astype(np.float64)

    comps = components
    deltas_out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    n_layers = len(layers)
    # earliest module first (reference iterates reversed(weights), :688)
    for i, (name, coords) in enumerate(reversed(layers)):
        K_cols, cur_cols = [], []
        for r, request in enumerate(requests):
            lm, lv = latents[r]
            keys_r, cur_r, _ = _region_io(
                comps, request, hp, name, coords[2], lm, lv,
                region_masks[r], jax.random.fold_in(rng, r),
                num_step_per_block=num_steps_per_block)
            K_cols.append(keys_r)
            cur_cols.append(cur_r)
        K = np.concatenate(K_cols).T.astype(np.float64)  # (C_in, Npts)
        cur_pf = np.concatenate(cur_cols).T.astype(np.float64)
        sources = final_desired - cur_pf
        resid = sources / (n_layers - i)
        cov_l = cov[name] if isinstance(cov, dict) else cov
        adj_k = solve_adj_k(np.asarray(cov_l, np.float64), K, lam,
                            method="f64")
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
                  f"z error {float(np.linalg.norm(sources, axis=0).mean()):.4f}, "
                  f"upd norm {float(np.linalg.norm(upd)):.4f}")
    return deltas_out, comps

