"""UNet region-edit mode: layer walk, conv-as-matmul math, delta
optimization, spread insert."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.engine.unet_edit import (
    backward_const_res_single,
    capture_module_inputs,
    compute_delta_unet,
    conv_weight_as_matrix,
    dilate,
    execute_emcid_unet,
    list2name,
    matrix_as_conv_weight,
    pre_fold_output_delta,
    retrieve_spreading_layers,
)
from emcid_tpu.hparams import UNetEMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline
from emcid_tpu.models.pipeline import generate


def test_layer_walk_sd_shapes():
    # up_blocks.3 attn-out sub 2 → walks back through res convs / attn-outs
    layer = ["up_blocks", 3, "attn-out", 2]
    back = backward_const_res_single(layer)
    assert back == ["up_blocks", 3, "res-last-conv", 2]
    back2 = backward_const_res_single(back)
    assert back2 == ["up_blocks", 3, "attn-out", 1]
    assert list2name(layer) == (
        "up_blocks.3.attentions.2.transformer_blocks.0.attn2.to_out.0")
    assert list2name(back) == "up_blocks.3.resnets.2.conv2"
    # mid block naming drops the index
    assert list2name(["mid_block", 0, "attn-out", 0]) == (
        "mid_block.attentions.0.transformer_blocks.0.attn2.to_out.0")
    # sampler boundaries raise
    with pytest.raises(ValueError):
        backward_const_res_single(["up_blocks", 1, "upsampler-conv", 0])


def test_retrieve_spreading_layers():
    hp = _hp(final_layer=["up_blocks", 3, "attn-out"], spread_sub_block_cnt=4)
    layers = retrieve_spreading_layers(hp)
    # only attn-out kind retained
    assert all(c[2] == "attn-out" for _, c in layers)
    assert layers[0][1][3] == 2 and len(layers) == 3  # attn-out 2,1,0


def test_dilate():
    m = jnp.zeros((1, 5, 5)).at[0, 2, 2].set(1.0)
    d = dilate(m, 3)
    assert float(d.sum()) == 9.0
    assert float(d[0, 0, 0]) == 0.0


def test_conv_matrix_roundtrip(rng):
    kern = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    mat = conv_weight_as_matrix(kern)
    assert mat.shape == (16 * 9, 8)
    back = matrix_as_conv_weight(mat, 3, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(kern))


def test_pre_fold_delta_folds_back(rng):
    """Folding the pre-fold delta must reconstruct the (interior of the)
    original output delta: sum over the k² window with 180° rotation is the
    transpose of the conv fold."""
    ksz = 3
    delta = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    pf = pre_fold_output_delta(delta, ksz)  # (1, 8, 8, 4*9)
    p = np.asarray(pf).reshape(1, 8, 8, 4, 3, 3)
    # fold: out[y, x] = sum_{dy,dx} p[y+dy-1, x+dx-1, :, dy, dx] after the
    # rotation this reconstructs delta (interior points see all 9 windows)
    # fold: out[q] = sum_k PF[q + k - 1][c, k] — the 180° rotation is baked
    # into the pre-fold tensor itself (tap k's contribution from position p
    # lands at q = p - (k-1))
    rec = np.zeros((8, 8, 4), np.float32)
    for y in range(1, 7):
        for x in range(1, 7):
            acc = 0
            for dy in range(3):
                for dx in range(3):
                    acc += p[0, y + dy - 1, x + dx - 1, :, dy, dx]
            rec[y, x] = acc
    np.testing.assert_allclose(rec[1:7, 1:7], np.asarray(delta[0, 1:7, 1:7]),
                               atol=1e-5)


def _hp(**over):
    d = {
        "final_layer": ["up_blocks", 1, "attn-out"],
        "spread_sub_block_cnt": 2,
        "skip_res_conv": False,
        "v_reduce_inside_img": True,
        "v_reduce_for_concept": True,
        "gloabl_sample": True,
        "num_t_blocks": 2,
        "even_sample": True,
        "v_num_grad_steps": 2,
        "v_lr": 0.05,
        "v_weight_decay": 5e-4,
        "clamp_norm_factor": 1.5,
        "objective": "ablate-source",
        "esd_mu": None,
        "mom2_update_weight": 100,
        "rewrite_module_tmp": {
            "mlp": "{}.{}.attentions.{}.transformer_blocks.0.ff.net.2",
            "conv-res": "{}.{}.resnets.{}.conv2",
            "conv-sample": "{}.{}.{}.0.conv",
        },
        "mom2_dataset": "css_filtered",
        "mom2_n_samples_prompts": 10,
        "mom2_n_steps_per_prompt": 2,
        "mom2_dtype": "float32",
    }
    d.update(over)
    return UNetEMCIDHyperParams.from_dict(d)


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(words=["cat", "dog"])


REQ = {"prompts": ["a photo of a {}"], "source": "cat", "dest": "",
       "seed_train": 0}


def _tiny_walk_hp(**over):
    """Tiny UNet: up_blocks has 2 levels, level 1 is CrossAttn with
    layers_per_block+1 = 2 sub-blocks."""
    import emcid_tpu.engine.unet_edit as ue

    return _hp(final_layer=["up_blocks", 1, "attn-out", 1],
               spread_sub_block_cnt=2, **over)


def test_capture_module_inputs(comps, rng):
    hp = _tiny_walk_hp()
    mean = rng.randn(1, 1, 8, 8, 4).astype(np.float32) * 0.18
    logvar = np.full(mean.shape, -6.0, np.float32)
    name, coords = retrieve_spreading_layers(hp)[0]
    inputs = capture_module_inputs(comps, REQ, name, coords[2], [0, 500],
                                   mean, logvar)
    assert inputs.shape == (1, 64, 32)  # 8x8 spatial at level-0 res, C=32


@pytest.mark.slow
def test_unet_edit_conv_kind_and_objectives(comps, rng, monkeypatch):
    """Regressions from the round-4 review: (a) a conv-kind final layer
    must not crash (the old (B, N, C) injection could not broadcast onto
    the NHWC conv output); (b) use_sampled_noise and the default dest-
    prompt target are distinct objectives (reference compute_z.py:
    1952-1960)."""
    import jax as _jax

    import emcid_tpu.engine.unet_edit as ue

    monkeypatch.setattr(ue, "_NUM_UP", 2)
    monkeypatch.setattr(ue, "_NUM_DOWN", 2)
    mean = rng.randn(1, 1, 8, 8, 4).astype(np.float32) * 0.18
    logvar = np.full(mean.shape, -6.0, np.float32)
    region = np.zeros((1, 8, 8), np.float32)
    region[0, 2:6, 2:6] = 1.0

    hp_conv = _hp(final_layer=["up_blocks", 1, "res-last-conv", 1],
                  spread_sub_block_cnt=2)
    d_conv = compute_delta_unet(comps, REQ, hp_conv, mean, logvar, region,
                                rng=_jax.random.PRNGKey(0), verbose=False)
    assert np.isfinite(d_conv).all() and np.abs(d_conv).sum() > 0

    hp = _tiny_walk_hp()
    d_dest = compute_delta_unet(comps, REQ, hp, mean, logvar, region,
                                rng=_jax.random.PRNGKey(0), verbose=False)
    d_noise = compute_delta_unet(
        comps, REQ, _tiny_walk_hp(use_sampled_noise=True), mean, logvar,
        region, rng=_jax.random.PRNGKey(0), verbose=False)
    assert not np.allclose(d_dest, d_noise)


@pytest.mark.slow
def test_unet_edit_end_to_end(comps, rng, monkeypatch):
    import emcid_tpu.engine.unet_edit as ue

    # tiny UNet walk: patch block counts to the tiny architecture
    monkeypatch.setattr(ue, "_NUM_UP", 2)
    monkeypatch.setattr(ue, "_NUM_DOWN", 2)
    hp = _tiny_walk_hp()
    mean = rng.randn(1, 1, 8, 8, 4).astype(np.float32) * 0.18
    logvar = np.full(mean.shape, -6.0, np.float32)
    region = np.zeros((1, 8, 8), np.float32)
    region[0, 2:6, 2:6] = 1.0

    delta = compute_delta_unet(comps, REQ, hp, mean, logvar, region,
                               verbose=False)
    assert delta.shape == (2, 32) and np.isfinite(delta).all()
    assert np.abs(delta).sum() > 0

    A = rng.randn(100, 32).astype(np.float32)
    cov = A.T @ A / 100
    deltas, edited = execute_emcid_unet(
        comps, [REQ], hp, [delta], [region], [(mean, logvar)], cov,
        verbose=False)
    assert len(deltas) >= 1
    kw = dict(num_inference_steps=2, height=16, width=16)
    assert not np.array_equal(
        generate(comps, ["a photo of a cat"], [1], **kw),
        generate(edited, ["a photo of a cat"], [1], **kw))
