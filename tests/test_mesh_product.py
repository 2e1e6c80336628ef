"""Sharded == unsharded parity for the PRODUCT paths that use the mesh
(SURVEY.md §2.4: data-parallel concept/image/caption axes over a 1-D mesh).

Three mesh consumers, each compared against its single-device result on the
8-virtual-device CPU mesh (conftest.py):
  * Stage-1 z optimization (concept axis)      — engine.editor
  * image generation (image batch axis)         — models.pipeline.generate
  * covariance caption sweep (caption axis)     — engine.layer_stats
"""

import numpy as np
import pytest

import jax

from emcid_tpu.engine.editor import compute_zs_for_requests
from emcid_tpu.engine.layer_stats import layer_stats_text_encoder
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline
from emcid_tpu.models.pipeline import generate
from emcid_tpu.parallel import get_mesh


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline()


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return get_mesh()


HP = dict(
    layers=[0, 1], clamp_norm_factor=1.5, layer_selection="all",
    fact_token="subject_last", v_num_grad_steps=3, v_lr=0.1,
    v_weight_decay=5e-4, mom2_adjustment=True, mom2_update_weight=100,
    rewrite_module_tmp="text_model.encoder.layers.{}.mlp.fc2",
    layer_module_tmp="text_model.encoder.layers.{}",
    mlp_module_tmp="text_model.encoder.layers.{}.mlp",
    attn_module_tmp="text_model.encoder.layers.{}.self_attn",
    ln_f_module="text_model.final_layer_norm",
    mom2_dataset="ccs_filtered", mom2_n_samples=100,
    mom2_dtype="float32", objective="ablate-dest", esd_mu="None",
)


def _requests(n):
    rng = np.random.RandomState(7)
    return [
        {"prompts": ["a photo of {}", "{}"], "source": f"w{i}",
         "dest": f"w{i + 1}", "seed_train": i,
         # pre-supplied training images -> no generation inside stage 1
         "images": [rng.rand(16, 16, 3).astype(np.float32) for _ in range(2)]}
        for i in range(n)
    ]


@pytest.mark.slow
def test_stage1_sharded_equals_unsharded(comps, mesh):
    hp = EMCIDHyperParams.from_dict(dict(HP))
    reqs = _requests(8)
    zs_single = compute_zs_for_requests(
        comps, reqs, hp, block_size=8, verbose=False)
    zs_mesh = compute_zs_for_requests(
        comps, reqs, hp, block_size=8, mesh=mesh, verbose=False)
    assert zs_mesh.shape == zs_single.shape
    # iterative optimization: sharded reduction order drifts a few ulps
    # per forward, and Adam's normalization amplifies that along the
    # trajectory (observed: 3e-3 rel on 1/256 elements after 3 steps).  A
    # sharding BUG (wrong data on a shard) produces O(1) differences, so a
    # loose trajectory-level tolerance still catches what matters.
    np.testing.assert_allclose(zs_mesh, zs_single, rtol=5e-3, atol=5e-4)


@pytest.mark.slow
def test_stage1_mesh_pads_odd_block(comps, mesh):
    """6 concepts on an 8-device mesh: the block pads, results drop the pad."""
    hp = EMCIDHyperParams.from_dict(dict(HP))
    reqs = _requests(6)
    zs_single = compute_zs_for_requests(
        comps, reqs, hp, block_size=8, verbose=False)
    zs_mesh = compute_zs_for_requests(
        comps, reqs, hp, block_size=6, mesh=mesh, verbose=False)
    assert zs_mesh.shape[0] == 6
    np.testing.assert_allclose(zs_mesh, zs_single, rtol=5e-3, atol=5e-4)


def test_generate_sharded_equals_unsharded(comps, mesh):
    prompts = [f"a photo of w{i}" for i in range(8)]
    seeds = list(range(8))
    kw = dict(num_inference_steps=2, guidance_scale=7.5, height=16, width=16,
              sampler="ddim")
    imgs_single = generate(comps, prompts, seeds, batch_size=8, **kw)
    imgs_mesh = generate(comps, prompts, seeds, batch_size=8, mesh=mesh, **kw)
    assert imgs_mesh.shape == imgs_single.shape
    # uint8 images: allow 1-count rounding flips from reduction-order diffs
    assert np.abs(imgs_mesh.astype(int) - imgs_single.astype(int)).max() <= 1


def test_generate_mesh_pads_short_batch(comps, mesh):
    prompts = [f"a photo of w{i}" for i in range(5)]
    seeds = list(range(5))
    kw = dict(num_inference_steps=2, guidance_scale=7.5, height=16, width=16,
              sampler="ddim")
    imgs_single = generate(comps, prompts, seeds, batch_size=5, **kw)
    imgs_mesh = generate(comps, prompts, seeds, batch_size=5, mesh=mesh, **kw)
    assert imgs_mesh.shape == imgs_single.shape
    assert np.abs(imgs_mesh.astype(int) - imgs_single.astype(int)).max() <= 1


def test_layer_stats_sharded_equals_unsharded(comps, mesh, tmp_path):
    captions = [f"a photo of w{i % 30}" for i in range(25)]
    layer_name = "text_model.encoder.layers.1.mlp.fc2"
    kw = dict(stats_dir=tmp_path, ds_name="x", sample_size=None,
              batch_size=6, force_recompute=True)
    s_single = layer_stats_text_encoder(
        comps.text_encoder, comps.text_params, comps.tokenizer, layer_name,
        captions=captions, **kw)
    s_mesh = layer_stats_text_encoder(
        comps.text_encoder, comps.text_params, comps.tokenizer, layer_name,
        captions=captions, mesh=mesh, **kw)
    assert s_mesh.mom2.count == s_single.mom2.count
    np.testing.assert_allclose(
        np.asarray(s_mesh.mom2.moment()), np.asarray(s_single.mom2.moment()),
        rtol=1e-5, atol=1e-7)
