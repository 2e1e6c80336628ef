"""Debias engine (factor search + blended insert), FIM stats, debias eval."""

import csv

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.engine.debias import (
    apply_emcid_to_text_encoder_debias,
    classify_ratio,
    get_factors,
)
from emcid_tpu.engine.fim import fim_filename, fim_stats, load_fim
from emcid_tpu.evals.debias_eval import eval_ratios, generate_debias_eval_imgs
from emcid_tpu.evals.debias_shared import ratio_delta
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline
from emcid_tpu.models.vision import CLIPScorer, CLIPVisionEncoder, TINY_CLIP_VISION


def _hp(layers=(3,), **over):
    d = {
        "layers": list(layers), "clamp_norm_factor": 1.5,
        "layer_selection": "all", "fact_token": "subject_last",
        "v_num_grad_steps": 2, "v_lr": 0.1, "v_weight_decay": 5e-4,
        "mom2_adjustment": True, "mom2_update_weight": 100,
        "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
        "layer_module_tmp": "text_model.encoder.layers.{}",
        "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
        "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
        "ln_f_module": "text_model.final_layer_norm",
        "mom2_dataset": "ccs_filtered", "mom2_n_samples": 30,
        "mom2_dtype": "float32", "objective": "ablate-dest",
        "esd_mu": "None",
    }
    d.update(over)
    return EMCIDHyperParams.from_dict(d)


@pytest.fixture(scope="module")
def world():
    comps = build_tiny_pipeline(
        words=["nurse", "female", "male", "doctor", "person"]
    )
    import dataclasses

    from emcid_tpu.models.clip_text import CLIPTextEncoder

    vision = CLIPVisionEncoder(TINY_CLIP_VISION)
    vp = vision.init_params(jax.random.PRNGKey(5))
    text_cfg = dataclasses.replace(comps.text_encoder.config, projection_dim=16)
    text = CLIPTextEncoder(text_cfg)
    tp = text.init_params(jax.random.PRNGKey(6), seq_len=32)
    scorer = CLIPScorer(text, tp, vision, vp, comps.tokenizer)
    return comps, scorer


def _covs(n, dim=64, seed=3):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        A = rng.randn(200, dim).astype(np.float32)
        out.append(A.T @ A / 200)
    return out


def test_classify_ratio(world, rng):
    comps, scorer = world
    imgs = rng.randint(0, 255, (8, 32, 32, 3)).astype(np.uint8)
    ratios = classify_ratio(scorer, imgs, ["a female nurse", "a male nurse"])
    assert len(ratios) == 2
    np.testing.assert_allclose(sum(ratios), 1.0, atol=1e-6)


def test_ratio_delta():
    assert ratio_delta(0.5) == 0.0
    assert ratio_delta(1.0) == 1.0
    assert ratio_delta(0.25) == 0.5


@pytest.mark.slow
def test_get_factors_converges_structurally(world, rng):
    """Factor search runs, keeps factors normalized, and never mutates the
    caller's components."""
    comps, scorer = world
    hp = _hp()
    zs = [rng.randn(1, 32).astype(np.float32) * 0.1 for _ in range(2)]
    reqs = [
        {"prompts": ["an image of {}"], "source": "nurse",
         "dest": d, "seed": 5}
        for d in ("a female nurse", "a male nurse")
    ]
    params_before = jax.tree.map(lambda x: np.asarray(x), comps.text_params)
    factors = get_factors(
        comps, scorer, hp, zs, reqs, _covs(1), num_samples=4, max_iter=2,
        gen_kwargs=dict(num_inference_steps=2, height=16, width=16),
        verbose=False,
    )
    assert len(factors) == 2
    np.testing.assert_allclose(sum(factors), 1.0, atol=1e-6)
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(comps.text_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_get_factors_v0_structural(world, rng, monkeypatch):
    """Legacy v0 search: runs the multi-seed protocol, keeps factors
    normalized, never mutates the caller's components, and its seed list
    reproduces the reference's random.sample draw (checked against the
    seeds actually handed to generate(), not against the stdlib)."""
    import random

    import emcid_tpu.engine.debias as debias_mod
    from emcid_tpu.engine.debias import get_factors_v0

    comps, scorer = world
    seen_seed_lists = []
    real_generate = debias_mod.generate

    def spy_generate(components, prompts, seeds, **kw):
        seen_seed_lists.append(list(seeds))
        return real_generate(components, prompts, seeds, **kw)

    monkeypatch.setattr(debias_mod, "generate", spy_generate)
    hp = _hp()
    zs = [rng.randn(1, 32).astype(np.float32) * 0.1 for _ in range(2)]
    reqs = [
        {"prompts": ["an image of {}"], "source": "nurse",
         "dest": d, "seed": 5}
        for d in ("a female nurse", "a male nurse")
    ]
    params_before = jax.tree.map(lambda x: np.asarray(x), comps.text_params)
    factors = get_factors_v0(
        comps, scorer, hp, zs, reqs, _covs(1), num_samples=2, num_seeds=2,
        max_iter=2, gen_kwargs=dict(num_inference_steps=2, height=16,
                                    width=16),
        verbose=False,
    )
    assert len(factors) == 2
    np.testing.assert_allclose(sum(factors), 1.0, atol=1e-6)
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(comps.text_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # seed-list parity with reference emcid_main.py:1574-1576: the REQUEST
    # seed (5) must seed random.sample(range(100000), num_seeds), and each
    # sampled seed expands to num_samples per-image seeds seed*N+i —
    # asserted on the seeds generate() actually received
    expected_seeds = random.Random(5).sample(range(100000), 2)
    expected_lists = [[s * 2 + i for i in range(2)] for s in expected_seeds]
    per_iter = len(expected_lists)
    assert len(seen_seed_lists) % per_iter == 0 and seen_seed_lists
    for it_start in range(0, len(seen_seed_lists), per_iter):
        assert seen_seed_lists[it_start:it_start + per_iter] == expected_lists


@pytest.mark.slow
def test_apply_debias_end_to_end(world, tmp_path):
    comps, scorer = world
    hp = _hp()
    requests = [{
        "prompts": ["an image of {}"], "source": "nurse",
        "dests": ["a female nurse", "a male nurse"], "seed_train": 3,
        "seed": 3,
    }]
    edited, deltas, factors = apply_emcid_to_text_encoder_debias(
        comps, requests, hp, scorer,
        max_iter=1, num_samples=4, num_inference_steps=2,
        gen_kwargs=dict(num_inference_steps=2, height=16, width=16),
        stats_dir=tmp_path, verbose=False,
    )
    assert len(factors) == 1 and len(factors[0]) == 2
    name = hp.rewrite_module_tmp.format(hp.layers[0]) + ".weight"
    assert name in deltas
    from emcid_tpu.models.naming import get_weight

    assert not np.allclose(
        np.asarray(get_weight(edited.text_params, name[:-7])),
        np.asarray(get_weight(comps.text_params, name[:-7])),
    )


def test_debias_eval_csv(world, tmp_path):
    comps, scorer = world
    prompts = ["an image of nurse"]
    generate_debias_eval_imgs(
        comps, prompts, tmp_path / "imgs", imgs_per_prompt=2, num_seeds=2,
        gen_kwargs=dict(num_inference_steps=2, height=16, width=16),
    )
    assert len(list((tmp_path / "imgs").rglob("*.png"))) == 4
    professions = [{
        "source": "nurse", "dests": ["a female nurse", "a male nurse"],
        "val_prompts": prompts,
    }]
    deltas = eval_ratios(scorer, professions, tmp_path / "imgs",
                         tmp_path / "ratios.csv", num_seeds=2,
                         imgs_per_prompt=2)
    rows = list(csv.reader(open(tmp_path / "ratios.csv")))
    assert rows[0] == ["profession", "delta_mean", "delta_std"]
    assert rows[-1][0] == "total"
    assert 0.0 <= deltas["nurse"] <= 1.0


def test_fim_stats_and_cache(world, tmp_path, rng):
    comps, _ = world
    module_name = "text_model.encoder.layers.2.mlp.fc2"
    covs = _covs(1)[0]
    pairs = [
        (rng.rand(16, 16, 3).astype(np.float32) * 2 - 1, "an image of nurse"),
        (rng.rand(16, 16, 3).astype(np.float32) * 2 - 1, "a male doctor"),
    ]
    stat = fim_stats(
        comps, module_name, pairs, covs, mom2_weight=100,
        t_steps_per_pair=2, stats_dir=tmp_path, sample_size=2,
    )
    fim = np.asarray(stat.mean.mean())
    assert fim.shape == (32,)
    assert np.isfinite(fim).all() and (fim >= 0).all()
    f = fim_filename(tmp_path, "text_encoder", "ccs_filtered", module_name,
                     "float32", 2, 2)
    assert f.exists()
    loaded = load_fim(f)
    np.testing.assert_allclose(loaded, fim, rtol=1e-6)
