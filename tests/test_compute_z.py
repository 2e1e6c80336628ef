"""Stage-1 z optimization: loss descent, clamp, objectives, determinism,
record/replay, and the training-image latents helper."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.engine.compute_z import (
    ConceptBatch,
    ZOptimizer,
    compute_z_text_encoder_batch,
    prepare_concept_batch,
)
from emcid_tpu.engine.training_images import (
    encode_posterior,
    preprocess_images,
    training_latents_for_requests,
)
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models import CLIPTextEncoder, TINY_TEXT
from emcid_tpu.models.configs import tiny_unet, tiny_vae
from emcid_tpu.models.pipeline import SDComponents
from emcid_tpu.models.scheduler import sd_schedule
from emcid_tpu.models.unet import UNet2DCondition
from emcid_tpu.models.vae import AutoencoderKL
from emcid_tpu.text import make_tiny_tokenizer

WORDS = ["a", "photo", "of", "an", "image", "cat", "dog", "tench", "goldfish"]


def make_hp(**over):
    base = {
        "layers": [0, 1],
        "clamp_norm_factor": 1.5,
        "layer_selection": "all",
        "fact_token": "subject_last",
        "v_num_grad_steps": 12,
        "v_lr": 0.05,
        "v_weight_decay": 5e-4,
        "mom2_adjustment": True,
        "mom2_update_weight": 100,
        "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
        "layer_module_tmp": "text_model.encoder.layers.{}",
        "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
        "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
        "ln_f_module": "text_model.final_layer_norm",
        "mom2_dataset": "ccs_filtered",
        "mom2_n_samples": 100,
        "mom2_dtype": "float32",
        "objective": "ablate-dest",
        "esd_mu": "None",
        "cal_text_repr_loss": True,
        "text_repr_loss_scale_factor": 0.01,
    }
    base.update(over)
    return EMCIDHyperParams.from_dict(base)


REQUESTS = [
    {"prompts": ["a photo of a {}", "an image of a {}"],
     "source": "cat", "dest": "dog", "seed_train": 0},
    {"prompts": ["a photo of a {}", "an image of a {}"],
     "source": "tench", "dest": "goldfish", "seed_train": 1},
]


@pytest.fixture(scope="module")
def setup():
    tok = make_tiny_tokenizer(WORDS, model_max_length=16)
    text = CLIPTextEncoder(TINY_TEXT)
    tp = text.init_params(jax.random.PRNGKey(0), seq_len=16)
    unet = UNet2DCondition(tiny_unet(cross_attention_dim=32))
    up = unet.init_params(jax.random.PRNGKey(1), context_len=16)
    sched = sd_schedule()
    return tok, text, tp, unet, up, sched


def _latents(C=2, Simg=1, P=2, hw=8, seed=0):
    rng = np.random.RandomState(seed)
    mean = rng.randn(C, Simg, P, hw, hw, 4).astype(np.float32) * 0.2
    logvar = np.full((C, Simg, P, hw, hw, 4), -6.0, dtype=np.float32)
    return mean, logvar


def test_prepare_concept_batch(setup):
    tok, *_ = setup
    hp = make_hp()
    arrays, src, dst = prepare_concept_batch(tok, REQUESTS, hp)
    assert arrays["source_ids"].shape == (2, 2, 16)
    assert arrays["inject_mask"].shape == (2, 1, 2, 16)
    # mask marks exactly one token per prompt, at the subject token
    for c in range(2):
        for p in range(2):
            idx = arrays["inject_mask"][c, 0, p].nonzero()[0]
            assert len(idx) == 1
            assert idx[0] == arrays["source_lookup"][c, p]
            subj = REQUESTS[c]["source"]
            assert tok.decode([int(arrays["source_ids"][c, p, idx[0]])]) == subj
    assert src[0][0] == "a photo of a cat"
    assert dst[1][1] == "an image of a goldfish"


@pytest.mark.slow
def test_z_optimization_descends_and_clamps(setup):
    tok, text, tp, unet, up, sched = setup
    hp = make_hp(v_num_grad_steps=15)
    mean, logvar = _latents()
    zs, losses = compute_z_text_encoder_batch(
        text, tp, unet, up, sched, tok, REQUESTS, hp, hp.layers[-1],
        mean, logvar, rng=jax.random.PRNGKey(0), verbose=False,
    )
    assert zs.shape == (2, 1, 32)
    # averaged loss over the last third is below the first third (noisy
    # mini-batch objective, so compare means)
    third = len(losses) // 3
    assert losses[-third:].mean() < losses[:third].mean()
    # z differs from z0 and delta obeys the clamp
    arrays, _, _ = prepare_concept_batch(tok, REQUESTS, hp)
    out0 = text.apply({"params": tp}, jnp.asarray(arrays["source_ids"][:, 0]),
                      capture=("layer_out",), stop_at_layer=1)
    l0 = np.asarray(out0.taps["layer_out"][1])
    z0 = np.stack([l0[c, arrays["source_lookup"][c, 0]] for c in range(2)])[:, None]
    delta = zs - z0
    assert np.linalg.norm(delta) > 1e-4
    for c in range(2):
        assert (np.linalg.norm(delta[c]) <=
                hp.clamp_norm_factor * np.linalg.norm(z0[c]) + 1e-4)


@pytest.mark.slow
def test_z_optimization_deterministic(setup):
    tok, text, tp, unet, up, sched = setup
    hp = make_hp(v_num_grad_steps=5)
    mean, logvar = _latents()
    kw = dict(rng=jax.random.PRNGKey(7), verbose=False)
    z1, l1 = compute_z_text_encoder_batch(
        text, tp, unet, up, sched, tok, REQUESTS, hp, 1, mean, logvar, **kw)
    z2, l2 = compute_z_text_encoder_batch(
        text, tp, unet, up, sched, tok, REQUESTS, hp, 1, mean, logvar, **kw)
    np.testing.assert_array_equal(z1, z2)
    np.testing.assert_array_equal(l1, l2)


@pytest.mark.parametrize("objective,extra", [
    ("esd", {"esd_mu": 1.0}),
    ("ablate-source", {}),
    ("ablate-dest", {"use_sampled_noise": True}),
    ("ablate-dest", {"no_noise_loss": True}),
    ("ablate-dest", {"align_object_token": True}),
])
@pytest.mark.slow
def test_objective_variants_run(setup, objective, extra):
    tok, text, tp, unet, up, sched = setup
    hp = make_hp(objective=objective, v_num_grad_steps=3, **extra)
    mean, logvar = _latents()
    zs, losses = compute_z_text_encoder_batch(
        text, tp, unet, up, sched, tok, REQUESTS, hp, 1, mean, logvar,
        rng=jax.random.PRNGKey(0), verbose=False,
    )
    assert np.isfinite(zs).all() and np.isfinite(losses).all()


def test_ewc_requires_fim_and_runs(setup):
    tok, text, tp, unet, up, sched = setup
    hp = make_hp(use_ewc=True, ewc_lambda=10.0, v_num_grad_steps=3)
    mean, logvar = _latents()
    with pytest.raises(ValueError):
        compute_z_text_encoder_batch(
            text, tp, unet, up, sched, tok, REQUESTS, hp, 1, mean, logvar,
            verbose=False,
        )
    fim = np.ones((32,), np.float32) * 0.1
    zs, _ = compute_z_text_encoder_batch(
        text, tp, unet, up, sched, tok, REQUESTS, hp, 1, mean, logvar,
        fim=fim, verbose=False,
    )
    assert np.isfinite(zs).all()


def test_record_replay_noise_override(setup):
    """Supplying the (noise, timestep) sequence pins the stochastic path —
    the RNG-parity seam for cross-implementation comparison (SURVEY.md §7)."""
    tok, text, tp, unet, up, sched = setup
    hp = make_hp(v_num_grad_steps=4, cal_text_repr_loss=False)
    mean, logvar = _latents()
    arrays, _, _ = prepare_concept_batch(tok, REQUESTS, hp)
    batch = ConceptBatch(
        source_ids=jnp.asarray(arrays["source_ids"]),
        dest_ids=jnp.asarray(arrays["dest_ids"]),
        inject_mask=jnp.asarray(arrays["inject_mask"]),
        source_lookup=jnp.asarray(arrays["source_lookup"]),
        dest_lookup=jnp.asarray(arrays["dest_lookup"]),
        latents_mean=jnp.asarray(mean),
        latents_logvar=jnp.asarray(logvar * 0 - 30.0),  # ~deterministic post.
    )
    rngnp = np.random.RandomState(0)
    noise = jnp.asarray(rngnp.randn(4, 2, 2, 8, 8, 4).astype(np.float32))
    ts = jnp.asarray(rngnp.randint(0, 1000, (4, 2, 2)).astype(np.int32))
    optz = ZOptimizer(text, unet, sched, hp, 1)
    z1, *_ = optz.run(tp, up, batch, jax.random.PRNGKey(0),
                      noise_override=noise, ts_override=ts)
    z2, *_ = optz.run(tp, up, batch, jax.random.PRNGKey(99),
                      noise_override=noise, ts_override=ts)
    # different rng keys, same overrides → (near-)identical trajectory;
    # remaining rng use is only the posterior sample, pinned by logvar=-30
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)


def test_training_latents_from_request_images(setup):
    tok, text, tp, unet, up, sched = setup
    vae = AutoencoderKL(tiny_vae())
    vp = vae.init_params(jax.random.PRNGKey(3), image_size=16)
    comps = SDComponents(
        tokenizer=tok, text_encoder=text, text_params=tp,
        unet=unet, unet_params=up, vae=vae, vae_params=vp, vae_scale=2,
    )
    imgs = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    reqs = [dict(r, images=list(imgs)) for r in REQUESTS]
    hp = make_hp()
    mean, logvar = training_latents_for_requests(comps, reqs, hp, height=16,
                                                 width=16)
    assert mean.shape == (2, 1, 2, 8, 8, 4)
    assert np.isfinite(mean).all()


def test_training_latents_generated(setup):
    tok, text, tp, unet, up, sched = setup
    vae = AutoencoderKL(tiny_vae())
    vp = vae.init_params(jax.random.PRNGKey(3), image_size=16)
    comps = SDComponents(
        tokenizer=tok, text_encoder=text, text_params=tp,
        unet=unet, unet_params=up, vae=vae, vae_params=vp, vae_scale=2,
    )
    hp = make_hp()
    mean, logvar = training_latents_for_requests(
        comps, REQUESTS, hp, height=16, width=16, num_inference_steps=2,
    )
    assert mean.shape == (2, 1, 2, 8, 8, 4)
    # reproducible (seeded)
    mean2, _ = training_latents_for_requests(
        comps, REQUESTS, hp, height=16, width=16, num_inference_steps=2,
    )
    np.testing.assert_array_equal(mean, mean2)


def test_preprocess_images_range():
    arr = preprocess_images([np.full((4, 4, 3), 255, np.uint8)])
    np.testing.assert_allclose(arr, 1.0, atol=1e-6)
    arr = preprocess_images([np.zeros((4, 4, 3), np.uint8)])
    np.testing.assert_allclose(arr, -1.0, atol=1e-6)


def test_optimizer_memo_reuses_programs():
    """Per-request benchmark loops must not re-trace Stage-1: the editor's
    optimizer memo returns the same compiled ZOptimizer for repeated calls
    with equal (configs, hparams) and distinct ones when the program-
    shaping knobs change."""
    from emcid_tpu.engine.editor import _get_optimizer
    from emcid_tpu.models.loader import build_tiny_pipeline

    comps = build_tiny_pipeline(seed=0, words=["cat", "dog"])
    hp = make_hp()

    a = _get_optimizer(comps, hp, eps_pool=0)
    b = _get_optimizer(comps, hp, eps_pool=0)
    assert a is b
    c = _get_optimizer(comps, hp, eps_pool=4)
    assert c is not a
    # fim is baked into the trace as a constant -> never memoized
    import numpy as np

    H = comps.text_encoder.config.hidden_size
    d = _get_optimizer(comps, hp, fim=np.ones((H,), np.float32))
    e = _get_optimizer(comps, hp, fim=np.ones((H,), np.float32))
    assert d is not e


def _concept_batch(tok, hp, mean, logvar):
    arrays, _, _ = prepare_concept_batch(tok, REQUESTS, hp)
    return ConceptBatch(
        source_ids=jnp.asarray(arrays["source_ids"]),
        dest_ids=jnp.asarray(arrays["dest_ids"]),
        inject_mask=jnp.asarray(arrays["inject_mask"]),
        source_lookup=jnp.asarray(arrays["source_lookup"]),
        dest_lookup=jnp.asarray(arrays["dest_lookup"]),
        latents_mean=jnp.asarray(mean),
        latents_logvar=jnp.asarray(logvar),
    )


def test_remat_level0_matches_none(setup):
    """Selective remat ("level0": recompute only the full-resolution block
    interiors via the checkpoint_name seams) must be a pure memory/compute
    trade — the optimization trajectory matches remat="none"."""
    tok, text, tp, unet, up, sched = setup
    hp = make_hp(v_num_grad_steps=4)
    mean, logvar = _latents()
    batch = _concept_batch(tok, hp, mean, logvar)
    outs = {}
    for remat in ("none", "level0"):
        optz = ZOptimizer(text, unet, sched, hp, layer=hp.layers[-1],
                          remat=remat)
        zs, delta, z0, losses = optz.run(tp, up, batch, jax.random.PRNGKey(3))
        outs[remat] = (np.asarray(zs), np.asarray(losses))
    np.testing.assert_allclose(outs["level0"][0], outs["none"][0],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(outs["level0"][1], outs["none"][1],
                               rtol=2e-4, atol=2e-5)


def test_remat_tag_off_leaves_jaxpr_unchanged(setup):
    """remat_tag_hw=0 (the default everywhere outside remat="level0") must
    not insert name primitives — compiled-program cache keys stay stable."""
    _, _, _, unet, up, _ = setup
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 16, 32))

    plain = jax.make_jaxpr(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c).sample
    )(up, x, t, ctx)
    assert "unet_interior" not in str(plain)

    tagged = jax.make_jaxpr(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c,
                                      remat_tag_hw=8).sample
    )(up, x, t, ctx)
    assert "unet_interior" in str(tagged)


@pytest.mark.slow
def test_hbm_fallback_ladder(setup):
    """HBM exhaustion escalates remat none -> level0 -> full, retrying the
    SAME chunk with the SAME rng key (trajectory identical to a run that fit
    from the start)."""
    tok, text, tp, unet, up, sched = setup
    hp = make_hp(v_num_grad_steps=3)
    mean, logvar = _latents()
    batch = _concept_batch(tok, hp, mean, logvar)

    ref = ZOptimizer(text, unet, sched, hp, layer=hp.layers[-1], remat="none")
    zs_ref, *_ = ref.run(tp, up, batch, jax.random.PRNGKey(5))

    for start, expect in (("none", "level0"), ("level0", "full")):
        optz = ZOptimizer(text, unet, sched, hp, layer=hp.layers[-1],
                          remat=start)
        real_run = optz._run
        state = {"raised": False}

        def fake_run(*a, **kw):
            if not state["raised"]:
                state["raised"] = True
                raise RuntimeError("RESOURCE_EXHAUSTED: fake HBM OOM")
            return real_run(*a, **kw)

        optz._run = fake_run
        zs, *_ = optz.run(tp, up, batch, jax.random.PRNGKey(5))
        assert state["raised"] and optz.remat == expect
        np.testing.assert_allclose(np.asarray(zs), np.asarray(zs_ref),
                                   rtol=2e-4, atol=2e-5)
