"""Stage-2 engine: solve parity vs independent float64 math, the one-pass
incremental insert vs a naive per-layer re-forward implementation, delta
factor-pair re-application, and the covariance sweep."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.engine.emcid import (
    apply_deltas_to_params,
    execute_emcid_text_encoder,
    load_z_list,
    save_z_cache,
)
from emcid_tpu.engine.extract import (
    module_io_at_words,
    prepare_request_batch,
)
from emcid_tpu.engine.layer_stats import (
    get_cov_text_encoder,
    layer_stats_text_encoder,
    stats_filename,
    COV_CACHE,
)
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models import CLIPTextEncoder, TINY_TEXT
from emcid_tpu.models.naming import get_weight
from emcid_tpu.ops.solve import solve_adj_k, upd_matrix_match_shape
from emcid_tpu.text import make_tiny_tokenizer

WORDS = ["a", "photo", "of", "an", "image", "cat", "dog", "tench", "goldfish",
         "painting", "by", "vincent"]


@pytest.fixture(scope="module")
def setup():
    tok = make_tiny_tokenizer(WORDS, model_max_length=16)
    model = CLIPTextEncoder(TINY_TEXT)
    params = model.init_params(jax.random.PRNGKey(0))
    return tok, model, params


def make_hparams(layers):
    return EMCIDHyperParams.from_dict({
        "layers": layers,
        "clamp_norm_factor": 1.5,
        "layer_selection": "all",
        "fact_token": "subject_last",
        "v_num_grad_steps": 10,
        "v_lr": 0.2,
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
    })


REQUESTS = [
    {"prompts": ["a photo of a {}", "an image of a {}", "{}"],
     "source": "cat", "dest": "dog", "seed_train": 0},
    {"prompts": ["a photo of a {}", "an image of a {}", "{}"],
     "source": "tench", "dest": "goldfish", "seed_train": 1},
]


def _covs(in_dim, n_layers, seed=7, scale=1.0):
    rng = np.random.RandomState(seed)
    covs = []
    for _ in range(n_layers):
        A = rng.randn(200, in_dim).astype(np.float32)
        covs.append((A.T @ A / 200) * scale)
    return covs


def test_solve_f32_ir_matches_f64(rng):
    in_dim, n = 64, 8
    A = rng.randn(500, in_dim).astype(np.float32)
    C = A.T @ A / 500
    K = rng.randn(in_dim, n).astype(np.float32)
    x64 = solve_adj_k(C, K, lam=100.0, method="f64")
    x32 = np.asarray(solve_adj_k(C, K, lam=100.0, method="f32_ir"))
    np.testing.assert_allclose(x32, x64, rtol=2e-4, atol=1e-6)
    # residual norm near machine precision relative to K
    A_full = 100.0 * C.astype(np.float64) + K.astype(np.float64) @ K.T.astype(np.float64)
    r = K - A_full @ x32.astype(np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(K) < 1e-5


def test_upd_matrix_match_shape():
    m = jnp.ones((4, 8))
    assert upd_matrix_match_shape(m, (4, 8)).shape == (4, 8)
    assert upd_matrix_match_shape(m, (8, 4)).shape == (8, 4)
    assert upd_matrix_match_shape(m, (4, 2, 2, 2)).shape == (4, 2, 2, 2)
    with pytest.raises(ValueError):
        upd_matrix_match_shape(m, (3, 3))


def test_prepare_request_batch(setup):
    tok, model, params = setup
    batch = prepare_request_batch(tok, REQUESTS, num_fact_tokens=1)
    assert batch.input_ids.shape == (6, 16)
    assert batch.num_requests == 2
    assert list(batch.prompt_to_request) == [0, 0, 0, 1, 1, 1]
    # lookup index points at the subject token
    for i in range(6):
        subj = REQUESTS[batch.prompt_to_request[i]]["source"]
        tok_at = tok.decode([int(batch.input_ids[i, batch.lookup_indices[i, 0]])])
        assert tok_at == subj
    # averaging matrix rows sum to 1
    np.testing.assert_allclose(batch.seg_matrix.sum(1), [1.0, 1.0], atol=1e-6)


def test_module_io_matches_manual_extraction(setup):
    """keys/values must equal a manual full-forward tap + per-prompt gather."""
    tok, model, params = setup
    batch = prepare_request_batch(tok, REQUESTS)
    keys, vals = module_io_at_words(model, params, batch, layer=1)
    out = model.apply({"params": params}, jnp.asarray(batch.input_ids),
                      capture=("fc2_in", "fc2_out"))
    fc2_in = np.asarray(out.taps["fc2_in"][1])
    fc2_out = np.asarray(out.taps["fc2_out"][1])
    for r in range(2):
        rows = [i for i in range(6) if batch.prompt_to_request[i] == r]
        k_manual = np.mean(
            [fc2_in[i, batch.lookup_indices[i, 0]] for i in rows], axis=0
        )
        v_manual = np.mean(
            [fc2_out[i, batch.lookup_indices[i, 0]] for i in rows], axis=0
        )
        np.testing.assert_allclose(np.asarray(keys[r, 0]), k_manual, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vals[r, 0]), v_manual, atol=1e-5)


def _naive_reference_insert(model, params, tok, requests, hparams, zs, covs):
    """Independent implementation of the reference's per-layer loop
    (emcid_main.py:981-1065): full re-forward per layer on the partially
    edited params, host float64 solves."""
    from emcid_tpu.models.naming import set_weight

    batch = prepare_request_batch(tok, requests)
    zs_t = np.asarray(zs).reshape(-1, zs.shape[-1]).T.astype(np.float64)
    alpha = hparams.edit_weight
    lam = hparams.mom2_update_weight
    cur_params = params
    deltas = {}
    for j, layer in enumerate(hparams.layers):
        keys, vals = module_io_at_words(model, cur_params, batch, layer)
        K = np.asarray(keys).reshape(-1, keys.shape[-1]).T.astype(np.float64)
        cur = np.asarray(vals).reshape(-1, vals.shape[-1]).T.astype(np.float64)
        K = K * (alpha / 0.5) ** 0.5
        src = (zs_t - cur) * (alpha / 0.5) ** 0.5
        C = np.asarray(covs[j], dtype=np.float64) * (1 - alpha) / 0.5
        adj_k = np.linalg.solve(lam * C + K @ K.T, K)
        resid = src / (len(hparams.layers) - j)
        upd = resid @ adj_k.T
        name = hparams.rewrite_module_tmp.format(layer)
        w = np.asarray(get_weight(cur_params, name), dtype=np.float64)
        cur_params = set_weight(cur_params, name, (w + upd).astype(np.float32))
        deltas[name + ".weight"] = (adj_k, resid)
    return deltas, cur_params


@pytest.mark.parametrize("solve_method", ["f64", "f32_ir"])
def test_one_pass_insert_matches_naive_reference(setup, solve_method):
    tok, model, params = setup
    hp = make_hparams([0, 1])
    rng = np.random.RandomState(0)
    zs = rng.randn(2, 1, 32).astype(np.float32) * 0.5
    covs = _covs(64, 2)

    deltas, new_params = execute_emcid_text_encoder(
        model, params, tok, REQUESTS, hp, zs=zs, covs=covs,
        solve_method=solve_method, verbose=False,
    )
    ref_deltas, ref_params = _naive_reference_insert(
        model, params, tok, REQUESTS, hp, zs, covs
    )
    for layer in hp.layers:
        name = hp.rewrite_module_tmp.format(layer)
        w_new = np.asarray(get_weight(new_params, name))
        w_ref = np.asarray(get_weight(ref_params, name))
        w_orig = np.asarray(get_weight(params, name))
        # the edit is nontrivial
        assert np.linalg.norm(w_new - w_orig) > 1e-3
        np.testing.assert_allclose(w_new, w_ref, rtol=1e-3, atol=2e-5)


def test_edit_moves_output_toward_target(setup):
    tok, model, params = setup
    hp = make_hparams([0, 1])
    rng = np.random.RandomState(1)
    batch = prepare_request_batch(tok, REQUESTS)
    _, vals0 = module_io_at_words(model, params, batch, layer=1)
    zs = np.asarray(vals0) + rng.randn(2, 1, 32).astype(np.float32) * 0.3
    covs = _covs(64, 2, scale=0.01)

    _, new_params = execute_emcid_text_encoder(
        model, params, tok, REQUESTS, hp, zs=zs, covs=covs, verbose=False,
    )
    _, vals1 = module_io_at_words(model, new_params, batch, layer=1)
    err0 = np.linalg.norm(np.asarray(vals0) - zs)
    err1 = np.linalg.norm(np.asarray(vals1) - zs)
    assert err1 < err0 * 0.5, (err0, err1)


def test_delta_factor_pairs_reapply(setup):
    """(adj_k, resid) factor pairs reapplied to pristine params must NOT in
    general equal new_params for multi-layer (later layers saw earlier
    edits), but must match exactly for a single layer."""
    tok, model, params = setup
    hp = make_hparams([1])
    rng = np.random.RandomState(2)
    zs = rng.randn(2, 1, 32).astype(np.float32) * 0.5
    covs = _covs(64, 1)
    deltas, new_params = execute_emcid_text_encoder(
        model, params, tok, REQUESTS, hp, zs=zs, covs=covs, verbose=False,
    )
    reapplied = apply_deltas_to_params(params, deltas)
    name = hp.rewrite_module_tmp.format(1)
    np.testing.assert_allclose(
        np.asarray(get_weight(reapplied, name)),
        np.asarray(get_weight(new_params, name)),
        atol=1e-5,
    )


def test_z_cache_roundtrip(tmp_path):
    cache = str(tmp_path / "zs") + "/"
    req = {"source": "cat", "dest": "dog"}
    z = np.random.RandomState(0).randn(32).astype(np.float32)
    save_z_cache(cache, req, z)
    z_list, missing = load_z_list([req, {"source": "x", "dest": "y"}], cache)
    assert missing == [1]
    np.testing.assert_array_equal(z_list[0], z)


def test_sld_z_cache_roundtrip(tmp_path):
    """SLD-supervised requests key the cache on source_{cat}_{idx}
    (reference emcid_main.py:879-884) — a save that drops the index would
    collide every same-category request into one file and never hit on
    reload (regression: apply_emcid_to_text_encoder passed no idx)."""
    import types

    cache = str(tmp_path / "zs") + "/"
    hp = types.SimpleNamespace(objective="ablate-dest", sld_supervision=True)
    reqs = [{"source": "nude", "dest": "safe", "source_cat": "nudity"},
            {"source": "gore", "dest": "safe", "source_cat": "nudity"}]
    z0 = np.random.RandomState(0).randn(32).astype(np.float32)
    z1 = np.random.RandomState(1).randn(32).astype(np.float32)
    for i, z in enumerate((z0, z1)):
        save_z_cache(cache, reqs[i], z, hp, idx=i)
    z_list, missing = load_z_list(reqs, cache, hp)
    assert missing == []
    np.testing.assert_array_equal(z_list[0], z0)
    np.testing.assert_array_equal(z_list[1], z1)


def test_apply_saves_sld_cache_under_indexed_key(setup, tmp_path):
    """Call-level regression: apply_emcid_to_text_encoder must save
    computed z's under the SAME indexed key load_z_list reads — a second
    call with a poisoned compute_z_fn must be a pure cache hit."""
    import dataclasses

    from emcid_tpu.engine.emcid import apply_emcid_to_text_encoder

    tok, model, params = setup
    hp = dataclasses.replace(make_hparams([1]), sld_supervision=True)
    cache = str(tmp_path / "zs") + "/"
    reqs = [{"prompts": ["a photo of a {}"], "source": "cat", "dest": "dog",
             "source_cat": "animals"},
            {"prompts": ["a photo of a {}"], "source": "tench",
             "dest": "goldfish", "source_cat": "animals"}]
    rng = np.random.RandomState(0)
    out_dim = model.config.hidden_size
    in_dim = model.config.intermediate_size
    zs_store = [rng.randn(1, out_dim).astype(np.float32) for _ in reqs]
    covs = [np.eye(in_dim, dtype=np.float32) for _ in hp.layers]

    def compute_z_fn(missing_reqs):
        return [zs_store[reqs.index(r)] for r in missing_reqs]

    def poisoned(_):
        raise AssertionError("cache miss: SLD z cache was not reloaded")

    _ = apply_emcid_to_text_encoder(
        model, params, tok, reqs, hp, covs=covs, cache_name=cache,
        compute_z_fn=compute_z_fn, verbose=False)
    _ = apply_emcid_to_text_encoder(
        model, params, tok, reqs, hp, covs=covs, cache_name=cache,
        compute_z_fn=poisoned, verbose=False)


def test_layer_stats_matches_manual(setup, tmp_path):
    tok, model, params = setup
    captions = [f"a photo of a {w}" for w in WORDS] * 5
    layer_name = "text_model.encoder.layers.1.mlp.fc2"
    stat = layer_stats_text_encoder(
        model, params, tok, layer_name,
        stats_dir=tmp_path, sample_size=40, batch_size=8, captions=captions,
    )
    mom2 = np.asarray(stat.mom2.moment())
    assert mom2.shape == (64, 64)

    # manual: same sampled captions, full forward, mask-gathered fc2 inputs
    from emcid_tpu.stats import FixedRandomSubsetSampler

    idx = FixedRandomSubsetSampler(len(captions), 40, seed=1).indices
    sampled = [captions[i] for i in idx]
    enc = tok(sampled, padding="max_length", max_length=16)
    out = model.apply({"params": params}, jnp.asarray(enc["input_ids"]),
                      jnp.asarray(enc["attention_mask"]), capture=("fc2_in",))
    fc2_in = np.asarray(out.taps["fc2_in"][1])
    mask = np.asarray(enc["attention_mask"]).astype(bool)
    feats = fc2_in[mask]
    manual = feats.T @ feats / len(feats)
    assert stat.mom2.count == len(feats)
    np.testing.assert_allclose(mom2, manual, rtol=1e-4, atol=1e-6)

    # cache file exists with the reference codec and reloads
    f = stats_filename(tmp_path, "text_encoder", "ccs_filtered", layer_name,
                       sample_size=40)
    assert f.exists()
    stat2 = layer_stats_text_encoder(
        model, params, tok, layer_name,
        stats_dir=tmp_path, sample_size=40, captions=None,  # cache only
    )
    np.testing.assert_allclose(np.asarray(stat2.mom2.moment()), mom2, rtol=1e-6)


def test_get_cov_memoized(setup, tmp_path):
    tok, model, params = setup
    COV_CACHE.clear()
    captions = [f"an image of a {w}" for w in WORDS] * 3
    layer_name = "text_model.encoder.layers.0.mlp.fc2"
    C1 = get_cov_text_encoder(
        model, params, tok, layer_name, mom2_n_samples=20,
        stat_dir=tmp_path, captions=captions, verbose=False,
    )
    assert ("text_encoder", layer_name) in COV_CACHE
    C2 = get_cov_text_encoder(
        model, params, tok, layer_name, mom2_n_samples=20,
        stat_dir=tmp_path, captions=None, verbose=False,
    )
    np.testing.assert_array_equal(np.asarray(C1), np.asarray(C2))
