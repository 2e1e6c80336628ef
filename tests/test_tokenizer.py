"""CLIP BPE tokenizer + find_token_range behavior
(reference causal_trace.py:1030-1103 semantics)."""

import numpy as np
import pytest

from emcid_tpu.text import (
    CLIPBPETokenizer,
    decode_tokens,
    find_token_range,
    make_tiny_tokenizer,
)
from emcid_tpu.text.token_range import edit_token_indices, last_subject_token_index

WORDS = ["painting", "by", "vincent", "van", "gogh", "a", "photo", "of",
         "an", "image", "cat", "dog"]


@pytest.fixture(scope="module")
def tok():
    return make_tiny_tokenizer(WORDS, model_max_length=32)


def test_single_word_single_token(tok):
    ids = tok.encode("painting", add_special_tokens=False)
    assert len(ids) == 1
    assert tok.decode(ids) == "painting"


def test_encode_decode_roundtrip(tok):
    text = "painting by vincent van gogh"
    ids = tok.encode(text, add_special_tokens=False)
    assert tok.decode(ids) == text
    # with specials: BOS first, EOS last
    full = tok.encode(text)
    assert full[0] == tok.bos_token_id and full[-1] == tok.eos_token_id


def test_unknown_word_falls_back_to_chars(tok):
    ids = tok.encode("zeb", add_special_tokens=False)
    assert len(ids) > 1  # per-character
    assert tok.decode(ids) == "zeb"


def test_batch_call_padding(tok):
    out = tok(["a cat", "painting by vincent van gogh"], max_length=16)
    assert out["input_ids"].shape == (2, 16)
    assert out["attention_mask"].shape == (2, 16)
    assert out["input_ids"].dtype == np.int32
    # pad with EOS id
    assert out["input_ids"][0, -1] == tok.eos_token_id
    assert out["attention_mask"][0].sum() < 16
    # lowercase normalization
    out2 = tok(["A CAT"], max_length=16)
    np.testing.assert_array_equal(out["input_ids"][0], out2["input_ids"][0])


def test_truncation(tok):
    long_text = " ".join(["cat"] * 50)
    out = tok([long_text], max_length=8)
    assert out["input_ids"].shape == (1, 8)
    assert out["input_ids"][0, -1] == tok.eos_token_id


def test_find_token_range_basic(tok):
    prompt = "painting by vincent van gogh"
    ids = tok.encode(prompt)
    start, end = find_token_range(tok, ids, "vincent van gogh")
    decoded = tok.decode(ids[start:end])
    assert decoded == "vincent van gogh"
    # subject_last
    assert last_subject_token_index(tok, ids, "vincent van gogh") == end - 1


def test_find_token_range_single_word(tok):
    prompt = "a photo of a cat"
    ids = tok.encode(prompt)
    start, end = find_token_range(tok, ids, "cat")
    assert tok.decode(ids[start:end]) == "cat"
    assert end - start == 1


def test_find_token_range_specials(tok):
    ids = tok.encode("a cat")
    assert find_token_range(tok, ids, "[CLS]") == (0, 1)
    assert find_token_range(tok, ids, "") == (len(ids) - 1, len(ids))
    assert find_token_range(tok, ids, "[EOS]") == (len(ids) - 1, len(ids))


def test_find_token_range_missing_raises(tok):
    ids = tok.encode("a cat")
    with pytest.raises(ValueError):
        find_token_range(tok, ids, "zebra")


def test_edit_token_indices(tok):
    prompt = "a photo of a cat"
    out = tok([prompt], max_length=16)
    ids = out["input_ids"][0]
    idx1 = edit_token_indices(tok, ids, "cat", num_edit_tokens=1)
    assert len(idx1) == 1
    idx3 = edit_token_indices(tok, ids, "cat", num_edit_tokens=3)
    # last-subject, EOS, first pad
    n_real = int(out["attention_mask"][0].sum())
    assert idx3[0] == idx1[0]
    assert idx3[1] == n_real - 1
    assert idx3[2] == n_real


def test_decode_tokens_per_token(tok):
    ids = tok.encode("a cat", add_special_tokens=False)
    toks = decode_tokens(tok, ids)
    assert isinstance(toks, list) and all(isinstance(t, str) for t in toks)


def test_from_files_roundtrip(tmp_path, tok):
    import json

    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    with open(vocab_file, "w") as f:
        json.dump(tok.encoder, f)
    with open(merges_file, "w") as f:
        f.write("#version: 0.2\n")
        ordered = sorted(tok.bpe_ranks.items(), key=lambda kv: kv[1])
        for (a, b), _ in ordered:
            f.write(f"{a} {b}\n")
    tok2 = CLIPBPETokenizer.from_files(vocab_file, merges_file)
    text = "painting by vincent van gogh"
    assert tok2.encode(text) == tok.encode(text)
