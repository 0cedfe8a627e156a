import numpy as np
import pytest

from textboost_tpu.data import BOS_ID, EOS_ID, HashTokenizer, tokenize_prompt
from textboost_tpu.tokens import (
    add_augmentation_tokens,
    add_token,
    embedding_norm_stats,
    expand_placeholder,
)


def test_hash_tokenizer_semantics():
    tok = HashTokenizer()
    ids = tokenize_prompt(tok, "a photo of a dog")
    assert ids.shape == (1, 77)
    assert ids[0, 0] == BOS_ID and ids[0, -1] == EOS_ID
    # Empty prompt: position 1 is EOS — the null-detection invariant.
    null = tokenize_prompt(tok, "")
    assert null[0, 1] == EOS_ID
    nonnull = tokenize_prompt(tok, "dog")
    assert nonnull[0, 1] != EOS_ID
    # Deterministic across instances.
    tok2 = HashTokenizer()
    np.testing.assert_array_equal(ids, tokenize_prompt(tok2, "a photo of a dog"))


def test_hash_tokenizer_add_tokens():
    tok = HashTokenizer()
    n0 = len(tok)
    assert tok.add_tokens(["<dog>", "<cat>"]) == 2
    assert len(tok) == n0 + 2
    assert tok.add_tokens("<dog>") == 0  # duplicate
    tid = tok.convert_tokens_to_ids("<dog>")
    assert tid == n0
    ids = tokenize_prompt(tok, "a photo of <dog>")
    assert tid in ids[0].tolist()


def test_expand_placeholder():
    assert expand_placeholder("<x>", 1) == ["<x>"]
    assert expand_placeholder("<x>", 3) == ["<x_0>", "<x_1>", "<x_2>"]
    assert expand_placeholder("x", 2) == ["x", "x_1"]


def test_add_token_single_vector():
    tok = HashTokenizer()
    emb = np.random.RandomState(0).randn(len(tok), 16).astype(np.float32)
    init_id = tok.encode("dog", add_special_tokens=False)[0]
    res = add_token(emb, tok, "<dog>", "dog")
    assert res.placeholder_tokens == ["<dog>"]
    assert res.embedding.shape == (len(tok), 16)
    np.testing.assert_array_equal(res.embedding[res.placeholder_token_ids[0]], emb[init_id])
    # Re-adding raises like the reference.
    with pytest.raises(ValueError):
        add_token(res.embedding, tok, "<dog>", "dog")


def test_add_token_multi_vector():
    tok = HashTokenizer()
    emb = np.random.RandomState(0).randn(len(tok), 8).astype(np.float32)
    init_ids = tok.encode("golden retriever", add_special_tokens=False)
    assert len(init_ids) == 2
    res = add_token(emb, tok, "<pet>", "golden retriever")
    assert res.placeholder_tokens == ["<pet_0>", "<pet_1>"]
    for pid, iid in zip(res.placeholder_token_ids, init_ids):
        np.testing.assert_array_equal(res.embedding[pid], emb[iid])


def test_add_augmentation_tokens_object_and_style():
    tok = HashTokenizer()
    emb = np.zeros((len(tok), 4), dtype=np.float32)
    emb2, ids, token_dict, captions = add_augmentation_tokens(emb, tok, "object")
    # 8 base augmentations; multi-word initializers produce extra vectors:
    # zoom in / far away / photo collage are 2 tokens each under the
    # word-level tokenizer -> 8 + 3 extra.
    assert len(ids) == 11
    assert emb2.shape[0] == emb.shape[0] + 11
    assert "<hflip>" in token_dict and "<zoom-in_0>" in token_dict
    assert captions["<zoom-in>"] == "<zoom-in_0> <zoom-in_1>"
    assert captions["<hflip>"] == "<hflip>"

    tok_s = HashTokenizer()
    _, ids_s, dict_s, _ = add_augmentation_tokens(
        np.zeros((len(tok_s), 4), np.float32), tok_s, "style"
    )
    assert list(dict_s) == ["<hflip>"] and len(ids_s) == 1
    with pytest.raises(ValueError):
        add_augmentation_tokens(emb, tok, "both")


def test_embedding_norm_stats():
    emb = np.ones((100, 4), dtype=np.float32)
    emb[:50] *= 3.0
    max_n, mean_n = embedding_norm_stats(emb, first_added_id=98)
    assert abs(max_n - 6.0) < 1e-5  # rows 0..95 have norm 6
    assert abs(mean_n - (0.5 * 6 + 0.5 * 2)) < 1e-5
