"""BPE tokenizer tests with a synthetic vocab (no 49408-entry file needed)."""

import pytest

from from_ddpm_to_stable_diffusion_tpu.io.tokenizer import (
    CLIPTokenizer, build_simple_vocab, bytes_to_unicode)


@pytest.fixture(scope="module")
def tok():
    vocab, merges = build_simple_vocab(
        ["hello", "world", "cat", "photo", "of", "a"])
    return CLIPTokenizer(vocab, merges)


def test_bytes_table_is_bijective():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256
    # printable ascii maps to itself
    assert table[ord("a")] == "a"
    # space is displaced
    assert table[ord(" ")] != " "


def test_encode_shape_and_specials(tok):
    ids = tok.encode("hello world")
    assert len(ids) == 77
    assert ids[0] == tok.bos_id
    assert tok.eos_id in ids[1:]
    # padding after EOS with pad(=eos) id
    eos_pos = ids.index(tok.eos_id, 1)
    assert all(i == tok.pad_id for i in ids[eos_pos:])


def test_known_words_merge_to_single_tokens(tok):
    # 'hello' and 'world' were trained into the merge table
    ids = tok.encode("hello world")
    eos_pos = ids.index(tok.eos_id, 1)
    assert eos_pos - 1 == 2  # exactly two word tokens


def test_normalization(tok):
    # case, surrounding/multiple whitespace collapse
    assert tok.encode("  Hello   WORLD  ") == tok.encode("hello world")


def test_unknown_word_falls_back_to_characters(tok):
    ids = tok.encode("xyzzy")
    eos_pos = ids.index(tok.eos_id, 1)
    assert eos_pos - 1 >= 2  # split into multiple character-level tokens


def test_roundtrip_decode(tok):
    ids = tok.encode("a photo of a cat")
    assert tok.decode(ids) == "a photo of a cat"


def test_truncation():
    vocab, merges = build_simple_vocab(["a"])
    tok = CLIPTokenizer(vocab, merges, max_length=8)
    ids = tok.encode("a a a a a a a a a a a a")
    assert len(ids) == 8
    assert ids[0] == tok.bos_id


def test_batch(tok):
    out = tok.encode_batch(["hello", "world"])
    assert len(out) == 2 and all(len(x) == 77 for x in out)
