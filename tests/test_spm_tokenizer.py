"""SentencePiece unigram tokenizer: proto round-trip, Viterbi, T5/SD3 wrap.

Reference behavior: /root/reference/02_stable_diffusion-3/utils.py:186-246,
329-342 (SDTokenizer/T5XXLTokenizer/SD3Tokenizer semantics)."""

import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.io.spm_tokenizer import (
    BYTE, CONTROL, NORMAL, UNKNOWN, USER_DEFINED, SD3Tokenizer,
    SentencePieceUnigram, T5XXLTokenizer, build_spm_model, parse_spm_model)
from from_ddpm_to_stable_diffusion_tpu.io.tokenizer import (CLIPTokenizer,
                                                            build_simple_vocab)

# A tiny T5-style vocabulary: ids 0/1/2 are <pad>/</s>/<unk> like the real
# spiece.model; scores favor longer pieces.
TINY_PIECES = [
    ("<pad>", 0.0, CONTROL),
    ("</s>", 0.0, CONTROL),
    ("<unk>", 0.0, UNKNOWN),
    ("▁", -3.0, NORMAL),
    ("▁a", -2.5, NORMAL),
    ("▁cat", -1.0, NORMAL),
    ("▁photo", -1.2, NORMAL),
    ("▁of", -1.1, NORMAL),
    ("▁ca", -4.0, NORMAL),
    ("t", -2.0, NORMAL),
    ("c", -5.0, NORMAL),
    ("a", -5.0, NORMAL),
    ("o", -5.0, NORMAL),
    ("f", -5.0, NORMAL),
    ("s", -3.5, NORMAL),
    ("▁cats", -2.2, NORMAL),
]
IDX = {p: i for i, (p, _, _) in enumerate(TINY_PIECES)}


@pytest.fixture(scope="module")
def spm():
    # round-trip through the serialized form so the proto reader is on the
    # path of every test in this module
    return SentencePieceUnigram(parse_spm_model(build_spm_model(TINY_PIECES)))


def test_proto_roundtrip():
    parsed = parse_spm_model(build_spm_model(TINY_PIECES))
    assert [(p, t) for p, _, t in parsed] == [
        (p, t) for p, _, t in TINY_PIECES]
    np.testing.assert_allclose([s for _, s, _ in parsed],
                               [s for _, s, _ in TINY_PIECES], rtol=1e-6)


def test_viterbi_prefers_max_likelihood(spm):
    # "▁cat" (-1.0) beats "▁ca"+"t" (-6.0) and char splits
    assert spm.encode("cat") == [IDX["▁cat"]]
    # "cats": "▁cats" (-2.2) beats "▁cat"+"s" (-4.5)
    assert spm.encode("cats") == [IDX["▁cats"]]
    # multi-word: dummy prefix + ▁-boundaries
    assert spm.encode("a photo of a cat") == [
        IDX["▁a"], IDX["▁photo"], IDX["▁of"], IDX["▁a"], IDX["▁cat"]]


def test_viterbi_segmentation_is_global_not_greedy():
    # Greedy longest-match takes "ab" then is stuck with bad "c"; the
    # global optimum is "a"+"bc".
    pieces = [("<unk>", 0.0, UNKNOWN), ("ab", -1.0, NORMAL),
              ("a", -1.5, NORMAL), ("bc", -1.0, NORMAL),
              ("c", -10.0, NORMAL), ("b", -10.0, NORMAL)]
    sp = SentencePieceUnigram(pieces, add_dummy_prefix=False)
    ids = sp.encode("abc")
    assert [pieces[i][0] for i in ids] == ["a", "bc"]


def test_unknown_chars_fall_back_and_merge(spm):
    ids = spm.encode("cat zzz cat")
    # the unknown run "zzz" collapses to one <unk>; ▁ before it survives
    assert ids == [IDX["▁cat"], IDX["▁"], IDX["<unk>"], IDX["▁cat"]]


def test_normalization(spm):
    # NFKC + whitespace collapse: double spaces, tabs, newlines
    assert spm.encode("cat\t\n  cat") == [IDX["▁cat"], IDX["▁cat"]]
    assert spm.encode("") == []


def test_decode_roundtrip(spm):
    ids = spm.encode("a photo of a cat")
    assert spm.decode(ids) == "a photo of a cat"


def test_control_pieces_never_match_text(spm):
    # "<pad>" as literal text must not produce the control id 0
    ids = spm.encode("<pad>")
    assert 0 not in ids and 1 not in ids


def test_t5xxl_tokenizer_wrapper(spm):
    t5 = T5XXLTokenizer(spm)
    ids = t5.encode("a photo of a cat")
    assert len(ids) == 77
    body = [IDX["▁a"], IDX["▁photo"], IDX["▁of"], IDX["▁a"], IDX["▁cat"]]
    assert ids[: len(body)] == body
    assert ids[len(body)] == 1                 # </s>
    assert all(i == 0 for i in ids[len(body) + 1:])  # pad=0
    # empty prompt: exactly [</s>, 0, 0, ...] — the reference encodes ""
    # through T5 (sd3_infer.py:306-309)
    empty = t5.encode("")
    assert empty[0] == 1 and all(i == 0 for i in empty[1:])


def test_t5xxl_word_fanout_matches_whole_text(spm):
    """The reference tokenizes word-by-word (utils.py:209-221); with
    ▁-prefixed pieces that equals whole-text encoding for plain prompts."""
    t5 = T5XXLTokenizer(spm)
    per_word = t5.encode("a photo of a cat", pad=False)[:-1]
    whole = spm.encode("a photo of a cat")
    assert per_word == whole


def test_sd3_tokenizer_trio(spm):
    vocab, merges = build_simple_vocab(["a", "photo", "of", "cat"])
    clip = CLIPTokenizer(vocab, merges)
    trio = SD3Tokenizer(clip, T5XXLTokenizer(spm))
    out = trio.encode("a photo of a cat")
    assert set(out) == {"l", "g", "t5xxl"}
    assert len(out["l"]) == len(out["g"]) == len(out["t5xxl"]) == 77
    # same core ids, different padding: L pads with EOS, G pads with 0
    # (utils.py:229-231 — SDXLClipGTokenizer sets pad_with_end=False)
    n_core = out["l"].index(clip.eos_id) + 1
    assert out["l"][:n_core] == out["g"][:n_core]
    assert all(i == clip.eos_id for i in out["l"][n_core:])
    assert all(i == 0 for i in out["g"][n_core:])
    assert out["t5xxl"][0] != 0
