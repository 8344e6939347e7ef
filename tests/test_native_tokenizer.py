"""C++ tokenizer parity vs the Python implementation (same vocab/merges)."""

import json
import os

import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.io.tokenizer import (CLIPTokenizer,
                                                            build_simple_vocab)


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vocab")
    vocab, merges = build_simple_vocab(
        ["hello", "world", "cat", "photo", "of", "a", "the", "it"])
    vpath = tmp / "vocab.json"
    vpath.write_text(json.dumps(vocab, ensure_ascii=False))
    mpath = tmp / "merges.txt"
    lines = ["#version: 0.2"]
    for (a, b), rank in sorted(merges.items(), key=lambda kv: kv[1]):
        lines.append(f"{a} {b}")
    mpath.write_text("\n".join(lines) + "\n")
    return str(vpath), str(mpath)


@pytest.fixture(scope="module")
def both(vocab_files):
    from from_ddpm_to_stable_diffusion_tpu.io.native import NativeBPETokenizer

    vpath, mpath = vocab_files
    py = CLIPTokenizer.from_files(vpath, mpath)
    cc = NativeBPETokenizer(vpath, mpath)
    return py, cc


def test_native_builds_and_loads(both):
    py, cc = both
    assert cc.vocab_size == len(py.vocab)


@pytest.mark.parametrize("text", [
    "hello world",
    "a photo of a cat",
    "  Hello   WORLD  ",
    "it's the cat!!",
    "cat123dog",
    "...",
    "hello, world: a photo; of it.",
    "",
])
def test_native_matches_python(both, text):
    py, cc = both
    assert cc.encode(text) == py.encode(text), text


def test_native_batch(both):
    py, cc = both
    texts = ["hello", "a cat", "the world"]
    got = cc.encode_batch_np(texts)
    want = np.asarray(py.encode_batch(texts))
    np.testing.assert_array_equal(got, want)


def test_native_bad_paths():
    from from_ddpm_to_stable_diffusion_tpu.io.native import NativeBPETokenizer

    with pytest.raises(ValueError):
        NativeBPETokenizer("/nonexistent/vocab.json", "/nonexistent/merges.txt")
