"""From-scratch CLIP BPE tokenizer (host-side, pure Python).

Behavioral re-implementation of /root/reference/01_stable_diffusion-1/
stable_diffusion_pytorch/tokenizer.py:9-90 against the standard CLIP
vocab.json + merges.txt format: NFC normalize → whitespace collapse → lower
→ regex chunking (contractions / letters / digits / punctuation, with the
special tokens matched literally) → byte-to-printable-unicode remap → greedy
lowest-rank pair merging with an end-of-word marker → BOS/EOS + pad-to-77.

The vocab/merges file paths are explicit constructor arguments (the
reference hardcodes an asset directory); a ``SimpleVocab`` builder exists so
tests run without the 49408-entry file.
"""

from __future__ import annotations

import functools
import json
import unicodedata
from typing import Dict, List, Tuple

import regex as re

_CHUNK_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
    r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> Dict[int, str]:
    """Map every byte to a printable unicode char (GPT-2/CLIP convention):
    control/space bytes are displaced to 256+."""
    table = {}
    special = 0
    for byte in range(256):
        if unicodedata.category(chr(byte))[0] not in ("C", "Z"):
            table[byte] = chr(byte)
        else:
            table[byte] = chr(256 + special)
            special += 1
    return table


class CLIPTokenizer:
    """encode(text) -> 77 token ids with BOS/EOS/pad."""

    def __init__(self, vocab: Dict[str, int],
                 merges: Dict[Tuple[str, str], int],
                 max_length: int = 77,
                 bos_token: str = "<|startoftext|>",
                 eos_token: str = "<|endoftext|>"):
        self.vocab = vocab
        self.merges = merges
        self.max_length = max_length
        self.bos_id = vocab[bos_token]
        self.eos_id = vocab[eos_token]
        self.pad_id = self.eos_id
        self._bytes = bytes_to_unicode()

    @classmethod
    def from_files(cls, vocab_path: str, merges_path: str,
                   **kwargs) -> "CLIPTokenizer":
        with open(vocab_path, encoding="utf-8") as f:
            vocab = json.load(f)
        with open(merges_path, encoding="utf-8") as f:
            lines = f.read().split("\n")[1:-1]  # strip header + trailing blank
        merges = {tuple(line.split()): rank for rank, line in enumerate(lines)}
        return cls(vocab, merges, **kwargs)

    def _bpe(self, chunk: str) -> Tuple[str, ...]:
        parts = list(chunk)
        if not parts:
            return ()
        parts[-1] += "</w>"
        while len(parts) > 1:
            ranks = [self.merges[p] for p in zip(parts, parts[1:])
                     if p in self.merges]
            if not ranks:
                break
            best = min(ranks)
            # merge every (non-overlapping, left-to-right) occurrence of the
            # lowest-rank pair in one pass — the CLIP BPE convention
            merged: List[str] = []
            i = 0
            while i < len(parts):
                if (i + 1 < len(parts)
                        and self.merges.get((parts[i], parts[i + 1])) == best):
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        return tuple(parts)

    @functools.lru_cache(maxsize=10000)
    def _bpe_cached(self, chunk: str) -> Tuple[str, ...]:
        return self._bpe(chunk)

    def encode_fragment(self, text: str) -> List[int]:
        """BPE ids for a prompt fragment — no BOS/EOS/pad (used by
        prompt-weight segments, io/prompt_weights.py)."""
        text = unicodedata.normalize("NFC", text)
        text = re.sub(r"\s+", " ", text).strip().lower()
        ids: List[int] = []
        for chunk in _CHUNK_PATTERN.findall(text):
            mapped = "".join(self._bytes[b] for b in chunk.encode("utf-8"))
            ids.extend(self.vocab[piece] for piece in self._bpe_cached(mapped))
        return ids

    def encode(self, text: str, pad: bool = True) -> List[int]:
        ids = [self.bos_id] + self.encode_fragment(text) + [self.eos_id]
        ids = ids[: self.max_length]
        if pad:
            ids += [self.pad_id] * (self.max_length - len(ids))
        return ids

    def encode_batch(self, texts: List[str]) -> List[List[int]]:
        return [self.encode(t) for t in texts]

    def tokenize_with_weights(self, text: str, parse_weights: bool = False):
        """(token, weight) pairs. Default (stub weights at 1.0) matches the
        reference SD3 tokenizer (02_.../utils.py:187-226); with
        ``parse_weights=True`` the ``(text:w)`` attention syntax yields real
        per-token weights (io/prompt_weights.py)."""
        if not parse_weights:
            return [(tok, 1.0) for tok in self.encode(text)]
        from .prompt_weights import encode_with_weights

        ids, weights = encode_with_weights(self, text)
        return list(zip(ids, weights))

    def decode(self, ids: List[int]) -> str:
        inv_vocab = {v: k for k, v in self.vocab.items()}
        inv_bytes = {c: b for b, c in self._bytes.items()}
        text = "".join(inv_vocab.get(i, "") for i in ids)
        text = (text.replace("<|startoftext|>", "")
                    .replace("<|endoftext|>", ""))
        words = []
        for piece in text.split("</w>"):
            raw = bytes(inv_bytes[c] for c in piece if c in inv_bytes)
            words.append(raw.decode("utf-8", errors="replace"))
        return " ".join(w for w in words if w).strip()


def build_simple_vocab(words: List[str]) -> Tuple[Dict[str, int],
                                                  Dict[Tuple[str, str], int]]:
    """Character-level vocab + greedy merges over the given words — a tiny
    stand-in for the real 49408-entry CLIP vocab in tests."""
    table = bytes_to_unicode()
    vocab: Dict[str, int] = {}
    merges: Dict[Tuple[str, str], int] = {}

    def add(tok):
        if tok not in vocab:
            vocab[tok] = len(vocab)

    add("<|startoftext|>")
    add("<|endoftext|>")
    for byte in range(256):
        add(table[byte])
        add(table[byte] + "</w>")
    # learn full-word merges left-to-right so known words encode to one token
    for word in words:
        mapped = "".join(table[b] for b in word.encode("utf-8"))
        parts = list(mapped)
        parts[-1] += "</w>"
        while len(parts) > 1:
            pair = (parts[0], parts[1])
            if pair not in merges:
                merges[pair] = len(merges)
            parts = [parts[0] + parts[1]] + parts[2:]
            add(parts[0])
    return vocab, merges
