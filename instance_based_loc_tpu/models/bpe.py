"""CLIP byte-level BPE tokenizer — host-side text preprocessing for the
clip_loc text-embedding memory (reference `clip_loc/clip_utils.py:30-54`
tokenizes object names through openai CLIP's tokenizer).

Implements the openai `SimpleTokenizer` algorithm (byte->unicode alphabet,
regex pre-tokenization, rank-greedy byte-pair merges with the `</w>`
end-of-word marker) exactly as distributed with every CLIP checkpoint
(`vocab.json` + `merges.txt`). Text cleanup mirrors HF CLIPTokenizer's
no-ftfy path (BasicTokenizer with strip_accents=False,
do_split_on_punc=False), which tests verify token-for-token."""

from __future__ import annotations

import functools
import json
import unicodedata

import regex as re

PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
    r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", re.IGNORECASE)


@functools.lru_cache()
def bytes_to_unicode():
    """GPT-2's reversible byte -> printable-unicode map."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _is_cjk(cp: int) -> bool:
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF)
            or (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F)
            or (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF)
            or (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


def _basic_clean(text: str) -> str:
    """HF CLIPTokenizer no-ftfy path: BasicTokenizer(strip_accents=False,
    do_split_on_punc=False) then space-join — lowercased whole words."""
    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or unicodedata.category(ch) in ("Cc", "Cf"):
            continue
        out.append(" " if unicodedata.category(ch) == "Zs"
                   or ch in ("\t", "\n", "\r") else ch)
    text = "".join(f" {c} " if _is_cjk(ord(c)) else c for c in "".join(out))
    return " ".join(tok.lower() for tok in text.split())


class ClipBPETokenizer:
    def __init__(self, vocab_path: str, merges_path: str,
                 context_length: int = 77):
        with open(vocab_path, encoding="utf-8") as f:
            self.encoder = json.load(f)
        with open(merges_path, encoding="utf-8") as f:
            merges = f.read().strip().split("\n")[1:49152 - 256 - 2 + 1]
        self.bpe_ranks = {tuple(m.split()): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.cache = {}
        self.context_length = context_length
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            return token + "</w>" if len(token) > 1 else word[0]
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                if first not in word[i:]:
                    new_word.extend(word[i:])
                    break
                j = word.index(first, i)
                new_word.extend(word[i:j])
                i = j
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def tokenize(self, text: str) -> list[str]:
        tokens = []
        for tok in re.findall(PAT, _basic_clean(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            tokens.extend(self.bpe(tok).split(" "))
        return tokens

    def encode(self, text: str, pad: bool = True) -> list[int]:
        """[SOT] bpe ids [EOT], truncated/padded (with EOT... CLIP pads with
        zeros; openai clip.tokenize zero-pads) to context_length."""
        unk = self.eot
        ids = [self.sot] + [self.encoder.get(t, unk)
                            for t in self.tokenize(text)] + [self.eot]
        ids = ids[:self.context_length]
        ids[-1] = self.eot
        if pad:
            ids = ids + [0] * (self.context_length - len(ids))
        return ids
