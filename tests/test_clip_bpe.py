"""CLIP byte-level BPE parity vs HF CLIPTokenizer on an authored tiny
vocab/merges pair (VERDICT r1 item 7 — replaces the hash-fallback-only
tokenization; fixtures computed by the reference tokenizer implementation)."""

import json

import numpy as np
import pytest

from instance_based_loc_tpu.models.bpe import ClipBPETokenizer, bytes_to_unicode

transformers = pytest.importorskip("transformers")

MERGES = [
    "c h", "a i", "ai r</w>", "ch air</w>", "t a", "b l", "bl e</w>",
    "ta ble</w>", "l a", "m p</w>", "la mp</w>", "s o", "f a</w>", "so fa</w>",
    "w o", "o d", "wo od", "wood en</w>", "e n</w>", "p o", "po t",
    "pot ted</w>", "t e", "te d</w>",
]

SENTENCES = [
    "a wooden chair.",
    "Chair, table & lamp!",
    "sofa   potted-plant",
    "the café 123",
    "",
]


@pytest.fixture(scope="module")
def tok_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    alphabet = list(bytes_to_unicode().values())
    vocab = alphabet + [a + "</w>" for a in alphabet]
    for m in MERGES:
        vocab.append("".join(m.split()))
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    vocab_path = d / "vocab.json"
    vocab_path.write_text(json.dumps({t: i for i, t in enumerate(vocab)}))
    merges_path = d / "merges.txt"
    merges_path.write_text("#version: 0.2\n" + "\n".join(MERGES) + "\n")
    return str(vocab_path), str(merges_path)


def test_bpe_matches_hf(tok_files):
    vocab_path, merges_path = tok_files
    hf = transformers.CLIPTokenizer(vocab_path, merges_path)
    ours = ClipBPETokenizer(vocab_path, merges_path)
    for s in SENTENCES:
        assert ours.tokenize(s) == hf.tokenize(s), s
        ref_ids = hf(s).input_ids
        got = ours.encode(s, pad=False)
        assert got == ref_ids, s


def test_encode_zero_pads_to_context(tok_files):
    vocab_path, merges_path = tok_files
    ours = ClipBPETokenizer(vocab_path, merges_path, context_length=77)
    ids = ours.encode("a wooden chair")
    assert len(ids) == 77
    assert ids[0] == ours.sot and ours.eot in ids
    # zero padding (openai clip.tokenize convention), EOT position = argmax
    assert ids[np.argmax(ids)] == max(ids)
    assert ids[-1] == 0
