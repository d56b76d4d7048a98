"""WordPiece tokenizer parity vs HF BertTokenizer on a local vocab file."""

import numpy as np
import pytest

from instance_based_loc_tpu.models.wordpiece import WordPieceTokenizer

transformers = pytest.importorskip("transformers")

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "the", "chair", "table", "wooden", "##s", "##ing", "##ed",
         "walk", "run", "door", "win", "##dow", "window", "lamp", "sofa",
         "pot", "##ted", "plant", "tele", "##vision", ".", ",", "?", "!",
         "un", "##want", "coff", "##ee", "cup", "book", "##shelf", "cafe"]

SENTENCES = [
    "a wooden chair.",
    "potted plant. television. bookshelf.",
    "The LAMP, the sofa?",
    "unwanted windows!!",
    "walking and running",          # 'and' is OOV -> [UNK]
    "coffee cups",
    "café",                    # accent stripping -> cafe
    "",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_wordpiece_matches_hf(vocab_file):
    hf = transformers.BertTokenizer(vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer(vocab_file)
    for s in SENTENCES:
        assert ours.tokenize(s) == hf.tokenize(s), s
        assert ours.encode(s) == hf.encode(s), s


def test_wordpiece_special_ids(vocab_file):
    ours = WordPieceTokenizer(vocab_file)
    ids = ours.encode("a chair.")
    assert ids[0] == ours.cls_id and ids[-1] == ours.sep_id
