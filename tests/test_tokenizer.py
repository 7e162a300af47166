"""CLIP BPE tokenizer parity vs transformers.CLIPTokenizer.

Zero-egress: the real 49k CLIP vocab cannot be downloaded here, so parity is
proven ALGORITHMICALLY — both tokenizers are instantiated from the same
locally-trained BPE files; identical ids on a diverse corpus means dropping
the real vocab.json/merges.txt in makes this the real CLIP tokenizer.
"""

import numpy as np
import pytest

from dvdx_tpu.models.tokenizer import (CLIPBPETokenizer, build_test_vocab,
                                       bytes_to_unicode,
                                       write_tokenizer_files)

TRAIN_WORDS = [
    "a", "the", "red", "panda", "climbing", "tree", "snowy", "mountain",
    "video", "of", "cat", "playing", "with", "ball", "in", "garden",
    "cinematic", "shot", "sunset", "over", "ocean", "waves", "high",
    "quality", "detailed", "running", "dog", "blue", "sky", "clouds",
]

CORPUS = [
    "a red panda climbing a snowy tree",
    "A RED PANDA   climbing!!",
    "the cat's ball, isn't it?",
    "cinematic shot of sunset over ocean waves, high quality, detailed 4k",
    "dog running... (fast) [test] {x} 123 #tag @user",
    "unseen-words zzz qqq flurble",
    "  leading and   trailing   whitespace  ",
    "",
    "punctuation:;'\"!?-_=+",
    "mixed CaSe AnD numb3rs 42",
]


@pytest.fixture(scope="module")
def tok_files(tmp_path_factory):
    vocab, merges = build_test_vocab(TRAIN_WORDS * 3 + ["climbing", "panda"])
    d = tmp_path_factory.mktemp("tok")
    write_tokenizer_files(str(d), vocab, merges)
    return str(d)


def test_bytes_to_unicode_is_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_parity_with_transformers(tok_files):
    from transformers import CLIPTokenizer

    ours = CLIPBPETokenizer.from_dir(tok_files)
    theirs = CLIPTokenizer(vocab_file=f"{tok_files}/vocab.json",
                           merges_file=f"{tok_files}/merges.txt")
    for text in CORPUS:
        a = ours.encode(text)
        b = theirs.encode(text, add_special_tokens=False)
        assert a == b, f"mismatch on {text!r}: {a} vs {b}"


def test_batch_encode_matches_transformers_padded(tok_files):
    from transformers import CLIPTokenizer

    ours = CLIPBPETokenizer.from_dir(tok_files)
    theirs = CLIPTokenizer(vocab_file=f"{tok_files}/vocab.json",
                           merges_file=f"{tok_files}/merges.txt")
    theirs.model_max_length = 77
    got = ours(CORPUS, max_length=77)
    want = theirs(CORPUS, padding="max_length", max_length=77,
                  truncation=True, return_tensors="np").input_ids
    assert got.dtype == np.int32 and got.shape == (len(CORPUS), 77)
    assert np.array_equal(got, want.astype(np.int32))


def test_truncation_and_framing(tok_files):
    ours = CLIPBPETokenizer.from_dir(tok_files)
    long = " ".join(["panda"] * 200)
    ids = ours([long], max_length=16)[0]
    assert ids[0] == ours.bos_id and ids[-1] == ours.eos_id
    assert len(ids) == 16


def test_decode_roundtrip(tok_files):
    ours = CLIPBPETokenizer.from_dir(tok_files)
    text = "a red panda climbing"
    ids = ours.encode(text)
    assert ours.decode(ids) == text


def test_determinism_across_instances(tok_files):
    a = CLIPBPETokenizer.from_dir(tok_files)
    b = CLIPBPETokenizer.from_dir(tok_files)
    for t in CORPUS:
        assert a.encode(t) == b.encode(t)
