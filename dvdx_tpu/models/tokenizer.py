"""CLIP byte-level BPE tokenizer (the real one, self-contained).

The reference tokenises prompts with the pretrained CLIP tokenizer that ships
inside the diffusers checkpoint (`/root/reference/InferNet/neurons/miner.py:557-568`
via the pipeline's `tokenizer/vocab.json` + `merges.txt`;
`/root/reference/InferNet/template/validator/scoring.py:87-109` for scoring).
This module implements that exact algorithm — lowercasing + whitespace
cleanup, the CLIP regex split, byte→unicode mapping, end-of-word `</w>` BPE
with ranked merges, `<|startoftext|>`/`<|endoftext|>` framing, EOS padding —
against vocab/merges files supplied at runtime (e.g. the `tokenizer/` folder
of a diffusers checkpoint ingested by utils/convert.py).

Zero-egress note: the 49,152-entry CLIP vocab is data we cannot download in
this environment, so it is NOT vendored; algorithmic parity is instead proven
against `transformers.CLIPTokenizer` on locally constructed BPE vocabularies
(tests/test_tokenizer.py). Drop the real `vocab.json`/`merges.txt` next to a
checkpoint and this IS the CLIP tokenizer.

Determinism contract: tokenisation is part of the Proof-of-Inference chain —
miner and validator must derive identical ids, so both sides must load the
same tokenizer files (the checkpoint pins them).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:  # the CLIP split pattern needs \p{L}/\p{N}; `regex` ships in this image
    import regex as _re
except ImportError:  # pragma: no cover
    _re = None


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP reversible byte -> printable-unicode map (the standard
    byte-level-BPE alphabet)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


_PAT = (r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
        r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+")


def _whitespace_clean(text: str) -> str:
    import re

    return re.sub(r"\s+", " ", text).strip()


class CLIPBPETokenizer:
    """text -> int32 ids, byte-for-byte compatible with the HF/openai CLIP
    tokenizer given the same vocab/merges files."""

    def __init__(self, vocab: Dict[str, int], merges: Sequence[Tuple[str, str]],
                 bos_token: str = "<|startoftext|>",
                 eos_token: str = "<|endoftext|>",
                 model_max_length: int = 77):
        if _re is None:  # pragma: no cover
            raise RuntimeError("CLIPBPETokenizer needs the `regex` package")
        self.vocab = dict(vocab)
        self.decoder = {v: k for k, v in self.vocab.items()}
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.bos_token, self.eos_token = bos_token, eos_token
        self.bos_id = self.vocab[bos_token]
        self.eos_id = self.vocab[eos_token]
        self.pad_id = self.eos_id          # CLIP pads with <|endoftext|>
        self.model_max_length = model_max_length
        self.pat = _re.compile(_PAT, _re.IGNORECASE)
        self._cache: Dict[str, str] = {bos_token: bos_token, eos_token: eos_token}
        # HF parity: without ftfy, CLIPTokenizer normalises through
        # BasicTokenizer(strip_accents=False, do_split_on_punc=False)
        try:
            from transformers.models.bert.tokenization_bert import BasicTokenizer

            self._nlp = BasicTokenizer(strip_accents=False,
                                       do_split_on_punc=False)
        except Exception:  # pragma: no cover
            self._nlp = None

    # -- construction -----------------------------------------------------

    @classmethod
    def from_files(cls, vocab_file: str, merges_file: str,
                   **kw) -> "CLIPBPETokenizer":
        with open(vocab_file, encoding="utf-8") as f:
            vocab = json.load(f)
        with open(merges_file, encoding="utf-8") as f:
            lines = f.read().strip().split("\n")
        # first line is the "#version:" header (skipped, as HF does)
        merges = [tuple(l.split()) for l in lines[1:] if l and len(l.split()) == 2]
        return cls(vocab, merges, **kw)

    @classmethod
    def from_dir(cls, path: str, **kw) -> "CLIPBPETokenizer":
        """Load from a diffusers checkpoint's tokenizer/ folder."""
        return cls.from_files(os.path.join(path, "vocab.json"),
                              os.path.join(path, "merges.txt"), **kw)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    # -- BPE core ----------------------------------------------------------

    def bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.ranks.get(p, float("inf")))
            if bigram not in self.ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    # -- public API ---------------------------------------------------------

    def tokenize(self, text: str) -> List[str]:
        if self._nlp is not None:
            text = " ".join(self._nlp.tokenize(text))
        else:  # pragma: no cover
            text = _whitespace_clean(text)
        text = _whitespace_clean(text).lower()
        toks: List[str] = []
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            toks.extend(self.bpe(token).split(" "))
        return toks

    def encode(self, text: str) -> List[int]:
        """Token ids without special tokens."""
        return [self.vocab[t] for t in self.tokenize(text)]

    def __call__(self, texts, max_length: Optional[int] = None) -> np.ndarray:
        """Diffusers-style batch encode: [BOS] ids[:L-2] [EOS], EOS-padded to
        max_length. Returns (B, max_length) int32."""
        if isinstance(texts, str):
            texts = [texts]
        L = max_length or self.model_max_length
        out = np.full((len(texts), L), self.pad_id, np.int32)
        for r, text in enumerate(texts):
            ids = [self.bos_id] + self.encode(text)[: L - 2] + [self.eos_id]
            out[r, : len(ids)] = ids
        return out

    def decode(self, ids: Sequence[int], skip_special: bool = True) -> str:
        toks = [self.decoder[int(i)] for i in ids if int(i) in self.decoder]
        if skip_special:
            toks = [t for t in toks if t not in (self.bos_token, self.eos_token)]
        text = "".join(toks).replace("</w>", self.byte_encoder[ord(" ")])
        raw = bytearray(self.byte_decoder[c] for c in text
                        if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").strip()


def build_test_vocab(words: Sequence[str]) -> Tuple[Dict[str, int], List[Tuple[str, str]]]:
    """Construct a small but GENUINE BPE (vocab, merges) by greedy pair-count
    training over `words` — used by the parity tests to instantiate both this
    tokenizer and transformers.CLIPTokenizer from identical files."""
    alphabet = list(bytes_to_unicode().values())
    vocab_list = alphabet + [a + "</w>" for a in alphabet]
    merges: List[Tuple[str, str]] = []
    corpus: Dict[Tuple[str, ...], int] = {}
    b2u = bytes_to_unicode()
    for w in words:
        enc = "".join(b2u[b] for b in w.encode("utf-8"))
        key = tuple(enc[:-1]) + (enc[-1] + "</w>",)
        corpus[key] = corpus.get(key, 0) + 1
    for _ in range(128):  # cap merge count
        counts: Dict[Tuple[str, str], int] = {}
        for word, n in corpus.items():
            for p in zip(word[:-1], word[1:]):
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = max(sorted(counts), key=lambda p: counts[p])
        if counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        vocab_list.append(merged)
        new_corpus: Dict[Tuple[str, ...], int] = {}
        for word, n in corpus.items():
            out: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_corpus[tuple(out)] = new_corpus.get(tuple(out), 0) + n
        corpus = new_corpus
    vocab_list += ["<|startoftext|>", "<|endoftext|>"]
    return {tok: i for i, tok in enumerate(vocab_list)}, merges


def write_tokenizer_files(dirpath: str, vocab: Dict[str, int],
                          merges: Sequence[Tuple[str, str]]):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(dirpath, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
