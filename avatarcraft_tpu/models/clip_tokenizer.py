"""Pure-Python CLIP BPE tokenizer (no external tokenizer dependency).

The reference tokenizes prompts with HuggingFace ``CLIPTokenizer``
(reference: models/diffusion.py:56,76-83 — ``padding='max_length',
max_length=77, truncation=True``). This module implements the identical
byte-level BPE algorithm (the one CLIP/SD 1.x ship) from scratch:

* lowercase + whitespace collapse + html unescape (ftfy fixup when the
  library is present; prompts are ASCII in practice),
* the CLIP word-split regex (``regex`` module for \\p classes),
* byte -> printable-unicode mapping, BPE merges with the ``</w>``
  end-of-word marker, ``<|startoftext|>``/``<|endoftext|>`` specials,
* max-length padding with the EOS token (SD 1.x convention).

Vocabulary handling: CLIP's vocab.json is fully determined by the merges
file (256 byte symbols + their ``</w>`` forms + one token per merge +
2 specials = 49408 entries), so a ``merges.txt`` alone suffices; a
``vocab.json`` is honored when supplied. Assets are user-supplied alongside
the SD weights (this container has no network and ships no model assets) —
``save_assets``/``from_pretrained`` round-trip them, and the test suite
verifies behavioral identity against ``transformers.CLIPTokenizer`` on
shared toy assets.
"""

from __future__ import annotations

import functools
import html
import json
import os

import regex as re

BOS_TOKEN = "<|startoftext|>"
EOS_TOKEN = "<|endoftext|>"


@functools.lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2/CLIP reversible byte -> printable unicode char mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def basic_clean(text: str) -> str:
    try:  # ftfy is optional; identity for well-formed input
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    """Byte-level BPE tokenizer with CLIP semantics.

    ``merges``: ordered list of (a, b) merge pairs. ``vocab``: token -> id;
    derived from the merges when omitted (CLIP's canonical construction).
    """

    def __init__(self, merges: list[tuple[str, str]], vocab: dict[str, int] | None = None):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.merges = list(merges)
        if vocab is None:
            base = list(bytes_to_unicode().values())
            tokens = base + [v + "</w>" for v in base]
            tokens += ["".join(m) for m in self.merges]
            tokens += [BOS_TOKEN, EOS_TOKEN]
            vocab = {t: i for i, t in enumerate(tokens)}
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(self.merges, range(len(self.merges))))
        self.cache: dict[str, str] = {BOS_TOKEN: BOS_TOKEN, EOS_TOKEN: EOS_TOKEN}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )
        self.bos_id = self.encoder[BOS_TOKEN]
        self.eos_id = self.encoder[EOS_TOKEN]
        self.model_max_length = 77

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str) -> "CLIPTokenizer":
        """Load from a directory holding ``merges.txt`` (+ optional
        ``vocab.json``) — the exact files HF tokenizer dirs ship."""
        with open(os.path.join(path, "merges.txt"), encoding="utf-8") as fp:
            lines = fp.read().split("\n")
        merges = [
            tuple(l.split()) for l in lines if l and not l.startswith("#")
        ]
        merges = [m for m in merges if len(m) == 2]
        vocab = None
        vpath = os.path.join(path, "vocab.json")
        if os.path.exists(vpath):
            with open(vpath, encoding="utf-8") as fp:
                vocab = json.load(fp)
        return cls(merges, vocab)

    def save_assets(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "merges.txt"), "w", encoding="utf-8") as fp:
            fp.write("#version: 0.2\n")
            fp.write("\n".join(" ".join(m) for m in self.merges))
            fp.write("\n")
        with open(os.path.join(path, "vocab.json"), "w", encoding="utf-8") as fp:
            json.dump(self.encoder, fp, ensure_ascii=False)

    # ------------------------------------------------------------------
    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"

        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        """Text -> BPE ids (no specials)."""
        text = whitespace_clean(basic_clean(text)).lower()
        ids: list[int] = []
        for token in self.pat.findall(text):
            mapped = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(mapped).split(" "))
        return ids

    def decode(self, ids: list[int]) -> str:
        text = "".join(self.decoder[i] for i in ids if i not in (self.bos_id, self.eos_id))
        data = bytearray(self.byte_decoder[c] for c in text)
        return data.decode("utf-8", errors="replace").replace("</w>", " ").strip()

    def __call__(self, texts: list[str] | str, max_length: int | None = None):
        """HF-call parity: BOS + tokens + EOS, truncate to max_length keeping
        a final EOS, pad with EOS to max_length. Returns [B, L] int32 list."""
        if isinstance(texts, str):
            texts = [texts]
        L = max_length or self.model_max_length
        batch = []
        for t in texts:
            ids = [self.bos_id] + self.encode(t) + [self.eos_id]
            if len(ids) > L:
                ids = ids[: L - 1] + [self.eos_id]
            ids = ids + [self.eos_id] * (L - len(ids))
            batch.append(ids)
        return batch


def make_toy_tokenizer() -> CLIPTokenizer:
    """Small but real tokenizer for tests: byte alphabet + a handful of
    merges; same construction path as the full asset."""
    merges = [
        ("t", "h"),
        ("th", "e</w>"),
        ("a", "n"),
        ("an", "d</w>"),
        ("i", "n"),
        ("o", "f</w>"),
        ("r", "e"),
        ("e", "r"),
        ("in", "g</w>"),
        ("h", "u"),
        ("hu", "l"),
        ("hul", "k</w>"),
        ("s", "t"),
        ("st", "y"),
        ("l", "e</w>"),
        ("sty", "le</w>"),
    ]
    return CLIPTokenizer(merges)
