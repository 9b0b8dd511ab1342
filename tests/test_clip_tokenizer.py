"""CLIP BPE tokenizer: behavioral identity vs transformers.CLIPTokenizer.

Both tokenizers load the SAME toy merges/vocab assets, so any divergence is
an algorithm bug, not an asset difference. (The full 49408-token SD assets
are user-supplied at runtime, like the SD weights.)
"""

import jax  # noqa: F401  (keeps the platform pin of conftest active)
import pytest

from avatarcraft_tpu.models.clip_tokenizer import (
    BOS_TOKEN,
    EOS_TOKEN,
    CLIPTokenizer,
    bytes_to_unicode,
    make_toy_tokenizer,
)

PROMPTS = [
    "Hulk, photorealistic style",
    "a DSLR photo of the face of a warrior",
    "  weird   spacing\tand\nnewlines  ",
    "punctuation!!! and-hyphens (parens) 123",
    "the the the and and of of in in",
    "",
    "an extremely long prompt that will definitely exceed the maximum "
    "context length of the text encoder and therefore must be truncated "
    "cleanly with the end of text token kept in the final position "
    "padding padding padding padding padding padding padding padding "
    "padding padding padding padding padding padding padding padding "
    "padding padding padding padding padding padding padding padding",
]


def test_vocab_construction_matches_clip_convention():
    tok = make_toy_tokenizer()
    n_bytes = len(bytes_to_unicode())
    assert n_bytes == 256
    assert len(tok.encoder) == 2 * 256 + len(tok.merges) + 2
    assert tok.encoder[BOS_TOKEN] == len(tok.encoder) - 2
    assert tok.encoder[EOS_TOKEN] == len(tok.encoder) - 1


def test_encode_decode_roundtrip():
    tok = make_toy_tokenizer()
    # CLIP decode emits one space per BPE word (punctuation is its own word)
    cases = {
        "hulk style": "hulk style",
        "the quick brown fox!": "the quick brown fox !",
        "123 abc": "1 2 3 abc",  # digits are single tokens in CLIP's regex
    }
    for p, want in cases.items():
        assert tok.decode(tok.encode(p)) == want


def test_padding_and_truncation_semantics():
    tok = make_toy_tokenizer()
    batch = tok(PROMPTS, max_length=16)
    for row in batch:
        assert len(row) == 16
        assert row[0] == tok.bos_id
        assert row[-1] == tok.eos_id or tok.eos_id in row
    # empty prompt: BOS, EOS, then EOS padding
    empty = tok("", max_length=8)[0]
    assert empty[:2] == [tok.bos_id, tok.eos_id]
    assert all(i == tok.eos_id for i in empty[1:])


def test_matches_transformers_cliptokenizer(tmp_path):
    hf_tok_mod = pytest.importorskip("transformers")
    tok = make_toy_tokenizer()
    tok.save_assets(str(tmp_path))
    hf = hf_tok_mod.CLIPTokenizer(
        vocab_file=str(tmp_path / "vocab.json"),
        merges_file=str(tmp_path / "merges.txt"),
        model_max_length=16,
    )
    for p in PROMPTS:
        ours = tok(p, max_length=16)[0]
        theirs = hf(
            p, padding="max_length", max_length=16, truncation=True
        ).input_ids
        assert ours == theirs, f"mismatch on {p!r}:\n{ours}\n{theirs}"


def test_asset_roundtrip(tmp_path):
    tok = make_toy_tokenizer()
    tok.save_assets(str(tmp_path))
    tok2 = CLIPTokenizer.from_pretrained(str(tmp_path))
    assert tok2.encoder == tok.encoder
    assert tok2("hulk style of the thing") == tok("hulk style of the thing")


def test_merges_only_loading(tmp_path):
    """vocab.json is derivable from merges.txt alone (CLIP construction)."""
    tok = make_toy_tokenizer()
    tok.save_assets(str(tmp_path))
    (tmp_path / "vocab.json").unlink()
    tok2 = CLIPTokenizer.from_pretrained(str(tmp_path))
    assert tok2.encoder == tok.encoder
