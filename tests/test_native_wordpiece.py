"""Native C++ WordPiece: parity with the python tokenizer and HF BertTokenizer."""

import numpy as np
import pytest

from multimodal_timesfm_tpu.text.native import load_library, NativeWordPiece
from multimodal_timesfm_tpu.text.tokenizer import WordPieceTokenizer

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jump ##s over lazy dog "
    "report prediction search energy price ##d cafe , . ! un ##known".split()
)

TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "Report: energy priced, searched!",
    "unknown unknowable",
    "",
    "  spaces   and, punctuation! ",
    "CAFE Café café",  # accent folding: café -> cafe
    "Āłstraße",  # latin-ext chars
    "a" * 150,  # > max_chars_per_word -> UNK
]


@pytest.fixture()
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return p


@pytest.fixture(scope="module")
def native_available():
    if load_library() is None:
        pytest.skip("native toolchain unavailable")


def test_native_matches_python(vocab_file, native_available):
    py = WordPieceTokenizer(vocab_file, use_native=False)
    native = NativeWordPiece(vocab_file)
    for text in TEXTS:
        assert native.encode(text) == py.encode(text), repr(text)


def test_native_matches_transformers(vocab_file, native_available):
    from transformers import BertTokenizer

    hf = BertTokenizer(str(vocab_file), do_lower_case=True)
    native = NativeWordPiece(vocab_file)
    for text in TEXTS[:6]:
        assert native.encode(text) == hf.encode(text, add_special_tokens=True), repr(text)


def test_tokenizer_uses_native_by_default(vocab_file, native_available):
    tok = WordPieceTokenizer(vocab_file)
    assert tok._native is not None
    py = WordPieceTokenizer(vocab_file, use_native=False)
    for text in TEXTS:
        assert tok.encode(text) == py.encode(text)


def test_truncation_matches(vocab_file, native_available):
    py = WordPieceTokenizer(vocab_file, use_native=False)
    native = NativeWordPiece(vocab_file)
    long_text = "the quick brown fox " * 50
    a, b = native.encode(long_text, 16), py.encode(long_text, 16)
    assert len(a) <= 16 and a[-1] == py.sep_id
    assert a == b


def test_native_speedup(vocab_file, native_available):
    import time

    py = WordPieceTokenizer(vocab_file, use_native=False)
    native = NativeWordPiece(vocab_file)
    text = "the quick brown fox jumps over the lazy dog " * 20
    t0 = time.perf_counter()
    for _ in range(200):
        py.encode(text)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(200):
        native.encode(text)
    t_native = time.perf_counter() - t0
    assert t_native < t_py  # typically 20-100x


def test_unicode_punct_and_format_chars_match_hf(vocab_file, native_available):
    """Latin-1 punctuation and Cf format chars: native == python == HF."""
    from transformers import BertTokenizer

    hf = BertTokenizer(str(vocab_file), do_lower_case=True)
    py = WordPieceTokenizer(vocab_file, use_native=False)
    native = NativeWordPiece(vocab_file)
    cases = [
        "«the»",        # guillemets (Latin-1 Pi/Pf)
        "¿the?",             # inverted question mark
        "the·dog",           # middle dot
        "the‎fox",           # LRM (Cf) inside a word
        "​the﻿dog",     # ZWSP + BOM
        "the­dog",           # soft hyphen (Cf)
    ]
    for text in cases:
        ref = hf.encode(text, add_special_tokens=True)
        assert py.encode(text) == ref, f"py {text!r}"
        assert native.encode(text) == ref, f"native {text!r}"


def test_native_fuzz_vs_python_on_parity_domain(vocab_file, native_available):
    """Random ASCII + Latin-1/Ext-A text: native ids must equal python ids."""
    import random

    py = WordPieceTokenizer(vocab_file, use_native=False)
    native = NativeWordPiece(vocab_file)
    rng = random.Random(1)
    alphabet = (
        "abcdefghij THE QUICK brown fox dog ,.!?«»¿·§¶ éàüñÅåŁłðßþœĆčĘşŽž 0123 \t\n"
    )
    for _ in range(300):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 50)))
        assert native.encode(text) == py.encode(text), repr(text)


def test_embedded_nul_matches_python(vocab_file, native_available):
    """Embedded NUL bytes: the C ABI is strlen-terminated, so the binding
    strips them first — the Python _clean drops them too, keeping both paths
    id-identical (review finding: native silently truncated at the NUL)."""
    nat = NativeWordPiece(vocab_file)
    py = WordPieceTokenizer(vocab_file, use_native=False)
    text = "the quick\x00 brown fox"
    assert nat.encode(text) == py.encode(text)
    # sanity: tokens AFTER the NUL are present
    assert py.vocab["fox"] in nat.encode(text)


def test_duplicate_vocab_token_last_wins(tmp_path, native_available):
    """Duplicate vocab lines resolve last-occurrence-wins in BOTH paths
    (review finding: C++ emplace kept the first; Python dict keeps the last,
    matching HF load_vocab)."""
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "fox", "the", "fox"]
    p = tmp_path / "dup_vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    py = WordPieceTokenizer(p, use_native=False)
    assert py.vocab["fox"] == 6  # last occurrence
    nat = NativeWordPiece(p)
    assert nat.encode("fox") == py.encode("fox")
    assert py.vocab["fox"] in nat.encode("fox")
