"""Text stack tests — mirrors the reference's tokenizer window test
(lib/libmemex/src/llm/embedding.rs:200-218) plus WordPiece/chunker coverage."""

import numpy as np
import pytest

from memex_tpu.text import (
    WordPieceTokenizer,
    count_tokens,
    encode_windows,
    segment_text,
    split_text,
)
from memex_tpu.text.segment import window_token_ids


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer()


def test_tokenize_roundtrip(tok):
    text = "Hello, world! It's a test."
    ids = tok.encode(text)
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
    decoded = tok.decode(ids)
    assert "hello" in decoded
    assert decoded.count("[CLS]") == 0


def test_wordpiece_with_custom_vocab():
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "un", "##aff", "##able", "run"]
    t = WordPieceTokenizer(vocab=vocab)
    assert t.tokenize("unaffable") == ["un", "##aff", "##able"]
    assert t.tokenize("running") == ["[UNK]"]  # no continuation for 'ning'
    assert t.tokenize("run") == ["run"]


def test_windowing_stride_overlap(tok):
    # 600 content tokens, window 256 (254 content), stride 86 overlap
    ids = list(range(100, 700))
    windows = window_token_ids(ids, tok, max_length=256, stride=86)
    assert all(len(w) <= 256 for w in windows)
    assert windows[0][0] == tok.cls_id and windows[0][-1] == tok.sep_id
    # consecutive windows share exactly `stride` content tokens
    w0 = windows[0][1:-1]
    w1 = windows[1][1:-1]
    assert w0[-86:] == w1[:86]
    # all tokens covered
    covered = set()
    for w in windows:
        covered.update(w[1:-1])
    assert covered == set(ids)


def test_short_text_single_window(tok):
    segs = segment_text("this is a test string", tok)
    assert len(segs) == 1
    assert "test" in segs[0]


def test_long_text_multiple_windows(tok):
    text = " ".join(f"word{i}" for i in range(400))
    segs = segment_text(text, tok, max_length=256, stride=86)
    assert len(segs) > 1
    # overlap means consecutive segments share content
    assert segs[0] != segs[1]


def test_encode_windows_shapes(tok):
    ids, mask = encode_windows(["short", "a much longer text " * 50], tok, max_length=64)
    assert ids.shape == (2, 64) and mask.shape == (2, 64)
    assert ids.dtype == np.int32
    assert mask[0].sum() < 64  # short text padded
    assert mask[1].sum() == 64  # long text truncated
    assert ids[1, 63] == tok.sep_id  # trailing SEP preserved on truncation


def test_count_tokens_monotone():
    assert count_tokens("") == 0
    assert count_tokens("hello") >= 1
    assert count_tokens("hello world, this is a test") > count_tokens("hello")


def test_split_text_small_passthrough():
    assert split_text("tiny text", 100) == ["tiny text"]


def test_split_text_chunks_with_overlap():
    text = " ".join(f"w{i}" for i in range(2000))
    parts = split_text(text, 200)
    assert len(parts) > 1
    # ~10-word overlap between consecutive parts
    first_words = parts[0].split(" ")
    second_words = parts[1].split(" ")
    assert first_words[-10:] == second_words[:10]
    # every word present
    joined = " ".join(parts).split(" ")
    assert set(joined) == set(text.split(" "))


def test_vocab_file_loading(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "hello", "world"]))
    t = WordPieceTokenizer.from_vocab_file(str(p))
    assert t.vocab_size == 7
    assert t.tokenize("hello world") == ["hello", "world"]
