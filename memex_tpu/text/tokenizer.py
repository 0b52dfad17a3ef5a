"""BERT-style WordPiece tokenizer, self-contained.

Implements the same pipeline as HF's BertTokenizer (which the reference
uses indirectly via rust-bert/tokenizers for all-MiniLM models,
lib/libmemex/src/llm/embedding.rs:160-186): basic tokenization (lowercase,
accent strip, punctuation split, CJK isolation) followed by greedy
longest-match WordPiece with "##" continuations.

Vocab sources, in order:
  1. an explicit `vocab.txt` path (HF format, one token per line) — gives
     exact-id parity with real MiniLM checkpoints;
  2. the built-in fallback vocab: special tokens + printable characters as
     both word-initial and "##" continuation pieces, so any text tokenizes
     deterministically without downloads.
"""

from __future__ import annotations

import os
import unicodedata

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"
SPECIALS = [PAD, UNK, CLS, SEP, MASK]


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0xF900 <= cp <= 0xFAFF
    )


def _build_fallback_vocab() -> list[str]:
    """Deterministic character-level vocab covering ASCII + Latin-1 +
    common unicode; every char appears as word-initial and continuation."""
    chars: list[str] = []
    for cp in range(0x21, 0x7F):  # printable ASCII
        chars.append(chr(cp))
    for cp in range(0xA1, 0x100):  # latin-1 supplement
        ch = chr(cp)
        if unicodedata.category(ch)[0] != "C":
            chars.append(ch)
    vocab = list(SPECIALS)
    vocab.extend(chars)
    vocab.extend("##" + c for c in chars)
    return vocab


class WordPieceTokenizer:
    def __init__(
        self,
        vocab: list[str] | None = None,
        lowercase: bool = True,
        strip_accents: bool = True,
        max_chars_per_word: int = 100,
    ):
        if vocab is None:
            vocab = _build_fallback_vocab()
        self.vocab = vocab
        self.token_to_id = {tok: i for i, tok in enumerate(vocab)}
        self.lowercase = lowercase
        self.strip_accents = strip_accents
        self.max_chars_per_word = max_chars_per_word
        self.pad_id = self.token_to_id[PAD]
        self.unk_id = self.token_to_id[UNK]
        self.cls_id = self.token_to_id[CLS]
        self.sep_id = self.token_to_id[SEP]

    @classmethod
    def from_vocab_file(cls, path: str, **kw) -> "WordPieceTokenizer":
        with open(path, "r", encoding="utf-8") as fh:
            vocab = [line.rstrip("\n") for line in fh if line.rstrip("\n")]
        return cls(vocab=vocab, **kw)

    @classmethod
    def from_pretrained_dir(cls, model_dir: str, **kw) -> "WordPieceTokenizer":
        path = os.path.join(model_dir, "vocab.txt")
        if os.path.exists(path):
            return cls.from_vocab_file(path, **kw)
        return cls(**kw)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    # -- basic tokenization -------------------------------------------------
    def _basic_tokenize(self, text: str) -> list[str]:
        text = unicodedata.normalize("NFC", text)
        if self.lowercase:
            text = text.lower()
        if self.strip_accents:
            text = "".join(
                c
                for c in unicodedata.normalize("NFD", text)
                if unicodedata.category(c) != "Mn"
            )
        out: list[str] = []
        word: list[str] = []

        def flush():
            if word:
                out.append("".join(word))
                word.clear()

        for ch in text:
            cp = ord(ch)
            if ch.isspace() or unicodedata.category(ch)[0] == "C":
                flush()
            elif _is_punctuation(ch) or _is_cjk(cp):
                flush()
                out.append(ch)
            else:
                word.append(ch)
        flush()
        return out

    # -- wordpiece ----------------------------------------------------------
    def _wordpiece(self, word: str) -> list[str]:
        if len(word) > self.max_chars_per_word:
            return [UNK]
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.token_to_id:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [UNK]
            pieces.append(piece)
            start = end
        return pieces

    def tokenize(self, text: str) -> list[str]:
        tokens: list[str] = []
        for word in self._basic_tokenize(text):
            tokens.extend(self._wordpiece(word))
        return tokens

    # -- native fast path ----------------------------------------------------
    _native = None  # (lib, handle) once initialized; False if unavailable

    def _native_encode(self, text: str) -> list[int] | None:
        """C++ WordPiece (native/text/wordpiece.cpp) — ~10x the Python
        pipeline on long documents; used unless MEMEX_NO_NATIVE is set.
        Returns None when the native lib is unavailable."""
        if self._native is False:
            return None
        if self._native is None:
            import os as _os

            if _os.environ.get("MEMEX_NO_NATIVE"):
                self._native = False
                return None
            try:
                from ..native_lib import text_lib

                lib = text_lib()
                blob = "\n".join(self.vocab).encode("utf-8")
                handle = lib.wp_new(blob, len(blob), self.unk_id)
                # persist blob ref: wp_new copies, but keep lib+handle
                self._native = (lib, handle)
            except Exception:
                self._native = False
                return None
        lib, handle = self._native
        import ctypes

        raw = text.encode("utf-8")
        cap = max(256, len(raw) * 2)
        out = (ctypes.c_int32 * cap)()
        n = lib.wp_encode(handle, raw, len(raw), out, cap)
        if n > cap:  # extremely pathological expansion; retry exact
            out = (ctypes.c_int32 * n)()
            n = lib.wp_encode(handle, raw, len(raw), out, n)
        return list(out[:n])

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        ids = self._native_encode(text)
        if ids is None:
            ids = [self.token_to_id.get(t, self.unk_id) for t in self.tokenize(text)]
        if add_special_tokens:
            return [self.cls_id] + ids + [self.sep_id]
        return ids

    # -- decoding -----------------------------------------------------------
    def decode(self, ids: list[int], skip_special_tokens: bool = True) -> str:
        special_ids = {self.token_to_id[s] for s in SPECIALS}
        parts: list[str] = []
        for i in ids:
            if skip_special_tokens and i in special_ids:
                continue
            tok = self.vocab[i] if 0 <= i < len(self.vocab) else UNK
            if tok.startswith("##"):
                if parts:
                    parts[-1] += tok[2:]
                else:
                    parts.append(tok[2:])
            else:
                parts.append(tok)
        text = " ".join(parts)
        # Re-attach punctuation like HF decoders do (and the reference's
        # " ' " fixup, embedding.rs:172-176).
        for p in [",", ".", "!", "?", ";", ":", "'", ")", "]", "}", "%"]:
            text = text.replace(" " + p, p)
        for p in ["(", "[", "{", "$", "#"]:
            text = text.replace(p + " ", p)
        text = text.replace("' ", "'")
        return text
