"""Greedy-longest-match WordPiece tokenizer (pure Python).

Stand-in for ``BertJapaneseTokenizer`` with char-v2 semantics
(``cl-tohoku/bert-base-japanese-char-v2`` used at ``BERT/Model.py:84``):
greedy longest-prefix matching against a vocab, continuation pieces
prefixed ``##``, unknown chars → ``[UNK]``, whitespace produces no tokens.
The real model's tokenizer drops in unchanged (same tokenize/encode
surface); this one exists so the token-expansion code paths (B-tag
duplication in ``normalize_tagged_dataset``, sub-token span alignment) are
exercised end-to-end without the transformers dependency.
"""

from __future__ import annotations

PAD, CLS, UNK, SEP = "[PAD]", "[CLS]", "[UNK]", "[SEP]"


class WordPieceTokenizer:
    def __init__(self, vocab: list[str], max_chars_per_word: int = 100):
        specials = [PAD, CLS, UNK, SEP]
        self.itos = specials + [v for v in vocab if v not in specials]
        self.stoi = {t: i for i, t in enumerate(self.itos)}
        self.max_chars = max_chars_per_word

    @classmethod
    def from_itos(
        cls, itos: list[str], max_chars_per_word: int = 100
    ) -> "WordPieceTokenizer":
        """Restore from a saved id→piece table verbatim (checkpoint load
        path — piece ids must match the trained embedding rows)."""
        tok = cls.__new__(cls)
        tok.itos = list(itos)
        tok.stoi = {t: i for i, t in enumerate(tok.itos)}
        tok.max_chars = max_chars_per_word
        return tok

    def tokenize(self, text: str) -> list[str]:
        return [p for p, _, _ in self.tokenize_with_spans(text)]

    def tokenize_with_spans(self, text: str) -> list[tuple[str, int, int]]:
        """(piece, char_start, char_end) per piece, end-exclusive offsets
        into ``text`` — the alignment table the NER decode needs to lift
        piece-index BIO spans back to character spans. Same greedy matching
        as :meth:`tokenize` (which delegates here); a word that fails to
        tokenize or exceeds ``max_chars`` becomes one ``[UNK]`` spanning the
        whole word."""
        out: list[tuple[str, int, int]] = []
        pos = 0
        n = len(text)
        while pos < n:
            if text[pos].isspace():
                pos += 1
                continue
            wend = pos
            while wend < n and not text[wend].isspace():
                wend += 1
            word = text[pos:wend]
            if len(word) > self.max_chars:
                out.append((UNK, pos, wend))
                pos = wend
                continue
            start = 0
            pieces: list[tuple[str, int, int]] = []
            bad = False
            while start < len(word):
                end = len(word)
                cur = None
                while start < end:
                    piece = word[start:end]
                    if start > 0:
                        piece = "##" + piece
                    if piece in self.stoi:
                        cur = piece
                        break
                    end -= 1
                if cur is None:
                    bad = True
                    break
                pieces.append((cur, pos + start, pos + end))
                start = end
            out.extend([(UNK, pos, wend)] if bad else pieces)
            pos = wend
        return out

    def encode(self, tokens: list[str]) -> list[int]:
        unk = self.stoi[UNK]
        return [self.stoi[CLS]] + [self.stoi.get(t, unk) for t in tokens]


def char_vocab_with_pieces(texts: list[str], extra_pieces: list[str] | None = None) -> list[str]:
    """Char-v2-style vocab: every char + optional multi-char pieces."""
    chars = sorted({c for t in texts for c in t if not c.isspace()})
    pieces = sorted(set(extra_pieces or []))
    return chars + ["##" + c for c in chars] + pieces
