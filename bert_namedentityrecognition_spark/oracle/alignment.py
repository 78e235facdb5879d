"""Gold-label re-alignment under tokenizer normalization.

Reproduces ``normalize_tagged_dataset`` (``BERT/Model.py:353-385``, twin at
``BERT/bert_utils.py:5-37``): re-tokenize each character of a char-level
gold sequence with the model tokenizer (after han_to_zen, control tokens
exempt), dropping ''/' ' tokens and duplicating the character's tag across
expanded tokens.

QUIRK PRESERVED: the reference *intends* to turn a duplicated ``B-`` into
``I-`` on expansion ("make the subsequent ones as Intra", :377-380) but its
``last_tag`` guard variable is never assigned inside the loop, so the
condition ``last_tag.startswith('B')`` is never true and tags are duplicated
verbatim. We replicate the observed behavior by default;
``fix_b_duplication=True`` gives the documented intent for callers that
want well-formed IOB2.
"""

from __future__ import annotations

from collections.abc import Callable

from .textproc import han_to_zen

CONTROL_TOKENS = ("[CLS]", "[PAD]", "[UNK]")


def _char_tokenize(ch: str) -> list[str]:
    return [ch]


def normalize_tagged_dataset(
    sentences: list[list[str]],
    tags: list[list[str]],
    tokenize: Callable[[str], list[str]] = _char_tokenize,
    fix_b_duplication: bool = False,
) -> tuple[list[list[str]], list[list[str]]]:
    out_sents: list[list[str]] = []
    out_tags: list[list[str]] = []
    for sentence, tag_sentence in zip(sentences, tags):
        ps: list[str] = []
        pt: list[str] = []
        for character, tag_character in zip(sentence, tag_sentence):
            pieces = tokenize(
                han_to_zen(character) if character not in CONTROL_TOKENS else character
            )
            last_tag = ""  # reference: never reassigned → duplication verbatim
            for token in pieces:
                if token == "" or token == " ":
                    continue
                ps.append(token)
                if fix_b_duplication:
                    if last_tag.startswith("B") and last_tag == tag_character:
                        tag_character = tag_character.replace("B", "I", 1)
                    last_tag = tag_character
                else:
                    if last_tag.startswith("B") and last_tag == tag_character:
                        tag_character = tag_character.replace("B", "I", 1)
                pt.append(tag_character)
        out_sents.append(ps)
        out_tags.append(pt)
    return out_sents, out_tags


def drop_length_mismatches(
    gold_tokens: list[list[str]],
    gold_tags: list[list[str]],
    pred_tags: list[list[str]],
) -> tuple[list[list[str]], list[list[str]], int]:
    """Pairwise drop of sequences whose gold/pred lengths disagree
    (``BERT/evaluate.py:31-44``). Returns (gold_tags, pred_tags, n_dropped)."""
    g_out, p_out, dropped = [], [], 0
    for toks, g, p in zip(gold_tokens, gold_tags, pred_tags):
        if len(g) == len(p) == len(toks):
            g_out.append(g)
            p_out.append(p)
        else:
            dropped += 1
    return g_out, p_out, dropped
