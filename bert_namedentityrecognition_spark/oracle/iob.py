"""IOB2 tag-sequence semantics.

Re-implements (from documented behavior, not code copy) the reference's BIO
chunk FSM and span decoding:

- ``split_tag``        — semantics of ``util/iob_util.py:34-42``
- ``is_chunk_start``   — ``util/iob_util.py:386-397`` (NOTE: lenient — an
  ``I-X`` directly after ``O`` *opens* a chunk, unlike strict IOB2)
- ``is_chunk_end``     — ``util/iob_util.py:372-383``
- ``iob_to_spans``     — ``util/iob_util.py:62-94`` (``convert_iob_to_dict``):
  token-offset spans, end-exclusive, sentinel-padded linear scan
- ``spans_to_xml``     — ``util/iob_util.py:124-138`` cumulative-offset insert
- ``strict_entities`` / ``lenient_entities`` — seqeval-style span extraction
  used by the strict/lenient P-R-F1 metrics (``BERT/evaluate.py:46-58``).
"""

from __future__ import annotations


def split_tag(tag: str) -> tuple[str, str | None]:
    """``'B-C' -> ('B','C')``; ``'O' -> ('O', None)``; no dash -> ``(tag,'')``."""
    if tag == "O":
        return tag, None
    if "-" in tag:
        prefix, label = tag.split("-", 1)
        return prefix, label
    return tag, ""


def is_chunk_start(prev_tag: str, tag: str) -> bool:
    p1, t1 = split_tag(prev_tag)
    p2, t2 = split_tag(tag)
    if p2 == "B":
        return True
    if p2 == "O":
        return False
    if p1 == "O" and p2 == "I":  # lenient: I after O starts a chunk
        return True
    return t1 != t2


def is_chunk_end(tag: str, post_tag: str) -> bool:
    p1, t1 = split_tag(tag)
    p2, t2 = split_tag(post_tag)
    if p1 == "O":
        return False
    if p2 == "B":
        return True
    if p2 == "O":
        return p1 != "O"
    return t1 != t2


def iob_to_spans(tokens: list[str] | None, tags: list[str]) -> list[dict]:
    """Decode an IOB2 sequence into entity spans.

    Returns ``[{'start': s, 'end': e, 'type': t, 'word': w}]`` with token
    offsets, end-exclusive. If ``tokens`` is None the ``word`` field is ''.
    """
    if tokens is not None and len(tokens) != len(tags):
        raise ValueError("tokens and tags must align")
    padded = ["O"] + list(tags) + ["O"]
    s_pos = -1
    word = ""
    out: list[dict] = []
    for idx in range(1, len(padded) - 1):
        _, tag_type = split_tag(padded[idx])
        if is_chunk_start(padded[idx - 1], padded[idx]):
            s_pos = idx - 1
        if s_pos != -1 and tokens is not None:
            word += tokens[idx - 1]
        if is_chunk_end(padded[idx], padded[idx + 1]):
            out.append({"start": s_pos, "end": idx, "type": tag_type, "word": word})
            s_pos = -1
            word = ""
    return out


def iob_taglist_to_spans(tags: list[str]) -> list[dict]:
    """Span decode without surface text (``util/iob_util.py:97-121``)."""
    return [
        {"start": d["start"], "end": d["end"], "type": d["type"]}
        for d in iob_to_spans([""] * len(tags), tags)
    ]


def spans_to_xml(sent: str, spans: list[dict]) -> str:
    """Insert ``<type>...</type>`` around char spans, cumulative offsets."""
    spans = sorted(spans, key=lambda d: d["start"])
    inserts: list[tuple[int, str]] = []
    for d in spans:
        inserts.append((d["start"], "<" + d["type"] + ">"))
        inserts.append((d["end"], "</" + d["type"] + ">"))
    inserts.sort(key=lambda x: x[0])
    offset = 0
    for pos, tag in inserts:
        sent = sent[: pos + offset] + tag + sent[pos + offset :]
        offset += len(tag)
    return sent


def strict_entities(tags: list[str]) -> list[tuple[int, int, str]]:
    """Strict IOB2 entity extraction (seqeval ``mode='strict'``): chunks open
    only at ``B-``; an ``I-`` after ``O`` or after a different type is invalid
    and ignored."""
    out = []
    start = -1
    cur: str | None = None
    for i, tag in enumerate(tags + ["O"]):
        p, t = split_tag(tag)
        if cur is not None and (p in ("O", "B") or (p == "I" and t != cur)):
            out.append((start, i, cur))
            cur = None
        if p == "B":
            start, cur = i, t
    return out


def lenient_entities(tags: list[str]) -> list[tuple[int, int, str]]:
    """Lenient extraction (seqeval default / the reference FSM): ``I`` after
    ``O`` opens a chunk."""
    return [(d["start"], d["end"], d["type"]) for d in iob_taglist_to_spans(tags)]
