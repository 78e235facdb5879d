"""Inline-XML annotation → character-offset span extraction.

Re-implements the observable semantics of the reference's
``convert_xml_to_taglist`` (``util/iob_util.py:192-243``) on top of the
stdlib ``xml.etree`` pull parser (the reference uses lxml; unavailable here):

- wraps the sentence in ``<sent>...</sent>``
- tracks a running character offset over text/tail segments
- nested tags: closing an inner tag extends every still-open enclosing tag's
  end offset to the inner tag's end and appends the inner word to the
  enclosing word — and, notably, a tail that follows a closed child is NOT
  added to the enclosing span (quirk verified against the golden case at
  ``util/iob_util.py:421-428``)
- label tuples are emitted in *close* order: ``(start, end, tag+attrs, word)``
- strict mode (default, ``ignore_mismatch_tags=True`` upstream): malformed
  XML raises ``XmlSpanError`` and the caller drops the row
  (``util/iob_util.py:341-348``)

Also ``convert_taglist_to_iob`` semantics (``util/iob_util.py:257-289``) as
``taglist_to_iob`` and the composition ``xml_text_to_iob``
(``util/iob_util.py:292-309``).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


class XmlSpanError(ValueError):
    """Raised on malformed inline XML (maps the reference's XMLSyntaxError)."""


def xml_to_taglist(
    sent: str,
    tag_list: list[str] | None = None,
    attr: list[str] | None = None,
) -> tuple[str, list[tuple[int, int, str, str]]]:
    """Extract (clean_text, [(start, end, tag+attrs, word)]) from inline XML.

    Depth ≥ 2 nesting replicates the reference's stale-``word`` quirk
    (``util/iob_util.py:231-238``: on close, enclosing spans absorb the
    LAST-seen text segment — the closed child's tail — not the child's
    accumulated word): ``<a>x<b>y<c>z</c>w</b>v</a>`` yields
    ``(0, 4, 'a', 'xzw')`` for the outer tag, end offset including the
    tail 'w' and word missing 'y'. Pinned by
    tests/test_oracle_xmlspan.py::test_depth2_nesting_reference_quirk —
    bug-compatible by design, like the B→I dead-code quirk (CLAUDE.md
    rule 7)."""
    if attr is None:
        attr = []
    text = "<sent>" + sent + "</sent>"
    try:
        parser = ET.XMLPullParser(["start", "end"])
        parser.feed(text)
        events = list(parser.read_events())
        parser.close()
    except ET.ParseError as e:  # strict mode: caller skips the row
        raise XmlSpanError(str(e)) from e

    res = ""
    label: list[tuple[int, int, str, str]] = []
    open_tags: list[list] = []  # [start, end, tag+attrs, word, raw_tag]
    idx = 0
    word = ""

    for event, elem in events:
        isuse = tag_list is None or elem.tag in tag_list
        if event == "start":
            s_pos = idx
            attr_list = (
                "".join(v for k, v in elem.attrib.items() if k in attr)
                if elem.attrib
                else ""
            )
            word = elem.text if elem.text is not None else ""
            res += word
            idx += len(word)
            if elem.tag != "sent" and isuse:
                open_tags.append([s_pos, idx, elem.tag + attr_list, word, elem.tag])
        else:  # end
            if elem.tag != "sent" and isuse and open_tags and open_tags[-1][-1] == elem.tag:
                closed = open_tags.pop()
                label.append(tuple(closed[:-1]))
                for enclosing in open_tags:
                    enclosing[1] = idx
                    enclosing[3] += word
            word = elem.tail if elem.tail is not None else ""
            res += word
            idx += len(word)

    return res, label


def taglist_to_iob(
    sent: str,
    label: list[tuple[int, int, str, str]],
    tokenizer=list,
) -> list[tuple[str, str]]:
    """Char spans + tokenizer → per-token (token, B-/I-/O) alignment.

    Mirrors ``util/iob_util.py:257-289``: a token whose last char reaches a
    span start gets ``B-``, subsequent tokens inside the span get ``I-``;
    space tokens are dropped at the end.
    """
    tokens = tokenizer(sent)
    results: list[tuple[str, str]] = []
    idx = 0
    i = 0
    j = 0
    nebegin = True
    while j < len(sent) and idx < len(label):
        k = j + len(tokens[i]) - 1
        if k < label[idx][0]:
            results.append((tokens[i], "O"))
        elif label[idx][0] <= k and nebegin:
            results.append((tokens[i], "B-" + label[idx][2]))
            nebegin = False
        else:
            results.append((tokens[i], "I-" + label[idx][2]))
        j += len(tokens[i])
        i += 1
        while idx < len(label) and label[idx][1] <= j:
            idx += 1
            nebegin = True
    while i < len(tokens):
        results.append((tokens[i], "O"))
        i += 1
    return [r for r in results if r[0] != " " or r[0] == ""]


def xml_text_to_iob(
    sent: str,
    tag_list: list[str] | None = None,
    attr: list[str] | None = None,
    tokenizer=list,
) -> list[tuple[str, str]]:
    """Compose xml→taglist→iob, dropping newline tokens
    (``util/iob_util.py:292-309``). Labels must be sorted by start for the
    alignment scan."""
    res, label = xml_to_taglist(sent, tag_list=tag_list, attr=attr)
    label = sorted(label, key=lambda t: (t[0], t[1]))
    iob = taglist_to_iob(res, label, tokenizer=tokenizer)
    return [item for item in iob if item[0] != "\n"]
