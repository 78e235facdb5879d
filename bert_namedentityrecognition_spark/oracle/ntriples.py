"""N-Triples line format — escape/unescape/format/parse kernels (pure
Python, no Spark imports; rule 6: semantics live here, the Spark sink/scan
and the SQL twin both follow).

Scope: the simple-literal subset a KG triple export needs — ``<subj-iri>
<pred-iri> "literal" .`` per line (W3C RDF 1.1 N-Triples).  ECHAR escaping
covers the five sequences the canonical form uses: ``\\ \" \n \r \t``.
Unescape is a LEFT-TO-RIGHT scan, NOT chained replaces — ``'a\\\\nb'``
(escaped backslash, then letter n) must round-trip to backslash + 'n',
which replace-chains corrupt.  Escape IS expressible as chained replaces
(backslash first) — the Spark sink uses exactly that JVM-side chain and
``test_ntriples`` pins the parity against this kernel.

Ref: the reference exports an Excel ADE matrix (``ade_table/
generate_table.py:67-97``); a standards-format triple export is this
repo's KG-scale extension (SURVEY §2.2 sink family).
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

_ESCAPES = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}
_UNESCAPES = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}

# hostile literal templates the gate fixture cycles through — every ECHAR
# branch of the escaper is live at every scale factor
HOSTILE_LITERALS = [
    "plain value ",
    'quote " inside ',
    "back\\slash ",
    "line\nbreak ",
    "tab\tand\rcr 漢字 ",
]

LINE_RE = re.compile(r'^<([^<>"\s]+)> <([^<>"\s]+)> "(.*)" \.$')


def nt_escape(s: str) -> str:
    """Literal → ECHAR-escaped form (backslash first — the same order the
    Spark sink's chained ``replace`` calls apply)."""
    out = s.replace("\\", "\\\\")
    for raw, esc in _ESCAPES.items():
        if raw != "\\":
            out = out.replace(raw, esc)
    return out


def nt_unescape(s: str) -> str:
    """ECHAR-escaped form → literal, via a left-to-right scan.  Raises on
    a dangling or unknown escape — a malformed export must fail loudly,
    not silently pass the corrupted byte through."""
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\":
            if i + 1 >= len(s):
                raise ValueError(f"dangling escape at end of literal: {s!r}")
            nxt = s[i + 1]
            if nxt not in _UNESCAPES:
                raise ValueError(f"unknown escape \\{nxt} in literal: {s!r}")
            out.append(_UNESCAPES[nxt])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def format_line(subj_iri: str, pred_iri: str, obj_literal: str) -> str:
    """One N-Triples line.  IRIs are used verbatim (callers must keep them
    inside the IRI charset — the fixture's are arithmetic-derived ASCII)."""
    return f'<{subj_iri}> <{pred_iri}> "{nt_escape(obj_literal)}" .'


def parse_line(line: str) -> Optional[Tuple[str, str, str]]:
    """One line → (subj, pred, obj) with the literal unescaped; ``None``
    for blank lines and ``#`` comments (legal N-Triples interludes).
    Raises on anything else — a truncated export is a data bug."""
    t = line.strip()
    if not t or t.startswith("#"):
        return None
    m = LINE_RE.match(t)
    if not m:
        raise ValueError(f"malformed N-Triples line: {line!r}")
    return m.group(1), m.group(2), nt_unescape(m.group(3))
