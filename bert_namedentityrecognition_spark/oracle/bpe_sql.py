"""DuckDB SQL twins for distributed BPE training (``operators/bpe.py``).

Unlike the IVF/LSH oracles (which inline driver-computed constants per
CLAUDE.md rule 20), BPE needs **no inlined constants at all**: the whole
training loop is replayed data-driven in SQL, so ONE static query string
is exact at every scale factor and the DuckDB side is a genuinely
independent second implementation.

The trick that makes greedy leftmost merging SQL-expressible is the
round-4 "enumerate positions and test classes directly" recipe: keep each
word as (pos, sym) rows and decide each position's fate with window
functions instead of a sequential scan —

- ``mt(i)``  = the pair at position i matches this level's best (l, r);
- for l ≠ r two adjacent matches are impossible (the second would need
  sym[i+1] = l = r), so every match merges;
- for l = r matches chain inside runs of l, and greedy-leftmost takes
  every ODD match of each maximal chain — gaps-and-islands:
  ``grp = pos - row_number() OVER (tok, mt ORDER BY pos)`` groups a
  chain, ``row_number`` within (tok, mt, grp) is the 1-based streak, and
  ``taken = mt AND streak % 2 = 1`` covers BOTH cases at once;
- a position is consumed iff its left neighbour was taken
  (``lag(taken)``), survivors re-number by ``row_number``.

Each merge level unrolls to one {pairs → best → match/streak → rebuild}
CTE block; ``LEFT JOIN best ON TRUE`` keeps sequences unchanged when no
pair remains (early stop), matching the Spark loop's break.

``seq{t}`` and ``best{t}`` are declared ``AS MATERIALIZED``: each is
referenced twice (pair counting + merge application; the merge-table
query re-reads every ``best{t}``), and DuckDB's default CTE inlining
would otherwise double the plan per level — 2^num_merges blowup, OOM by
~20 merges (measured: 0.1 s → 0.3 s → 6.2 s at 2/4/8 merges inlined;
flat after materializing).
"""

from __future__ import annotations

# toks/words/seq0: same tokenization as corpus.oov_ratio and corpus_words
_WORDS = """
toks AS (
  SELECT t.tok FROM (
    SELECT unnest(string_split_regex(trim(coalesce(text, '')), '\\s+')) AS tok
    FROM documents
  ) t WHERE length(t.tok) > 0
),
words AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
seq0 AS MATERIALIZED (
  -- scalar-list generate_series (the table-function form can't take a
  -- lateral column parameter in DuckDB)
  SELECT tok, c, CAST(i - 1 AS BIGINT) AS pos,
         substring(tok, CAST(i AS INT), 1) AS sym
  FROM (SELECT tok, c, unnest(generate_series(1, length(tok))) AS i FROM words)
)"""


def _level(t: int, likelihood: bool = False) -> str:
    """One unrolled merge level: seq{t} → best{t} → seq{t+1}.

    ``likelihood=True`` switches the argmax from BPE raw pair frequency
    to the WordPiece criterion ``cnt/(sl·sr)`` — an extra per-level
    symbol-count CTE joined onto the pair table, scored as a DOUBLE
    division of exact BIGINTs (correctly rounded → engine-identical
    order), ties (l, r) ascending; ``best{t}`` then also carries the
    integer witnesses sl/sr."""
    if likelihood:
        best = f"""scnt{t} AS MATERIALIZED (
  SELECT sym AS s, CAST(sum(c) AS BIGINT) AS sc FROM seq{t} GROUP BY sym
),
best{t} AS MATERIALIZED (
  SELECT p.l, p.r, p.cnt, a.sc AS sl, b.sc AS sr
  FROM pcnt{t} p JOIN scnt{t} a ON a.s = p.l JOIN scnt{t} b ON b.s = p.r
  ORDER BY CAST(p.cnt AS DOUBLE) / CAST(a.sc * b.sc AS DOUBLE) DESC, p.l ASC, p.r ASC
  LIMIT 1
),"""
    else:
        best = (
            f"best{t} AS MATERIALIZED (SELECT l, r, cnt FROM pcnt{t} "
            f"ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),"
        )
    return f"""
pcnt{t} AS (
  SELECT l, r, CAST(sum(c) AS BIGINT) AS cnt FROM (
    SELECT sym AS l, lead(sym) OVER (PARTITION BY tok ORDER BY pos) AS r, c
    FROM seq{t}
  ) WHERE r IS NOT NULL GROUP BY l, r
),
{best}
tk{t} AS (
  SELECT *, mt AND (row_number() OVER (PARTITION BY tok, mt, grp ORDER BY pos) % 2 = 1) AS taken
  FROM (
    SELECT *, pos - row_number() OVER (PARTITION BY tok, mt ORDER BY pos) AS grp
    FROM (
      SELECT s.tok, s.c, s.pos, s.sym,
             coalesce(s.sym = b.l
                      AND lead(s.sym) OVER (PARTITION BY s.tok ORDER BY s.pos) = b.r,
                      FALSE) AS mt,
             lead(s.sym) OVER (PARTITION BY s.tok ORDER BY s.pos) AS nxt
      FROM seq{t} s LEFT JOIN best{t} b ON TRUE
    )
  )
),
seq{t + 1} AS MATERIALIZED (
  SELECT tok, c,
         CAST(row_number() OVER (PARTITION BY tok ORDER BY pos) - 1 AS BIGINT) AS pos,
         CASE WHEN taken THEN sym || nxt ELSE sym END AS sym
  FROM (SELECT *, lag(taken) OVER (PARTITION BY tok ORDER BY pos) AS ptk FROM tk{t})
  WHERE NOT coalesce(ptk, FALSE)
)"""


def _chain(num_merges: int, likelihood: bool = False) -> str:
    levels = ",".join(_level(t, likelihood=likelihood) for t in range(num_merges))
    return "WITH " + _WORDS + ("," + levels if levels else "")


def bpe_vocab_sql(num_merges: int) -> str:
    """Twin of ``operators/bpe.segmented_vocab``."""
    return f"""{_chain(num_merges)}
SELECT tok, c, CAST(count(*) AS BIGINT) AS n_pieces,
       string_agg(sym, ' ' ORDER BY pos) AS pieces
FROM seq{num_merges} GROUP BY tok, c
"""


def bpe_merges_sql(num_merges: int) -> str:
    """Twin of ``operators/bpe.merge_table``."""
    if num_merges == 0:
        return (
            "SELECT CAST(0 AS BIGINT) AS step, '' AS left_sym,"
            " '' AS right_sym, CAST(0 AS BIGINT) AS pair_count WHERE FALSE"
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS step, l AS left_sym, r AS right_sym,"
        f" cnt AS pair_count FROM best{t}"
        for t in range(num_merges)
    )
    return f"{_chain(num_merges)}\n{union}\n"


def bpe_encode_sql(num_merges: int) -> str:
    """Twin of ``operators/bpe.bpe_encode`` over the training corpus (every
    token is in the trained segmentation, so the character fallback — kept
    in both engines for shape parity — never fires)."""
    return f"""{_chain(num_merges)}
, seg AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS np FROM seq{num_merges} GROUP BY tok
),
dtoks AS (
  SELECT doc_id, t.tok FROM (
    SELECT doc_id, unnest(string_split_regex(trim(coalesce(text, '')), '\\s+')) AS tok
    FROM documents
  ) t WHERE length(t.tok) > 0
),
per_doc AS (
  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(coalesce(s.np, length(d.tok))) AS BIGINT) AS n_pieces
  FROM dtoks d LEFT JOIN seg s ON d.tok = s.tok
  GROUP BY d.doc_id
)
SELECT doc_id,
  CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(n_pieces, 0) AS BIGINT) AS n_pieces
FROM (SELECT doc_id FROM documents) LEFT JOIN per_doc USING (doc_id)
"""


def wordpiece_vocab_sql(num_merges: int) -> str:
    """Twin of ``operators/bpe.wordpiece_segmented_vocab``."""
    return f"""{_chain(num_merges, likelihood=True)}
SELECT tok, c, CAST(count(*) AS BIGINT) AS n_pieces,
       string_agg(sym, ' ' ORDER BY pos) AS pieces
FROM seq{num_merges} GROUP BY tok, c
"""


def wordpiece_merges_sql(num_merges: int) -> str:
    """Twin of ``operators/bpe.wordpiece_merge_table``."""
    if num_merges == 0:
        return (
            "SELECT CAST(0 AS BIGINT) AS step, '' AS left_sym,"
            " '' AS right_sym, CAST(0 AS BIGINT) AS pair_count,"
            " CAST(0 AS BIGINT) AS left_count,"
            " CAST(0 AS BIGINT) AS right_count WHERE FALSE"
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS step, l AS left_sym, r AS right_sym,"
        f" cnt AS pair_count, sl AS left_count, sr AS right_count FROM best{t}"
        for t in range(num_merges)
    )
    return f"{_chain(num_merges, likelihood=True)}\n{union}\n"
