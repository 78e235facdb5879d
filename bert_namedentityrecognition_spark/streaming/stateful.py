"""Custom stateful streaming operators (applyInPandasWithState).

``dedup_stream`` — exact-duplicate detection ACROSS micro-batches: state =
number of copies of each fingerprint seen so far; the first copy ever seen
(batch order, then id order within a batch) is the keeper, every later copy
is flagged. This is the streaming twin of ``operators/dedup.exact_dedup``
and the template for any keyed cross-batch state (session stitching,
first-seen timestamps, per-entity counters).

State is one long per fingerprint — bounded by distinct fingerprints, the
same cardinality an exact-dedup shuffle would carry in batch mode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fingerprint", T.StringType()),
        T.StructField("is_duplicate", T.BooleanType()),
    ]
)
_STATE_SCHEMA = T.StructType([T.StructField("seen", T.LongType())])


def _make_update_fn():
    """The per-fingerprint state-update kernel, exposed module-level so its
    chunking semantics are unit-testable without a streaming query."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = state.get[0] if state.exists else 0
        # concatenate the group's Arrow chunks BEFORE sorting: sorting each
        # chunk independently makes "first copy by doc_id within a batch"
        # only per-chunk, so a fingerprint split across chunks could flag
        # the lower doc_id as the duplicate
        chunks = [c for c in pdfs if len(c)]
        if not chunks:  # NoTimeout ⇒ only called with data; belt-and-braces
            state.update((seen,))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
        flags = []
        for _ in range(len(pdf)):
            flags.append(seen > 0)
            seen += 1
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "fingerprint": key[0],
                "is_duplicate": flags,
            }
        )
        state.update((seen,))

    return update


def dedup_stream(
    docs_stream: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """streaming docs → (doc_id, fingerprint, is_duplicate) with cross-batch
    memory of seen fingerprints."""
    from ..functions.textstats import md5_fingerprint

    fp = docs_stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        # the canonical exact-dup fingerprint — same helper as batch
        # exact_dedup, so the two paths cannot silently diverge
        md5_fingerprint(F.col(text_col)).alias("fingerprint"),
    )

    out = fp.groupBy("fingerprint").applyInPandasWithState(
        _make_update_fn(),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # null-text docs (null fingerprint) all land in one state group; their
    # content was never compared, so they are NEVER duplicates — same rule
    # as the batch exact_dedup twin
    return out.withColumn(
        "is_duplicate",
        F.col("fingerprint").isNotNull() & F.col("is_duplicate"),
    )
