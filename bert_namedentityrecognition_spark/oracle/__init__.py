"""Pure-Python reference-semantics kernels (no Spark imports).

Single source of truth for the reference's observable behavior. Each module
cites the reference file:line it re-implements (semantics only — the code is
written from scratch against the documented behavior in SURVEY.md).
"""

from .iob import (  # noqa: F401
    split_tag,
    is_chunk_start,
    is_chunk_end,
    iob_to_spans,
    iob_taglist_to_spans,
    spans_to_xml,
    strict_entities,
    lenient_entities,
)
from .textproc import (  # noqa: F401
    preprocess_text,
    split_sentences,
    han_to_zen,
    SENTENCE_SPLIT_REGEX,
)
from .xmlspan import xml_to_taglist, xml_text_to_iob  # noqa: F401
from .fuzzy import ratio, token_set_ratio, extract_one  # noqa: F401
from .matcher import exact_match, greedy_dictionary_match  # noqa: F401
from .ade import ade_pairs_from_lists  # noqa: F401
from .spanmatch import span_match_score, score_from_iob  # noqa: F401
from .relaxed import calculate_relaxed_metric  # noqa: F401
from .metrics import span_prf, accuracy  # noqa: F401
from .normalize import DictNormalizer, ExactThenFuzzyNormalizer  # noqa: F401
