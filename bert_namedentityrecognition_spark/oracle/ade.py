"""ADE-table / triple pairing semantics.

Reproduces ``ade_table/ade_table.py:14-64`` (``from_lists``): per-document
all-pairs of drug × entity mentions, with

- optional per-document dedup (``list(set(...))``, :25-27)
- drug ``strip()`` then ``len < 2`` drop (:31-33)
- documents with an empty entity list contribute ``(drug, "No Symptoms")``
  counts (:41-46)
- entity ``strip()`` (+ optional normalization hook) then empty-or-``len<2``
  drop (:49-55)
- nested-dict counting → here a flat ``{(drug, entity): count}``.

The Spark operator (operators/triples.py) expresses the same semantics as
dedup → filter → join → groupBy; this oracle is the pytest ground truth.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Callable

NO_SYMPTOMS = "No Symptoms"


def ade_pairs_from_lists(
    drugs: list[list[str]],
    entities: list[list[str]],
    remove_duplicates: bool = False,
    normalize: Callable[[str], str] | None = None,
) -> dict[tuple[str, str], int]:
    assert len(drugs) == len(entities)
    counts: Counter = Counter()
    for drug_list, entity_list in zip(drugs, entities):
        if remove_duplicates:
            drug_list = list(set(drug_list))
            entity_list = list(set(entity_list))
        for drug in drug_list:
            drug = drug.strip()
            if len(drug) < 2:
                continue
            if not entity_list:
                counts[(drug, NO_SYMPTOMS)] += 1
            else:
                for entity in entity_list:
                    entity = str(entity).strip()
                    if normalize is not None:
                        entity = normalize(entity)
                    if not entity or len(entity) < 2:
                        continue
                    counts[(drug, entity)] += 1
    return dict(counts)
