"""PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-expression of the capability surface of the
reference NER/KG toolkit (``gabrielandrade2/BERT-NamedEntityRecognition``):

- ``oracle``     — pure-Python reference-semantics kernels (BIO FSM, XML span
                   extraction, fuzzy normalization, ADE pairing, metrics).
                   These are the single source of truth for semantics; they
                   run inside Arrow UDFs on executors AND as the pytest oracle.
- ``functions``  — Spark Column-expression builders (JVM-side, codegen-able).
- ``operators``  — DataFrame→DataFrame operators (sentences, tagger/NER,
                   normalize, triples, dedup, similarity, metrics, ...).
- ``sources``    — readers + deterministic synthetic fixture generators.
- ``plans``      — end-to-end pipelines, session builder, resume ledger.
- ``streaming``  — Structured Streaming variants.
- ``multimodal`` — binary-column (image/audio) plumbing with stubbed decode.

Design rules (enforced throughout):
- declarative DataFrame plans; Catalyst/AQE do the optimizing
- Python only inside vectorized Arrow UDFs (mapInPandas / applyInPandas)
- broadcast small dimensions; salt / AQE for skew; no driver-side loops
"""

__version__ = "0.1.0"
