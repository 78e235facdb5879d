"""Model NER stage — iterator-of-pandas Arrow UDF with broadcast weights.

Re-expresses the reference inference path (``BERT/Model.py:295-351``,
``BERT/predict.py:1-7``) as one ``mapInPandas`` stage:

    sentences(url, sent_id, sent) → mentions(url, sent_id, start, end, type, word)

Per Arrow batch, inside the Python worker:
1. han_to_zen + tokenize + prepend [CLS] id      (``prepare_sentences``, :329-351)
2. sort indices by token length desc, sub-batch,
   right-pad each sub-batch to its own max ≤512  (``Batch``, data_utils.py:66-97
   — the padding-efficiency trick Catalyst can't know about)
3. model forward → argmax over label axis        (:311-318)
4. drop the [CLS] position, trim to sentence length, map ids→labels,
   stray [PAD]→'O'                               (:320-327, :391-397; predict.py:5)
5. BIO-decode to mention spans via the reference FSM (iob_util.py:62-94)

The model is pluggable: anything with ``logits(ids: list[list[int]]) ->
[B, T, num_labels] ndarray``. ``TorchTokenClassifier`` (gated import) wraps a
real ``BertForTokenClassification`` state_dict broadcast via
``SparkContext.broadcast`` and loaded once per executor worker.
``DictionaryStubModel`` is the deterministic stand-in used in this sandbox:
same tensor shapes, same decode path, logits derived from a gazetteer.

At 100 TB the unit of work is the Arrow batch (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``), so executor-python peak
memory is flat; weights ship once per executor, not per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..oracle.iob import iob_to_spans
from ..oracle.matcher import automaton_match, build_automaton
from ..oracle.textproc import han_to_zen
from .tagger import MENTION_SCHEMA, matches_to_iob

PAD, CLS, UNK = "[PAD]", "[CLS]", "[UNK]"
MAX_LEN = 512


class CharTokenizer:
    """Char-level tokenizer + vocab (stand-in for WordPiece; same interface)."""

    def __init__(self, alphabet: list[str] | None = None):
        self.itos = [PAD, CLS, UNK] + sorted(set(alphabet or []))
        self.stoi = {t: i for i, t in enumerate(self.itos)}

    @classmethod
    def from_itos(cls, itos: list[str]) -> "CharTokenizer":
        """Restore from a saved id→token table verbatim (checkpoint load
        path — ids must match the embedding rows they were trained with)."""
        tok = cls.__new__(cls)
        tok.itos = list(itos)
        tok.stoi = {t: i for i, t in enumerate(tok.itos)}
        return tok

    def tokenize(self, text: str) -> list[str]:
        return list(text)

    def encode(self, tokens: list[str]) -> list[int]:
        unk = self.stoi[UNK]
        return [self.stoi[CLS]] + [self.stoi.get(t, unk) for t in tokens]

    def decode(self, ids: list[int]) -> list[str]:
        return [self.itos[i] for i in ids[1:]]  # drop [CLS]


class LabelVocab:
    """[PAD]=0, first-seen order (``BERT/bert_utils.py:39-55``)."""

    def __init__(self, labels: list[str]):
        self.itos = [PAD]
        for l in labels:
            if l not in self.itos:
                self.itos.append(l)
        self.stoi = {l: i for i, l in enumerate(self.itos)}

    @classmethod
    def from_itos(cls, itos: list[str]) -> "LabelVocab":
        """Restore from a saved id→label table verbatim."""
        v = cls.__new__(cls)
        v.itos = list(itos)
        v.stoi = {l: i for i, l in enumerate(v.itos)}
        return v

    def to_labels(self, ids: np.ndarray) -> list[str]:
        return [self.itos[i] if self.itos[i] != PAD else "O" for i in ids]


def label_vocab_for_types(types: list[str]) -> LabelVocab:
    labels = ["O"]
    for t in sorted(set(types)):
        labels += [f"B-{t}", f"I-{t}"]
    return LabelVocab(labels)


class DictionaryStubModel:
    """Deterministic logits from a gazetteer — the sandbox's 'weights'.

    Produces a [B, T, L] float32 tensor with 1.0 at the IOB label of each
    char position (positions covered by a dictionary match) so that
    ``argmax`` recovers exactly the gazetteer tags through the full
    pad/trim/decode machinery.
    """

    def __init__(
        self,
        term_types: dict[str, str],
        label_vocab: LabelVocab,
        emulate_compute: bool = False,
        d_model: int = 64,
        d_ff: int = 256,
    ):
        self.term_types = {han_to_zen(k): v for k, v in term_types.items()}
        self.label_vocab = label_vocab
        # emulate_compute: burn one seeded FFN block ([B,T,d]·[d,ff]·[ff,d])
        # per batch so benchmarks see a transformer-representative
        # compute-to-coordination ratio (a real forward is 100-1000x the
        # gazetteer cost; without this the pipeline measures scheduler
        # overhead, not inference scaling). Semantics are unchanged — the
        # gazetteer logits are returned either way.
        self.emulate_compute = emulate_compute
        self.d_model = d_model
        self.d_ff = d_ff
        self._automaton = None
        self._weights = None

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_automaton"] = None  # rebuilt lazily on each executor
        state["_weights"] = None
        return state

    def _ffn(self, texts: list[str], padded_len: int) -> None:
        if self._weights is None:
            rng = np.random.RandomState(0)
            self._weights = (
                rng.randn(self.d_model, self.d_ff).astype(np.float32) * 0.02,
                rng.randn(self.d_ff, self.d_model).astype(np.float32) * 0.02,
            )
        w1, w2 = self._weights
        x = np.zeros((len(texts), padded_len, self.d_model), np.float32)
        for bi, t in enumerate(texts):
            codes = np.frombuffer(t.encode("utf-32-le"), np.uint32)[: padded_len - 1]
            x[bi, 1 : len(codes) + 1, 0] = codes % 97
        h = np.maximum(x @ w1, 0.0)
        (h @ w2).sum()  # forward block executed, activations discarded

    def logits(self, texts: list[str], padded_len: int) -> np.ndarray:
        if self._automaton is None:
            self._automaton = build_automaton(list(self.term_types))
        if self.emulate_compute:
            self._ffn(texts, padded_len)
        out = np.zeros((len(texts), padded_len, len(self.label_vocab.itos)), np.float32)
        o_id = self.label_vocab.stoi["O"]
        out[:, :, o_id] = 0.5  # default O everywhere (incl. [CLS]/[PAD] pos)
        for bi, text in enumerate(texts):
            matches = automaton_match(text, self._automaton)
            tags = matches_to_iob(text, matches, self.term_types)
            for ti, tag in enumerate(tags):
                if tag != "O":
                    # +1: position 0 is [CLS]
                    out[bi, ti + 1, self.label_vocab.stoi[tag]] = 1.0
        return out


class NumpyTokenClassifier:
    """Executable real-model path: the BertForTokenClassification forward in
    numpy over a broadcast state dict (``operators/bert_numpy.py``), driven
    through the same tokenize → [CLS] → pad → forward → argmax machinery as
    the reference (``BERT/Model.py:295-327``). HF key names/shapes, so a
    trained checkpoint's tensors drop in unchanged; random-init works for
    structure/parity testing in this torch-less sandbox."""

    def __init__(self, state_dict: dict, tokenizer: "CharTokenizer"):
        self.state_dict = state_dict
        self.tokenizer = tokenizer

    def logits(self, texts: list[str], padded_len: int) -> np.ndarray:
        from .bert_numpy import bert_token_logits

        B = len(texts)
        ids = np.zeros((B, padded_len), np.int64)  # [PAD]=0 right-padding
        mask = np.zeros((B, padded_len), np.float32)
        for bi, t in enumerate(texts):
            enc = self.tokenizer.encode(self.tokenizer.tokenize(t))[:padded_len]
            ids[bi, : len(enc)] = enc
            mask[bi, : len(enc)] = 1.0
        return bert_token_logits(self.state_dict, ids, mask)


def classifier_from_checkpoint(path: str):
    """(NumpyTokenClassifier, LabelVocab) from a self-describing ``.npz``
    checkpoint (``bert_numpy.save_checkpoint`` with bundled vocabularies) —
    the file a training run exports and ``run_pipeline.py --checkpoint``
    loads at spark-submit time. The tensors are used exactly as stored;
    tokenizer/label id tables restore verbatim so ids line up with the
    trained embedding/classifier rows."""
    from .bert_numpy import load_checkpoint

    sd = load_checkpoint(path)
    try:
        tok_itos = [str(t) for t in sd.pop("_meta.tokenizer_itos")]
        label_itos = [str(t) for t in sd.pop("_meta.label_itos")]
    except KeyError as e:
        raise ValueError(
            f"{path}: checkpoint has no bundled vocabularies ({e}); save it "
            "with save_checkpoint(sd, path, tokenizer_itos=..., "
            "label_itos=...) or construct NumpyTokenClassifier directly"
        ) from None
    kind = (
        str(sd.pop("_meta.tokenizer_kind")[0])
        if "_meta.tokenizer_kind" in sd
        else "char"
    )
    if kind == "wordpiece":
        from ..oracle.wordpiece import WordPieceTokenizer

        tokenizer = WordPieceTokenizer.from_itos(tok_itos)
    elif kind == "char":
        tokenizer = CharTokenizer.from_itos(tok_itos)
    else:
        raise ValueError(f"{path}: unknown tokenizer_kind {kind!r}")
    return NumpyTokenClassifier(sd, tokenizer), LabelVocab.from_itos(label_itos)


class TorchTokenClassifier:
    """torch adapter (torch absent in this sandbox — see
    :class:`NumpyTokenClassifier` for the executable twin with identical
    state-dict layout).

    Holds a broadcastable state_dict + config; loads the module once per
    executor python worker (module-level cache), runs ``no_grad`` forward.
    """

    def __init__(self, state_dict_bytes: bytes, num_labels: int):
        self.state_dict_bytes = state_dict_bytes
        self.num_labels = num_labels
        self._model = None

    def logits(self, texts: list[str], padded_len: int) -> np.ndarray:
        raise NotImplementedError(
            "torch is not available in this environment; use "
            "NumpyTokenClassifier (same BertForTokenClassification state-dict "
            "layout, numpy forward) or DictionaryStubModel. This adapter "
            "exists so a trained torch checkpoint can be dropped in without "
            "touching the pipeline."
        )


def _infer_rows(rows, mdl, vocab, batch_size: int, max_len: int, out: dict):
    """Shared batched-inference kernel over (url, sent_id, raw_sent) rows.

    Applies han_to_zen, length-sorted sub-batching (padding-efficiency trick
    of ``BERT/data_utils.py:66-97``), forward, argmax, [CLS] drop, trim,
    BIO decode; appends mention fields into ``out`` column lists.

    Sub-token alignment: when the model's tokenizer exposes
    ``tokenize_with_spans`` (the WordPiece path — a char can expand to 2+
    pieces, ``BERT/Model.py:377-381``), labels come back per PIECE; the
    decode runs at piece granularity and the spans are lifted to character
    offsets through the tokenizer's alignment table, so the emitted mention
    schema is identical to the char path (char start/end into the processed
    sentence, word = the covered text).
    """
    texts = [han_to_zen(r[2]) for r in rows]
    spanner = getattr(getattr(mdl, "tokenizer", None), "tokenize_with_spans", None)
    order = sorted(range(len(texts)), key=lambda i: -len(texts[i]))
    for ofs in range(0, len(order), batch_size):
        idxs = order[ofs : ofs + batch_size]
        chunk = [texts[i][: max_len - 1] for i in idxs]
        if spanner is not None:
            # cap at max_len-1 PIECES (position table is max_len long incl.
            # [CLS]); the same truncated id sequence is what mdl.logits
            # builds from chunk, so labels and alignment stay in lockstep
            chunk_spans = [spanner(c)[: max_len - 1] for c in chunk]
            padded = max((len(s) for s in chunk_spans), default=0) + 1  # +[CLS]
        else:
            chunk_spans = None
            padded = max((len(c) for c in chunk), default=0) + 1  # +[CLS]
        logits = mdl.logits(chunk, padded)
        pred_ids = logits.argmax(axis=2)[:, 1:]  # drop [CLS] position
        for row, i in enumerate(idxs):
            if chunk_spans is not None:
                tbl = chunk_spans[row]
                labels = vocab.to_labels(pred_ids[row, : len(tbl)])
                spans = []
                for s in iob_to_spans([p for p, _, _ in tbl], labels):
                    cs, ce = tbl[s["start"]][1], tbl[s["end"] - 1][2]
                    spans.append(
                        {"start": cs, "end": ce, "type": s["type"],
                         "word": chunk[row][cs:ce]}
                    )
            else:
                n = len(chunk[row])
                labels = vocab.to_labels(pred_ids[row, :n])
                spans = iob_to_spans(list(chunk[row]), labels)
            for span in spans:
                out["url"].append(rows[i][0])
                out["sent_id"].append(int(rows[i][1]))
                out["start"].append(span["start"])
                out["end"].append(span["end"])
                out["type"].append(span["type"])
                out["word"].append(span["word"])


def _out_to_pdf(out: dict) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "url": pd.Series(out["url"], dtype="object"),
            "sent_id": pd.Series(out["sent_id"], dtype="int32"),
            "start": pd.Series(out["start"], dtype="int32"),
            "end": pd.Series(out["end"], dtype="int32"),
            "type": pd.Series(out["type"], dtype="object"),
            "word": pd.Series(out["word"], dtype="object"),
        }
    )


def _empty_out() -> dict:
    return {k: [] for k in ("url", "sent_id", "start", "end", "type", "word")}


def ner_sentences(
    sentences: DataFrame,
    model,
    label_vocab: LabelVocab,
    batch_size: int = 8,
    max_len: int = MAX_LEN,
) -> DataFrame:
    """The NER mapInPandas stage over a sentences table."""
    sc = sentences.sparkSession.sparkContext
    bc = sc.broadcast((model, label_vocab))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mdl, vocab = bc.value
        for pdf in batches:
            out = _empty_out()
            rows = list(zip(pdf["url"], pdf["sent_id"], pdf["sent"]))
            _infer_rows(rows, mdl, vocab, batch_size, max_len, out)
            yield _out_to_pdf(out)

    return sentences.mapInPandas(run, schema=MENTION_SCHEMA)


def ner_pages(
    pages: DataFrame,
    model,
    label_vocab: LabelVocab,
    batch_size: int = 8,
    max_len: int = MAX_LEN,
    lang_filter: str | None = "ja",
    text_col: str = "text",
    key_col: str = "url",
    html_col: str | None = "html",
) -> DataFrame:
    """Fused pages → mentions via the model path: preprocess + sentence
    split + batched inference + BIO decode in ONE Arrow stage (one Python
    runner section per Spark stage — see operators/tagger.extract_mentions
    for why fusion matters at high parallelism). html→text fallback for
    null-text rows happens inside the same section (null-gated JVM-side, so
    text rows never ship html bytes through Arrow)."""
    from ..oracle.textproc import html_to_text, preprocess_text, split_sentences

    from ..operators.tagger import _pages_text_source

    sc = pages.sparkSession.sparkContext
    bc = sc.broadcast((model, label_vocab))

    src = _pages_text_source(pages, text_col, key_col, html_col, lang_filter)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mdl, vocab = bc.value
        for pdf in batches:
            out = _empty_out()
            rows = []
            for url, text, hb in zip(pdf["url"], pdf["text"], pdf["_html"]):
                if text is None or text == "":
                    text = html_to_text(hb) if hb is not None else ""
                    if not text:
                        continue
                for sid, sent in enumerate(split_sentences(preprocess_text(text))):
                    if len(sent) <= max_len:
                        rows.append((url, sid, sent))
            _infer_rows(rows, mdl, vocab, batch_size, max_len, out)
            yield _out_to_pdf(out)

    return src.mapInPandas(run, schema=MENTION_SCHEMA)
