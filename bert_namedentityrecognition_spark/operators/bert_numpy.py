"""Numpy BERT-for-token-classification forward — the executable model path.

The reference's inference core is ``BertForTokenClassification`` driven by
``BERT/Model.py:295-327``. torch is absent from this container, so this
module implements the same forward in numpy over a plain ``dict[str,
ndarray]`` state dict using the exact HF parameter names/shapes — a trained
checkpoint's tensors can be loaded into it unchanged, and the random-init
path makes the §2.6 operator genuinely executable and testable here.

Design for Spark:
- the state dict is broadcast once per executor (``SparkContext.broadcast``
  inside ``ner_sentences``/``ner_pages``); workers never re-deserialize per
  task;
- all math is batched numpy (BLAS pinned to 1 thread in
  ``plans/session.py`` — rule: one math thread per Spark task);
- eval-mode semantics only (no dropout), matching ``model.eval()`` at
  ``BERT/Model.py:308``.

GELU uses the tanh approximation (HF ``gelu_new``); swap ``_gelu`` for an
erf-based one when scipy is available — the choice is config, not
architecture.
"""

from __future__ import annotations

import numpy as np

__all__ = ["init_token_classifier_state", "bert_token_logits", "bert_config_of"]


def init_token_classifier_state(
    vocab_size: int,
    num_labels: int,
    hidden: int = 64,
    layers: int = 2,
    heads: int = 4,
    intermediate: int = 256,
    max_position: int = 512,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Random-init state dict with ``BertForTokenClassification`` key names
    and shapes (HF convention: Linear weights are [out, in])."""
    rng = np.random.RandomState(seed)

    def w(*shape):
        return (rng.randn(*shape) * 0.02).astype(np.float32)

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    def ones(*shape):
        return np.ones(shape, np.float32)

    sd: dict[str, np.ndarray] = {
        "bert.embeddings.word_embeddings.weight": w(vocab_size, hidden),
        "bert.embeddings.position_embeddings.weight": w(max_position, hidden),
        "bert.embeddings.token_type_embeddings.weight": w(2, hidden),
        "bert.embeddings.LayerNorm.weight": ones(hidden),
        "bert.embeddings.LayerNorm.bias": zeros(hidden),
        "classifier.weight": w(num_labels, hidden),
        "classifier.bias": zeros(num_labels),
    }
    for i in range(layers):
        p = f"bert.encoder.layer.{i}."
        for name in ("query", "key", "value"):
            sd[p + f"attention.self.{name}.weight"] = w(hidden, hidden)
            sd[p + f"attention.self.{name}.bias"] = zeros(hidden)
        sd[p + "attention.output.dense.weight"] = w(hidden, hidden)
        sd[p + "attention.output.dense.bias"] = zeros(hidden)
        sd[p + "attention.output.LayerNorm.weight"] = ones(hidden)
        sd[p + "attention.output.LayerNorm.bias"] = zeros(hidden)
        sd[p + "intermediate.dense.weight"] = w(intermediate, hidden)
        sd[p + "intermediate.dense.bias"] = zeros(intermediate)
        sd[p + "output.dense.weight"] = w(hidden, intermediate)
        sd[p + "output.dense.bias"] = zeros(hidden)
        sd[p + "output.LayerNorm.weight"] = ones(hidden)
        sd[p + "output.LayerNorm.bias"] = zeros(hidden)
    sd["_meta.heads"] = np.array([heads], np.int64)
    return sd


def bert_config_of(sd: dict[str, np.ndarray]) -> dict[str, int]:
    """Infer (layers, heads, hidden, num_labels) from a state dict."""
    layers = 0
    while f"bert.encoder.layer.{layers}.attention.self.query.weight" in sd:
        layers += 1
    hidden = sd["bert.embeddings.word_embeddings.weight"].shape[1]
    heads = int(sd["_meta.heads"][0]) if "_meta.heads" in sd else max(1, hidden // 64)
    return {
        "layers": layers,
        "heads": heads,
        "hidden": hidden,
        "num_labels": sd["classifier.weight"].shape[0],
    }


def _layer_norm(x: np.ndarray, weight: np.ndarray, bias: np.ndarray, eps: float = 1e-12):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * weight + bias


def _gelu(x: np.ndarray) -> np.ndarray:
    return 0.5 * x * (1.0 + np.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))


def _linear(x: np.ndarray, sd: dict, prefix: str) -> np.ndarray:
    return x @ sd[prefix + ".weight"].T + sd[prefix + ".bias"]


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def bert_token_logits(
    sd: dict[str, np.ndarray],
    ids: np.ndarray,
    attention_mask: np.ndarray | None = None,
) -> np.ndarray:
    """ids [B, T] int → logits [B, T, num_labels] float32.

    Standard BERT encoder: (word + position + type-0) embeddings → LayerNorm
    → per layer (multi-head self-attention with additive −10⁴ pad mask,
    residual + LN, GELU FFN, residual + LN) → token classifier head —
    the ``BertForTokenClassification`` dataflow of ``BERT/Model.py:311-318``.
    """
    cfg = bert_config_of(sd)
    B, T = ids.shape
    H, heads = cfg["hidden"], cfg["heads"]
    dh = H // heads
    if attention_mask is None:
        attention_mask = np.ones((B, T), np.float32)
    ext_mask = (1.0 - attention_mask[:, None, None, :].astype(np.float32)) * -10000.0

    x = (
        sd["bert.embeddings.word_embeddings.weight"][ids]
        + sd["bert.embeddings.position_embeddings.weight"][:T][None, :, :]
        + sd["bert.embeddings.token_type_embeddings.weight"][0][None, None, :]
    )
    x = _layer_norm(
        x,
        sd["bert.embeddings.LayerNorm.weight"],
        sd["bert.embeddings.LayerNorm.bias"],
    )

    def split_heads(t):  # [B,T,H] -> [B,heads,T,dh]
        return t.reshape(B, T, heads, dh).transpose(0, 2, 1, 3)

    for i in range(cfg["layers"]):
        p = f"bert.encoder.layer.{i}."
        q = split_heads(_linear(x, sd, p + "attention.self.query"))
        k = split_heads(_linear(x, sd, p + "attention.self.key"))
        v = split_heads(_linear(x, sd, p + "attention.self.value"))
        scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh) + ext_mask
        ctx = _softmax(scores) @ v  # [B,heads,T,dh]
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, H)
        attn = _layer_norm(
            _linear(ctx, sd, p + "attention.output.dense") + x,
            sd[p + "attention.output.LayerNorm.weight"],
            sd[p + "attention.output.LayerNorm.bias"],
        )
        inter = _gelu(_linear(attn, sd, p + "intermediate.dense"))
        x = _layer_norm(
            _linear(inter, sd, p + "output.dense") + attn,
            sd[p + "output.LayerNorm.weight"],
            sd[p + "output.LayerNorm.bias"],
        )

    return (x @ sd["classifier.weight"].T + sd["classifier.bias"]).astype(np.float32)
