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

The activation follows the checkpoint's config: ``_meta.hidden_act`` in the
state dict (default ``"gelu"`` — the exact erf GELU stock
``BertForTokenClassification`` configs use; ``"gelu_new"`` selects the tanh
approximation some configs request). The erf is evaluated in float64 with
the Abramowitz–Stegun 7.1.26 polynomial (max abs error 1.5e-7 ≈ float32
eps — within one float32 ulp of stdlib ``math.erf``) — no scipy needed.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "init_token_classifier_state",
    "bert_token_logits",
    "bert_config_of",
    "save_checkpoint",
    "load_checkpoint",
]


def init_token_classifier_state(
    vocab_size: int,
    num_labels: int,
    hidden: int = 64,
    layers: int = 2,
    heads: int = 4,
    intermediate: int = 256,
    max_position: int = 512,
    seed: int = 0,
    hidden_act: str = "gelu",
) -> dict[str, np.ndarray]:
    """Random-init state dict with ``BertForTokenClassification`` key names
    and shapes (HF convention: Linear weights are [out, in]).
    ``hidden_act`` mirrors ``config.hidden_act`` and is carried in the state
    dict (``_meta.hidden_act``) so the forward replays the checkpoint's own
    activation."""
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
    sd["_meta.hidden_act"] = np.array([hidden_act])
    return sd


def bert_config_of(sd: dict[str, np.ndarray]) -> dict:
    """Infer (layers, heads, hidden, num_labels, hidden_act) from a state
    dict. ``hidden_act`` defaults to ``"gelu"`` (exact erf — the stock
    ``BertConfig`` default) when the checkpoint carries no meta entry, as a
    real HF state dict won't."""
    layers = 0
    while f"bert.encoder.layer.{layers}.attention.self.query.weight" in sd:
        layers += 1
    hidden = sd["bert.embeddings.word_embeddings.weight"].shape[1]
    heads = int(sd["_meta.heads"][0]) if "_meta.heads" in sd else max(1, hidden // 64)
    act = str(sd["_meta.hidden_act"][0]) if "_meta.hidden_act" in sd else "gelu"
    return {
        "layers": layers,
        "heads": heads,
        "hidden": hidden,
        "num_labels": sd["classifier.weight"].shape[0],
        "hidden_act": act,
    }


def save_checkpoint(
    sd: dict[str, np.ndarray],
    path: str,
    tokenizer_itos: list[str] | None = None,
    label_itos: list[str] | None = None,
    tokenizer_kind: str | None = None,
) -> None:
    """Persist a state dict to ``.npz`` with key names preserved verbatim —
    the file-interchange twin of ``torch.save(model.state_dict())``. A torch
    checkpoint converted tensor-by-tensor to ndarrays round-trips through
    this format unchanged.

    Optionally bundles the tokenizer/label vocabularies
    (``_meta.tokenizer_itos`` / ``_meta.label_itos`` /
    ``_meta.tokenizer_kind`` ∈ {'char','wordpiece'}) so a single file is a
    complete, self-describing inference artifact — what
    ``classifier_from_checkpoint`` (operators/ner.py) and the
    ``run_pipeline.py --checkpoint`` launch mode consume."""
    extra: dict[str, np.ndarray] = {}
    if tokenizer_itos is not None:
        extra["_meta.tokenizer_itos"] = np.array(tokenizer_itos)
        extra["_meta.tokenizer_kind"] = np.array([tokenizer_kind or "char"])
    if label_itos is not None:
        extra["_meta.label_itos"] = np.array(label_itos)
    # Merge (explicit args win) so re-saving a dict that already carries
    # _meta.* keys from load_checkpoint doesn't raise duplicate-kwarg.
    np.savez_compressed(path, **{**sd, **extra})


def load_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a ``.npz`` checkpoint back into a plain state dict; the arrays
    are materialized (no lazy file handle) so the dict is broadcast-safe."""
    with np.load(path, allow_pickle=False) as z:
        return {k: np.array(z[k]) for k in z.files}


def _layer_norm(x: np.ndarray, weight: np.ndarray, bias: np.ndarray, eps: float = 1e-12):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * weight + bias


def _erf(x: np.ndarray) -> np.ndarray:
    """Vectorized erf, Abramowitz–Stegun 7.1.26 in float64: max abs error
    1.5e-7 ≈ float32 eps, so the float32 GELU agrees with stdlib
    ``math.erf`` to within one ulp (asserted in tests); stdlib math.erf via
    np.vectorize would be exact but ~50× slower on the [B,T,ff] tensor."""
    sign = np.sign(x)
    ax = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * np.exp(-ax * ax))


def _gelu_erf(x: np.ndarray) -> np.ndarray:
    """Exact GELU (HF ``"gelu"`` — the stock BertConfig default)."""
    return 0.5 * x * (1.0 + _erf(x.astype(np.float64) / np.sqrt(2.0))).astype(
        np.float32
    )


def _gelu_tanh(x: np.ndarray) -> np.ndarray:
    """Tanh approximation (HF ``"gelu_new"`` / ``"gelu_pytorch_tanh"``)."""
    return 0.5 * x * (1.0 + np.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))


_ACTIVATIONS = {
    "gelu": _gelu_erf,
    "gelu_new": _gelu_tanh,
    "gelu_pytorch_tanh": _gelu_tanh,
    "relu": lambda x: np.maximum(x, 0.0),
}


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
    out_dtype: np.dtype = np.float32,
) -> np.ndarray:
    """ids [B, T] int → logits [B, T, num_labels] (``out_dtype``, default
    float32 — the executor dtype; the SQL-oracle margin check passes
    float64 so the asserted margins bound the PRE-cast gaps).

    Standard BERT encoder: (word + position + type-0) embeddings → LayerNorm
    → per layer (multi-head self-attention with additive −10⁴ pad mask,
    residual + LN, GELU FFN, residual + LN) → token classifier head —
    the ``BertForTokenClassification`` dataflow of ``BERT/Model.py:311-318``.
    """
    cfg = bert_config_of(sd)
    try:
        act = _ACTIVATIONS[cfg["hidden_act"]]
    except KeyError:
        raise ValueError(
            f"unsupported hidden_act {cfg['hidden_act']!r}; "
            f"known: {sorted(_ACTIVATIONS)}"
        ) from None
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
        inter = act(_linear(attn, sd, p + "intermediate.dense"))
        x = _layer_norm(
            _linear(inter, sd, p + "output.dense") + attn,
            sd[p + "output.LayerNorm.weight"],
            sd[p + "output.LayerNorm.bias"],
        )

    return (x @ sd["classifier.weight"].T + sd["classifier.bias"]).astype(out_dtype)
