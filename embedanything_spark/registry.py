"""Model-registry dispatch parity with the reference's embedder
factory.

The reference selects an embedder three ways (all mirrored here):
sniffing ``config.json``'s ``architectures[0]`` (embedder.rs:32-126),
a curated ONNX model-id registry (text_embedding.rs:14-88), and the
``WhichModel`` enum surface (_embed_anything.pyi:1005-1017). This
engine's north rule replaces neural forwards with exact classical
kernels, so each architecture family dispatches to its classical
stand-in — the SELECTION surface is the parity target, the kernels
are honest about what they are:

- dense text (BertModel, JinaBertForMaskedLM, ModernBert, Qwen3,
  XLMRoberta, StaticModel/Model2Vec) → deterministic feature-hashing
  embedding (``server.text_hash_embedding``) at the family's native
  dimension — the public hashing trick, vocabulary-free;
- sparse (BertForMaskedLM — the SPLADE slot) → query-side
  tf-saturation term weights (corpus-side exact BM25 tf×idf lives in
  the index engine, E2);
- late-interaction (ColBERT, ColPali) → per-token hash vectors
  scored with exact MaxSim (embedops.maxsim_multi semantics);
- vision/audio (ClipModel, Dinov2Model) → real classical content
  features via the multimodal decode kernels;
- cloud (OpenAI, Cohere) → refused with a clear error (REST is out
  of scope, cloud/openai.rs).

A genuinely-neural forward remains env-blocked behind this seam
(no torch/ONNX in the container): swap ``_DENSE_KERNEL`` for a real
model runtime and every ``from_pretrained*`` entry point keeps
working unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

import numpy as np
import pandas as pd

from embedanything_spark.analyzer import tokenize
from embedanything_spark.server import (text_hash_embedding,
                                        text_hash_embeddings_batch)


class WhichModel(Enum):
    """Variant parity with _embed_anything.pyi:1005-1017."""

    OpenAI = "OpenAI"
    Cohere = "Cohere"
    CohereVision = "CohereVision"
    Bert = "Bert"
    Model2Vec = "Model2Vec"
    Jina = "Jina"
    Clip = "Clip"
    Colpali = "Colpali"
    ColBert = "ColBert"
    SparseBert = "SparseBert"
    ModernBert = "ModernBert"
    Qwen3 = "Qwen3"


@dataclass(frozen=True)
class ModelSpec:
    which: WhichModel
    family: str  # dense | sparse | multivector | vision | cloud
    dim: int


# config.json architectures[0] → WhichModel (embedder.rs:44-112 match
# arms; same strings, same families).
_ARCH_TO_WHICH = {
    "BertModel": WhichModel.Bert,
    "XLMRobertaModel": WhichModel.Bert,
    "JinaBertForMaskedLM": WhichModel.Jina,
    "BertForMaskedLM": WhichModel.SparseBert,  # SPLADE slot
    "ModernBertForMaskedLM": WhichModel.ModernBert,
    "ModernBertModel": WhichModel.ModernBert,
    "StaticModel": WhichModel.Model2Vec,
    "ClipModel": WhichModel.Clip,
    "CLIPModel": WhichModel.Clip,
    "Dinov2Model": WhichModel.Clip,
    "ColPali": WhichModel.Colpali,
    "ColQwen2": WhichModel.Colpali,
    "HF_ColBERT": WhichModel.ColBert,
    "Qwen3Model": WhichModel.Qwen3,
}

_FAMILY = {
    WhichModel.Bert: "dense", WhichModel.Jina: "dense",
    WhichModel.ModernBert: "dense", WhichModel.Qwen3: "dense",
    WhichModel.Model2Vec: "dense",
    WhichModel.SparseBert: "sparse",
    WhichModel.ColBert: "multivector", WhichModel.Colpali: "multivector",
    WhichModel.Clip: "vision", WhichModel.CohereVision: "cloud",
    WhichModel.OpenAI: "cloud", WhichModel.Cohere: "cloud",
}

# model-id substring → (WhichModel, native dim); the curated slice of
# the reference's 34-model ONNX registry (text_embedding.rs:14-88)
# plus the hf families its examples use. Order matters: first match
# wins, more specific substrings first.
_NAME_PATTERNS: list[tuple[str, WhichModel, int]] = [
    ("all-minilm-l6-v2", WhichModel.Bert, 384),
    ("all-minilm-l12-v2", WhichModel.Bert, 384),
    ("paraphrase-minilm", WhichModel.Bert, 384),
    ("paraphrase-mpnet", WhichModel.Bert, 768),
    ("bge-small", WhichModel.Bert, 384),
    ("bge-base", WhichModel.Bert, 768),
    ("bge-large", WhichModel.Bert, 1024),
    ("modernbert-embed-base", WhichModel.ModernBert, 768),
    ("modernbert-embed-large", WhichModel.ModernBert, 1024),
    ("nomic-embed-text", WhichModel.Bert, 768),
    ("multilingual-e5-small", WhichModel.Bert, 384),
    ("multilingual-e5-base", WhichModel.Bert, 768),
    ("multilingual-e5-large", WhichModel.Bert, 1024),
    ("mxbai-embed-large", WhichModel.Bert, 1024),
    ("gte-base", WhichModel.Bert, 768),
    ("gte-large", WhichModel.Bert, 1024),
    ("jina-embeddings-v2-small", WhichModel.Jina, 512),
    ("jina-embeddings", WhichModel.Jina, 768),
    ("model2vec", WhichModel.Model2Vec, 256),
    ("potion-", WhichModel.Model2Vec, 256),
    ("splade", WhichModel.SparseBert, 0),
    ("colbert", WhichModel.ColBert, 128),
    ("colpali", WhichModel.Colpali, 128),
    ("colqwen", WhichModel.Colpali, 128),
    ("qwen3-embedding", WhichModel.Qwen3, 1024),
    ("clip-vit", WhichModel.Clip, 512),
    ("dinov2", WhichModel.Clip, 768),
]

_DEFAULT_DIM = {"dense": 384, "sparse": 0, "multivector": 128,
                "vision": 512, "cloud": 0}


def _which(v: WhichModel | str) -> WhichModel:
    """Case-insensitive WhichModel coercion with the module's
    ValueError contract (never a bare KeyError)."""
    if isinstance(v, WhichModel):
        return v
    for m in WhichModel:
        if m.name.lower() == str(v).lower():
            return m
    raise ValueError(f"unknown WhichModel {v!r}; valid: "
                     f"{[m.name for m in WhichModel]}")


def _match_name(model_id: str) -> tuple[WhichModel, int] | None:
    """First _NAME_PATTERNS hit for a model id; separators are
    ignored on a second pass so ONNX-registry-style names
    (AllMiniLML6V2 ↔ all-MiniLM-L6-v2) match too."""
    low = model_id.lower()
    flat = "".join(c for c in low if c.isalnum())
    for pat, pw, pdim in _NAME_PATTERNS:
        if pat in low or pat.replace("-", "") in flat:
            return pw, pdim
    return None


def resolve(model_id: str | None = None,
            which: WhichModel | str | None = None,
            config: dict | None = None) -> ModelSpec:
    """Resolve a ModelSpec the way the reference's factory does.
    Family precedence: a ``config`` dict's ``architectures[0]`` when
    present (the config.json sniff; an UNKNOWN architecture raises
    with the supported list, the same contract as embedder.rs's
    fallthrough arm — a config merely lacking the key falls
    through), then an explicit ``which``, then model-id substring
    patterns. Dim precedence: config ``hidden_size`` (dense family
    only — for multivector/sparse the backbone width is not the
    output dim), then the matched name pattern's native dim when its
    family agrees with the resolved one, then the family default."""
    w: WhichModel | None = None
    if config is not None and config.get("architectures"):
        arch = config["architectures"][0]
        if arch not in _ARCH_TO_WHICH:
            raise ValueError(
                f"unsupported architecture {arch!r}; supported: "
                f"{sorted(_ARCH_TO_WHICH)}")
        w = _ARCH_TO_WHICH[arch]
    if w is None and which is not None:
        w = _which(which)
    matched = _match_name(model_id) if model_id else None
    if w is None and matched:
        w = matched[0]
    if w is None:
        raise ValueError(
            f"cannot resolve a model from id={model_id!r}; pass "
            f"which=WhichModel.<variant> or a config dict with "
            f"'architectures'")
    family = _FAMILY[w]
    dim = 0
    if config is not None and family == "dense":
        dim = int(config.get("hidden_size") or 0)
    if not dim and matched and _FAMILY[matched[0]] == family:
        dim = matched[1]
    if not dim:
        dim = _DEFAULT_DIM[family]
    return ModelSpec(which=w, family=family, dim=dim)


class EmbeddingModel:
    """Factory-surface parity with the reference's EmbeddingModel
    (_embed_anything.pyi:646-737): ``from_pretrained_hf`` /
    ``from_pretrained_onnx`` / ``from_pretrained_cloud``. Instances
    expose ``embed_query`` (driver-side, list of texts) and
    ``embed_udf`` (a pandas UDF for distributed embedding — the
    Arrow-batched path a Spark pipeline should use)."""

    def __init__(self, spec: ModelSpec, model_id: str = ""):
        if spec.family == "cloud":
            raise NotImplementedError(
                f"{spec.which.value}: cloud REST embedding is out of "
                f"scope in this engine (reference cloud/openai.rs); "
                f"use a local family or the serving tier's "
                f"/v1/embeddings")
        self.spec = spec
        self.model_id = model_id

    # -- constructors (parity names) --------------------------------
    @classmethod
    def from_pretrained_hf(cls, which: WhichModel | str | None = None,
                           model_id: str = "",
                           revision: str | None = None,
                           config: dict | None = None
                           ) -> "EmbeddingModel":
        return cls(resolve(model_id, which, config), model_id)

    @classmethod
    def from_pretrained_onnx(cls,
                             model: WhichModel | str | None = None,
                             model_name: str | None = None,
                             hf_model_id: str | None = None,
                             **_ignored) -> "EmbeddingModel":
        """Parity signature (_embed_anything.pyi:737-744): ``model``
        is the architecture (WhichModel), ``model_name`` an
        ONNX-registry name, ``hf_model_id`` an explicit hub id; at
        least one selector must be provided. A plain model-id string
        in the first position is also accepted."""
        if isinstance(model, str):
            try:
                model = _which(model)
            except ValueError:
                model, model_name = None, model
        mid = str(model_name or hf_model_id or "")
        if model is None and not mid:
            raise ValueError("provide model (WhichModel), "
                             "model_name, or hf_model_id")
        return cls(resolve(model_id=mid, which=model), mid)

    @classmethod
    def from_pretrained_cloud(cls, which: WhichModel | str,
                              model_id: str = "") -> "EmbeddingModel":
        return cls(ModelSpec(_which(which), "cloud", 0), model_id)

    # -- kernels ----------------------------------------------------
    def embed_query(self, texts: list[str]):
        """Driver-side embed. dense/vision → list[list[float]] (unit
        vectors); sparse → list[dict term→weight]; multivector →
        list[list[list[float]]] (one vector per token)."""
        f = self.spec.family
        if f == "dense":
            return text_hash_embeddings_batch(
                texts, self.spec.dim).tolist()
        if f == "sparse":
            from collections import Counter
            # query-side tf saturation (k1=1.2): the corpus-side idf
            # lives in the index dictionary (E2)
            return [{k: round(v / (v + 1.2), 6)
                     for k, v in Counter(tokenize(t)).items()}
                    for t in texts]
        if f == "multivector":
            # one vector per TOKEN: batch the hashing-trick kernel over
            # each text's token list (md5 once per unique token)
            return [text_hash_embeddings_batch(
                        tokenize(t), self.spec.dim).tolist() or
                    [[0.0] * self.spec.dim] for t in texts]
        if f == "vision":
            from embedanything_spark.operators.multimodal import \
                _decode_asset
            out = []
            for t in texts:
                payload = t if isinstance(t, (bytes, bytearray)) \
                    else t.encode()
                _w, _h, _n, vec, _real, _why = \
                    _decode_asset(bytes(payload))
                v = np.asarray(vec, dtype=np.float64)
                if v.size < self.spec.dim:
                    v = np.pad(v, (0, self.spec.dim - v.size))
                v = v[:self.spec.dim]
                n = float(np.linalg.norm(v))
                out.append((v / n if n else v).tolist())
            return out
        raise AssertionError(f)

    def embed_udf(self):
        """Arrow-batched pandas UDF for distributed DENSE embedding
        (the only family whose per-row output fits a flat
        array<float> column); attach with
        ``df.withColumn("embedding", model.embed_udf()(F.col("text")))``."""
        if self.spec.family != "dense":
            raise ValueError(
                f"embed_udf supports the dense family; "
                f"{self.spec.family} embeds via its own operator "
                f"(index engine for sparse, maxsim ops for "
                f"multivector)")
        from pyspark.sql import functions as F
        from pyspark.sql.types import ArrayType, FloatType
        dim = self.spec.dim

        @F.pandas_udf(ArrayType(FloatType()))
        def _embed(texts: pd.Series) -> pd.Series:
            # vectorized batch kernel: one md5 per UNIQUE token in the
            # Arrow batch + np.add.at scatter — no per-row Python in
            # the accumulate/normalize (bit-identical to the scalar
            # path; see text_hash_embeddings_batch)
            from embedanything_spark.server import \
                text_hash_embeddings_batch
            mat = text_hash_embeddings_batch(texts.tolist(), dim)
            return pd.Series(list(mat.astype(np.float32)))

        return _embed

    def maxsim_score(self, query_vecs, doc_vecs) -> float:
        """Exact MaxSim late interaction over two multi-vector sets
        (E10): per query vector take the max dot over doc vectors,
        then sum."""
        q = np.asarray(query_vecs, dtype=np.float64)
        d = np.asarray(doc_vecs, dtype=np.float64)
        if q.size == 0 or d.size == 0:
            return 0.0
        return float((q @ d.T).max(axis=1).sum())
