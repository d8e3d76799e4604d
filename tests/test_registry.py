"""Model-registry dispatch parity (embedder.rs:32-126 config sniff,
text_embedding.rs:14-88 ONNX registry, _embed_anything.pyi:1005
WhichModel surface) — selection resolves to the engine's classical
kernels."""

import numpy as np
import pytest

from embedanything_spark.registry import (EmbeddingModel, ModelSpec,
                                          WhichModel, resolve)


def test_resolve_by_config_architectures():
    s = resolve(config={"architectures": ["BertModel"],
                        "hidden_size": 768})
    assert s.which is WhichModel.Bert and s.family == "dense"
    assert s.dim == 768
    assert resolve(config={"architectures": ["BertForMaskedLM"]}
                   ).family == "sparse"
    assert resolve(config={"architectures": ["ColPali"]}
                   ).family == "multivector"
    assert resolve(config={"architectures": ["ClipModel"]}
                   ).family == "vision"
    with pytest.raises(ValueError, match="unsupported architecture"):
        resolve(config={"architectures": ["GPT2LMHeadModel"]})


def test_resolve_by_model_id_patterns():
    assert resolve("BAAI/bge-small-en-v1.5").dim == 384
    assert resolve("BAAI/bge-large-en-v1.5").dim == 1024
    assert resolve("prithivida/Splade_PP_en_v1").family == "sparse"
    s = resolve("colbert-ir/colbertv2.0")
    assert s.family == "multivector" and s.dim == 128
    assert resolve("minishlab/potion-base-8M").which \
        is WhichModel.Model2Vec
    with pytest.raises(ValueError, match="cannot resolve"):
        resolve("totally-unknown/model")


def test_cloud_refused():
    with pytest.raises(NotImplementedError, match="out of scope"):
        EmbeddingModel.from_pretrained_cloud(WhichModel.OpenAI,
                                             "text-embedding-3-small")


def test_dense_embed_query_unit_and_deterministic():
    m = EmbeddingModel.from_pretrained_onnx(
        "sentence-transformers/all-MiniLM-L6-v2")
    a, b = m.embed_query(["hello spark world", "hello spark world"])
    assert len(a) == 384 and a == b
    assert abs(np.linalg.norm(a) - 1.0) < 1e-9


def test_sparse_weights_tf_saturated():
    m = EmbeddingModel.from_pretrained_hf(
        config={"architectures": ["BertForMaskedLM"]})
    (w,) = m.embed_query(["apple apple banana"])
    assert w["apple"] == round(2 / 3.2, 6)
    assert w["banana"] == round(1 / 2.2, 6)


def test_maxsim_identity_beats_mismatch():
    m = EmbeddingModel.from_pretrained_hf(WhichModel.ColBert)
    (q,) = m.embed_query(["exact phrase match"])
    (d_same,) = m.embed_query(["exact phrase match"])
    (d_other,) = m.embed_query(["entirely different words"])
    assert m.maxsim_score(q, d_same) > m.maxsim_score(q, d_other)


def test_embed_udf_matches_driver_kernel(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    m = EmbeddingModel.from_pretrained_hf(WhichModel.Bert)
    texts = ["alpha beta", "gamma", ""]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = [r["e"] for r in
           df.select(m.embed_udf()(F.col("text")).alias("e"))
           .collect()]
    want = m.embed_query(texts)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-6)
    with pytest.raises(ValueError, match="dense family"):
        EmbeddingModel.from_pretrained_hf(WhichModel.ColBert).embed_udf()


def test_which_plus_model_id_keeps_native_dim():
    """The reference's documented call shape — explicit architecture
    AND a model id — must still pick up the model's native dim from
    the id patterns (not silently fall to the family default)."""
    m = EmbeddingModel.from_pretrained_hf(
        WhichModel.Bert, model_id="BAAI/bge-large-en-v1.5")
    assert m.spec.dim == 1024


def test_partial_config_falls_through():
    """A config without 'architectures' (hidden_size-only) must fall
    through to which/model_id, and hidden_size only applies to the
    dense family (multivector keeps its projection dim)."""
    s = resolve(which=WhichModel.Bert, config={"hidden_size": 768})
    assert s.which is WhichModel.Bert and s.dim == 768
    s2 = resolve(config={"architectures": ["HF_ColBERT"],
                         "hidden_size": 768})
    assert s2.family == "multivector" and s2.dim == 128


def test_string_which_case_insensitive_valueerror():
    assert resolve(which="bert").which is WhichModel.Bert
    with pytest.raises(ValueError, match="unknown WhichModel"):
        resolve(which="gpt4")
    with pytest.raises(ValueError, match="unknown WhichModel"):
        EmbeddingModel.from_pretrained_cloud("not-a-model")


def test_onnx_parity_signature():
    """Reference shape: from_pretrained_onnx(model=WhichModel.Bert,
    model_name=<ONNX registry name>); enum-style names match the
    separator-free pass."""
    m = EmbeddingModel.from_pretrained_onnx(
        WhichModel.Bert, model_name="BGESmallENV15Q")
    assert m.spec.dim == 384
    m2 = EmbeddingModel.from_pretrained_onnx(
        WhichModel.Bert, hf_model_id="BAAI/bge-base-en-v1.5")
    assert m2.spec.dim == 768
    with pytest.raises(ValueError, match="provide model"):
        EmbeddingModel.from_pretrained_onnx()
