"""Analyzer: the shared tokenization contract.

Contract (FIXTURES.md §3, frozen — changing it is a breaking
index-format change):

    NFC-normalize → lowercase → extract ``\\w+`` Unicode word tokens.
    No stemming, no stopwords.

The SAME Python function is used by the numpy oracle, the distributed
index build and the query path, so build/query/oracle can never drift
(the reference gets the same guarantee by sharing one HF tokenizer
between ingest and query — ``rust/src/embeddings/utils.rs:6-33``).

On the Spark side this is a pandas UDF (Arrow-batched, vectorized
transfer; the per-batch regex scan is numpy/pandas-level work, not a
per-row Python UDF — BASELINE.json input_hint requirement).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

ANALYZER_VERSION = "1"  # stamped into index metadata; query refuses on mismatch

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def tokenize(text: str | None) -> list[str]:
    """Tokenize one string per the frozen analyzer contract."""
    if not text:
        return []
    return _WORD_RE.findall(unicodedata.normalize("NFC", text).lower())


def tokenize_batch(texts: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batch) tokenizer for pandas UDFs."""
    return texts.map(tokenize)


@F.pandas_udf(ArrayType(StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:  # pragma: no cover - thin wrapper
    return tokenize_batch(texts)
