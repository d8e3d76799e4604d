from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embedanything_spark.datagen import (  # noqa: E402
    gen_query_set, gen_transcripts_pdf)
from embedanything_spark.oracle import OracleIndex  # noqa: E402
from embedanything_spark.session import get_spark  # noqa: E402

N_CONVS_SMOKE = 200  # FIXTURES.md t1 scale (~1.6k turns)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="embedanything-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf():
    return gen_transcripts_pdf(N_CONVS_SMOKE)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    df = spark.createDataFrame(transcripts_pdf)
    df = df.withColumn("turn_idx", df.turn_idx.cast("int"))
    return df.persist()


@pytest.fixture(scope="session")
def queries_pdf():
    return gen_query_set()


@pytest.fixture(scope="session")
def oracle(transcripts_pdf):
    return OracleIndex(transcripts_pdf)


@pytest.fixture(scope="session")
def golden_topk(oracle, queries_pdf):
    return oracle.score_all(queries_pdf)
