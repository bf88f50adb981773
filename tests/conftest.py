import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lindorm_tsdb_contest_java_spark.plans.session import get_spark
from lindorm_tsdb_contest_java_spark.sources.generator import generate_transcripts


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", parallelism=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf():
    """t_small fixture: ~8k turns, 200 convs, skewed (FIXTURES.md sizes)."""
    return generate_transcripts(n_conv=200, mean_turns=40, seed=42)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    return spark.createDataFrame(transcripts_pdf).cache()
