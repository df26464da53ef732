from __future__ import annotations

import pytest

from rmlint_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rmlint_spark_tests", cores=8, shuffle_partitions=8, driver_memory="6g")
    yield s


@pytest.fixture(scope="session")
def corpus(spark):
    from rmlint_spark.corpus import generate_corpus

    files, truth = generate_corpus(spark, n_rows=2000)
    files = files.cache()
    truth = truth.cache()
    files.count()
    return files, truth
