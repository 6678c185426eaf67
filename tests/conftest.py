from __future__ import annotations

import pytest

from pdf_extractor_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="pdf_extractor_spark-tests", master="local[4]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()
