"""Registry rule: no registered query may emit array/struct/map columns.

The driver's CORRECTNESS canonicalizer loads each result into pandas and
sorts every column; non-scalar cells raise ``unhashable type`` and fail
the query outright (round 1: q_approx_percentile). Building the plan is
enough to know the schema — nothing executes here.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from sas_etl_spark.registry import QUERIES, queries_map
from tests.conftest import SF_SMOKE

queries_map()  # populate registry

ALL_NAMES = sorted(QUERIES)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_output_schema_is_flat(spark, name):
    sdf = QUERIES[name].fn(spark, SF_SMOKE)
    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name}: non-scalar output columns {bad}"
