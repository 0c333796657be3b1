"""Every registered key's OUTPUT schema must be driver-canonicalizable.

The driver sorts the collected pandas frame by every column before value
hashing; array/map/binary cells are unhashable there and fail the row even
when the values are right (round-1 `map_from_json` failure). Typed
arrays/maps are fine *inside* a plan — outputs flatten them via
to_json / array_join / concat_ws / hex.

Schema-only check: building the DataFrame is lazy, so this sweep is cheap
and runs over the full registry at the default sf.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, BinaryType, DataType, MapType, StructType

import upflow_spark  # noqa: F401
from upflow_spark.registry import QUERIES


def _unhashable(dt: DataType) -> bool:
    return isinstance(dt, (ArrayType, MapType, BinaryType, StructType))


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_output_schema_is_driver_hashable(spark, sf_dir, key):
    df = QUERIES[key](spark, sf_dir)
    bad = [f.name for f in df.schema.fields if _unhashable(f.dataType)]
    assert not bad, (
        f"[{key}] output columns {bad} are array/map/binary/struct-typed — "
        "the driver's pandas canonicalizer cannot sort/hash them; flatten "
        "with to_json/array_join/hex before returning"
    )
