"""Scale smoke: every registered query executes end-to-end at sf0.1 (the
largest local dataset, 10× the driver's correctness scale).  Spark side
only — correctness is the sf0.01 oracle gate; this catches the class of
failure that only appears with more data (partition-count assumptions,
timestamp encodings per row-group, memory blow-ups in explode paths),
which is exactly how the round-2 events.parquet regression surfaced.

Marked slow: ~5 min of compute.  Deselect with -m "not slow"."""

from __future__ import annotations

import os

import pytest

from json_sql_database_storage_spark import registry

registry.load_all()
_SPECS = registry.specs()
_SF01 = "/root/testdata/sf0.1"

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.isdir(_SF01), reason="sf0.1 data absent")
@pytest.mark.parametrize("name", sorted(_SPECS))
def test_runs_at_sf01(spark, name):
    # noop sink forces full execution without driver-side materialization
    _SPECS[name].fn(spark, _SF01).write.format("noop").mode("overwrite").save()
