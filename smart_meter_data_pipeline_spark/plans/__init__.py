"""Query plans: the engine's registered query surface.

``registry`` holds every (name → Spark callable, optional DuckDB oracle
SQL) pair. The driver contract (``__spark_entry__.py``) and the test
suite both read from here, so a query is "done" exactly when it is
registered with a passing oracle.
"""

from smart_meter_data_pipeline_spark.plans.registry import (  # noqa: F401
    QUERIES,
    ORACLES,
    register,
)
