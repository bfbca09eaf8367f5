"""Query modules — importing this package populates the registry."""

from dataclod_spark.queries import relational  # noqa: F401
from dataclod_spark.queries import windows  # noqa: F401
from dataclod_spark.queries import events  # noqa: F401
from dataclod_spark.queries import text  # noqa: F401
from dataclod_spark.queries import dedup  # noqa: F401
from dataclod_spark.queries import similarity  # noqa: F401
from dataclod_spark.queries import spatial  # noqa: F401
from dataclod_spark.queries import sources  # noqa: F401
from dataclod_spark.queries import streaming  # noqa: F401
from dataclod_spark.queries import sampling  # noqa: F401
