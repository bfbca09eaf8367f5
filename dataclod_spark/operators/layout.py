"""Data-layout operators: space-filling-curve keys for locality-preserving
table layout.

At 100 TB the dominant spatial-read optimization is not the join algorithm
but the LAYOUT: rows written in Z-order (Morton) key order give each
parquet row group a tight bounding box, so min/max column statistics prune
most of the file for any window query — the same lever as Delta's
``OPTIMIZE ZORDER BY`` / Hudi space-filling-curve clustering, expressed
here as a plain JVM bit-interleaving expression usable with
``df.repartitionByRange(zorder_key(...)).sortWithinPartitions(...)``
before a write.

Everything is whole-stage-codegen integer arithmetic (shifts/masks —
no UDF, no shuffle for the key itself), and the bit math is reproducible
verbatim in ANSI SQL for the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["quantize", "zorder_key"]


def quantize(
    v: Column, vmin: float, vmax: float, bits: int = 16
) -> Column:
    """Map a double in [vmin, vmax] to an integer cell in [0, 2^bits-1]
    (values outside the bounds clamp to the edge cells)."""
    cells = (1 << bits) - 1
    scaled = F.floor((v - F.lit(vmin)) / F.lit(vmax - vmin) * F.lit(cells + 1)).cast(
        "bigint"
    )
    return F.least(F.lit(cells).cast("bigint"), F.greatest(F.lit(0).cast("bigint"), scaled))


def zorder_key(
    x: Column,
    y: Column,
    bounds: tuple[float, float, float, float],
    bits: int = 16,
) -> Column:
    """Morton / Z-order key: interleave the quantized x (even positions)
    and y (odd positions) bits into one BIGINT.  Unrolled shifts/masks —
    2·bits codegen ops per row, zero Python.  Rows sorted by this key are
    spatially clustered: any axis-aligned window maps to O(few) key
    ranges, so row-group min/max stats prune the rest of the table.
    """
    xmin, ymin, xmax, ymax = bounds
    qx = quantize(x, xmin, xmax, bits)
    qy = quantize(y, ymin, ymax, bits)
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key
