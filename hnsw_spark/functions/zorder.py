"""Z-order (Morton) interleaving: multi-dimensional data layout.

Sorting a table by one column makes that column prunable and destroys
locality for every other; interleaving the bits of two (or more) columns
into one Morton key makes a range-sort cluster rows that are close in ALL
interleaved dimensions at once.  Files/row groups written in z-key order
then carry tight min/max footer ranges for EVERY interleaved column, so a
2-d box predicate prunes most of the table — the layout trick behind
Delta/Iceberg ``ZORDER BY`` and the natural companion to
``sources/metadata.py``'s footer manifests.

The expression is pure Catalyst bit arithmetic (python-unrolled literal
shifts, whole-stage codegen), suitable for ``repartitionByRange`` +
``sortWithinPartitions`` at write time.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_value(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton key of two non-negative ints using their low ``bits`` bits:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.  2·bits
    must fit a signed long (bits ≤ 31)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    terms = []
    for i in range(bits):
        terms.append(
            (F.shiftright(ac.cast("long"), i).bitwiseAND(F.lit(1)))
            * F.lit(1 << (2 * i))
        )
        terms.append(
            (F.shiftright(bc.cast("long"), i).bitwiseAND(F.lit(1)))
            * F.lit(1 << (2 * i + 1))
        )
    return reduce(add, terms)


def write_zordered(
    df, path: str, col_a: str, col_b: str, num_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of (col_a,
    col_b): range-partition on the key into ``num_files`` files, sort
    within each — every file then covers a compact z-range, i.e. a tight
    box in BOTH dimensions, which the footer manifest exposes for
    pruning."""
    (
        df.withColumn("_z", z_value(col_a, col_b, bits))
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
