"""Engine-portable deterministic digests.

The determinism contract every hashed-bucket operator shares: the first
15 md5 hex digits (< 2^60, always positive) of the value's string form,
reduced mod ``n_buckets`` — identical bytes in any engine, so a DuckDB
oracle replays it as ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
% n``.  Defined ONCE so the Spark sites (DSIR buckets, streaming
heavy-hitter buckets, logreg feature hashing) and their oracles cannot
silently diverge on digest width or modulus semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_bucket(col: Column, n_buckets: int) -> Column:
    """Bucket index in [0, n_buckets) from the md5 of ``col``."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"),
        F.lit(int(n_buckets)))
