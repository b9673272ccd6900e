"""Engine-portable deterministic hashing.

xxhash64 is Spark-only; md5 is implemented identically by every engine we
oracle against. The salted md5-prefix-to-long idiom below is the single
definition used wherever a hash must be reproducible outside Spark
(training-shard assignment, count-min sketch buckets) — oracles rebuild
it as ``CAST(('0x' || substr(md5(salt || '#' || value), 1, 8)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def md5_prefix_long(salt: F.Column | str, value: F.Column) -> F.Column:
    """First 8 hex chars of md5('<salt>#<value>') as an unsigned 32-bit
    value in a LONG — cheap, well-distributed, engine-portable."""
    salt_col = F.lit(str(salt)) if not isinstance(salt, F.Column) else salt.cast("string")
    h = F.md5(F.concat(salt_col, F.lit("#"), value.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
