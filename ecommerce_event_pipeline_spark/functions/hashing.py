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


#: Mersenne prime 2^31 − 1 — the modulus for the portable universal-hash
#: family below (the same 32-bit-lane design datasketch's MinHash uses).
#: With 28-bit bases every product a·b < 2^59, so plain BIGINT/LongType
#: arithmetic is exact in BOTH engines — no decimals, no overflow wrap.
MERSENNE_31 = (1 << 31) - 1


def md5_prefix28_long(value: F.Column) -> F.Column:
    """First 7 hex chars of md5(value) as a 28-bit value in a LONG —
    always < MERSENNE_31, the base input to the lane hashes.
    Oracle twin: ``CAST(('0x' || substr(md5(v), 1, 7)) AS BIGINT)``.

    28-bit base space (268M) is plenty for PER-DOCUMENT shingle sets, and
    cross-document base collisions only ADD candidate pairs (minhash
    candidates are exact-Jaccard verified downstream, so false candidates
    cost a little compute and no correctness)."""
    return F.conv(F.substring(F.md5(value), 1, 7), 16, 10).cast("long")


def _splitmix(x: int) -> int:
    """splitmix64 integer mix — plain Python, used only to DERIVE the lane
    constants below (both engines receive them as literals)."""
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB % (1 << 64)
    return x ^ (x >> 31)


def lane_constants(num: int, salt: int = 0x5EED) -> list[tuple[int, int]]:
    """``num`` pairs (a, c) for the universal hash h(b) = (a·b + c) mod
    MERSENNE_31 with a ∈ [1, M−1], c ∈ [0, M−1] — deterministic, so the
    same literals can be inlined into a SQL oracle."""
    out = []
    for s in range(num):
        # salt occupies bits ≥32, the lane index the low bits — the two
        # can never alias, so lanes stay distinct for ANY num (the old
        # `(salt << 8) | (2*s)` wrapped into the salt once 2*s ≥ 256,
        # silently repeating lanes with period 128)
        a = _splitmix((salt << 32) | (2 * s)) % (MERSENNE_31 - 1) + 1
        c = _splitmix((salt << 32) | (2 * s + 1)) % MERSENNE_31
        out.append((a, c))
    return out
