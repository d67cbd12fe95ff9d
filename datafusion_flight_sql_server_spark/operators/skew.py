"""Skew mitigation — salted joins for hot keys.

North-star extension (SURVEY.md §2.C): the reference delegates all join
planning to DataFusion and has no skew story; at 100 TB a handful of hot
keys (one dominant language, one viral document, a null-heavy foreign key)
can pin an entire shuffle join on one reducer.

Two complementary mechanisms, and when each applies:

- **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on in
  `engine/session.py`): splits oversized sort-merge partitions at runtime.
  Zero code, the default answer — but it only fires for sort-merge joins
  and only after the skewed shuffle files already exist.
- **Explicit salting** (this module): spreads each hot key over
  ``n_salts`` reduce partitions *before* the shuffle by widening the join
  key with a salt column — the big side derives its salt from a
  row-unique column (deterministic, no RNG state), the small side
  replicates each row once per salt value. Cost: the small side grows
  ``n_salts``×, which is fine exactly when the small side is the
  dimension-sized one. Use it when the skew is known ahead of time, the
  join is not sort-merge (broadcast-nested-loop fallback, streaming), or
  the downstream agg must also avoid the hot-key partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Internal salt column name; dropped before returning.
_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_src: Column | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the key salted ``n_salts``
    ways.

    ``salt_src`` is a row-unique (or near-unique) column of ``big`` — its
    hash spreads the hot key's rows uniformly and deterministically
    (``xxhash64``, no RNG state, reproducible across runs/engines). The
    small side is replicated once per salt value via an inline explode, so
    every (key, salt) pair still finds its match; semantics are exactly the
    unsalted join (asserted against the plain-join oracle in the query
    catalog).
    """
    salt_col = F.col(salt_src) if isinstance(salt_src, str) else salt_src
    big_salted = big.withColumn(
        _SALT, F.pmod(F.xxhash64(salt_col), F.lit(n_salts)).cast("int")
    )
    small_salted = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_salted, [*on, _SALT], how).drop(_SALT)
