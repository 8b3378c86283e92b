"""Bloom-filter-assisted incremental exact dedup.

The 10^12-scale ingest problem: each incoming batch must be checked
against *all previously ingested* content keys. A plain anti-join
shuffles the whole history every wave; the standard fix is a Bloom
filter over history keys — batch rows the filter rejects are *certainly
new* and skip the join entirely; only filter hits (true dups + an
``fpp`` sliver of false positives) pay the exact verification join. The
output is therefore EXACT (the driver oracle is the plain anti-join:
``oracle_sql()['incremental_new_docs']``); the bloom is purely a
work-avoidance device, the same role the reference's in-memory
``HashSet`` lookup plays per file (``DataControllerSimple.cs:43-75``)
— rebuilt here so no single machine ever holds the key set.

Scale shape — everything stays distributed:

- the bitmap is SHARDED by key hash: ``n_shards`` rows of
  ``bits_per_shard/8`` bytes each, built with one applyInPandas pass
  over history keys (per-shard, partial work map-side via the shuffle)
  and persistable as a table — at 10^12 keys / 1% fpp the full bitmap
  is ~1.2 TB, far beyond a driver or a broadcast, but each shard is
  executor-sized and co-partitioned with its probes;
- the probe COGROUPS batch keys with their shard's bitmap row — one
  shuffle of the (small) batch, never a per-row copy of bitmap bytes
  (a broadcast-join + scalar UDF would Arrow-copy the bitmap onto
  every row);
- bit positions use double hashing (Kirsch–Mitzenmacher 2006) over the
  key's MD5, the repo-standard mixing family
  (functions/text.shingle_hash64) — process-stable, engine-stable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS_PER_SHARD = 1 << 20  # 128 KiB per shard row
DEFAULT_K_HASHES = 7


def _h1h2(keys: Iterable[str]) -> tuple[np.ndarray, np.ndarray]:
    """Double-hash bases per key: (h1, h2) from the MD5 digest halves,
    h2 forced odd so the k probe positions cycle the whole bitmap."""
    h1 = np.empty(len(keys), dtype=np.uint64)
    h2 = np.empty(len(keys), dtype=np.uint64)
    for i, s in enumerate(keys):
        d = hashlib.md5(str(s).encode("utf-8")).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little") | 1
    return h1, h2


def shard_of(h1: np.ndarray, n_shards: int) -> np.ndarray:
    return (h1 % np.uint64(n_shards)).astype(np.int32)


def _positions(
    h1: np.ndarray, h2: np.ndarray, bits: int, k: int
) -> np.ndarray:
    """(n, k) probe positions: (h1 + (i+1)*h2) mod bits."""
    steps = (np.arange(1, k + 1, dtype=np.uint64))[None, :]
    return ((h1[:, None] + steps * h2[:, None]) % np.uint64(bits)).astype(
        np.int64
    )


def bloom_shards(
    keys: DataFrame,
    key_col: str = "key",
    n_shards: int = 32,
    bits_per_shard: int = DEFAULT_BITS_PER_SHARD,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """History keys -> one (shard, bits) bitmap row per shard.

    Persist the result (it is the ingest index); rebuild cost is one
    shuffle of history keys by shard. Size ``bits_per_shard * n_shards``
    to ~10 bits per expected key for ~1% fpp."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h1, h2 = _h1h2(pdf["__key"].tolist())
        bmp = np.zeros(bits_per_shard // 8, dtype=np.uint8)
        pos = _positions(h1, h2, bits_per_shard, k_hashes).ravel()
        np.bitwise_or.at(bmp, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame(
            {"shard": [int(pdf["__shard"].iloc[0])], "bits": [bmp.tobytes()]}
        )

    @F.pandas_udf("int")
    def shard_udf(s: pd.Series) -> pd.Series:
        h1, _ = _h1h2(s.tolist())
        return pd.Series(shard_of(h1, n_shards), index=s.index)

    return (
        keys.select(F.col(key_col).cast("string").alias("__key"))
        .withColumn("__shard", shard_udf("__key"))
        .groupBy("__shard")
        .applyInPandas(build, "shard int, bits binary")
    )


def bloom_probe(
    batch: DataFrame,
    blooms: DataFrame,
    key_col: str,
    n_shards: int = 32,
    bits_per_shard: int = DEFAULT_BITS_PER_SHARD,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """Batch + boolean ``might_contain`` column, via a cogroup on shard
    (the bitmap row rides to its probes ONCE per shard, not per row).
    Output carries only (key, might_contain) joined back onto the batch
    by key — batch payload columns never enter the Python worker."""

    @F.pandas_udf("int")
    def shard_udf(s: pd.Series) -> pd.Series:
        h1, _ = _h1h2(s.tolist())
        return pd.Series(shard_of(h1, n_shards), index=s.index)

    def probe(_key, probes: pd.DataFrame, bmp_pdf: pd.DataFrame) -> pd.DataFrame:
        if probes.empty:
            return pd.DataFrame({"__key": pd.Series(dtype="str"),
                                 "might_contain": pd.Series(dtype="bool")})
        keys = probes["__key"].tolist()
        if bmp_pdf.empty:  # shard never seen in history
            return pd.DataFrame({"__key": keys,
                                 "might_contain": [False] * len(keys)})
        bmp = np.frombuffer(bmp_pdf["bits"].iloc[0], dtype=np.uint8)
        h1, h2 = _h1h2(keys)
        pos = _positions(h1, h2, bits_per_shard, k_hashes)
        hit = (
            (bmp[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        ).all(axis=1)
        return pd.DataFrame({"__key": keys, "might_contain": hit})

    probes = (
        batch.select(F.col(key_col).cast("string").alias("__key"))
        .distinct()
        .withColumn("__shard", shard_udf("__key"))
    )
    flags = (
        probes.groupBy("__shard")
        .cogroup(blooms.groupBy("shard"))
        .applyInPandas(probe, "__key string, might_contain boolean")
    )
    return batch.join(
        flags.withColumnRenamed("__key", key_col), key_col, "left"
    ).fillna({"might_contain": False})


def incremental_new_docs(
    history: DataFrame,
    batch: DataFrame,
    key_col: str = "content_sha",
    n_shards: int = 32,
    bits_per_shard: int = DEFAULT_BITS_PER_SHARD,
    k_hashes: int = DEFAULT_K_HASHES,
    blooms: DataFrame | None = None,
) -> DataFrame:
    """EXACT new-content extraction for one ingest wave: batch rows whose
    ``key_col`` does not occur in history. Bloom misses bypass the
    history join; hits are verified with a left-anti join whose probe
    side is only the hit sliver. Pass a persisted ``blooms`` table to
    skip the rebuild (the production shape)."""
    if blooms is None:
        blooms = bloom_shards(
            history.select(key_col),
            key_col=key_col,
            n_shards=n_shards,
            bits_per_shard=bits_per_shard,
            k_hashes=k_hashes,
        )
    flagged = bloom_probe(
        batch, blooms, key_col,
        n_shards=n_shards,
        bits_per_shard=bits_per_shard,
        k_hashes=k_hashes,
    )
    certain_new = flagged.filter(~F.col("might_contain")).drop("might_contain")
    candidates = flagged.filter(F.col("might_contain")).drop("might_contain")
    verified_new = candidates.join(
        history.select(key_col).distinct(), key_col, "left_anti"
    )
    return certain_new.unionByName(verified_new)
