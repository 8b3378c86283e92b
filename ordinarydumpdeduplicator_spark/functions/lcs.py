"""Longest-common-substring verifier for candidate caption pairs.

The north rule's third text feature (alongside MinHash and SimHash):
suffix-automaton LCS — O(|a| + |b|) per pair, equivalent to the classic
suffix-array approach but simpler to implement correctly. Runs only on
candidate pairs (bounded by LSH), as a vectorized pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def lcs_length(a: str | None, b: str | None) -> int:
    """Length of the longest common substring of a and b."""
    if not a or not b:
        return 0
    # build suffix automaton of `a`
    # states: len, link, transitions
    sa_len = [0, 0]
    sa_link = [-1, -1]
    sa_next: list[dict[str, int]] = [{}, {}]
    last = 1

    def add_state(length: int, link: int, trans: dict[str, int]) -> int:
        sa_len.append(length)
        sa_link.append(link)
        sa_next.append(trans)
        return len(sa_len) - 1

    for ch in a:
        cur = add_state(sa_len[last] + 1, 1, {})
        p = last
        while p != -1 and ch not in sa_next[p]:
            sa_next[p][ch] = cur
            p = sa_link[p]
        if p == -1:
            sa_link[cur] = 1
        else:
            q = sa_next[p][ch]
            if sa_len[p] + 1 == sa_len[q]:
                sa_link[cur] = q
            else:
                clone = add_state(sa_len[p] + 1, sa_link[q], dict(sa_next[q]))
                while p != -1 and sa_next[p].get(ch) == q:
                    sa_next[p][ch] = clone
                    p = sa_link[p]
                sa_link[q] = clone
                sa_link[cur] = clone
        last = cur

    best = cur_len = 0
    v = 1
    for ch in b:
        while v != 1 and ch not in sa_next[v]:
            v = sa_link[v]
            cur_len = sa_len[v]
        if ch in sa_next[v]:
            v = sa_next[v][ch]
            cur_len += 1
            best = max(best, cur_len)
        else:
            v, cur_len = 1, 0
    return best


@F.pandas_udf(T.IntegerType())
def lcs_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [lcs_length(x, y) for x, y in zip(a, b)], index=a.index, dtype="int32"
    )
