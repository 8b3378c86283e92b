"""DuckDB oracle SQL for the hash-sketch queries (driver correctness gate).

Each builder returns ANSI-ish DuckDB SQL that recomputes the engine's EXACT
math — not an approximation of it:

- the 64-bit shingle/token hash is ``md5_number_lower`` (the definition of
  ``functions/text.shingle_hash64``);
- MinHash multiply-shift runs in signed 128-bit (HUGEINT) arithmetic with
  the engine's seeded coefficients inlined as literals (a < 2^63 keeps
  ``a*x + b`` < 2^127, see functions/minhash._coeffs);
- LSH band membership is tested by signature-SLICE equality. The engine
  hashes each slice into a 64-bit band key (functions/minhash.
  band_keys_from_mins) purely as a compaction; equal slices <=> equal keys
  up to negligible 64-bit collisions, so slice equality is the semantics;
- hyperplane sketches inline the seeded plane matrix
  (operators/similarity._hyperplanes) as double literals; a sketch bit is
  sign(vec . plane) exactly as the Arrow UDF computes it;
- cosine for the JVM-fold paths mirrors Spark's evaluation order
  bit-for-bit: float32 products (FLOAT * FLOAT), each widened to double,
  summed left-to-right (operators/similarity.with_cosine).

These strings are consumed by ``__spark_entry__.oracle_sql()`` and by
``tools/check_oracles.py``; tests/test_oracle_parity.py pins Spark == DuckDB
on the driver's testdata.
"""

from __future__ import annotations

from .functions.minhash import _A, _B, NUM_HASHES, ROWS_PER_BAND
from .operators.lsh import DEFAULT_BUCKET_CAP
from .operators.similarity import DEFAULT_SKETCH_BUCKET_CAP, _hyperplanes

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
_MOD64 = "18446744073709551616::HUGEINT"  # 2^64

# powers of two as HUGEINT literals (bit extraction without shifts)
_P2_64 = "[" + ", ".join(f"{1 << b}::HUGEINT" for b in range(64)) + "]"
_P16 = "[" + ", ".join(f"{1 << (16 * k)}::HUGEINT" for k in range(4)) + "]"


def _hugeint_list(vals) -> str:
    return "[" + ", ".join(f"{int(v)}::HUGEINT" for v in vals) + "]"


# --------------------------------------------------------------- minhash/LSH


def _minhash_band_ctes(cap: int = DEFAULT_BUCKET_CAP) -> str:
    """CTE chain: documents -> shingles -> signatures -> band rows ->
    capped buckets (the pairs_from_buckets contract of operators/lsh.py:
    small buckets emit all pairs, over-cap buckets emit star edges to the
    bucket-min id). Ids are compared as STRINGS — the engine's shared
    banding machinery casts ids to string (operators/text_dedup.
    minhash_candidate_pairs)."""
    alist = _hugeint_list(_A)
    blist = _hugeint_list(_B)
    r = ROWS_PER_BAND
    return f"""
    toks AS (
      SELECT doc_id::VARCHAR AS id, {_TOKS} AS toks, text FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT id, text,
             CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                      for i in range(1, len(toks) - 1)])
             END AS sh
      FROM toks WHERE len(toks) > 0
    ),
    -- set-based, not nested lambdas: shingle rows x coefficient rows,
    -- vectorized min per (doc, hash fn). Lambda-shaped evaluation of the
    -- same math re-materializes the 128-element coefficient literal per
    -- element and runs ~100x slower.
    shr AS (
      SELECT id, md5_number_lower(unnest(sh))::HUGEINT AS h FROM sh
    ),
    coeff AS (
      SELECT unnest(range(1, {NUM_HASHES + 1})) AS j,
             unnest({alist}) AS a, unnest({blist}) AS b
    ),
    vals AS (
      SELECT shr.id, coeff.j,
             min(((coeff.a * shr.h + coeff.b) % {_MOD64}) // 4294967296) AS v
      FROM shr CROSS JOIN coeff GROUP BY shr.id, coeff.j
    ),
    bands AS MATERIALIZED (
      SELECT id, ((j - 1) // {r})::BIGINT AS band,
             array_to_string(list(v ORDER BY j), ',') AS key
      FROM vals GROUP BY id, (j - 1) // {r}
    ),
    stats AS (
      SELECT band, key, count(*) AS n, min(id) AS mn
      FROM bands GROUP BY band, key HAVING count(*) >= 2
    ),
    bk AS MATERIALIZED (
      SELECT bands.id, bands.band, bands.key, n, mn
      FROM bands JOIN stats USING (band, key)
    ),
    cand AS (
      SELECT DISTINCT src, dst FROM (
        SELECT a.id AS src, b.id AS dst
        FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
        WHERE a.n <= {cap} AND a.id < b.id
        UNION ALL
        SELECT mn AS src, id AS dst FROM bk WHERE n > {cap} AND id <> mn
      )
    )"""


def minhash_candidates_sql() -> str:
    return f"""
    WITH {_minhash_band_ctes()}
    SELECT src AS doc_id_a, dst AS doc_id_b FROM cand
    """


def near_dup_text_pairs_sql(
    jaccard_threshold: float = 0.5, lcs_ratio: float = 0.6
) -> str:
    """Candidates (above) verified exactly as operators/verify.
    verify_caption_pairs: shingle-set Jaccard >= threshold OR longest
    common substring ratio >= lcs_ratio. The LCS >= L check is equivalent
    to 'some length-L substring is shared'; L is the smallest integer with
    L / max(min_len, 1) >= ratio under the same double division Spark
    evaluates."""
    return f"""
    WITH {_minhash_band_ctes()},
    j AS (
      SELECT cand.src, cand.dst,
             a.sh AS sh_a, b.sh AS sh_b, a.text AS ta, b.text AS tb
      FROM cand JOIN sh a ON cand.src = a.id JOIN sh b ON cand.dst = b.id
    ),
    scored AS (
      SELECT src, dst, ta, tb,
             len(list_intersect(sh_a, sh_b))::DOUBLE
               / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)))
               AS jacc,
             list_min([l for l in range(1, least(length(ta), length(tb)) + 1)
                       if l::DOUBLE / greatest(least(length(ta), length(tb)), 1)
                          >= {lcs_ratio}]) AS L
      FROM j
    )
    SELECT src AS doc_id_a, dst AS doc_id_b, 'caption_near' AS kind
    FROM scored
    WHERE jacc >= {jaccard_threshold}
       OR (L IS NOT NULL AND len(list_intersect(
             [substr(ta, i, L) for i in range(1, length(ta) - L + 2)],
             [substr(tb, i, L) for i in range(1, length(tb) - L + 2)])) > 0)
    """


def pair_score_histogram_sql(bin_width: float = 0.05) -> str:
    """operators/text_dedup.pair_score_histogram: the candidate CTE chain
    scored by the same exact shingle Jaccard, floor-binned. n_inter and
    n_union are exact small integers, so the division and the
    floor(j / w) binning are bit-identical IEEE double math in both
    engines."""
    return f"""
    WITH {_minhash_band_ctes()},
    j AS (
      SELECT a.sh AS sh_a, b.sh AS sh_b
      FROM cand JOIN sh a ON cand.src = a.id JOIN sh b ON cand.dst = b.id
    ),
    scored AS (
      SELECT len(list_intersect(sh_a, sh_b))::DOUBLE
               / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)))
               AS jacc
      FROM j
    )
    SELECT floor(jacc / {bin_width})::BIGINT AS bin,
           floor(jacc / {bin_width}) * {bin_width} AS jaccard_lo,
           count(*)::BIGINT AS n_pairs
    FROM scored GROUP BY 1, 2
    """


def cross_corpus_novel_sql(
    batch_mod: int = 4,
    jaccard_threshold: float = 0.5,
    lcs_ratio: float = 0.6,
    ref_cap: int = DEFAULT_BUCKET_CAP,
    is_batch_expr: str | None = None,
) -> str:
    """operators/cross_dedup.cross_corpus_matches over a deterministic
    split of `documents`: batch = doc_id % batch_mod == 0, reference =
    the rest (``is_batch_expr`` overrides the batch-side predicate —
    fuzzy_decontamination_sql flips it so the TRAIN split is the batch).
    Bands reuse the in-corpus CTE chain (same signature math on
    every document); the reference side of each (band, slice) bucket is
    capped with the engine's standard rule (over-cap buckets collapse to
    their min-id witness); candidates are CROSS-side only; verification
    is the near_dup_text_pairs jaccard-or-LCS rule; the match witness is
    the numeric-min verified reference id."""
    pred = is_batch_expr or f"doc_id % {batch_mod} = 0"
    return f"""
    WITH {_minhash_band_ctes()},
    sides AS (
      SELECT doc_id::VARCHAR AS id, {pred} AS is_batch
      FROM documents
    ),
    rb AS (
      SELECT bands.id, band, key FROM bands JOIN sides USING (id)
      WHERE NOT is_batch
    ),
    rstats AS (
      SELECT band, key, count(*) AS rn, min(id) AS rmn
      FROM rb GROUP BY band, key
    ),
    rcap AS (
      SELECT rb.id, rb.band, rb.key
      FROM rb JOIN rstats USING (band, key)
      WHERE rn <= {ref_cap} OR rb.id = rmn
    ),
    bb AS (
      SELECT bands.id, band, key FROM bands JOIN sides USING (id)
      WHERE is_batch
    ),
    ccand AS (
      SELECT DISTINCT bb.id AS src, rcap.id AS dst
      FROM bb JOIN rcap USING (band, key)
    ),
    cj AS (
      SELECT ccand.src, ccand.dst,
             a.sh AS sh_a, b.sh AS sh_b, a.text AS ta, b.text AS tb
      FROM ccand JOIN sh a ON ccand.src = a.id JOIN sh b ON ccand.dst = b.id
    ),
    -- verify math identical to near_dup_text_pairs_sql (operators/verify)
    cscored AS (
      SELECT src, dst, ta, tb,
             len(list_intersect(sh_a, sh_b))::DOUBLE
               / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)))
               AS jacc,
             list_min([l for l in range(1, least(length(ta), length(tb)) + 1)
                       if l::DOUBLE / greatest(least(length(ta), length(tb)), 1)
                          >= {lcs_ratio}]) AS L
      FROM cj
    ),
    cver AS (
      SELECT src, dst FROM cscored
      WHERE jacc >= {jaccard_threshold}
         OR (L IS NOT NULL AND len(list_intersect(
               [substr(ta, i, L) for i in range(1, length(ta) - L + 2)],
               [substr(tb, i, L) for i in range(1, length(tb) - L + 2)])) > 0)
    ),
    cmatch AS (
      SELECT src, min(dst::BIGINT) AS match_ref_id FROM cver GROUP BY src
    )
    SELECT d.doc_id, cmatch.match_ref_id,
           cmatch.match_ref_id IS NULL AS is_novel
    FROM documents d LEFT JOIN cmatch ON d.doc_id::VARCHAR = cmatch.src
    WHERE {pred}
    """


def near_dup_text_clusters_sql(
    jaccard_threshold: float = 0.5, lcs_ratio: float = 0.6
) -> str:
    """operators/text_dedup.near_dup_text_clusters: the verified pair list
    (near_dup_text_pairs_sql above) closed transitively via a recursive
    min-label CTE — the SQL mirror of the engine's connected-components
    fixpoint. `reach` enumerates, per node, every label reachable through
    the undirected edge set (UNION dedupes, so the recursion terminates at
    the transitive closure); min(label) per node is then exactly the
    numeric-min component head the Spark operator assigns. Singletons and
    NULL-text docs cluster to themselves."""
    pairs_sql = near_dup_text_pairs_sql(jaccard_threshold, lcs_ratio)
    return f"""
    WITH RECURSIVE pairs AS MATERIALIZED (
      SELECT doc_id_a::BIGINT AS a, doc_id_b::BIGINT AS b
      FROM ({pairs_sql})
    ),
    und AS (
      SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS id FROM und),
    reach AS (
      SELECT id, id AS lbl FROM nodes
      UNION
      SELECT u.b AS id, r.lbl FROM reach r JOIN und u ON u.a = r.id
    ),
    comp AS (
      SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id
    ),
    sizes AS (
      SELECT cluster_id, count(*)::BIGINT AS n_members
      FROM comp GROUP BY cluster_id
    ),
    clustered AS (
      SELECT doc_id, comp.cluster_id, sizes.n_members
      FROM comp JOIN sizes USING (cluster_id)
    ),
    singles AS (
      SELECT d.doc_id, d.doc_id AS cluster_id, 1::BIGINT AS n_members
      FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM clustered)
    )
    SELECT doc_id, cluster_id, n_members,
           doc_id = cluster_id AS is_canonical
    FROM (SELECT * FROM clustered UNION ALL SELECT * FROM singles)
    """


def _norm_text(col: str = "text") -> str:
    """operators/text_dedup.normalized_text mirrored in RE2 (value-equal on
    whitespace-separated corpora; pinned by the exact_text_groups oracle)."""
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


# Driver-corpus augmentation for the tier cascade: the testdata documents
# table has fuzzy near-dups but no raw-exact copies, no case/whitespace
# variants and no empty rows, so the cascade's first three tiers would go
# unexercised by the driver gate. Both sides plant them deterministically:
# __spark_entry__._aug_docs in the Spark plan, and this CTE (which SHADOWS
# the registered `documents` view — base reads disambiguate via `main.`)
# in the oracle.
# Planted ids are NEGATIVE (-(4*doc_id + family), empties on residue 0):
# collision-free against real non-negative doc_ids at any scale.
_AUG_DOCS_CTE = """
      SELECT doc_id, text FROM main.documents
      UNION ALL
      SELECT -(doc_id * 4 + 1) AS doc_id, text
      FROM main.documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT -(doc_id * 4 + 2) AS doc_id, upper(text) AS text
      FROM main.documents WHERE doc_id % 11 = 0
      UNION ALL
      SELECT -(doc_id * 4 + 3) AS doc_id, replace(text, ' ', '  ') AS text
      FROM main.documents WHERE doc_id % 13 = 0
      UNION ALL
      SELECT * FROM (VALUES (-4::BIGINT, NULL::VARCHAR),
                            (-8::BIGINT, ''),
                            (-12::BIGINT, '   ')) v(doc_id, text)
"""


def dedup_tiers_sql(
    jaccard_threshold: float = 0.5,
    lcs_ratio: float = 0.6,
    augmented: bool = False,
) -> str:
    """operators/tiers.dedup_tiers: precedence attribution over the three
    independent groupings — raw-text equality, normalized-text equality,
    and the fuzzy cluster assignment (near_dup_text_clusters_sql above).
    Grouping by the text VALUE here is value-equivalent to the engine's
    grouping by sha256(text) (equal values <=> equal hashes). With
    ``augmented`` the corpus is the planted-variant superset (_AUG_DOCS_CTE)
    — every unqualified `documents` reference below, including those inside
    the recursive clusters subquery, then resolves to the shadowing CTE."""
    clusters_sql = near_dup_text_clusters_sql(jaccard_threshold, lcs_ratio)
    aug = (
        f"documents AS MATERIALIZED ({_AUG_DOCS_CTE}),\n    "
        if augmented
        else ""
    )
    return f"""
    WITH {aug}base AS (
      SELECT doc_id, text,
             (text IS NULL OR trim(text) = '') AS is_empty
      FROM documents
    ),
    ex AS (
      SELECT text, min(doc_id) AS exact_keeper
      FROM base WHERE NOT is_empty GROUP BY text
    ),
    nm AS (
      SELECT {_norm_text()} AS ntext, min(doc_id) AS norm_keeper
      FROM base WHERE NOT is_empty GROUP BY 1
    ),
    cl AS (
      SELECT doc_id, cluster_id FROM ({clusters_sql})
    )
    SELECT b.doc_id,
           CASE WHEN b.is_empty THEN 'empty'
                WHEN b.doc_id <> ex.exact_keeper THEN 'exact'
                WHEN b.doc_id <> nm.norm_keeper THEN 'normalized'
                WHEN b.doc_id <> cl.cluster_id THEN 'near'
                ELSE 'unique' END AS tier,
           CASE WHEN b.is_empty THEN b.doc_id
                WHEN b.doc_id <> ex.exact_keeper THEN ex.exact_keeper
                WHEN b.doc_id <> nm.norm_keeper THEN nm.norm_keeper
                WHEN b.doc_id <> cl.cluster_id THEN cl.cluster_id
                ELSE b.doc_id END AS keeper_id
    FROM base b
    LEFT JOIN ex ON NOT b.is_empty AND b.text = ex.text
    LEFT JOIN nm ON NOT b.is_empty AND {_norm_text('b.text')} = nm.ntext
    LEFT JOIN cl ON b.doc_id = cl.doc_id
    """


def dedup_tier_stats_sql(
    jaccard_threshold: float = 0.5,
    lcs_ratio: float = 0.6,
    augmented: bool = False,
) -> str:
    """operators/tiers.dedup_tier_stats: per-tier doc/char accounting.
    When augmented, the shadow CTE sits in the OUTER scope so both the
    nested tiers query and the length join see the same planted corpus."""
    aug = (
        f"documents AS MATERIALIZED ({_AUG_DOCS_CTE}),\n    "
        if augmented
        else ""
    )
    tiers = dedup_tiers_sql(jaccard_threshold, lcs_ratio, augmented=False)
    return f"""
    WITH {aug}t AS MATERIALIZED ({tiers})
    SELECT tier, count(*)::BIGINT AS n_docs,
           sum(length(d.text))::BIGINT AS n_chars
    FROM t JOIN documents d USING (doc_id)
    GROUP BY tier
    """


# Embedding-side augmentation (mirrors __spark_entry__._aug_embs): exact
# copies and x2-scaled copies (same direction => cosine 1, different
# bytes => 'near' not 'exact'; float32 doubling is exact in both engines)
# with negative ids, empty vector added in `base` only so the sketch CTEs
# never see an unsketchable empty array.
_AUG_EMBS_CTE = """
      SELECT vec_id, embedding FROM main.embeddings
      UNION ALL
      SELECT -(vec_id * 4 + 1) AS vec_id, embedding
      FROM main.embeddings WHERE vec_id % 9 = 0
      UNION ALL
      SELECT -(vec_id * 4 + 2) AS vec_id,
             list_transform(embedding, x -> x * 2.0::FLOAT) AS embedding
      FROM main.embeddings WHERE vec_id % 5 = 0
"""


def embedding_dedup_tiers_sql(
    dim: int,
    threshold: float = 0.4,
    bands: int = 16,
    augmented: bool = False,
) -> str:
    """operators/tiers.embedding_dedup_tiers: exact grouping by the vector
    value + the verified LSH pair list (embedding_near_pairs_lsh_sql over
    the exact REPRESENTATIVES — min id per distinct vector, mirroring the
    engine's pre-collapse) closed via the recursive min-label CTE,
    precedence-cased."""
    pairs_sql = embedding_near_pairs_lsh_sql(dim, threshold, bands, source="exr")
    aug = (
        f"embeddings AS MATERIALIZED ({_AUG_EMBS_CTE}),\n    "
        if augmented
        else ""
    )
    empty_rows = (
        "UNION ALL SELECT -4::BIGINT AS vec_id, []::FLOAT[] AS embedding"
        if augmented
        else ""
    )
    return f"""
    WITH RECURSIVE {aug}base AS (
      SELECT vec_id, embedding FROM embeddings
      {empty_rows}
    ),
    ex AS (
      SELECT embedding, min(vec_id) AS ek FROM embeddings GROUP BY embedding
    ),
    exr AS (
      SELECT ek AS vec_id, embedding FROM ex
      WHERE embedding IS NOT NULL AND len(embedding) > 0
    ),
    pairs AS MATERIALIZED (
      SELECT vec_id_a AS a, vec_id_b AS b FROM ({pairs_sql})
    ),
    und AS (
      SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS id FROM und),
    reach AS (
      SELECT id, id AS lbl FROM nodes
      UNION
      SELECT u.b AS id, r.lbl FROM reach r JOIN und u ON u.a = r.id
    ),
    comp AS (
      SELECT id AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY id
    )
    SELECT b.vec_id,
           CASE WHEN b.embedding IS NULL OR len(b.embedding) = 0 THEN 'empty'
                WHEN b.vec_id <> ex.ek THEN 'exact'
                WHEN comp.cluster_id IS NOT NULL
                     AND b.vec_id <> comp.cluster_id THEN 'near'
                ELSE 'unique' END AS tier,
           CASE WHEN b.embedding IS NULL OR len(b.embedding) = 0 THEN b.vec_id
                WHEN b.vec_id <> ex.ek THEN ex.ek
                WHEN comp.cluster_id IS NOT NULL
                     AND b.vec_id <> comp.cluster_id THEN comp.cluster_id
                ELSE b.vec_id END AS keeper_id
    FROM base b
    LEFT JOIN ex ON b.embedding = ex.embedding
    LEFT JOIN comp ON b.vec_id = comp.vec_id
    """


# ------------------------------------------------------------------ simhash


def simhash_near_pairs_sql(
    hamming_threshold: int = 3, cap: int = DEFAULT_BUCKET_CAP
) -> str:
    """operators/text_dedup.simhash_near_pairs: 64-bit token SimHash
    (unit weights, token multiplicity preserved), 4x16-bit block bands,
    capped buckets, exact Hamming <= threshold."""
    return f"""
    WITH docs0 AS (
      SELECT doc_id::VARCHAR AS id, {_TOKS} AS toks
      FROM documents WHERE text IS NOT NULL AND text <> ''
    ),
    -- set-based: token rows (multiplicity preserved by unnest) x 64 bit
    -- rows, vectorized +-1 sums per (doc, bit)
    tok AS (
      SELECT id, md5_number_lower(unnest(toks))::HUGEINT AS h FROM docs0
    ),
    bits AS (
      SELECT unnest(range(0, 64)) AS b, unnest({_P2_64}) AS pw
    ),
    acc AS (
      SELECT tok.id, bits.pw,
             sum(CASE WHEN (tok.h // bits.pw) % 2 = 1 THEN 1 ELSE -1 END) AS s
      FROM tok CROSS JOIN bits GROUP BY tok.id, bits.pw
    ),
    vsum AS (
      SELECT id, sum(CASE WHEN s > 0 THEN pw ELSE 0::HUGEINT END) AS v
      FROM acc GROUP BY id
    ),
    sim AS (
      SELECT d.id, coalesce(vs.v, 0::HUGEINT) AS v
      FROM docs0 d LEFT JOIN vsum vs ON d.id = vs.id
    ),
    signed AS MATERIALIZED (
      SELECT id, v,
             (CASE WHEN v >= 9223372036854775808::HUGEINT
                   THEN v - {_MOD64} ELSE v END)::BIGINT AS s
      FROM sim
    ),
    banded AS MATERIALIZED (
      SELECT id, s, bs.b AS band, ((v // bs.pw16) % 65536)::BIGINT AS key
      FROM signed CROSS JOIN (
        SELECT unnest(range(0, 4)) AS b, unnest({_P16}) AS pw16) bs
    ),
    stats AS (
      SELECT band, key, count(*) AS n, min(id) AS mn
      FROM banded GROUP BY band, key HAVING count(*) >= 2
    ),
    bk AS MATERIALIZED (
      SELECT banded.id, banded.band, banded.key, n, mn
      FROM banded JOIN stats USING (band, key)
    ),
    cand AS (
      SELECT DISTINCT src, dst FROM (
        SELECT a.id AS src, b.id AS dst
        FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
        WHERE a.n <= {cap} AND a.id < b.id
        UNION ALL
        SELECT mn AS src, id AS dst FROM bk WHERE n > {cap} AND id <> mn
      )
    )
    SELECT src AS doc_id_a, dst AS doc_id_b,
           bit_count(xor(sa.s, sb.s))::BIGINT AS hamming
    FROM cand JOIN signed sa ON cand.src = sa.id
              JOIN signed sb ON cand.dst = sb.id
    WHERE bit_count(xor(sa.s, sb.s)) <= {hamming_threshold}
    """


# ---------------------------------------------------------------- winnowing


def winnowing_fingerprints_sql(k: int = 5, window: int = 4) -> str:
    """operators/text_analysis.winnowing_fingerprints, counted form:
    k-gram rolling hash (base 1000000007 mod 2^64, per-step wraparound like
    numpy uint64) over the normalized character stream, min per sliding
    window, distinct count. The corpus is ASCII so ord(char) == byte."""
    B = 1000000007
    # nested per-step wraparound fold over the k window characters
    h = f"ord(substr(s, i, 1))::HUGEINT"
    for j in range(1, k):
        h = f"(({h} * {B} + ord(substr(s, i+{j}, 1))) % {_MOD64})"
    w = window
    return f"""
    WITH norm AS (
      SELECT doc_id, text, array_to_string({_TOKS}, ' ') AS s FROM documents
    ),
    h AS (
      SELECT doc_id, text,
             CASE WHEN length(s) >= {k} THEN
               [{h} for i in range(1, length(s) - {k - 2})]
             END AS hs
      FROM norm
    ),
    sel AS (
      SELECT doc_id, text,
             CASE WHEN hs IS NULL THEN NULL
                  WHEN len(hs) < {w} THEN [list_min(hs)]
                  ELSE [list_min(hs[i:i+{w - 1}]) for i in range(1, len(hs) - {w - 2})]
             END AS sel
      FROM h
    )
    SELECT doc_id,
           CASE WHEN text IS NULL OR text = '' OR sel IS NULL THEN NULL
                ELSE len(list_distinct(sel)) END AS n_fingerprints
    FROM sel
    """


# ------------------------------------------------------- hyperplane sketches


def _cosine_jvm(a: str, b: str) -> str:
    """Bit-exact mirror of operators/similarity.with_cosine: float32
    products (the arrays are FLOAT[]), each widened to double, summed
    left-to-right; norms likewise; 0.0 when the denominator is not > 0."""
    dot = f"list_sum(list_transform(list_zip({a}, {b}), p -> (p[1] * p[2])::DOUBLE))"
    na = f"sqrt(list_sum(list_transform({a}, x -> (x * x)::DOUBLE)))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> (x * x)::DOUBLE)))"
    return (
        f"CASE WHEN {na} * {nb} > 0 THEN {dot} / ({na} * {nb}) "
        f"ELSE 0.0 END"
    )


def _sketch_keys_expr(dim: int, n_planes: int, bands: int) -> str:
    """[key_band0, key_band1, ...] where key_g packs the sign bits of the
    band's planes with weights 2^j — exactly operators/similarity.
    band_sketch with the seeded plane matrix inlined."""
    planes = _hyperplanes(dim, n_planes)
    bits_per = n_planes // bands
    keys = []
    for g in range(bands):
        terms = []
        for j in range(bits_per):
            row = planes[g * bits_per + j]
            lit = "[" + ", ".join(repr(float(x)) for x in row) + "]"
            terms.append(
                f"(CASE WHEN list_inner_product(embedding, {lit}) > 0 "
                f"THEN {1 << j} ELSE 0 END)"
            )
        keys.append(" + ".join(terms))
    return "[" + ", ".join(keys) + "]"


def _sketch_band_ctes(
    dim: int, n_planes: int, bands: int, cap: int, source: str = "embeddings"
) -> str:
    """``source`` -> per-band sketch keys -> band rows with over-cap
    buckets DROPPED (operators/similarity._cap_buckets semantics — no star
    edges in the top-k/pairs sketch path)."""
    return f"""
    sk AS MATERIALIZED (
      SELECT vec_id, embedding, {_sketch_keys_expr(dim, n_planes, bands)} AS keys
      FROM {source}
    ),
    br0 AS (
      SELECT vec_id, embedding, bs.b AS band, keys[bs.b+1] AS key
      FROM sk CROSS JOIN (SELECT unnest(range(0, {bands})) AS b) bs
    ),
    ok AS (
      SELECT band, key FROM br0 GROUP BY band, key HAVING count(*) <= {cap}
    ),
    br AS MATERIALIZED (SELECT br0.* FROM br0 JOIN ok USING (band, key))"""


def embedding_near_pairs_lsh_sql(
    dim: int,
    threshold: float,
    bands: int = 8,
    n_planes: int = 64,
    cap: int = DEFAULT_SKETCH_BUCKET_CAP,
    source: str = "embeddings",
) -> str:
    return f"""
    WITH {_sketch_band_ctes(dim, n_planes, bands, cap, source)},
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
             a.embedding AS ea, b.embedding AS eb
      FROM br a JOIN br b ON a.band = b.band AND a.key = b.key
      WHERE a.vec_id < b.vec_id
    )
    SELECT vec_id_a, vec_id_b FROM cand
    WHERE {_cosine_jvm('ea', 'eb')} >= {threshold}
    """


def lsh_topk_sql(
    dim: int,
    k: int,
    bands: int = 8,
    n_planes: int = 64,
    cap: int = DEFAULT_SKETCH_BUCKET_CAP,
) -> str:
    return f"""
    WITH {_sketch_band_ctes(dim, n_planes, bands, cap)},
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
             a.embedding AS ea, b.embedding AS eb
      FROM br a JOIN br b ON a.band = b.band AND a.key = b.key
      WHERE a.vec_id <> b.vec_id
    ),
    scored AS (
      SELECT vec_id, neighbor_id, {_cosine_jvm('ea', 'eb')} AS cosine
      FROM cand
    )
    SELECT vec_id, neighbor_id, rank FROM (
      SELECT vec_id, neighbor_id,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= {k}
    """


# ------------------------------------------------------------- IVF / IVF-PQ
#
# The coarse quantizer and PQ codebooks are trained driver-side from a
# deterministic md5-ordered sample (operators/similarity.
# _collect_normalized_sample) — training is SHARED with the engine (same
# numpy functions on the same sample), then the trained arrays are inlined
# as DOUBLE[] literals and the entire assign -> probe -> ADC -> re-rank is
# recomputed independently in SQL. Tie behavior is pinned on both sides:
# stable argsorts engine-side, `ORDER BY ... DESC, <id> ASC` oracle-side.
# Residual risk is summation-order ulps (numpy pairwise/BLAS vs DuckDB
# sequential) flipping a near-tie at a rank boundary — observed clean on
# the driver's sf0.01 gate data.

ORACLE_SF_DIR_ENV = "SPARK_GRAFT_ORACLE_SF_DIR"


def oracle_sf_dir() -> str:
    """The sf dir data-dependent oracles train against. The driver's gate
    runs at sf=0.01; tools/check_oracles.py exports this env var so parity
    holds at any sf."""
    import os

    return os.environ.get(ORACLE_SF_DIR_ENV, "/root/testdata/sf0.01")


def ivf_training_sample(
    sf_dir: str,
    sample_size: int = 4096,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Replicates operators/similarity._collect_normalized_sample without
    Spark: md5(str(id)) hex ordering, top-n, float64, unit-normalize.
    Sample ORDER matters — k-means seeding indexes into it."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=[id_col, vec_col])
    ids = t.column(id_col).to_pylist()
    vecs = t.column(vec_col).to_pylist()
    order = sorted(
        range(len(ids)),
        key=lambda i: hashlib.md5(str(ids[i]).encode()).hexdigest(),
    )[:sample_size]
    sample = np.stack([np.asarray(vecs[i], dtype=np.float64) for i in order])
    sn = np.linalg.norm(sample, axis=1)
    sn[sn == 0] = 1.0
    return sample / sn[:, None]


import functools


@functools.lru_cache(maxsize=4)
def ivf_oracle_artifacts(
    sf_dir: str,
    n_cells: int = 64,
    m_subspaces: int = 8,
    n_codes: int = 256,
    sample_size: int = 4096,
):
    """(centroids, codebooks) for the sf dir — the same _kmeans/_l2_kmeans
    the engine runs, on the byte-identical sample. Cached: oracle_sql()
    is called once per parity test, and the training artifacts for a
    given sf dir never change within a process."""
    import numpy as np

    from .operators.similarity import _kmeans, _l2_kmeans

    smp = ivf_training_sample(sf_dir, sample_size=sample_size)
    cents = _kmeans(smp, n_cells)
    dim = smp.shape[1]
    ds = dim // m_subspaces
    books = np.stack(
        [
            _l2_kmeans(smp[:, m * ds : (m + 1) * ds], n_codes, seed=11 + m)
            for m in range(m_subspaces)
        ]
    )
    return cents, books


def _dlist(row) -> str:
    # repr(float) is shortest-round-trip: the literal parses back to the
    # exact float64 the trainer produced
    return "[" + ", ".join(repr(float(x)) for x in row) + "]::DOUBLE[]"


def _cents_values(cents) -> str:
    return ", ".join(f"({i}, {_dlist(c)})" for i, c in enumerate(cents))


# mirror of similarity._norm_mat: widen float32 -> float64 FIRST (unlike
# _cosine_jvm, which mirrors the float32-product JVM fold), L2 norm with
# the zero-norm -> 1.0 guard, elementwise divide
_NORMED_CTE = """
    vd AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    nv AS MATERIALIZED (
      SELECT vec_id,
             list_transform(v, x -> x /
               (CASE WHEN sqrt(list_inner_product(v, v)) > 0
                     THEN sqrt(list_inner_product(v, v)) ELSE 1.0 END)) AS nvec
      FROM vd
    )"""


def ivf_topk_sql(cents, k: int, n_probe: int) -> str:
    """Mirror of operators/similarity.ivf_topk with the trained centroids
    inlined: assign (rank-1 cell), probe (rank<=n_probe cells), exact
    re-rank by the JVM-fold cosine within probed cells."""
    return f"""
    WITH cents(cell, c) AS (VALUES {_cents_values(cents)}),
    {_NORMED_CTE},
    sims AS (
      SELECT nv.vec_id, cents.cell, list_inner_product(nvec, c) AS sim
      FROM nv CROSS JOIN cents
    ),
    ranked AS (
      SELECT vec_id, cell,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS pr
      FROM sims
    ),
    corpus AS (SELECT vec_id, cell FROM ranked WHERE pr = 1),
    probes AS (SELECT vec_id AS q_id, cell FROM ranked WHERE pr <= {n_probe}),
    cand AS (
      SELECT p.q_id, c.vec_id AS neighbor_id
      FROM probes p JOIN corpus c USING (cell)
      WHERE p.q_id <> c.vec_id
    ),
    scored AS (
      SELECT cand.q_id AS vec_id, cand.neighbor_id,
             {_cosine_jvm('qa.embedding', 'qb.embedding')} AS cosine
      FROM cand
      JOIN embeddings qa ON qa.vec_id = cand.q_id
      JOIN embeddings qb ON qb.vec_id = cand.neighbor_id
    )
    SELECT vec_id, neighbor_id, rank FROM (
      SELECT vec_id, neighbor_id,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= {k}
    """


def ivf_pq_topk_sql(cents, books, k: int, n_probe: int, refine: int) -> str:
    """Mirror of operators/similarity.ivf_pq_topk: PQ-encode the corpus
    against the inlined codebooks, ADC-score probed cells (terms summed in
    subspace order, matching the engine's sequential adds), local top-t per
    (query, cell) with the self row parked at -inf exactly like the
    cogroup kernel, global top-t shortlist, exact-cosine refine."""
    m_sub, n_codes, ds = books.shape
    t_short = k * refine
    books_vals = ", ".join(
        f"({m}, {c}, {_dlist(books[m][c])})"
        for m in range(m_sub)
        for c in range(n_codes)
    )
    return f"""
    WITH cents(cell, c) AS (VALUES {_cents_values(cents)}),
    books(m, code, b) AS (VALUES {books_vals}),
    {_NORMED_CTE},
    csims AS (
      SELECT nv.vec_id, cents.cell, list_inner_product(nvec, c) AS sim
      FROM nv CROSS JOIN cents
    ),
    cranked AS (
      SELECT vec_id, cell,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS pr
      FROM csims
    ),
    cellof AS (SELECT vec_id, cell FROM cranked WHERE pr = 1),
    probes AS (SELECT vec_id AS q_id, cell FROM cranked WHERE pr <= {n_probe}),
    subv AS MATERIALIZED (
      SELECT vec_id, ms.m AS m,
             nvec[{ds} * ms.m + 1 : {ds} * (ms.m + 1)] AS sub
      FROM nv CROSS JOIN (SELECT unnest(range(0, {m_sub})) AS m) ms
    ),
    enc AS MATERIALIZED (
      SELECT vec_id, m, code FROM (
        SELECT s.vec_id, s.m, b.code,
               row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                 list_inner_product(s.sub, s.sub)
                 - 2.0 * list_inner_product(s.sub, b.b)
                 + list_inner_product(b.b, b.b) ASC, b.code ASC) AS rn
        FROM subv s JOIN books b USING (m))
      WHERE rn = 1
    ),
    adcterms AS (
      SELECT p.q_id, e.vec_id, p.cell, e.m,
             list_inner_product(qs.sub, b.b) AS term
      FROM probes p
      JOIN cellof cf ON cf.cell = p.cell
      JOIN enc e ON e.vec_id = cf.vec_id
      JOIN books b ON b.m = e.m AND b.code = e.code
      JOIN subv qs ON qs.vec_id = p.q_id AND qs.m = e.m
    ),
    adc AS (
      SELECT q_id, vec_id, cell,
             CASE WHEN q_id = vec_id THEN '-infinity'::DOUBLE
                  ELSE list_sum(list(term ORDER BY m)) END AS adc
      FROM adcterms GROUP BY q_id, vec_id, cell
    ),
    loc AS (
      SELECT q_id, vec_id, adc FROM (
        SELECT q_id, vec_id, adc,
               row_number() OVER (
                 PARTITION BY q_id, cell ORDER BY adc DESC, vec_id ASC) AS lr
        FROM adc)
      WHERE lr <= {t_short} AND q_id <> vec_id
    ),
    shortlist AS (
      SELECT q_id, vec_id AS neighbor_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (
                 PARTITION BY q_id ORDER BY adc DESC, vec_id ASC) AS gr
        FROM loc)
      WHERE gr <= {t_short}
    ),
    refined AS (
      SELECT s.q_id AS vec_id, s.neighbor_id,
             {_cosine_jvm('qa.embedding', 'qb.embedding')} AS cosine
      FROM shortlist s
      JOIN embeddings qa ON qa.vec_id = s.q_id
      JOIN embeddings qb ON qb.vec_id = s.neighbor_id
    )
    SELECT vec_id, neighbor_id, rank FROM (
      SELECT vec_id, neighbor_id,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM refined)
    WHERE rank <= {k}
    """


# ------------------------------------------------------------ SemDeDup


@functools.lru_cache(maxsize=4)
def semantic_oracle_centroids(
    sf_dir: str, n_cells: int = 16, sample_size: int = 4096
):
    """Trained coarse-quantizer centroids for semantic_dedup — the same
    md5-ordered sample + seeded _kmeans the engine's _train_centroids
    runs (operators/similarity.py:305), so the literals inlined into the
    SQL are bit-identical to the broadcast the Spark job uses."""
    from .operators.similarity import _kmeans

    return _kmeans(
        ivf_training_sample(sf_dir, sample_size=sample_size), n_cells
    )


def semantic_dedup_sql(cents, threshold: float) -> str:
    """Mirror of operators/similarity.semantic_dedup with the trained
    centroids inlined: cell assignment is argmax over normalized-vector ·
    centroid (numpy argmax takes the FIRST max, hence ORDER BY sim DESC,
    cell ASC), and a vector is dropped when ANY lower-id vector in the
    same cell has JVM-fold cosine >= threshold (dropped vectors still
    shadow later ones — the greedy chain)."""
    return f"""
    WITH cents(cell, c) AS (VALUES {_cents_values(cents)}),
    {_NORMED_CTE},
    sims AS (
      SELECT nv.vec_id, cents.cell, list_inner_product(nvec, c) AS sim
      FROM nv CROSS JOIN cents
    ),
    assigned AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS pr
        FROM sims)
      WHERE pr = 1
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a
      JOIN assigned b USING (cell)
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE a.vec_id < b.vec_id
        AND {_cosine_jvm('ea.embedding', 'eb.embedding')} >= {threshold}
    )
    SELECT a.vec_id, a.cell::BIGINT AS cell,
           (d.vec_id IS NULL) AS is_kept
    FROM assigned a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    """


# ------------------------------------------------------- corpus-stats audits


def source_overlap_minhash_sql() -> str:
    """operators/corpus_stats.source_overlap_minhash: per-source union
    MinHash sketch (min over ALL shingle hashes of the source — equal to
    the engine's min-over-docs of per-doc minima) -> pairwise agreement
    estimator. Same coefficient literals / HUGEINT math as the per-doc
    minhash CTEs."""
    alist = _hugeint_list(_A)
    blist = _hugeint_list(_B)
    return f"""
    WITH toks AS (
      SELECT source, {_TOKS} AS toks FROM documents
    ),
    sh AS (
      SELECT source,
             CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                      for i in range(1, len(toks) - 1)])
             END AS sh
      FROM toks WHERE len(toks) > 0
    ),
    shr AS (
      SELECT source, md5_number_lower(unnest(sh))::HUGEINT AS h FROM sh
    ),
    coeff AS (
      SELECT unnest(range(1, {NUM_HASHES + 1})) AS j,
             unnest({alist}) AS a, unnest({blist}) AS b
    ),
    sk AS MATERIALIZED (
      SELECT source, coeff.j,
             min(((coeff.a * shr.h + coeff.b) % {_MOD64}) // 4294967296)
               AS v
      FROM shr CROSS JOIN coeff GROUP BY source, coeff.j
    )
    SELECT a.source AS source_a, b.source AS source_b,
           sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END)::BIGINT AS n_agree,
           sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END)::DOUBLE
             / {NUM_HASHES} AS est_jaccard
    FROM sk a JOIN sk b ON a.j = b.j AND a.source < b.source
    GROUP BY a.source, b.source
    """


def cross_source_dup_matrix_sql(augmented: bool = False) -> str:
    """operators/corpus_stats.cross_source_dup_matrix: per-(sha, source)
    counts -> unordered source pairs sharing a content group.

    ``augmented`` shadows the documents view with the planted cross-source
    mirrors of __spark_entry__.q_cross_source_dup_matrix (the driver corpus
    has no exact copies spanning sources)."""
    aug = """
    documents AS (
      SELECT doc_id, text, source FROM main.documents
      UNION ALL
      SELECT -(doc_id * 4 + 1) AS doc_id, text, 'mirror_' || source AS source
      FROM main.documents WHERE doc_id % 9 = 0
      UNION ALL
      SELECT -(doc_id * 4 + 2) AS doc_id, text, 'mirror_' || source AS source
      FROM main.documents WHERE doc_id % 21 = 0
      UNION ALL
      SELECT -(doc_id * 4 + 3) AS doc_id, text, 'mirror_' || source AS source
      FROM main.documents WHERE doc_id % 21 = 0
    ),""" if augmented else ""
    return f"""
    WITH {aug} counts AS (
      SELECT sha256({_norm_text()}) AS content_sha, source,
             count(*) AS n
      FROM documents WHERE text IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT a.source AS source_a, b.source AS source_b,
           count(*)::BIGINT AS shared_groups,
           sum(a.n * b.n)::BIGINT AS cross_pairs
    FROM counts a
    JOIN counts b ON a.content_sha = b.content_sha AND a.source < b.source
    GROUP BY a.source, b.source
    """


def training_order_sql(n_shards: int = 64, salt: str = "order") -> str:
    """operators/sampling.training_order: salted-MD5 shard draw (hash60 %
    n_shards) + rank within shard by an independent salted digest."""
    return f"""
    SELECT doc_id, shard,
           row_number() OVER (
             PARTITION BY shard ORDER BY rd, doc_id)::BIGINT AS pos
    FROM (
      SELECT doc_id,
             ('0x' || substr(
                md5('{salt}:shard:' || doc_id::VARCHAR), 1, 15))::BIGINT
               % {n_shards} AS shard,
             md5('{salt}:pos:' || doc_id::VARCHAR) AS rd
      FROM documents
    )
    """


def leakage_safe_split_sql(
    test_fraction: float = 0.1, salt: str = "split"
) -> str:
    """operators/sampling.leakage_safe_split over the fuzzy cluster
    closure: per-cluster salted-MD5 holdout draw on top of
    near_dup_text_clusters_sql."""
    from .operators.sampling import fraction_to_hex_threshold

    thr = fraction_to_hex_threshold(test_fraction)
    return f"""
    SELECT doc_id, cluster_id,
           CASE WHEN md5('{salt}:' || cluster_id::VARCHAR) < '{thr}'
                THEN 'test' ELSE 'train' END AS split
    FROM ({near_dup_text_clusters_sql()})
    """


def dedup_pair_metrics_sql(golden: str = "identical") -> str:
    """operators/dedup_eval.dedup_pair_metrics over the fuzzy closure.

    ``golden`` picks the label set:
      'identical' — the proxy set: ALL pairs of documents with identical
        raw text (what a planted corpus labels for free; quadratic in
        group size, which is why the sf1 stress showed it super-linear);
      'star' — the bounded production shape of the same label set: per
        identical-text group with >1 member, only (group-min, member)
        pairs — linear in corpus size under duplication, the
        fixed-eval-artifact contract. Recall semantics are identical
        (a clique is recalled iff its star is).
    Predicted pairs fold cluster sizes with integer DIV, hits join the
    golden pairs back to both endpoints' assignments."""
    if golden == "star":
        golden_cte = """
    gk AS (SELECT doc_id, text AS k FROM documents),
    gg AS (SELECT k, min(doc_id) AS mn FROM gk
           GROUP BY k HAVING count(*) > 1),
    golden AS (
      SELECT g.mn AS id_a, k.doc_id AS id_b
      FROM gk k JOIN gg g USING (k) WHERE k.doc_id <> g.mn
    ),"""
    else:
        golden_cte = """
    golden AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM documents a
      JOIN documents b ON a.text = b.text AND a.doc_id < b.doc_id
    ),"""
    return f"""
    WITH assign AS MATERIALIZED ({near_dup_text_clusters_sql()}),
    {golden_cte}
    ng AS (SELECT count(*)::BIGINT AS n_golden FROM golden),
    pred AS (
      SELECT sum((n * (n - 1)) // 2)::BIGINT AS n_predicted
      FROM (SELECT count(*)::BIGINT AS n FROM assign GROUP BY cluster_id)
    ),
    hit AS (
      SELECT count(*)::BIGINT AS n_hit
      FROM golden g
      JOIN assign ca ON g.id_a = ca.doc_id
      JOIN assign cb ON g.id_b = cb.doc_id
      WHERE ca.cluster_id = cb.cluster_id
    )
    SELECT n_golden, n_predicted, n_hit,
           CASE WHEN n_golden > 0
                THEN n_hit::DOUBLE / n_golden END AS pair_recall,
           CASE WHEN n_predicted > 0
                THEN n_hit::DOUBLE / n_predicted END AS pair_precision
    FROM ng, pred, hit
    """


def fuzzy_decontamination_sql(eval_mod: int = 10, **kwargs) -> str:
    """operators/decontamination.fuzzy_decontaminate over the exact-decon
    contract split (train = doc_id % eval_mod != 0, eval = the rest):
    cross_corpus_novel_sql with the batch predicate flipped so TRAIN is
    the probed side, relabeled to the decontamination verdict columns."""
    inner = cross_corpus_novel_sql(
        is_batch_expr=f"doc_id % {eval_mod} != 0", **kwargs
    )
    return f"""
    SELECT doc_id, match_ref_id AS matched_eval_id,
           match_ref_id IS NOT NULL AS contaminated
    FROM ({inner})
    """


# ------------------------------------------------------- media segment chain
# DuckDB mirror of the synthetic fingerprint generator
# (operators/segment_synth.synthetic_segment_fingerprints) and the
# segment dedup chain downstream of it (operators/segment_dedup.py:
# band-slice LSH with the pairs_from_buckets cap contract, symmetric
# bit_count match-fraction verify, CC closure, tier attribution). The
# decode stage of the real media chains is not SQL-expressible; this
# puts everything AFTER the fingerprint frame behind the value-exact
# driver gate.

from .operators.segment_synth import (  # noqa: E402
    SEG_BANDS,
    SEG_BUCKET_CAP,
    SEG_MAX_HAMMING,
    SEG_MIN_MATCH_FRAC,
    SEG_REF_BUCKET_CAP,
)

_H60 = "('0x' || substr(md5({s}), 1, 15))::BIGINT"


def segment_fps_ctes() -> str:
    """CTE chain: documents -> the planted-family fingerprint frame,
    cell-exact vs synthetic_segment_fingerprints (hash60 convention;
    all values positive < 2^60 so signed bit ops agree)."""
    h = _H60.format(s="'seg:' || ck || ':' || i::VARCHAR")
    return f"""
    seg_base AS (
      SELECT doc_id AS did, doc_id // 4 AS g, doc_id % 4 AS v,
             (doc_id // 4) % 3 = 2 AS solo,
             doc_id % 29 = 7 AS broken
      FROM documents
    ),
    seg_meta AS (
      SELECT did, g, v, solo, broken,
        CASE WHEN solo THEN 'solo:' || did::VARCHAR
             ELSE 'fam:' || g::VARCHAR END AS ck,
        CASE WHEN solo THEN 8 + (did % 5) ELSE 8 + (g % 5) END AS n_seg,
        (NOT solo) AND v = 3 AND g % 2 = 0 AS noisy,
        (NOT solo) AND v = 3 AND g % 2 = 1 AS trimmed,
        CASE WHEN broken THEN 'broken:' || (did // 58)::VARCHAR
             WHEN solo THEN 'payload:solo:' || did::VARCHAR
             WHEN v = 1 THEN 'payload:' || g::VARCHAR || ':0'
             ELSE 'payload:' || g::VARCHAR || ':' || v::VARCHAR
        END AS payload_key
      FROM seg_base
    ),
    seg_fps AS MATERIALIZED (
      SELECT did, v, did::VARCHAR AS media_id,
             CASE WHEN broken THEN 'broken' ELSE 'ok' END AS status,
             payload_key,
             CASE WHEN broken THEN NULL ELSE
               list_transform(
                 range(0, (CASE WHEN trimmed THEN n_seg - 3
                                ELSE n_seg END)::BIGINT),
                 i -> CASE WHEN noisy
                      THEN xor({h},
                               (1::BIGINT << (i % 7)::INT)
                               + (1::BIGINT << (7 + g % 13)::INT))
                      ELSE {h} END)
             END AS seg_hashes
      FROM seg_meta
    )
    """


def _seg_band_rows_cte(
    name: str, src: str, id_expr: str = "media_id", bands: int = SEG_BANDS
) -> str:
    """segment_band_rows mirror: distinct (id, band, key) bit slices."""
    width = 64 // bands
    mask = (1 << width) - 1
    return f"""
    {name} AS MATERIALIZED (
      SELECT DISTINCT {id_expr} AS id, band,
             (h >> ({width} * band)) & {mask} AS key
      FROM (SELECT {id_expr}, unnest(seg_hashes) AS h FROM {src}
            WHERE seg_hashes IS NOT NULL)
      CROSS JOIN (SELECT unnest(range(0, {bands})) AS band) _b
    )
    """


_SEG_FRAC = (
    "(len(list_filter(sa.seg_hashes, x -> len(list_filter(sb.seg_hashes,"
    " y -> bit_count(xor(x, y)) <= {r})) > 0))"
    " + len(list_filter(sb.seg_hashes, y -> len(list_filter(sa.seg_hashes,"
    " x -> bit_count(xor(y, x)) <= {r})) > 0)))::DOUBLE"
    " / (len(sa.seg_hashes) + len(sb.seg_hashes))"
)


def segment_clusters_sql(
    bands: int = SEG_BANDS,
    max_hamming: int = SEG_MAX_HAMMING,
    min_match_frac: float = SEG_MIN_MATCH_FRAC,
    bucket_cap: int = SEG_BUCKET_CAP,
) -> str:
    """segment_dedup_report(...)["tiers"] over the synthetic frame:
    (media_id, cluster_id, tier). Edge families: exact (payload_key
    groups — injective for sha2), seg_exact (hash-list groups —
    injective for the comma-joined signature sha), seg_near (banded
    candidates under the pairs_from_buckets cap contract, verified by
    the symmetric match fraction). Closure via the recursive min-label
    CTE (the near_dup_text_clusters precedent), ids compared as
    STRINGS exactly like the engine. Tier = strongest incident edge
    kind; component heads 'canonical', singletons 'unique'."""
    frac = _SEG_FRAC.format(r=max_hamming)
    return f"""
    WITH RECURSIVE {segment_fps_ctes()},
    {_seg_band_rows_cte("seg_rows", "seg_fps", bands=bands)},
    bstats AS (
      SELECT band, key, count(*) AS n, min(id) AS mn
      FROM seg_rows GROUP BY band, key HAVING count(*) >= 2
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a, b FROM (
        SELECT r1.id AS a, r2.id AS b
        FROM seg_rows r1
        JOIN bstats s ON r1.band = s.band AND r1.key = s.key
        JOIN seg_rows r2 ON r2.band = s.band AND r2.key = s.key
        WHERE s.n <= {bucket_cap} AND r1.id < r2.id
        UNION ALL
        SELECT s.mn AS a, r.id AS b
        FROM seg_rows r
        JOIN bstats s ON r.band = s.band AND r.key = s.key
        WHERE s.n > {bucket_cap} AND r.id <> s.mn
      )
    ),
    near AS MATERIALIZED (
      SELECT a, b FROM cand
      JOIN seg_fps sa ON sa.media_id = cand.a
      JOIN seg_fps sb ON sb.media_id = cand.b
      WHERE {frac} >= {min_match_frac}
    ),
    ex_groups AS (
      SELECT payload_key, min(media_id) AS hub, count(*) AS n
      FROM seg_fps GROUP BY payload_key HAVING count(*) > 1
    ),
    ex_pairs AS (
      SELECT g.hub AS a, f.media_id AS b
      FROM seg_fps f JOIN ex_groups g USING (payload_key)
      WHERE f.media_id <> g.hub
    ),
    sig_groups AS (
      SELECT seg_hashes, min(media_id) AS hub, count(*) AS n
      FROM seg_fps WHERE status = 'ok'
      GROUP BY seg_hashes HAVING count(*) > 1
    ),
    sig_pairs AS (
      SELECT g.hub AS a, f.media_id AS b
      FROM (SELECT media_id, seg_hashes FROM seg_fps
            WHERE status = 'ok') f
      JOIN sig_groups g ON f.seg_hashes = g.seg_hashes
      WHERE f.media_id <> g.hub
    ),
    allp AS (
      SELECT a, b FROM ex_pairs
      UNION SELECT a, b FROM sig_pairs
      UNION SELECT a, b FROM near
    ),
    und AS (SELECT a, b FROM allp UNION SELECT b AS a, a AS b FROM allp),
    nodes AS (SELECT DISTINCT a AS id FROM und),
    reach AS (
      SELECT id, id AS lbl FROM nodes
      UNION
      SELECT u.b AS id, r.lbl FROM reach r JOIN und u ON u.a = r.id
    ),
    comp AS (
      SELECT id AS media_id, min(lbl) AS cluster_id
      FROM reach GROUP BY id
    ),
    kinds AS (
      SELECT f.media_id, 1 AS p
      FROM seg_fps f JOIN ex_groups g USING (payload_key)
      UNION ALL
      SELECT f.media_id, 2 AS p
      FROM (SELECT media_id, seg_hashes FROM seg_fps
            WHERE status = 'ok') f
      JOIN sig_groups g ON f.seg_hashes = g.seg_hashes
      UNION ALL SELECT a AS media_id, 3 AS p FROM near
      UNION ALL SELECT b AS media_id, 3 AS p FROM near
    ),
    best_kind AS (SELECT media_id, min(p) AS p FROM kinds GROUP BY media_id)
    SELECT f.media_id,
           coalesce(c.cluster_id, f.media_id) AS cluster_id,
           CASE WHEN c.media_id IS NULL THEN 'unique'
                WHEN f.media_id = c.cluster_id THEN 'canonical'
                WHEN k.p = 1 THEN 'exact'
                WHEN k.p = 2 THEN 'seg_exact'
                ELSE 'seg_near' END AS tier
    FROM seg_fps f
    LEFT JOIN comp c USING (media_id)
    LEFT JOIN best_kind k ON k.media_id = f.media_id
    """


def segment_novelty_sql(
    bands: int = SEG_BANDS,
    max_hamming: int = SEG_MAX_HAMMING,
    min_match_frac: float = SEG_MIN_MATCH_FRAC,
    ref_bucket_cap: int = SEG_REF_BUCKET_CAP,
) -> str:
    """segment_novelty(batch = did%4==3, ref = rest) over the synthetic
    frame: cross-side-only banded candidates, reference buckets capped
    with a min-id witness, verified best match per batch item ordered
    (frac DESC, ref_id ASC) — the min_by struct packing mirrored as a
    window rank."""
    frac = _SEG_FRAC.format(r=max_hamming)
    return f"""
    WITH {segment_fps_ctes()},
    batch_fps AS (SELECT * FROM seg_fps WHERE did % 4 = 3),
    ref_fps AS (SELECT * FROM seg_fps WHERE did % 4 <> 3),
    {_seg_band_rows_cte("b_rows", "batch_fps", bands=bands)},
    {_seg_band_rows_cte("r_rows", "ref_fps", bands=bands)},
    r_stats AS (
      SELECT band, key, count(*) AS n, min(id) AS mn
      FROM r_rows GROUP BY band, key
    ),
    r_capped AS (
      SELECT r.band, r.key, r.id AS rid
      FROM r_rows r JOIN r_stats s ON r.band = s.band AND r.key = s.key
      WHERE s.n <= {ref_bucket_cap} OR r.id = s.mn
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT b.id AS bid, r.rid
      FROM b_rows b JOIN r_capped r ON b.band = r.band AND b.key = r.key
    ),
    verified AS (
      SELECT bid, rid, {frac} AS match_frac
      FROM cand
      JOIN batch_fps sa ON sa.media_id = cand.bid
      JOIN ref_fps sb ON sb.media_id = cand.rid
      WHERE sa.seg_hashes IS NOT NULL AND sb.seg_hashes IS NOT NULL
    ),
    scored AS (SELECT * FROM verified WHERE match_frac >= {min_match_frac}),
    best AS (
      SELECT bid, rid, match_frac FROM (
        SELECT bid, rid, match_frac, row_number() OVER (
          PARTITION BY bid ORDER BY match_frac DESC, rid ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT f.media_id, b.rid AS match_ref_id, b.match_frac,
           b.rid IS NULL AS is_novel
    FROM batch_fps f LEFT JOIN best b ON b.bid = f.media_id
    """


def frames_matching_images_sql(
    bands: int = SEG_BANDS,
    max_hamming: int = 4,
    image_bucket_cap: int = SEG_REF_BUCKET_CAP,
) -> str:
    """video_dedup.frames_matching_images over the synthetic canonical
    videos (did%4==0, status ok) and synthetic_modal_images stills
    (one per did%4==1 row): banded cross-modal candidates, image
    buckets capped with a min-id witness, bit_count verify. Output one
    row per (video, frame_pos, image) match with the Hamming
    distance."""
    width = 64 // bands
    mask = (1 << width) - 1
    still = _H60.format(s="'still:' || did::VARCHAR")
    fam = _H60.format(
        s="'seg:fam:' || g::VARCHAR || ':' || (did % n_seg)::VARCHAR"
    )
    return f"""
    WITH {segment_fps_ctes()},
    vids AS (
      SELECT media_id AS video_id, seg_hashes FROM seg_fps
      WHERE did % 4 = 0 AND status = 'ok'
    ),
    v_rows AS MATERIALIZED (
      -- subscript bound derived from the data (the engine posexplodes
      -- ALL frame hashes; a hard-coded literal would silently truncate
      -- if the generator's segment counts ever grow)
      SELECT video_id, i - 1 AS frame_pos, seg_hashes[i] AS h, band,
             (seg_hashes[i] >> ({width} * band)) & {mask} AS key
      FROM vids
      CROSS JOIN (SELECT unnest(range(
        1, (SELECT coalesce(max(len(seg_hashes)), 0) FROM vids) + 1
      )) AS i) _i
      CROSS JOIN (SELECT unnest(range(0, {bands})) AS band) _b
      WHERE i <= len(seg_hashes)
    ),
    imgs AS (
      SELECT 'img:' || did::VARCHAR AS image_id,
             CASE WHEN solo OR broken THEN {still}
                  WHEN g % 2 = 1
                  THEN xor({fam}, (1::BIGINT << (g % 20)::INT))
                  ELSE {fam} END AS ph
      FROM (SELECT did, g, solo, broken, 8 + (g % 5) AS n_seg
            FROM seg_base WHERE did % 4 = 1)
    ),
    i_rows AS MATERIALIZED (
      SELECT image_id, ph, band, (ph >> ({width} * band)) & {mask} AS key
      FROM imgs
      CROSS JOIN (SELECT unnest(range(0, {bands})) AS band) _b
    ),
    i_stats AS (
      SELECT band, key, count(*) AS n, min(image_id) AS mn
      FROM i_rows GROUP BY band, key
    ),
    i_capped AS (
      SELECT r.band, r.key, r.image_id, r.ph
      FROM i_rows r JOIN i_stats s ON r.band = s.band AND r.key = s.key
      WHERE s.n <= {image_bucket_cap} OR r.image_id = s.mn
    )
    SELECT DISTINCT v.video_id, v.frame_pos, i.image_id,
           bit_count(xor(v.h, i.ph))::BIGINT AS hamming
    FROM v_rows v JOIN i_capped i ON v.band = i.band AND v.key = i.key
    WHERE bit_count(xor(v.h, i.ph)) <= {max_hamming}
    """


def segment_pair_metrics_sql() -> str:
    """dedup_eval.dedup_pair_metrics over the media segment chain's
    cluster assignments (segment_clusters_sql, which embeds the full
    synthetic-fingerprint chain) and the PLANTED golden pair set: per
    expected content group (family / solo / shared broken payload, the
    segment_synth scheme keyed on doc_id alone) with >1 member, the
    (string-min member, other member) star pairs — both engines pick
    the hub by STRING min over the stringified id, so the pair sets are
    byte-identical. Metrics fold mirrors dedup_pair_metrics_sql."""
    return f"""
    WITH assign AS MATERIALIZED (
      SELECT media_id, cluster_id FROM ({segment_clusters_sql()})
    ),
    gk AS (
      SELECT doc_id::VARCHAR AS mid,
        CASE WHEN doc_id % 29 = 7
               THEN 'broken:' || (doc_id // 58)::VARCHAR
             WHEN (doc_id // 4) % 3 = 2
               THEN 'solo:' || doc_id::VARCHAR
             ELSE 'fam:' || (doc_id // 4)::VARCHAR END AS k
      FROM documents
    ),
    gg AS (SELECT k, min(mid) AS mn FROM gk
           GROUP BY k HAVING count(*) > 1),
    golden AS (
      SELECT g.mn AS id_a, k.mid AS id_b
      FROM gk k JOIN gg g USING (k) WHERE k.mid <> g.mn
    ),
    ng AS (SELECT count(*)::BIGINT AS n_golden FROM golden),
    pred AS (
      SELECT sum((n * (n - 1)) // 2)::BIGINT AS n_predicted
      FROM (SELECT count(*)::BIGINT AS n FROM assign GROUP BY cluster_id)
    ),
    hit AS (
      SELECT count(*)::BIGINT AS n_hit
      FROM golden g
      JOIN assign ca ON g.id_a = ca.media_id
      JOIN assign cb ON g.id_b = cb.media_id
      WHERE ca.cluster_id = cb.cluster_id
    )
    SELECT n_golden, n_predicted, n_hit,
           CASE WHEN n_golden > 0
                THEN n_hit::DOUBLE / n_golden END AS pair_recall,
           CASE WHEN n_predicted > 0
                THEN n_hit::DOUBLE / n_predicted END AS pair_precision
    FROM ng, pred, hit
    """
