"""DuckDB oracle SQL for the text-analysis / dedup / ANN query suite.

Each builder mirrors a deterministic pipeline operator exactly:

- **doc_rolling_fp** — polynomial rolling hash (base 257 mod 2^61-1) over
  codepoints, via ``list_reduce`` in HUGEINT arithmetic.
- **doc_langid** — the marker-word + trigram profile scorer
  (`functions/langid.py::detect_language`), profiles embedded as VALUES;
  score arithmetic mirrors the Python expression term-for-term so IEEE
  results (and therefore argmax ties) are bit-identical.
- **doc_simhash** — 64-bit SimHash over distinct lowercased tokens; the
  per-feature hash is the first 8 md5 bytes little-endian, which DuckDB
  exposes as ``md5_number_upper`` (`functions/minhash.py::simhash64`).
- **doc_minhash_dedup** — clusters from EXACT word-3-gram Jaccard >= 0.7
  plus transitive closure. The pipeline verifies by minhash signature
  estimate; tests/test_doc_oracle.py asserts estimate- and exact-threshold
  clusterings agree on the corpus (pair margins are wide: planted near-dups
  have J >= 0.9, everything else ~0.3).
- **doc_ngram_jaccard_pairs** — exact all-pairs word-3-gram Jaccard >= 0.8
  (the pipeline's MinHash blocking has ~1-4e-8 miss probability at J >= 0.9).
- **embedding_near_dup** — all-pairs cosine >= threshold + closure.
- similarity_topk_lsh shares similarity_topk's exact SQL: the LSH probe is
  exact on this table (recall 1.0, same rounding/tie-break), asserted by
  tests/test_doc_oracle.py.

All run over the driver's pre-registered ``documents`` / ``embeddings``
views — no external paths.
"""

from __future__ import annotations

from ..functions.langid import _PROFILES, _TRIGRAMS
from ..functions.tokenize import TOKEN_PATTERN

_MOD = (1 << 61) - 1


def doc_rolling_fp_sql() -> str:
    return f"""
        SELECT doc_id,
               CASE WHEN text IS NULL OR text = '' THEN 0
                    ELSE list_reduce(
                        list_prepend(0::HUGEINT,
                            [unicode(c)::HUGEINT
                             for c in regexp_split_to_array(text, '')]),
                        (h, c) -> (h * 257 + c) % {_MOD}::HUGEINT
                    )::BIGINT
               END AS rolling_fp
        FROM documents
    """


def _prof_values() -> str:
    rows = []
    for lang in sorted(_PROFILES):
        markers = ", ".join(f"'{w}'" for w in sorted(_PROFILES[lang]))
        tris = ", ".join(f"'{t}'" for t in sorted(_TRIGRAMS[lang]))
        rows.append(f"('{lang}', [{markers}], [{tris}])")
    return ", ".join(rows)


def doc_langid_sql() -> str:
    # mirrors detect_language: CJK codepoint check first, then per-language
    # score = marker_hits/len(words) + 0.1*trigram_occurrences/max(1, len//3);
    # argmax with ties to the alphabetically first language; 'und' if the
    # best score is not > 0
    return f"""
        WITH prof(lang, markers, trigrams) AS (VALUES {_prof_values()}),
        d AS (
            SELECT doc_id, coalesce(text, '') AS text,
                   regexp_extract_all(lower(coalesce(text, '')), '[a-zà-ÿ]+')
                       AS words,
                   len(regexp_extract_all(coalesce(text, ''), '[一-鿿]'))
                       AS han,
                   len(regexp_extract_all(coalesce(text, ''), '[぀-ヿ]'))
                       AS kana,
                   len(regexp_extract_all(coalesce(text, ''), '[가-힯]'))
                       AS hangul
            FROM documents
        ),
        j AS (SELECT *, array_to_string(words, ' ') AS joined FROM d),
        scored AS (
            SELECT j.doc_id, p.lang,
                   len(list_filter(j.words, w -> list_contains(p.markers, w)))
                       / len(j.words)
                   + 0.1 * list_sum(list_transform(p.trigrams,
                         t -> (length(j.joined)
                               - length(replace(j.joined, t, ''))) // 3))
                     / greatest(1, length(j.joined) // 3) AS score
            FROM j CROSS JOIN prof p
            WHERE len(j.words) > 0
              AND NOT (j.han + j.kana + j.hangul
                       >= greatest(1, length(j.text) // 20))
        ),
        best AS (
            SELECT doc_id, lang, score
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY score DESC, lang ASC) AS rk
                  FROM scored)
            WHERE rk = 1
        )
        SELECT d.doc_id,
               CASE WHEN d.text = '' THEN 'und'
                    WHEN d.han + d.kana + d.hangul
                         >= greatest(1, length(d.text) // 20) THEN
                         CASE WHEN d.hangul >= greatest(1, d.kana) THEN 'ko'
                              WHEN d.kana > 0 THEN 'ja'
                              ELSE 'zh' END
                    WHEN len(d.words) = 0 THEN 'und'
                    WHEN b.score > 0 THEN b.lang
                    ELSE 'und'
               END AS lang_pred
        FROM d LEFT JOIN best b USING (doc_id)
    """


def doc_simhash_sql() -> str:
    return f"""
        WITH dt AS (
            SELECT doc_id,
                   list_distinct(regexp_extract_all(lower(coalesce(text, '')),
                       '{TOKEN_PATTERN}')) AS toks
            FROM documents
        ),
        th AS (
            SELECT doc_id, md5_number_upper(unnest(toks)) AS h FROM dt
        ),
        bits AS (
            SELECT doc_id, bi.b,
                   sum(CASE WHEN (h >> bi.b::INT) & 1 = 1 THEN 1 ELSE -1 END)
                       AS acc
            FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bi
            GROUP BY doc_id, bi.b
        ),
        sh AS (
            SELECT doc_id,
                   sum(CASE WHEN acc > 0 THEN (1::HUGEINT << b::INT)
                       ELSE 0::HUGEINT END) AS u
            FROM bits GROUP BY doc_id
        )
        SELECT dt.doc_id,
               coalesce(CASE WHEN s.u >= 9223372036854775808::HUGEINT
                             THEN (s.u - 18446744073709551616::HUGEINT)::BIGINT
                             ELSE s.u::BIGINT END, 0) AS simhash
        FROM dt LEFT JOIN sh s USING (doc_id)
    """


def _shingle_cte() -> str:
    """Word-3-gram shingle sets per document (mirrors ``word_shingles``)."""
    return f"""
        dt AS (
            SELECT doc_id,
                   regexp_extract_all(lower(coalesce(text, '')),
                       '{TOKEN_PATTERN}') AS toks
            FROM documents
        ),
        shin AS (
            SELECT doc_id,
                   CASE WHEN len(toks) = 0 THEN []::VARCHAR[]
                        WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                        ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                            for i in range(1, len(toks) - 1)])
                   END AS sh
            FROM dt
        )"""


def _jaccard_pairs_cte(threshold: float) -> str:
    """All same-table pairs (a.doc_id < b.doc_id) with exact Jaccard.

    Two empty shingle sets have Jaccard 1 (mirrors ``jaccard``); one empty
    side gives 0.
    """
    return f"""{_shingle_cte()},
        jp AS (
            SELECT a.doc_id AS pa, b.doc_id AS pb,
                   CASE WHEN len(a.sh) = 0 AND len(b.sh) = 0 THEN 1.0
                        WHEN len(a.sh) = 0 OR len(b.sh) = 0 THEN 0.0
                        ELSE len(list_intersect(a.sh, b.sh))
                             / (len(a.sh) + len(b.sh)
                                - len(list_intersect(a.sh, b.sh)))
                   END AS jac
            FROM shin a JOIN shin b ON a.doc_id < b.doc_id
        ),
        pairs AS (SELECT pa, pb, jac FROM jp WHERE jac >= {threshold})"""


def doc_ngram_jaccard_pairs_sql(threshold: float = 0.8) -> str:
    return f"""
        WITH {_jaccard_pairs_cte(threshold)}
        SELECT pa AS a, pb AS b, round(jac, 4) AS jac FROM pairs
    """


def _closure_sql(universe_sql: str, id_col: str) -> str:
    """Shared tail: pairs(pa,pb) + universe → (id_col, cluster_id)."""
    return f"""
        sym AS (
            SELECT pa AS a, pb AS b FROM pairs
            UNION SELECT pb, pa FROM pairs
        ),
        reach AS (
            SELECT {id_col} AS src, {id_col} AS dst FROM ({universe_sql})
            UNION
            SELECT r.src, e.b FROM reach r JOIN sym e ON r.dst = e.a
        )
        SELECT src AS {id_col}, min(dst)::BIGINT AS cluster_id
        FROM reach GROUP BY src
    """


def doc_minhash_dedup_sql(threshold: float = 0.7) -> str:
    return f"""
        WITH RECURSIVE {_jaccard_pairs_cte(threshold)},
        {_closure_sql("SELECT doc_id FROM documents", "doc_id")}
    """


def embedding_near_dup_sql(threshold: float = 0.98) -> str:
    return f"""
        WITH RECURSIVE ep AS (
            SELECT a.vec_id AS pa, b.vec_id AS pb
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[])
                  >= {threshold}
        ),
        pairs AS (SELECT pa, pb FROM ep),
        {_closure_sql("SELECT vec_id FROM embeddings", "vec_id")}
    """


def similarity_topk_sql(k: int = 10, query_vec_id: int = 0) -> str:
    """Exact cosine top-k — shared by similarity_topk and (because its
    probe achieves exact recall on this table) similarity_topk_lsh."""
    return f"""
        SELECT e.vec_id,
               round(list_cosine_similarity(
                   e.embedding::DOUBLE[],
                   (SELECT embedding FROM embeddings
                    WHERE vec_id = {query_vec_id})::DOUBLE[]
               ), 4) AS cos
        FROM embeddings e WHERE e.vec_id <> {query_vec_id}
        ORDER BY cos DESC, vec_id ASC LIMIT {k}
    """


def media_image_features_sql() -> str:
    """Mirrors the fake image codec + pixel-sum summary term-for-term:
    ``DeterministicFakeCodec.decode_image`` pixels are
    (u % 2^32 + j·((u >> 32) | 1)) % 256 for j in 0..767 (16×16×3 C order),
    u = first 8 md5 bytes little-endian (DuckDB ``md5_number_upper``);
    feat_dim = 192 (the 8×8×3 pooled grid), feat_mean =
    round(px_sum / (768·255), 6) — equal to the mean of the equal-sized
    2×2-block pooled features, computed from the exact integer pixel sum."""
    return """
        WITH p AS (
            SELECT doc_id, md5_number_upper(coalesce(text, '')) AS u
            FROM documents
        ),
        pr AS (
            SELECT doc_id,
                   (u % 4294967296)::BIGINT AS strt,
                   ((u >> 32) | 1)::BIGINT AS step
            FROM p
        ),
        px AS (
            SELECT doc_id, sum((strt + g.j * step) % 256) AS s
            FROM pr CROSS JOIN (SELECT unnest(range(0, 768)) AS j) g
            GROUP BY doc_id
        )
        SELECT 'm' || printf('%06d', doc_id) AS media_id,
               192::BIGINT AS feat_dim,
               round(s / 195840.0, 6) AS feat_mean
        FROM px
    """


def similarity_topk_ivf_sql(
    sf_dir: str = "/root/testdata/sf0.01", k: int = 10, query_vec_id: int = 0
) -> str:
    """IVF-flat ANN oracle. The index is deterministic (fixed k-means seed,
    prefix sample, argmin assignment), so this builder recomputes the probed
    candidate-id set locally with pure numpy — no Ray, no shared search code
    — and DuckDB then independently computes the exact cosine top-k over
    those candidates from the real table. The id list is bound to ``sf_dir``
    (the driver compares at sf0.01; pass GRAFT_ORACLE_SF_DIR elsewhere)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from ..stages.similarity import kmeans_centroids
    from .queries import IVF_LISTS, IVF_NPROBE, IVF_SAMPLE

    tab = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(tab["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(tab["embedding"].to_pylist(), dtype=np.float64)
    cent = kmeans_centroids(mat[:IVF_SAMPLE], k=IVF_LISTS)
    assign = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    q = mat[ids == query_vec_id][0]
    probe = set(
        np.argsort(((q[None, :] - cent) ** 2).sum(axis=1))[:IVF_NPROBE].tolist()
    )
    cand = sorted(
        int(i)
        for i, a in zip(ids, assign)
        if int(a) in probe and int(i) != query_vec_id
    )
    if not cand:
        raise ValueError(f"IVF oracle: empty candidate set for {sf_dir}")
    id_list = ", ".join(str(i) for i in cand)
    return f"""
        SELECT e.vec_id,
               round(list_cosine_similarity(
                   e.embedding::DOUBLE[],
                   (SELECT embedding FROM embeddings
                    WHERE vec_id = {query_vec_id})::DOUBLE[]
               ), 4) AS cos
        FROM embeddings e
        WHERE e.vec_id IN ({id_list})
        ORDER BY cos DESC, vec_id ASC LIMIT {k}
    """


def embedding_kmeans_sql(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """Unrolled Lloyd iterations mirroring ``queries.embedding_kmeans`` /
    ``similarity.kmeans_assign``: init = embeddings of the k smallest
    vec_ids; per iteration assign by round(list_distance, 6) with
    smallest-cluster tie-break, then component-wise round(avg, 6) means
    (an empty cluster keeps its previous centroid via the LEFT JOIN
    coalesce); final SELECT is one more assignment pass.

    FLOAT-PARITY FRAGILITY (same class as the NOTES.md rounding entries):
    the two sides sum doubles in different orders (numpy batch-tree partial
    sums vs DuckDB's own aggregation order), so equality relies on no
    partial sum landing within ~1 ulp of a round(x, 6) boundary — and the
    iteration unrolling COMPOUNDS a single flipped assignment into a
    whole-table mismatch. Green at sf0.001/0.01/0.1 today, but this parity
    is scale- and partitioning-dependent, not guaranteed; if it ever flips,
    compare assignments with a tolerance on the distance margin (or round
    partial sums at a coarser epsilon checked against the boundary
    distance) rather than chasing bit equality."""
    body, assign = _kmeans_parts(k, iters, dim)
    return f"WITH {body}\nSELECT vec_id, cluster FROM ({assign}) WHERE rn = 1"


def _kmeans_parts(
    k: int,
    iters: int,
    dim: int,
    prefix: str = "",
    vec_expr: str = "embedding::DOUBLE[]",
) -> tuple[str, str]:
    """Shared unrolled-Lloyd CTE chain: returns (cte_body, final-assignment
    subquery selecting ``e.vec_id, c.cluster`` with an rn=1 filter expected
    at the caller). ``prefix`` namespaces every CTE so several chains (the
    product-quantization subspace oracles) compose in ONE statement;
    ``vec_expr`` selects/slices the vector column."""
    r = 6
    x = prefix
    parts = [
        f"""{x}e AS (SELECT vec_id, {vec_expr} AS v FROM embeddings),
{x}pos AS (SELECT unnest(range(1, {dim + 1})) AS p),
{x}c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
  FROM (SELECT vec_id, v FROM {x}e ORDER BY vec_id LIMIT {k}))"""
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        parts.append(
            f""",
{x}a{i} AS (
  SELECT vec_id, cluster, v FROM (
    SELECT e.vec_id, c.cluster, e.v,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round(list_distance(e.v, c.v), {r}), c.cluster) AS rn
    FROM {x}e e, {x}{prev} c) WHERE rn = 1),
{x}m{i} AS (
  SELECT cluster, list(m ORDER BY p) AS v FROM (
    SELECT a.cluster, pos.p, round(avg(a.v[pos.p]), {r}) AS m
    FROM {x}a{i} a, {x}pos pos GROUP BY a.cluster, pos.p) GROUP BY cluster),
{x}c{i} AS (
  SELECT pc.cluster, coalesce(nm.v, pc.v) AS v
  FROM {x}{prev} pc LEFT JOIN {x}m{i} nm USING (cluster))"""
        )
        prev = f"c{i}"
    assign = f"""
  SELECT e.vec_id, c.cluster,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_distance(e.v, c.v), {r}), c.cluster) AS rn
  FROM {x}e e, {x}{prev} c"""
    return "".join(parts), assign


def embedding_semdedup_sql(
    k: int = 8, iters: int = 3, dim: int = 64, tau: float = 0.42
) -> str:
    """SemDedup keep flags: the ``embedding_kmeans_sql`` unrolled-Lloyd
    chain (verbatim — same init, iterations, rounding, tie-breaks) plus a
    final-assignment CTE and the within-cluster pairwise cosine pass. A
    vector is DROPPED (keep = 0) when some cluster-mate with a SMALLER
    vec_id has round(cosine, 6) ≥ τ — the deterministic min-id-survivor
    rule mirrored by ``queries.embedding_semdedup``. τ sits ≥ 1e-4 from
    every observed within-cluster cosine at sf0.001/0.01/0.1, so the
    rounded compare cannot flip on summation-order ulps (same fragility
    class as ``embedding_kmeans_sql`` — see its docstring)."""
    body, assign = _kmeans_parts(k, iters, dim)
    return f"""WITH {body},
asg AS MATERIALIZED (
  SELECT vec_id, cluster FROM ({assign}) WHERE rn = 1)
SELECT a.vec_id, a.cluster,
       (CASE WHEN EXISTS (
           SELECT 1 FROM asg b
           JOIN e eb ON eb.vec_id = b.vec_id
           WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
             AND round(list_cosine_similarity(eb.v, ea.v), 6) >= {tau})
        THEN 0 ELSE 1 END)::BIGINT AS keep
FROM asg a JOIN e ea ON ea.vec_id = a.vec_id"""


def embedding_pq_codes_sql(
    m: int = 4, sub_dim: int = 16, k: int = 4, iters: int = 2
) -> str:
    """Product-quantization codebook assignment: ``m`` independent
    ``_kmeans_parts`` chains (one per contiguous ``sub_dim`` slice of the
    vector, 1-based inclusive DuckDB list slicing), each namespaced with
    an ``s{{i}}_`` prefix so the unrolled iterations compose in ONE
    statement; the final select joins the per-subspace assignments into
    the code tuple. Mirrors ``queries.embedding_pq_codes`` (same init =
    k smallest vec_ids per subspace, same rounding/tie-breaks — the
    ``embedding_kmeans_sql`` fragility note applies per chain)."""
    bodies, finals = [], []
    for s in range(m):
        lo, hi = s * sub_dim + 1, (s + 1) * sub_dim
        body, assign = _kmeans_parts(
            k,
            iters,
            sub_dim,
            prefix=f"s{s}_",
            vec_expr=f"(embedding::DOUBLE[])[{lo}:{hi}]",
        )
        bodies.append(body)
        finals.append(
            f"s{s}_asg AS MATERIALIZED (\n"
            f"  SELECT vec_id, cluster FROM ({assign}) WHERE rn = 1)"
        )
    joins = "\n".join(
        f"JOIN s{s}_asg s{s} USING (vec_id)" for s in range(1, m)
    )
    cols = ",\n       ".join(
        f"s{s}.cluster AS c{s}" for s in range(m)
    )
    return f"""WITH {",".join(bodies)},
{",".join(finals)}
SELECT vec_id,
       {cols}
FROM s0_asg s0
{joins}"""


def embedding_pca_top1_sql(iters: int = 3, dim: int = 64) -> str:
    """Unrolled power iterations mirroring ``queries.embedding_pca_top1``:
    v0 = 1/8 per component (exact dyadic), per iteration
    w = Σᵢ xᵢ(xᵢ·v) over all rows, v' = round(w / ‖w‖, 6); final output
    rounded to 4 decimals.

    Same float-parity fragility as ``embedding_kmeans_sql`` (see its
    docstring): differently-ordered double summation + per-iteration
    round(·, 6) compounding — green at three scales, not guaranteed."""
    r = 6
    parts = [
        f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
pos AS (SELECT unnest(range(1, {dim + 1})) AS p),
v0 AS (SELECT p AS pos, 0.125 AS val FROM pos)"""
    ]
    prev = "v0"
    for i in range(1, iters + 1):
        parts.append(
            f""",
d{i} AS MATERIALIZED (
  SELECT e.vec_id, sum(e.x[v.pos] * v.val) AS dot
  FROM e, {prev} v GROUP BY e.vec_id),
w{i} AS MATERIALIZED (
  SELECT pos.p AS pos, sum(e.x[pos.p] * d.dot) AS w
  FROM e JOIN d{i} d USING (vec_id), pos
  GROUP BY pos.p),
n{i} AS MATERIALIZED (SELECT sqrt(sum(w * w)) AS nrm FROM w{i}),
v{i} AS MATERIALIZED (
  SELECT w.pos, round(w.w / n.nrm, {r}) AS val FROM w{i} w, n{i} n)"""
        )
        prev = f"v{i}"
    parts.append(
        f"""
SELECT pos::BIGINT AS pos, round(val, 4) AS val FROM {prev}"""
    )
    return "".join(parts)


def corpus_bpe_merges_sql(n_merges: int = 6) -> str:
    """Unrolled BPE merge rounds (kmeans/pagerank unroll precedent): each
    round counts adjacent symbol pairs weighted by word frequency (list
    pair expansion — overlapping pairs counted, as BPE's get_stats does),
    picks (max count, lexicographically smallest 'l r' string), and
    rewrites every word with a list_reduce fold — proven equivalent to
    the standard left-to-right non-overlapping merge scan because the
    merged token can never equal its own left symbol. Every round CTE is
    MATERIALIZED (DuckDB re-inlines recursive-adjacent CTEs
    exponentially — the k-core lesson)."""
    parts = [
        """
WITH words AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS n FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS word
    FROM documents)
  GROUP BY word),
w0 AS MATERIALIZED (SELECT split(word, '') AS syms, n FROM words)"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        parts.append(
            f""",
p{i} AS MATERIALIZED (
  SELECT p, sum(n)::BIGINT AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(syms)),
                  j -> syms[j] || ' ' || syms[j + 1])) AS p, n
    FROM {prev})
  GROUP BY p),
b{i} AS MATERIALIZED (
  SELECT split_part(p, ' ', 1) AS l, split_part(p, ' ', 2) AS r, cnt
  FROM p{i} ORDER BY cnt DESC, p ASC LIMIT 1),
w{i} AS MATERIALIZED (
  SELECT list_reduce(
           list_prepend([]::VARCHAR[], list_transform(syms, s -> [s])),
           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l
                             AND x[1] = b.r
                       THEN acc[1:len(acc) - 1] || [b.l || b.r]
                       ELSE acc || x END) AS syms, n
  FROM {prev} CROSS JOIN b{i} b)"""
        )
    selects = [
        f"""SELECT {i} AS merge_idx, l AS left_sym, r AS right_sym,
       l || r AS merged, cnt AS freq FROM b{i}"""
        for i in range(1, n_merges + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def doc_jaccard_clusters_sql(threshold: float = 0.8) -> str:
    """Near-dup cluster sizes: recursive closure over the SAME pair CTE
    that backs ``doc_ngram_jaccard_pairs``, restricted to paired ids
    (singletons carry no pair row), then a size census per min-member
    label — mirrors ``queries.doc_jaccard_clusters``."""
    return f"""
        WITH RECURSIVE {_jaccard_pairs_cte(threshold)},
        sym AS (
            SELECT pa AS a, pb AS b FROM pairs
            UNION SELECT pb, pa FROM pairs
        ),
        uni AS (SELECT a AS id FROM sym),
        reach AS (
            SELECT id AS src, id AS dst FROM uni
            UNION
            SELECT r.src, e.b FROM reach r JOIN sym e ON r.dst = e.a
        ),
        lab AS (
            SELECT src AS doc_id, min(dst)::BIGINT AS cluster_id
            FROM reach GROUP BY src
        )
        SELECT cluster_id, count(*)::BIGINT AS n_docs
        FROM lab GROUP BY cluster_id
        ORDER BY cluster_id
    """


def doc_containment_pairs_sql(threshold: float = 0.8) -> str:
    """Ordered containment pairs — mirrors
    ``stages.dedup.containment_pairs`` (|S(a)∩S(b)| / |S(a)|, empty
    shingle sets never contained)."""
    return f"""
        WITH {_shingle_cte()},
        cp AS (
            SELECT a.doc_id AS ca, b.doc_id AS cb,
                   CASE WHEN len(a.sh) = 0 THEN 0.0
                        ELSE len(list_intersect(a.sh, b.sh))
                             / len(a.sh) END AS cont
            FROM shin a JOIN shin b ON a.doc_id <> b.doc_id)
        SELECT ca AS a, cb AS b, round(cont, 4) AS containment
        FROM cp WHERE cont >= {threshold}
    """


def doc_winnowing_fp_sql() -> str:
    """Winnowing fingerprints — mirrors ``queries.doc_winnowing_fp``
    (ordered token 3-grams, md5-hex-prefix hashes, window-of-4
    lexicographic minima, distinct per doc)."""
    return f"""
        WITH dt AS (
            SELECT doc_id,
                   regexp_extract_all(lower(coalesce(text, '')),
                       '{TOKEN_PATTERN}') AS toks
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   CASE WHEN len(toks) = 0 THEN []::VARCHAR[]
                        WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                        ELSE [array_to_string(toks[i:i+2], ' ')
                              for i in range(1, len(toks) - 1)]
                   END AS gs
            FROM dt
        ),
        hs AS (
            SELECT doc_id,
                   list_transform(gs, g -> substr(md5(g), 1, 16)) AS h
            FROM grams
        ),
        sel AS (
            SELECT doc_id,
                   CASE WHEN len(h) = 0 THEN []::VARCHAR[]
                        WHEN len(h) < 4 THEN [list_min(h)]
                        ELSE list_distinct([list_min(h[i:i+3])
                                            for i in range(1, len(h) - 2)])
                   END AS fps
            FROM hs
        )
        SELECT doc_id, unnest(fps) AS fp FROM sel
    """


def doc_dedup_keep_longest_sql(threshold: float = 0.8) -> str:
    """Keep-longest survivorship over the exact Jaccard clusters —
    mirrors ``queries.doc_dedup_keep_longest`` (paired docs only;
    survivor = n_chars DESC, doc_id ASC)."""
    return f"""
        WITH RECURSIVE {_jaccard_pairs_cte(threshold)},
        sym AS (
            SELECT pa AS a, pb AS b FROM pairs
            UNION SELECT pb, pa FROM pairs
        ),
        uni AS (
            SELECT pa AS doc_id FROM pairs
            UNION SELECT pb FROM pairs
        ),
        reach AS (
            SELECT doc_id AS src, doc_id AS dst FROM uni
            UNION
            SELECT r.src, e.b FROM reach r JOIN sym e ON r.dst = e.a
        ),
        cl AS (
            SELECT src AS doc_id, min(dst)::BIGINT AS cluster_id
            FROM reach GROUP BY src
        ),
        j AS (
            SELECT cl.doc_id, cl.cluster_id, d.n_chars
            FROM cl JOIN documents d ON d.doc_id = cl.doc_id
        ),
        win AS (
            SELECT cluster_id, doc_id AS keep_id FROM (
                SELECT cluster_id, doc_id,
                       row_number() OVER (PARTITION BY cluster_id
                           ORDER BY n_chars DESC, doc_id ASC) AS rn
                FROM j) WHERE rn = 1
        )
        SELECT j.doc_id, j.cluster_id,
               (CASE WHEN j.doc_id = w.keep_id THEN 1 ELSE 0 END)::BIGINT
                   AS keep
        FROM j JOIN win w ON w.cluster_id = j.cluster_id
    """


def embedding_centroid_outliers_sql(k: int = 10) -> str:
    """Top-k distance-to-own-label-centroid — mirrors
    ``queries.embedding_centroid_outliers`` (documented float-summation
    fragility class, same as kmeans/PCA)."""
    return f"""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                   FROM embeddings),
        pos AS (SELECT unnest(range(1, 65)) AS p),
        comp AS (
            SELECT label, pos.p, avg(v[pos.p]) AS m
            FROM e, pos GROUP BY label, pos.p),
        d AS (
            SELECT e.vec_id, e.label::BIGINT AS label,
                   sum((e.v[c.p] - c.m) * (e.v[c.p] - c.m)) AS d2
            FROM e JOIN comp c ON c.label = e.label
            GROUP BY e.vec_id, e.label)
        SELECT vec_id, label, round(sqrt(d2), 4) AS dist
        FROM d ORDER BY d2 DESC, vec_id ASC LIMIT {k}
    """


def doc_split_leakage_sql(threshold: float = 0.8) -> str:
    """Cross-split near-dup pair counts — composes the oracled jaccard
    pair CTE with doc_split_assign's md5 split rule (pure hash labels,
    mirrored from ``queries.doc_split_leakage``)."""
    lab = (
        "CASE WHEN md5_number_upper({c}::VARCHAR) % 10 < 8 THEN 'train' "
        "WHEN md5_number_upper({c}::VARCHAR) % 10 = 8 THEN 'valid' "
        "ELSE 'test' END"
    )
    return f"""
        WITH {_jaccard_pairs_cte(threshold)},
        lab AS (SELECT {lab.format(c="pa")} AS sa,
                       {lab.format(c="pb")} AS sb
                FROM pairs)
        SELECT count(*)::BIGINT AS n_pairs,
               coalesce(sum(CASE WHEN sa <> sb THEN 1 ELSE 0 END),
                        0)::BIGINT AS n_cross_split
        FROM lab
    """


def doc_cluster_purity_sql(threshold: float = 0.8) -> str:
    """Per-cluster majority-lang purity over the SAME jaccard cluster
    closure that backs ``doc_jaccard_clusters`` — mirrors
    ``queries.doc_cluster_purity``."""
    return f"""
        WITH RECURSIVE {_jaccard_pairs_cte(threshold)},
        sym AS (
            SELECT pa AS a, pb AS b FROM pairs
            UNION SELECT pb, pa FROM pairs
        ),
        uni AS (SELECT a AS id FROM sym),
        reach AS (
            SELECT id AS src, id AS dst FROM uni
            UNION
            SELECT r.src, e.b FROM reach r JOIN sym e ON r.dst = e.a
        ),
        lab AS (
            SELECT src AS doc_id, min(dst)::BIGINT AS cluster_id
            FROM reach GROUP BY src
        ),
        cl AS (SELECT l.cluster_id, d.lang
               FROM lab l JOIN documents d ON d.doc_id = l.doc_id),
        c AS (SELECT cluster_id, lang, count(*)::BIGINT AS n
              FROM cl GROUP BY 1, 2),
        m AS (SELECT cluster_id, sum(n) AS n_docs, max(n) AS n_major
              FROM c GROUP BY 1)
        SELECT cluster_id, n_docs::BIGINT AS n_docs,
               n_major::BIGINT AS n_major,
               round(n_major / CAST(n_docs AS DOUBLE), 4) AS purity
        FROM m
    """


def _local_minhash_blocking(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    cap: int = 500,
) -> dict[tuple[int, int], int]:
    """LOCAL recompute of the deterministic MinHash band blocking (fixed
    blake2b base hash, RandomState(42) mixing family, fixed banding) —
    pure numpy/hashlib, no Ray, no shared search code (the IVF-oracle
    precedent). Returns {(a, b): slot_match_count} for every band
    candidate pair, a < b numerically. Shared by the sketch-accuracy
    and blocking-quality oracle builders."""
    import hashlib
    import os
    import re

    import numpy as np
    import pyarrow.parquet as pq

    M = np.uint64((1 << 61) - 1)
    rng = np.random.RandomState(42)
    pa_ = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    pb_ = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    tok_re = re.compile(TOKEN_PATTERN)

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    sigs: dict[str, np.ndarray] = {}
    blocks: dict[str, list[str]] = {}
    rows = num_perm // bands
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = tok_re.findall((text or "").lower())
        if len(toks) < shingle_k:
            sh = {" ".join(toks)} if toks else set()
        else:
            sh = {
                " ".join(toks[i : i + shingle_k])
                for i in range(len(toks) - shingle_k + 1)
            }
        if sh:
            base = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(),
                        "little",
                    )
                    & ((1 << 61) - 1)
                    for s in sh
                ),
                dtype=np.uint64,
                count=len(sh),
            )
            sig = ((pa_[:, None] * base[None, :] + pb_[:, None]) % M).min(axis=1)
        else:
            sig = np.full(num_perm, M, dtype=np.uint64)
        key = f"{int(did):020d}"
        sigs[key] = sig
        for bi in range(bands):
            chunk = sig[bi * rows : (bi + 1) * rows]
            digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            blocks.setdefault(f"b{bi}:{digest}", []).append(key)

    pairs: dict[tuple[int, int], int] = {}
    for members in blocks.values():
        ms = sorted(set(members))[:cap]
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                k_ = (int(ms[i]), int(ms[j]))
                if k_ not in pairs:
                    pairs[k_] = int((sigs[ms[i]] == sigs[ms[j]]).sum())
    return pairs


def minhash_estimate_audit_sql(
    sf_dir: str = "/root/testdata/sf0.01",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    cap: int = 500,
) -> str:
    """Sketch-accuracy-audit oracle (``queries.doc_minhash_estimate_audit``).

    The deterministic sketch side comes from ``_local_minhash_blocking``
    (local recompute, embedded as a VALUES literal); DuckDB then
    independently computes the EXACT word-shingle Jaccard per candidate
    pair from the real table and the error column.  ``est`` = k/num_perm
    with num_perm = 2^6 is exact at 6 decimals, so embedding it as a
    6 dp literal is lossless.  Bound to ``sf_dir`` (the driver compares
    at sf0.01; pass GRAFT_ORACLE_SF_DIR elsewhere)."""
    pairs = _local_minhash_blocking(sf_dir, num_perm, bands, shingle_k, cap)

    if not pairs:
        return """
            SELECT CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b,
                   CAST(NULL AS DOUBLE) AS est, CAST(NULL AS DOUBLE) AS jac,
                   CAST(NULL AS DOUBLE) AS err
            WHERE false
        """
    values = ", ".join(
        f"({int(a)}, {int(b)}, {nm / num_perm:.6f})"
        for (a, b), nm in sorted(pairs.items())
    )
    return f"""
        WITH cand(ca, cb, est) AS (VALUES {values}),
        {_shingle_cte()},
        j AS (
            SELECT c.ca, c.cb, c.est,
                   CASE WHEN len(sa.sh) = 0 AND len(sb.sh) = 0 THEN 1.0
                        WHEN len(sa.sh) = 0 OR len(sb.sh) = 0 THEN 0.0
                        ELSE len(list_intersect(sa.sh, sb.sh))
                             / (len(sa.sh) + len(sb.sh)
                                - len(list_intersect(sa.sh, sb.sh)))
                   END AS jac
            FROM cand c
            JOIN shin sa ON sa.doc_id = c.ca
            JOIN shin sb ON sb.doc_id = c.cb
        )
        SELECT ca::BIGINT AS a, cb::BIGINT AS b,
               round(est, 6) AS est, round(jac, 6) AS jac,
               round(abs(est - round(jac, 6)), 6) AS err
        FROM j ORDER BY a, b
    """


def doc_blocking_quality_sql(
    sf_dir: str = "/root/testdata/sf0.01", threshold: float = 0.7
) -> str:
    """Blocking-quality oracle (``queries.doc_blocking_quality``): the
    candidate pair set comes from ``_local_minhash_blocking`` (embedded
    as a VALUES literal); DuckDB independently computes the exact-Jaccard
    TRUE pair set over ALL pairs, the intersection, and the two standard
    ER blocking metrics — pair completeness (recall of true pairs) and
    reduction ratio (1 − candidates/all-pairs). Divisions are single
    double ops over exact ints, rounded at 6 dp on both sides."""
    cand = sorted(_local_minhash_blocking(sf_dir))
    if cand:
        cand_cte = "cand(ca, cb) AS (VALUES {})".format(
            ", ".join(f"({a}, {b})" for a, b in cand)
        )
    else:
        cand_cte = (
            "cand(ca, cb) AS (SELECT CAST(NULL AS BIGINT), "
            "CAST(NULL AS BIGINT) WHERE false)"
        )
    return f"""
        WITH {cand_cte},
        {_jaccard_pairs_cte(threshold)},
        tp AS (SELECT count(*)::BIGINT AS n_true FROM pairs),
        cp AS (SELECT count(*)::BIGINT AS n_cand FROM cand),
        bo AS (SELECT count(*)::BIGINT AS n_both
               FROM cand c JOIN pairs p ON p.pa = c.ca AND p.pb = c.cb),
        nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
        SELECT n_docs,
               (n_docs * (n_docs - 1) // 2)::BIGINT AS n_all_pairs,
               n_true, n_cand, n_both AS n_cand_true,
               CASE WHEN n_true = 0 THEN 1.0
                    ELSE round(n_both / CAST(n_true AS DOUBLE), 6)
               END AS pair_completeness,
               CASE WHEN n_docs < 2 THEN 1.0
                    ELSE round(1.0 - n_cand
                               / CAST(n_docs * (n_docs - 1) // 2 AS DOUBLE),
                               6)
               END AS reduction_ratio
        FROM tp, cp, bo, nd
    """


def embedding_mmr_topk_sql(
    sf_dir: str = "/root/testdata/sf0.01",
    k: int = 10,
    n_candidates: int = 50,
    lam: float = 0.7,
    query_vec_id: int = 0,
) -> str:
    """MMR oracle (``queries.embedding_mmr_topk``): the greedy selection
    is deterministic (fixed query, 6-dp rounding before every argmax,
    id tie-break), so this builder recomputes it LOCALLY with pure
    numpy (IVF precedent) and embeds (rank, vec_id); DuckDB then
    independently computes each selected vector's exact relevance
    cosine from the real table — the value column is genuinely
    SQL-derived, the selection order is the recomputed part."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]

    def r6(x):
        scaled = np.asarray(x, dtype=np.float64) * 10**6
        return (
            np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
        ) / 10**6

    qpos = np.nonzero(ids == query_vec_id)[0]
    if len(qpos) == 0:
        return """
            SELECT CAST(NULL AS BIGINT) AS rank,
                   CAST(NULL AS BIGINT) AS vec_id,
                   CAST(NULL AS DOUBLE) AS rel
            WHERE false
        """
    q = mat[qpos[0]]
    keep = ids != query_vec_id
    cids, cmat = ids[keep], mat[keep]
    rel = r6(cmat @ q)
    order = np.lexsort((cids, -rel))[:n_candidates]
    cids, cmat, rel = cids[order], cmat[order], rel[order]
    sims = r6(cmat @ cmat.T)

    selected: list[int] = []
    remaining = list(range(len(cids)))
    picks: list[int] = []
    for rank in range(1, min(k, len(cids)) + 1):
        if rank == 1:
            scores = rel[remaining]
        else:
            mx = sims[np.ix_(remaining, selected)].max(axis=1)
            scores = r6(lam * rel[remaining] - (1.0 - lam) * mx)
        best = max(
            range(len(remaining)),
            key=lambda j: (scores[j], -int(cids[remaining[j]])),
        )
        pick = remaining[best]
        selected.append(pick)
        remaining.remove(pick)
        picks.append(pick)
    values = ", ".join(
        f"({rank}, {int(cids[p])})" for rank, p in enumerate(picks, 1)
    )
    return f"""
        WITH sel(rnk, vid) AS (VALUES {values}),
        q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings
              WHERE vec_id = {query_vec_id})
        SELECT s.rnk::BIGINT AS rank, s.vid::BIGINT AS vec_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[],
                                            (SELECT v FROM q)), 6) AS rel
        FROM sel s JOIN embeddings e ON e.vec_id = s.vid
        ORDER BY s.rnk
    """


def events_voptimal_hist_sql(
    sf_dir: str = "/root/testdata/sf0.01",
    prebins: int = 256,
    n_buckets: int = 8,
) -> str:
    """V-optimal-histogram oracle (``queries.events_voptimal_hist``):
    the DP is deterministic (integer census, strict-< tie-break), so the
    builder recomputes pre-bin census + DP LOCALLY with pure numpy (IVF
    precedent) and embeds the chosen boundaries; DuckDB independently
    re-aggregates the real rows per bucket — every output cell an exact
    int derived by SQL, the boundary choice the recomputed part."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["value"])
    v = np.asarray(t["value"].to_pylist(), dtype=np.float64)
    if len(v) == 0:
        return """
            SELECT CAST(NULL AS BIGINT) AS bucket,
                   CAST(NULL AS BIGINT) AS bin_lo,
                   CAST(NULL AS BIGINT) AS bin_hi,
                   CAST(NULL AS BIGINT) AS n_rows,
                   CAST(NULL AS BIGINT) AS sum_cents,
                   CAST(NULL AS BIGINT) AS sumsq_cents
            WHERE false
        """
    scaled = v * 100.0
    cents = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
    lo_c, hi_c = int(cents.min()), int(cents.max())
    span = hi_c - lo_c + 1
    pb = (cents - lo_c) * prebins // span
    dn = np.zeros(prebins, dtype=np.int64)
    ds_ = np.zeros(prebins, dtype=np.int64)
    dss = np.zeros(prebins, dtype=np.int64)
    np.add.at(dn, pb, 1)
    np.add.at(ds_, pb, cents)
    np.add.at(dss, pb, cents * cents)

    cn = np.concatenate([[0], np.cumsum(dn)])
    cs = np.concatenate([[0], np.cumsum(ds_)])
    css = np.concatenate([[0], np.cumsum(dss)])

    def sse(i, j):
        nn = cn[j + 1] - cn[i]
        if nn == 0:
            return 0.0
        sv = cs[j + 1] - cs[i]
        return float(css[j + 1] - css[i]) - float(sv) * float(sv) / float(nn)

    V = prebins
    B = min(n_buckets, V)
    INF = float("inf")
    dp = np.full((V, B + 1), INF)
    back = np.zeros((V, B + 1), dtype=np.int64)
    for j in range(V):
        dp[j][1] = sse(0, j)
    for b in range(2, B + 1):
        for j in range(b - 1, V):
            best, arg = INF, -1
            for i in range(b - 2, j):
                cand = dp[i][b - 1] + sse(i + 1, j)
                if cand < best:
                    best, arg = cand, i
            dp[j][b] = best
            back[j][b] = arg
    ends = []
    j, b = V - 1, B
    while b >= 1:
        ends.append(j)
        j = int(back[j][b])
        b -= 1
    ends = sorted(ends)
    values, start = [], 0
    for bi, end in enumerate(ends):
        values.append(f"({bi}, {start}, {end})")
        start = end + 1
    return f"""
        WITH mm AS (SELECT min(CAST(round(value * 100) AS BIGINT)) AS lo,
                           max(CAST(round(value * 100) AS BIGINT)) AS hi
                    FROM events),
        c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents
              FROM events),
        pbs AS (SELECT cents,
                       (cents - (SELECT lo FROM mm)) * {prebins}
                           // ((SELECT hi FROM mm) - (SELECT lo FROM mm) + 1)
                           AS pb
                FROM c),
        bk(bucket, bin_lo, bin_hi) AS (VALUES {", ".join(values)})
        SELECT bk.bucket::BIGINT AS bucket, bk.bin_lo::BIGINT AS bin_lo,
               bk.bin_hi::BIGINT AS bin_hi,
               count(pbs.cents)::BIGINT AS n_rows,
               coalesce(sum(pbs.cents), 0)::BIGINT AS sum_cents,
               coalesce(sum(pbs.cents * pbs.cents), 0)::BIGINT
                   AS sumsq_cents
        FROM bk LEFT JOIN pbs ON pbs.pb BETWEEN bk.bin_lo AND bk.bin_hi
        GROUP BY 1, 2, 3 ORDER BY bucket
    """


def corpus_dedup_threshold_curve_sql(
    sf_dir: str = "/root/testdata/sf0.01",
) -> str:
    """Dedup-threshold-curve oracle: candidate pairs from
    ``_local_minhash_blocking`` (VALUES literal); DuckDB computes each
    pair's exact word-shingle Jaccard and counts survivors per
    threshold arm."""
    cand = sorted(_local_minhash_blocking(sf_dir))
    if cand:
        cand_cte = "cand(ca, cb) AS (VALUES {})".format(
            ", ".join(f"({a}, {b})" for a, b in cand)
        )
    else:
        cand_cte = (
            "cand(ca, cb) AS (SELECT CAST(NULL AS BIGINT), "
            "CAST(NULL AS BIGINT) WHERE false)"
        )
    return f"""
        WITH {cand_cte},
        {_shingle_cte()},
        j AS (
            SELECT round(CASE WHEN len(sa.sh) = 0 AND len(sb.sh) = 0
                              THEN 1.0
                              WHEN len(sa.sh) = 0 OR len(sb.sh) = 0
                              THEN 0.0
                              ELSE len(list_intersect(sa.sh, sb.sh))
                                   / (len(sa.sh) + len(sb.sh)
                                      - len(list_intersect(sa.sh, sb.sh)))
                         END, 6) AS jac
            FROM cand c
            JOIN shin sa ON sa.doc_id = c.ca
            JOIN shin sb ON sb.doc_id = c.cb
        ),
        t(threshold) AS (VALUES (0.5), (0.6), (0.7), (0.8), (0.9))
        SELECT CAST(threshold AS DOUBLE) AS threshold,
               (SELECT count(*) FROM j
                WHERE j.jac >= CAST(t.threshold AS DOUBLE))::BIGINT
                   AS n_pairs
        FROM t ORDER BY threshold
    """


def events_hourly_lttb_sql(
    sf_dir: str = "/root/testdata/sf0.01", n_out: int = 100
) -> str:
    """LTTB oracle (``queries.events_hourly_lttb``): the greedy sweep is
    deterministic (fixed buckets, float area argmax with strict->
    update ⇒ earliest-hour ties), so the builder recomputes the hourly
    census + selection LOCALLY with pure numpy (IVF precedent) and
    embeds (idx, hour); DuckDB independently re-derives each kept
    hour's exact count from the raw rows."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    HOUR = 3_600_000_000
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["ts"])
    us = np.asarray(
        t["ts"].cast("int64").to_pylist(), dtype=np.int64
    ) if t.num_rows else np.array([], dtype=np.int64)
    if len(us) == 0:
        return """
            SELECT CAST(NULL AS BIGINT) AS idx,
                   CAST(NULL AS BIGINT) AS hour_us,
                   CAST(NULL AS BIGINT) AS n
            WHERE false
        """
    h = (us // HOUR) * HOUR
    hs, ns = np.unique(h, return_counts=True)
    N = len(hs)
    if N <= n_out:
        values = ", ".join(f"({i}, {int(hs[i])})" for i in range(N))
    else:
        x = ((hs - hs[0]) // HOUR).astype(np.float64)
        y = ns.astype(np.float64)
        picked = [0]
        n_mid = n_out - 2
        for b in range(n_mid):
            lo = 1 + b * (N - 2) // n_mid
            hi = 1 + (b + 1) * (N - 2) // n_mid
            if b + 1 < n_mid:
                nlo = 1 + (b + 1) * (N - 2) // n_mid
                nhi = 1 + (b + 2) * (N - 2) // n_mid
            else:
                nlo, nhi = N - 1, N
            ax, ay = x[picked[-1]], y[picked[-1]]
            cx = float(x[nlo:nhi].mean())
            cy = float(y[nlo:nhi].mean())
            best_area, best_i = -1.0, lo
            for i in range(lo, hi):
                area = abs((ax - cx) * (y[i] - ay) - (ax - x[i]) * (cy - ay))
                if area > best_area:
                    best_area, best_i = area, i
            picked.append(best_i)
        picked.append(N - 1)
        values = ", ".join(
            f"({i}, {int(hs[p])})" for i, p in enumerate(picked)
        )
    return f"""
        WITH sel(idx, h) AS (VALUES {values}),
        c AS (SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS h,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1)
        SELECT s.idx::BIGINT AS idx, s.h::BIGINT AS hour_us, c.n
        FROM sel s JOIN c ON c.h = s.h ORDER BY idx
    """


def cluster_agreement_sql(
    lex_threshold: float = 0.7, sem_threshold: float = 0.98
) -> str:
    """Clustering-agreement oracle (``queries.cluster_agreement_lex_sem``):
    both cluster closures recomputed independently in SQL — the lexical
    one over exact word-shingle Jaccard (the doc_minhash_dedup oracle's
    construction), the semantic one over exact cosine (the
    embedding_near_dup construction) — with disjoint CTE names so the
    two recursions coexist; all three pair counts from size censuses
    (Σ s·(s−1)/2), one 6-dp division."""
    return f"""
        WITH RECURSIVE {_jaccard_pairs_cte(lex_threshold)},
        sym1 AS (
            SELECT pa AS a, pb AS b FROM pairs
            UNION SELECT pb, pa FROM pairs
        ),
        reach1 AS (
            SELECT doc_id AS src, doc_id AS dst FROM documents
            UNION
            SELECT r.src, e.b FROM reach1 r JOIN sym1 e ON r.dst = e.a
        ),
        lab1 AS (SELECT src AS id, min(dst)::BIGINT AS cl
                 FROM reach1 GROUP BY src),
        ep AS (
            SELECT a.vec_id AS pa2, b.vec_id AS pb2
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[])
                  >= {sem_threshold}
        ),
        sym2 AS (
            SELECT pa2 AS a, pb2 AS b FROM ep
            UNION SELECT pb2, pa2 FROM ep
        ),
        reach2 AS (
            SELECT vec_id AS src, vec_id AS dst FROM embeddings
            UNION
            SELECT r.src, e.b FROM reach2 r JOIN sym2 e ON r.dst = e.a
        ),
        lab2 AS (SELECT src AS id, min(dst)::BIGINT AS cl
                 FROM reach2 GROUP BY src),
        joint AS (SELECT coalesce(l1.id, l2.id) AS id,
                         coalesce(l1.cl, -1) AS cl1,
                         coalesce(l2.cl, -1) AS cl2
                  FROM lab1 l1 FULL OUTER JOIN lab2 l2 ON l1.id = l2.id),
        sz1 AS (SELECT cl1, count(*)::BIGINT AS s FROM joint GROUP BY 1),
        sz2 AS (SELECT cl2, count(*)::BIGINT AS s FROM joint GROUP BY 1),
        szb AS (SELECT cl1, cl2, count(*)::BIGINT AS s
                FROM joint GROUP BY 1, 2),
        agg AS (SELECT
                    (SELECT count(*) FROM joint)::BIGINT AS n_ids,
                    (SELECT sum(s * (s - 1) // 2) FROM sz1)::BIGINT AS pl,
                    (SELECT sum(s * (s - 1) // 2) FROM sz2)::BIGINT AS ps,
                    (SELECT sum(s * (s - 1) // 2) FROM szb)::BIGINT AS pb)
        SELECT n_ids, pl AS n_pairs_lex, ps AS n_pairs_sem,
               pb AS n_pairs_both,
               CASE WHEN pl + ps - pb = 0 THEN 1.0
                    ELSE round(pb / CAST(pl + ps - pb AS DOUBLE), 6)
               END AS agreement
        FROM agg
    """


def doc_compression_ratio_sql(
    sf_dir: str = "/root/testdata/sf0.01", level: int = 6
) -> str:
    """Compression-ratio oracle (``queries.doc_compression_ratio``):
    zlib at a fixed level is deterministic, so the builder recomputes
    each doc's compressed byte count locally (stdlib zlib — no shared
    code) and embeds (doc_id, comp_bytes); raw byte counts and the
    ratio division stay SQL-derived from the real table."""
    import os
    import zlib

    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    pairs = []
    for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        b = (txt or "").encode("utf-8")
        pairs.append((int(did), len(zlib.compress(b, level))))
    if not pairs:
        return """
            SELECT CAST(NULL AS BIGINT) AS doc_id,
                   CAST(NULL AS BIGINT) AS raw_bytes,
                   CAST(NULL AS BIGINT) AS comp_bytes,
                   CAST(NULL AS DOUBLE) AS ratio
            WHERE false
        """
    values = ", ".join(f"({d}, {c})" for d, c in sorted(pairs))
    return f"""
        WITH cz(did, cb) AS (VALUES {values})
        SELECT d.doc_id,
               strlen(coalesce(d.text, ''))::BIGINT AS raw_bytes,
               cz.cb::BIGINT AS comp_bytes,
               CASE WHEN strlen(coalesce(d.text, '')) = 0 THEN 0.0
                    ELSE round(cz.cb
                               / CAST(strlen(coalesce(d.text, ''))
                                      AS DOUBLE), 6)
               END AS ratio
        FROM documents d JOIN cz ON cz.did = d.doc_id
    """


def doc_dedup_savings_sql(threshold: float = 0.7) -> str:
    """Dedup-savings oracle (``queries.doc_dedup_savings``): the MinHash
    cluster closure (the doc_minhash_dedup construction) joined to
    byte sizes; survivors = min-id members; exact-int counts + two 6-dp
    fractions."""
    return f"""
        WITH RECURSIVE {_jaccard_pairs_cte(threshold)},
        sym AS (
            SELECT pa AS a, pb AS b FROM pairs
            UNION SELECT pb, pa FROM pairs
        ),
        reach AS (
            SELECT doc_id AS src, doc_id AS dst FROM documents
            UNION
            SELECT r.src, e.b FROM reach r JOIN sym e ON r.dst = e.a
        ),
        lab AS (SELECT src AS doc_id, min(dst)::BIGINT AS cl
                FROM reach GROUP BY src),
        sz AS (SELECT l.cl, count(*)::BIGINT AS n,
                      sum(strlen(coalesce(d.text, '')))::BIGINT AS b,
                      min(l.doc_id)::BIGINT AS surv
               FROM lab l JOIN documents d ON d.doc_id = l.doc_id
               GROUP BY 1),
        sb AS (SELECT sum(strlen(coalesce(d.text, '')))::BIGINT AS s
               FROM sz JOIN documents d ON d.doc_id = sz.surv)
        SELECT (SELECT sum(n) FROM sz)::BIGINT AS n_docs,
               (SELECT count(*) FROM sz)::BIGINT AS n_survivors,
               (SELECT sum(b) FROM sz)::BIGINT AS total_bytes,
               (SELECT s FROM sb)::BIGINT AS survivor_bytes,
               round(1.0 - (SELECT count(*) FROM sz)
                     / CAST((SELECT sum(n) FROM sz) AS DOUBLE), 6)
                   AS doc_savings_frac,
               round(1.0 - (SELECT s FROM sb)
                     / CAST((SELECT sum(b) FROM sz) AS DOUBLE), 6)
                   AS byte_savings_frac
    """
