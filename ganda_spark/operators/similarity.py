"""Similarity search over embedding columns (array<float>) — brute-force
cosine top-k baseline + random-hyperplane LSH bucketing as the scale path.

Scale posture: brute force is O(Q×N) — correct baseline and fine when the
query set is small or N is bucketed first. The LSH path buckets the corpus
by 8-bit hyperplane signatures (pure array expressions, no Python), so the
expensive pass runs only inside matching buckets: the classic ANN recall/
cost dial (more planes → smaller buckets). All dot products are JVM
higher-order functions (zip_with + aggregate) in double — zero UDFs.

Hyperplanes are ±1 vectors derived from md5(plane:dim) so any external
oracle reproduces the buckets exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pre(av, an, bv, bn) -> Column:
    """cosine with PRE-HOISTED norms: dot(av,bv)/(an·bn). Bit-identical
    to `cosine` (same fold producing the same double, evaluated once per
    ROW instead of once per PAIR) — but in a quadratic pair stage it cuts
    the per-pair work from 3 array folds (dot + both norms) to 1. Spark
    cannot CSE across join sides; hoisting the norm into a projection
    below the exchange materializes it into the shuffle/broadcast row, so
    every O(n²) consumer pays dot-only. The r5 rehearsal's small-list
    pair scan is ~39M pairs at 100k docs — 2 saved folds per pair is the
    difference between the scan and 3× the scan."""
    return dot(av, bv) / (an * bn)


def _batch_topk_select(nids, key, valid, k):
    """Batch-local candidate pruning for a two-level exact top-k: returns
    indices covering every row that can reach the GLOBAL top-k under
    Spark's (score DESC, nid ASC) order with NaN above every double and
    NULL below — i.e. per category, ordered: up to k NaN rows by lowest
    nid, the top-k valid rows by (key desc, nid asc), and up to k
    invalid (NULL-score) rows by lowest nid. `key` float array (NaN
    allowed), `valid` bool mask (False ⇒ NULL score)."""
    import numpy as np

    out = []
    nanm = valid & np.isnan(key)
    okm = valid & ~nanm
    for mask in (nanm, ~valid):
        idx = np.nonzero(mask)[0]
        if len(idx):
            order = np.argsort(nids[idx], kind="stable")[:k]
            out.append(idx[order])
    idx = np.nonzero(okm)[0]
    if len(idx):
        order = np.lexsort((nids[idx], -key[idx]))[:k]
        out.append(idx[order])
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(out)


def _topk_candidates_arrow(
    emb: DataFrame,
    q_rows,
    R: int,
    id_col: str,
    vec_col: str,
    integer_codes: bool,
    code_expr=None,
):
    """Shared candidate stage for the Arrow top-k paths: the Catalyst
    form joined the corpus against the broadcast query set and windowed
    the FULL N×Q expansion — per-pair interpreted folds plus (for the
    quantized path) double arrays as window-exchange payload. Here the
    (bounded, localized) query vectors score each corpus batch in NumPy
    and only the batch-local top-R survivors per query reach the global
    window — narrow (qid, nid, score) rows, exact two-level top-R.

    EXACTNESS: integer scores (integer_codes=True) are order-free;
    double cosines accumulate dimension-sequentially with the one-
    product-one-divide of cosine_pre (the _pair_dup_arrays contract).
    Cross-length pairs, NULL vectors and NULL elements score NULL
    (zip_with semantics — the element-null flag is computed in Catalyst)
    and are pruned under NULL-below-everything, NaN-above-everything,
    ties to the lowest neighbor id — Spark's (score DESC, nid ASC)."""
    import pandas as pd

    score_t = "bigint" if integer_codes else "double"
    c = emb.select(
        F.col(id_col).alias("nid"),
        (code_expr if code_expr is not None else F.col(vec_col)).alias("_cv"),
        F.expr(
            f"exists({vec_col}, x -> x is null)"
        ).alias("_hn"),
    )
    id_t = dict(c.dtypes)["nid"]

    qs = []  # (qid, vector or None)
    for r in q_rows:
        v = r[1]
        if v is None or any(x is None for x in v):
            qs.append((r[0], None))
        else:
            qs.append((r[0], [float(x) if not integer_codes else int(x) for x in v]))

    # NaN cannot cross the pandas→Arrow boundary (it arrives as NULL),
    # so it rides as an explicit marker column and is reconstructed in
    # Catalyst by the wrapper (`when(_snan, double NaN)`)
    out_schema = f"qid {id_t}, nid {id_t}, _score {score_t}, _snan boolean"

    def fn(it):
        import numpy as np

        dt = np.int64 if integer_codes else np.float64
        by_len: dict[int, list] = {}
        null_q = []
        for qid, v in qs:
            if v is None:
                null_q.append(qid)
            else:
                by_len.setdefault(len(v), []).append((qid, v))
        prepped = {}
        for L, items in by_len.items():
            Q = np.array([v for _, v in items], dtype=dt).reshape(len(items), L)
            qn = None
            if not integer_codes:
                acc = np.zeros(len(items))
                for d in range(L):
                    col = Q[:, d]
                    acc = acc + col * col
                qn = np.sqrt(acc)
            prepped[L] = ([q for q, _ in items], Q, qn)
        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            nids_raw = pdf["nid"].to_numpy()
            vecs = pdf["_cv"].tolist()
            hn = pdf["_hn"].to_numpy()
            lens = np.array(
                [-1 if (v is None or h) else len(v)
                 for v, h in zip(vecs, hn)],
                dtype=np.int64,
            )
            oq, on, os_, osn = [], [], [], []
            for L, (qids, Q, qn) in prepped.items():
                sel = np.nonzero(lens == L)[0]
                scores = None
                if len(sel):
                    V = np.array(
                        [vecs[i] for i in sel], dtype=dt
                    ).reshape(len(sel), L)
                    if integer_codes:
                        scores = V @ Q.T  # integer: exact in any order
                    else:
                        vacc = np.zeros(len(sel))
                        for d in range(L):
                            col = V[:, d]
                            vacc = vacc + col * col
                        vn = np.sqrt(vacc)
                        D = np.zeros((len(sel), len(qids)))
                        for d in range(L):
                            D += V[:, d][:, None] * Q[:, d][None, :]
                        with np.errstate(divide="ignore", invalid="ignore"):
                            scores = D / (qn[None, :] * vn[:, None])
                nsel = np.nonzero(lens != L)[0]
                for col_i, qid in enumerate(qids):
                    if len(sel):
                        key = scores[:, col_i].astype(np.float64) \
                            if integer_codes else scores[:, col_i]
                        notself = nids_raw[sel] != qid
                        pick = _batch_topk_select(
                            nids_raw[sel][notself], key[notself],
                            np.ones(int(notself.sum()), dtype=bool), R,
                        )
                        base = np.nonzero(notself)[0]
                        for p in pick:
                            i = sel[base[p]]
                            oq.append(qid)
                            on.append(nids_raw[i])
                            s = (
                                int(scores[base[p], col_i])
                                if integer_codes
                                else float(key[base[p]])
                            )
                            if not integer_codes and s != s:
                                os_.append(None)
                                osn.append(True)
                            else:
                                os_.append(s)
                                osn.append(False)
                    # rows of OTHER lengths / null rows: NULL score
                    if len(nsel):
                        cand = nids_raw[nsel]
                        cand = cand[cand != qid]
                        for nid in np.sort(cand, kind="stable")[:R]:
                            oq.append(qid)
                            on.append(nid)
                            os_.append(None)
                            osn.append(False)
            for qid in null_q:
                cand = nids_raw[nids_raw != qid]
                for nid in np.sort(cand, kind="stable")[:R]:
                    oq.append(qid)
                    on.append(nid)
                    os_.append(None)
                    osn.append(False)
            # _score stays OBJECT-dtyped: a numeric pandas column would
            # coerce None to NaN, and NULL (ranks below everything) must
            # not become NaN (ranks above everything)
            yield pd.DataFrame(
                {
                    "qid": oq,
                    "nid": on,
                    "_score": pd.Series(os_, dtype=object),
                    "_snan": pd.Series(osn, dtype=bool),
                }
            )

    return c.mapInPandas(fn, out_schema)


def brute_force_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_arrow: bool = True,
    max_local_queries: int = 4096,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).
    One scan of N. r7 default: the candidate stage runs as an Arrow map
    over the corpus with the (bounded, localized) query set — batch-local
    top-k pruning, dimension-sequential cosines (bit-exact vs the
    Catalyst fold, pinned by test) — and only narrow candidate rows reach
    the per-query window; the final rank and round(cos, 4) are the
    unchanged Catalyst expressions. The Catalyst join form remains behind
    use_arrow=False and as the too-many-queries fallback. (Zero-norm
    vectors take the NaN route in the Arrow stage where ANSI raised —
    the pair scan's documented upgrade.)"""
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    if use_arrow:
        q_rows = (
            query_ids.select(F.col(id_col), as_double(F.col(vec_col)))
            .limit(max_local_queries + 1)
            .collect()
        )
        if len(q_rows) <= max_local_queries:
            raw = _topk_candidates_arrow(
                emb, q_rows, k, id_col, vec_col, integer_codes=False
            )
            cand = raw.select(
                "qid",
                "nid",
                F.when(F.col("_snan"), F.lit(float("nan")))
                .otherwise(F.col("_score"))
                .alias("cos"),
            )
            return (
                cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select(
                    "qid", "nid", F.col("rank").cast("long").alias("rank"),
                    F.round("cos", 4).alias("cos_r"),
                )
            )
    q = query_ids.select(
        F.col(id_col).alias("qid"),
        as_double(F.col(vec_col)).alias("qv"),
        norm(as_double(F.col(vec_col))).alias("qn"),
    )
    c = emb.select(
        F.col(id_col).alias("nid"),
        as_double(F.col(vec_col)).alias("nv"),
        norm(as_double(F.col(vec_col))).alias("nn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid",
            cosine_pre(F.col("qv"), F.col("qn"), F.col("nv"), F.col("nn")).alias("cos"),
        )
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "qid", "nid", F.col("rank").cast("long").alias("rank"),
            F.round("cos", 4).alias("cos_r"),
        )
    )


def hyperplane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign(p,d) = +1 iff
    int(md5(f"{p}:{d}")[:12], 16) % 2 == 0."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:12], 16)
            row.append(1 if h % 2 == 0 else -1)
        planes.append(row)
    return planes


def bucket_col(n_planes: int, dim: int, vec_col: str = "embedding") -> Column:
    """bucket = Σ_p (v·plane_p ≥ 0) << p as a pure Column — plane literals
    are constants folded into codegen, so bucketing is a projection, never
    a join."""
    v = as_double(F.col(vec_col))
    planes = hyperplane_signs(n_planes, dim)
    bucket = None
    for p, signs in enumerate(planes):
        plane = F.array(*[F.lit(float(s)) for s in signs])
        bit = F.when(dot(v, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def lsh_bucket(
    emb: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) projection of bucket_col."""
    return emb.select(
        F.col(id_col), bucket_col(n_planes, dim, vec_col).alias("bucket")
    )


def _ivf_assign_arrow(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
) -> DataFrame:
    """nprobe=1 assignment as ONE Arrow map stage (guide §4.2): the
    Catalyst form paid an interpreted aggregate(zip_with) fold per
    (row × centroid) — ~100 µs core each, N×C of them — plus a C-way join
    expansion undone by a groupBy(id) exchange. Here the C-row centroid
    table is localized (bounded by definition) and each batch computes
    its rows' argmax in NumPy with the _kmeans_update_arrow assignment
    discipline, emitting every input column plus `out_id` — a pure map:
    ZERO exchanges where the aggregate form shuffled N full rows.

    EXACTNESS (the max_by(cid, struct(cos, −cid)) contract, test-pinned
    against the Catalyst form):
      * dots and both norms accumulate dimension-sequentially (the
        _pair_dup_arrays IEEE-op-sequence contract); cosine is the same
        one-product-one-divide as cosine_pre;
      * centroids are sorted by id and np.argmax takes the FIRST max:
        equal cosines break to the lowest cid, NaN maps to +inf first
        (Spark orders NaN above every double — and zero-norm rows take
        this NaN route where the Catalyst form RAISED under ANSI
        0.0/0.0, the same documented upgrade as the pair scan);
      * a row whose length matches NO centroid scores NULL against every
        centroid in the Catalyst form, where the struct tie falls to
        −cid → lowest cid; here non-matching centroids key at −inf, so
        the all-miss row argmaxes to the lowest cid identically. Rows or
        centroids containing NULL elements are undefined input (the
        _kmeans_update_arrow contract).
    """
    from pyspark.sql.types import StructField, StructType

    cent_rows = sorted(
        (r[0], None if r[1] is None else [float(x) for x in r[1]])
        for r in centroids.select(
            F.col(id_col), as_double(F.col(vec_col))
        ).collect()
    )
    out_field = StructField(
        out_id, centroids.schema[id_col].dataType, nullable=True
    )
    schema = StructType(list(emb.schema.fields) + [out_field])
    cols = emb.columns

    def assign_fn(it):
        import numpy as np

        cids = [c for c, _ in cent_rows]
        by_len: dict[int, tuple] = {}
        for k, (c, v) in enumerate(cent_rows):
            if v is None:
                continue
            by_len.setdefault(len(v), []).append(k)
        prepped: dict[int, tuple] = {}
        for L, idxs in by_len.items():
            M = np.array(
                [cent_rows[k][1] for k in idxs], dtype=np.float64
            ).reshape(len(idxs), L)
            nacc = np.zeros(len(idxs))
            for d in range(L):
                col = M[:, d]
                nacc = nacc + col * col
            prepped[L] = (np.array(idxs), M, np.sqrt(nacc))
        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            vecs = pdf[vec_col].tolist()
            lens = np.array(
                [-1 if v is None else len(v) for v in vecs], dtype=np.int64
            )
            best = np.zeros(n, dtype=np.int64)  # all-miss rows → first cid
            for L in np.unique(lens):
                sel = np.nonzero(lens == L)[0]
                if L < 0 or int(L) not in prepped:
                    continue
                idxs, M, cn = prepped[int(L)]
                V = np.array([vecs[i] for i in sel], dtype=np.float64).reshape(
                    len(sel), int(L)
                )
                vacc = np.zeros(len(sel))
                for d in range(int(L)):
                    col = V[:, d]
                    vacc = vacc + col * col
                vn = np.sqrt(vacc)
                D = np.zeros((len(sel), len(idxs)))
                for d in range(int(L)):
                    D += V[:, d][:, None] * M[:, d][None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    COS = D / (vn[:, None] * cn[None, :])
                COS = np.where(np.isnan(COS), np.inf, COS)
                # keys for NON-matching centroids sit at −inf (they score
                # NULL in Catalyst: below every non-null struct)
                KEY = np.full((len(sel), len(cids)), -np.inf)
                KEY[:, idxs] = COS
                best[sel] = np.argmax(KEY, axis=1)
            out = pdf.copy()
            out[out_id] = [cids[b] for b in best]
            yield out

    if not cent_rows:
        # empty centroid table: the Catalyst join+agg yields zero rows
        return emb.limit(0).mapInPandas(assign_fn, schema).select(
            id_col, *[c for c in cols if c != id_col], out_id
        )
    return emb.mapInPandas(assign_fn, schema).select(
        id_col, *[c for c in cols if c != id_col], out_id
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    out_id: str = "list_id",
    use_arrow: bool = True,
) -> DataFrame:
    """IVF coarse quantization: each vector joins its `nprobe`
    nearest-centroid inverted lists (cosine, ties by centroid id). The
    centroid table is tiny (C rows) and broadcast.

    nprobe=1 — the CORPUS-side assignment, the big side of every IVF /
    k-means / SemDeDup plan — is an argmax AGGREGATE
    (max_by over the (cos, −cid) struct), not a window: the window form
    shuffled the full N×C candidate expansion (embedding arrays included)
    through the per-vector sort — measured ~700 MB of shuffle per assign
    at just 24k×64 in the r5 rehearsal, and N×C rows at 10^10×4096 is a
    non-starter. The aggregate gets map-side partial combine, so the
    exchange carries N rows (one running best per vector per mapper).
    Tie semantics are IDENTICAL to the window (cos DESC, cid ASC): the
    lexicographic struct max breaks equal cosines by larger −cid = lower
    cid, and full-struct ties pin the same cid by construction.

    nprobe>1 — the QUERY side, orders of magnitude smaller — keeps the
    per-vector top-nprobe window (never a global window).

    CONTRACT (nprobe=1 branch, asserted below): centroid ids must be
    NUMERIC (tie-breaking negates the id inside the max_by struct) and
    vector ids unique (the aggregate F.first-collapses duplicate id_col
    rows). The nprobe>1 window branch orders by _cid ASC directly and
    works for any orderable id type — callers with string centroid ids
    must map them to a numeric surrogate first (ADVICE r5)."""
    from pyspark.sql import Window

    c = F.broadcast(
        centroids.select(
            F.col(id_col).alias("_cid"),
            as_double(F.col(vec_col)).alias("_cv"),
            norm(as_double(F.col(vec_col))).alias("_cn"),
        )
    )
    # hoist the double-cast vector AND its norm: referencing the
    # as_double(...) transform after the join would re-evaluate the cast
    # (plus an array allocation) once per (row × centroid) — C× per row;
    # hoisted columns are computed once per row and the C-way expansion
    # pays dots only (cosine_pre docstring — same doubles, 1× work)
    scored = (
        emb.withColumn("_v", as_double(F.col(vec_col)))
        .withColumn("_vn", norm(F.col("_v")))
        .join(c)
        .withColumn(
            "_ccos",
            cosine_pre(F.col("_v"), F.col("_vn"), F.col("_cv"), F.col("_cn")),
        )
        .drop("_cv", "_cn")
    )
    if nprobe == 1:
        cid_type = dict(centroids.dtypes)[id_col]
        if cid_type in ("string", "binary", "boolean"):
            raise TypeError(
                f"ivf_assign nprobe=1 requires a numeric centroid id "
                f"(got {id_col}: {cid_type}); map to a numeric surrogate "
                f"or use nprobe>1"
            )
        if use_arrow:
            return _ivf_assign_arrow(emb, centroids, id_col, vec_col, out_id)
        others = [col for col in emb.columns if col != id_col]
        return scored.groupBy(id_col).agg(
            *[F.first(col).alias(col) for col in others],
            F.max_by(
                F.col("_cid"), F.struct(F.col("_ccos"), (-F.col("_cid")).alias("_nc"))
            ).alias(out_id),
        )
    w = Window.partitionBy(id_col).orderBy(F.col("_ccos").desc(), F.col("_cid").asc())
    return (
        scored.withColumn("_crk", F.row_number().over(w))
        .where(F.col("_crk") <= nprobe)
        .withColumnRenamed("_cid", out_id)
        .drop("_ccos", "_crk", "_vn", "_v")
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k — the second scale path next to the LSH
    buckets: coarse-quantize the corpus into C inverted lists (centroids =
    the first C corpus vectors by id: deterministic, oracle-reproducible;
    swap in k-means centroids in production without touching the plan),
    probe each query's `nprobe` nearest lists, score exactly inside them.
    Recall dial = nprobe/C. One corpus scan to assign + a candidate join
    keyed on list_id (the only shuffle)."""
    from pyspark.sql import Window

    centroids = emb.where(F.col(id_col) < n_centroids)
    corpus = ivf_assign(emb, centroids, id_col, vec_col, nprobe=1).select(
        F.col(id_col).alias("nid"),
        as_double(F.col(vec_col)).alias("nv"),
        norm(as_double(F.col(vec_col))).alias("nn"),
        "list_id",
    )
    probes = ivf_assign(query_ids, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("qid"),
        as_double(F.col(vec_col)).alias("qv"),
        norm(as_double(F.col(vec_col))).alias("qn"),
        "list_id",
    )
    scored = (
        corpus.join(F.broadcast(probes), "list_id")
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid",
            cosine_pre(F.col("qv"), F.col("qn"), F.col("nv"), F.col("nn")).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "qid", "nid", F.col("rank").cast("long").alias("rank"),
            F.round("cos", 4).alias("cos_r"),
        )
    )


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    wide_dim_limit: int = 256,
    use_arrow: bool = True,
) -> DataFrame:
    """DataFrame-native Lloyd's iterations for IVF coarse quantization
    (VERDICT r3 #2): seeded by the deterministic first-C-by-id picks, each
    fixed iteration assigns every vector to its nearest centroid
    (`ivf_assign`, broadcast centroids — one corpus scan) and recomputes
    each list's mean.

    Determinism contract: the update step runs in INTEGER basis points —
    per-dimension `sum(round(v[d]·10⁴))` then integer `div` by the list
    count — because float sums are order-dependent under Spark's partial
    aggregation, and the DuckDB oracle must reproduce the centroids
    bit-for-bit. The mean is `dim` independent long-sum aggregates in ONE
    groupBy (no posexplode shuffle); cosine assignment then runs on the
    de-scaled doubles, same fold order both engines.

    Empty lists simply vanish (their centroid attracted no vectors) —
    standard Lloyd's degeneracy, fine for IVF where C ≪ N. Returns
    (id_col, vec_col) shaped like a centroid table for `ivf_assign`.

    WIDTH CEILING (VERDICT r5 wrong #3): the wide form builds `dim`
    independent sum aggregates in one groupBy — exact and fast at dim 64,
    but at production embedding widths (1k-4k) that is a 4k-column
    aggregate row and a 4k-expression codegen unit. Above
    `wide_dim_limit` (default 256) the update switches to the TALL form:
    posexplode to (list_id, pos, val) rows, ONE sum aggregate keyed on
    (list_id, pos), re-assembled with array_sort — identical integer
    arithmetic, identical centroids (equivalence is test-pinned), one
    narrow shuffle of N·dim skinny rows instead of a wide aggregate."""
    cent = emb.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).cast("long").alias(id_col), as_double(F.col(vec_col)).alias(vec_col)
    )
    if use_arrow and iters > 0:
        # r7 (guide §5): ONE persisted skinny (vec, bp) projection shared
        # by every iteration — each Arrow update otherwise re-derived the
        # corpus plan (parquet scan + caller's union/cast chain) per
        # iteration. Every iteration is collect-localized (C rows, the
        # established exact round-trip), so the cache can be released
        # before returning and no consumer re-enters the Lloyd's chain.
        rows = _kmeans_rows(emb, vec_col).persist()
        try:
            for _ in range(iters):
                cent = _kmeans_update_arrow(
                    emb, cent, dim, id_col, vec_col, rows=rows
                )
                cent = emb.sparkSession.createDataFrame(
                    cent.collect(), f"{id_col} long, {vec_col} array<double>"
                )
        finally:
            rows.unpersist()
        return cent
    for it in range(iters):
        if use_arrow:
            cent = _kmeans_update_arrow(emb, cent, dim, id_col, vec_col)
        else:
            # Catalyst reference paths (wide/tall), kept for the
            # use_arrow=False cross-check pinned by test
            assigned = ivf_assign(emb, cent, id_col, vec_col, nprobe=1)
            cent = _kmeans_update_catalyst(
                assigned, dim, wide_dim_limit, id_col, vec_col
            )
        # r7 (guide §5): LOCALIZE each INTERMEDIATE iteration's centroid
        # table (C rows — bounded by definition) so iteration i+1 starts
        # from a LocalRelation instead of re-evaluating the whole nested
        # Lloyd's chain per action (measured 6.7 s → 3.8 s for the
        # 2-iteration localized form at sf0.1). The LAST iteration stays
        # lazy: localized_kmeans_centroids — the multi-consumer entrypoint
        # — collects it exactly once. Identical values: the collect/
        # createDataFrame round-trip of longs and doubles is exact.
        if it < iters - 1:
            cent = emb.sparkSession.createDataFrame(
                cent.collect(), f"{id_col} long, {vec_col} array<double>"
            )
    return cent


def _kmeans_update_catalyst(
    assigned: DataFrame,
    dim: int,
    wide_dim_limit: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """One Lloyd's update from an assigned corpus — the r6 Catalyst forms
    (wide ≤ wide_dim_limit, tall above), kept as the use_arrow=False
    reference implementation and cross-check (equivalence test-pinned)."""
    if dim <= wide_dim_limit:
        sums = [
            F.sum(
                F.round(F.col(vec_col)[d].cast("double") * 10000).cast("long")
            ).alias(f"_s{d}")
            for d in range(dim)
        ]
        upd = assigned.groupBy("list_id").agg(*sums, F.count("*").alias("_n"))
        return upd.select(
            F.col("list_id").cast("long").alias(id_col),
            F.array(
                *[
                    (F.expr(f"_s{d} div _n") / F.lit(10000.0)).cast("double")
                    for d in range(dim)
                ]
            ).alias(vec_col),
        )
    tall = assigned.select(
        "list_id",
        F.posexplode(
            F.expr(
                f"transform({vec_col}, v -> "
                "CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT))"
            )
        ).alias("_pos", "_bp"),
    )
    upd = tall.groupBy("list_id", "_pos").agg(
        F.sum("_bp").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    return (
        upd.groupBy("list_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_pos"),
                        (F.expr("_s div _n") / F.lit(10000.0))
                        .cast("double")
                        .alias("_m"),
                    )
                )
            ).alias("_pm")
        )
        .select(
            F.col("list_id").cast("long").alias(id_col),
            F.expr("transform(_pm, x -> x._m)").alias(vec_col),
        )
    )


def _kmeans_rows(emb: DataFrame, vec_col: str) -> DataFrame:
    """The skinny (double vector, bp-rounded int64 vector) projection the
    Arrow Lloyd's update consumes — split out so kmeans_centroids can
    persist it ONCE across iterations (guide §5)."""
    return emb.select(
        as_double(F.col(vec_col)).alias("_kv"),
        F.expr(
            f"transform({vec_col}, v -> "
            "CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT))"
        ).alias("_kbp"),
    )


def _kmeans_update_arrow(
    emb: DataFrame,
    cent: DataFrame,
    dim: int,
    id_col: str,
    vec_col: str,
    rows: DataFrame | None = None,
) -> DataFrame:
    """One Lloyd's update as a SINGLE Arrow pass (guide §4.2): per
    partition, NumPy computes each row's nearest centroid and accumulates
    per-list integer bp sums — replacing the N×C broadcast-nested-loop
    expansion, the first(embedding) SortAggregate, and the wide update
    aggregate with one map stage plus a C×dim skinny-row sum (measured
    13.5 s → ~4 s for 2 iterations at 10× sf0.1).

    EXACTNESS by construction, not accident:
      * assignment cosines accumulate dimension-sequentially (the
        _pair_dup_arrays contract — per row the IEEE op sequence of the
        aggregate(zip_with) fold), centroid norms likewise, division is
        the same one-product-one-divide as cosine_pre;
      * the argmax replicates max_by(cid, struct(cos, −cid)): centroids
        are sorted by id and np.argmax takes the FIRST maximum (ties →
        lowest cid); NaN cosines map to +inf first (Spark orders NaN
        above every double);
      * the summed values are NOT re-rounded in Python: Spark's own
        Round(v·10⁴) HALF_UP runs in a Catalyst projection and ships as
        int64 — the NumPy stage only adds integers (order-free, exact),
        and the final per-(list, pos) sum + `div` reassembly is the
        r6 tall form verbatim.

    Contract: vectors of exactly `dim` elements (rows of any other
    length are skipped — the Catalyst forms produced NULL-poisoned
    groups for them; both behaviors are undefined input)."""
    import pandas as pd

    spark = emb.sparkSession
    cent_rows = sorted(
        (int(r[0]), [float(x) for x in r[1]]) for r in cent.collect()
    )
    schema = "list_id long, _pos int, _s long, _n long"
    if not cent_rows:
        return _kmeans_update_catalyst(
            spark.createDataFrame([], f"list_id long, {vec_col} array<double>"),
            dim, dim + 1, id_col, vec_col,
        )
    if rows is None:
        rows = _kmeans_rows(emb, vec_col)

    def partials(it):
        import numpy as np

        cids = np.array([c for c, _ in cent_rows], dtype=np.int64)
        C = np.array([v for _, v in cent_rows], dtype=np.float64)
        nacc = np.zeros(len(cids))
        for d in range(dim):
            col = C[:, d]
            nacc = nacc + col * col
        cn = np.sqrt(nacc)
        for pdf in it:
            if not len(pdf):
                continue
            vecs = pdf["_kv"].tolist()
            keep = [
                i for i, v in enumerate(vecs)
                if v is not None and len(v) == dim
            ]
            if not keep:
                continue
            V = np.empty((len(keep), dim), dtype=np.float64)
            BP = np.empty((len(keep), dim), dtype=np.int64)
            bps = pdf["_kbp"].tolist()
            for r, i in enumerate(keep):
                V[r, :] = vecs[i]
                BP[r, :] = bps[i]
            vacc = np.zeros(len(keep))
            for d in range(dim):
                col = V[:, d]
                vacc = vacc + col * col
            vn = np.sqrt(vacc)
            D = np.zeros((len(keep), len(cids)))
            for d in range(dim):
                D += V[:, d][:, None] * C[:, d][None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                COS = D / (vn[:, None] * cn[None, :])
            COS = np.where(np.isnan(COS), np.inf, COS)
            best = np.argmax(COS, axis=1)
            out_l, out_p, out_s, out_n = [], [], [], []
            for k in np.unique(best):
                sel = best == k
                s = BP[sel].sum(axis=0)
                n = int(sel.sum())
                for pos in range(dim):
                    out_l.append(int(cids[k]))
                    out_p.append(pos)
                    out_s.append(int(s[pos]))
                    out_n.append(n)
            yield pd.DataFrame(
                {"list_id": out_l, "_pos": out_p, "_s": out_s, "_n": out_n}
            )

    upd = (
        rows.mapInPandas(partials, schema)
        .groupBy("list_id", "_pos")
        .agg(F.sum("_s").alias("_s"), F.sum("_n").alias("_n"))
    )
    return (
        upd.groupBy("list_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_pos"),
                        (F.expr("_s div _n") / F.lit(10000.0))
                        .cast("double")
                        .alias("_m"),
                    )
                )
            ).alias("_pm")
        )
        .select(
            F.col("list_id").cast("long").alias(id_col),
            F.expr("transform(_pm, x -> x._m)").alias(vec_col),
        )
    )



def ivf_kmeans_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over LEARNED centroids: identical probe/score plan to
    `ivf_topk`, but the coarse quantizer is `kmeans_centroids` — centroids
    move to the data's density, so lists are balanced and recall at fixed
    nprobe improves on clustered corpora (pinned by the recall test).

    r7: centroids are LOCALIZED (C-row collect) — the corpus and probe
    assignments are two plan branches, and a lazy centroid chain was
    re-evaluated once per branch (guide §5)."""
    from pyspark.sql import Window

    centroids = localized_kmeans_centroids(
        emb, n_centroids, iters, dim, id_col, vec_col
    )
    corpus = ivf_assign(emb, centroids, id_col, vec_col, nprobe=1).select(
        F.col(id_col).alias("nid"),
        as_double(F.col(vec_col)).alias("nv"),
        norm(as_double(F.col(vec_col))).alias("nn"),
        "list_id",
    )
    probes = ivf_assign(query_ids, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("qid"),
        as_double(F.col(vec_col)).alias("qv"),
        norm(as_double(F.col(vec_col))).alias("qn"),
        "list_id",
    )
    scored = (
        corpus.join(F.broadcast(probes), "list_id")
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid",
            cosine_pre(F.col("qv"), F.col("qn"), F.col("nv"), F.col("nn")).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "qid", "nid", F.col("rank").cast("long").alias("rank"),
            F.round("cos", 4).alias("cos_r"),
        )
    )


def localized_kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """kmeans_centroids with LINEAGE TRUNCATION (collect + recreate): the
    centroid table is driver-sized BY DEFINITION (C = n_centroids rows), so
    collecting it is a bounded localization, not a scale hazard. Callers
    that feed the centroid table into multiple plan branches (semantic
    dedup's self-join sides + verdict join) need this or every branch
    re-runs the full Lloyd's iteration chain — measured 3× the assignment
    cost at sf0.1 (VERDICT r4)."""
    cent = kmeans_centroids(emb, n_centroids, iters, dim, id_col, vec_col)
    spark = emb.sparkSession
    return spark.createDataFrame(
        cent.collect(), f"{id_col} long, {vec_col} array<double>"
    )


def round_ge_boundary(threshold_bp: int) -> float:
    """The smallest double B with round(B, 4) >= threshold_bp/10⁴ under
    SPARK's Round semantics — so the per-pair predicate
    `round(cos, 4) >= thr` collapses to the single compare `cos >= B`
    (plus Spark's NaN-is-greatest rule, handled by callers).

    Spark's Round(double, 4) goes through
    BigDecimal(Double.toString(x)).setScale(4, HALF_UP); Python's
    Decimal(repr(x)) reproduces that decimal exactly, and the predicate
    is monotone in x, so a float-bit binary search finds the exact
    boundary. Verified against Spark over boundary-adjacent ulp ladders
    and 4k random draws (0 mismatches; the NaN row needs the callers'
    NaN OR-clause because Spark orders NaN above every double)."""
    import math
    import struct
    from decimal import ROUND_HALF_UP, Decimal

    thr = threshold_bp / 10_000.0

    def pred(x: float) -> bool:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        ) >= thr

    lo, hi = thr - 0.01, thr + 0.01
    if pred(lo):
        return lo  # degenerate (thr tiny); callers never hit this
    blo = struct.unpack("<q", struct.pack("<d", lo))[0]
    bhi = struct.unpack("<q", struct.pack("<d", hi))[0]
    while bhi - blo > 1:
        mid = (blo + bhi) // 2
        if pred(struct.unpack("<d", struct.pack("<q", mid))[0]):
            bhi = mid
        else:
            blo = mid
    return struct.unpack("<d", struct.pack("<q", bhi))[0]


def _pair_dup_arrays(ids, vecs, boundary: float, is_new=None, block: int = 4096):
    """NumPy core of the within-list SemDeDup pair scan: for every row j
    (every NEW row j when `is_new` is given), the minimum candidate id i
    with cosine(i, j) passing `boundary` (or NaN — Spark orders NaN above
    every double, so a NaN cosine PASSES round(cos,4) >= thr, pinned by
    test). Candidates: i with id < j's id (full mode); any base row OR a
    new row with smaller id (incremental mode, matching the operator's
    p_base/p_new pair union).

    EXACT Spark arithmetic by construction: dots and squared norms
    accumulate dimension-sequentially (`acc = acc + x_d·y_d`, vectorized
    over pairs, scalar order per pair identical to the
    aggregate(zip_with) fold), cosine is one divide of the one-product
    norm pair — every IEEE op matches the Column expression; the
    round-threshold is the precomputed exact boundary. Pairs of
    equal-but-nonstandard-length vectors score over their own length
    (zip_with semantics); mixed-length pairs yield NULL in Spark and are
    simply not candidates here. Memory is blocked: never more than
    block² floats live at once, so degenerate lists cost time, not heap.

    FAST PASS + EXACT BAND (r7): the per-dimension elementwise
    accumulation of the full block product is the bit-exactness anchor
    but costs ~10× a BLAS matmul. The block cosines are now computed
    with `V @ V.T` (any summation order) TOGETHER with a RIGOROUS
    per-pair error bound: for a d-term dot product, any summation order
    satisfies |fl(Σxy) − Σxy| ≤ γ·Σ|x||y| with γ = d·u/(1−d·u)
    (Higham, Accuracy and Stability of Numerical Algorithms, §3.1), so
    |seq − blas| ≤ 2γ·Σ|x||y|; dividing by the same norm product and
    allowing rounding of the division and of the |·| matmul itself, the
    bound used is E = (4d+32)·eps·(A/(nᵢnⱼ)) + 8·eps·|cos_fast| with
    A = |V|@|V|.T and eps = 2⁻⁵². Pairs with cos_fast ≥ boundary + E
    pass for certain, cos_fast < boundary − E fail for certain, and
    only the (empirically empty: width ~1e-13, and Σ|x||y| ≤ nᵢnⱼ by
    Cauchy-Schwarz) band in between re-evaluates the exact
    dimension-sequential fold — so the pass/fail set is IDENTICAL to
    the sequential form on every input, adversarially-planted boundary
    cosines included (test-pinned on a boundary ulp ladder).

    Returns (j_ids, dup_ids) int64 arrays."""
    import numpy as np

    eps = float(np.finfo(np.float64).eps)  # 2^-52
    big = np.iinfo(np.int64).max
    lens = np.array([-1 if v is None else len(v) for v in vecs], dtype=np.int64)
    out_j: list = []
    out_d: list = []
    for L in np.unique(lens):
        if L < 0:
            continue
        sel = np.nonzero(lens == L)[0]
        order = sel[np.argsort(ids[sel], kind="stable")]
        sid = ids[order]
        n = len(order)
        if n < 2:
            continue
        V = np.zeros((n, max(int(L), 1)), dtype=np.float64)
        for r, oi in enumerate(order):
            if L > 0:
                V[r, :] = vecs[oi]
        AV = np.abs(V)
        nacc = np.zeros(n)
        for d in range(int(L)):
            c = V[:, d]
            nacc = nacc + c * c
        nrm = np.sqrt(nacc)
        ebound = (4 * int(L) + 32) * eps
        nw = is_new[order] if is_new is not None else None
        bestid = np.full(n, big)
        for jb in range(0, n, block):
            je = min(jb + block, n)
            i_hi = n if is_new is not None else je
            for ib in range(0, i_hi, block):
                ie = min(ib + block, i_hi)
                NP_ = nrm[ib:ie][:, None] * nrm[jb:je][None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    C = (V[ib:ie] @ V[jb:je].T) / NP_
                    E = (
                        ebound * (AV[ib:ie] @ AV[jb:je].T) / NP_
                        + 8 * eps * np.abs(C)
                    )
                M = (C >= boundary + E) | np.isnan(C)
                band = ~M & (C >= boundary - E)
                if band.any():
                    bi, bj = np.nonzero(band)
                    Vi = V[ib:ie][bi]
                    Vj = V[jb:je][bj]
                    acc = np.zeros(len(bi))
                    for d in range(int(L)):
                        acc = acc + Vi[:, d] * Vj[:, d]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        ce = acc / (nrm[ib:ie][bi] * nrm[jb:je][bj])
                    ok = ce >= boundary
                    M[bi[ok], bj[ok]] = True
                ipos = np.arange(ib, ie)[:, None]
                jpos = np.arange(jb, je)[None, :]
                if is_new is not None:
                    base_i = (nw[ib:ie] == 0)[:, None]
                    new_i = (nw[ib:ie] == 1)[:, None]
                    jnew = (nw[jb:je] == 1)[None, :]
                    M &= jnew & (base_i | (new_i & (ipos < jpos)))
                else:
                    M &= ipos < jpos
                if not M.any():
                    continue
                anyc = M.any(axis=0)
                first = M.argmax(axis=0)
                cand = np.where(anyc, sid[ib:ie][first], big)
                bestid[jb:je] = np.minimum(bestid[jb:je], cand)
        hit = bestid < big
        out_j.append(sid[hit])
        out_d.append(bestid[hit])
    if not out_j:
        import numpy as np

        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(out_j), np.concatenate(out_d)


def list_pair_dups(
    assigned: DataFrame,
    threshold_bp: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "list_id",
) -> DataFrame:
    """Within-list duplicate verdicts (_j, dup_of) — the SemDeDup pair
    scan as ONE grouped NumPy pass (guide §4.2): the Catalyst self-join
    form shuffled the list twice and paid ~100 µs of interpreted
    higher-order fold PER PAIR (measured: a 40M-pair scan spent 122 s in
    the dot folds alone; the unrolled-codegen alternative measured
    SLOWER still — see OPTIMIZATION_r07.md). Here each k-means list
    crosses the Arrow boundary ONCE (N rows, one shuffle — the join
    shuffled 2N) and the quadratic loop runs vectorized in NumPy with
    bit-exact Spark arithmetic (_pair_dup_arrays). Same skew posture as
    the join it replaces: one list = one task."""
    import pandas as pd

    boundary = round_ge_boundary(threshold_bp)
    rows = assigned.select(
        F.col(list_col).alias("_slist"),
        F.col(id_col).cast("long").alias("_sid"),
        as_double(F.col(vec_col)).alias("_sv"),
    )

    def verdicts(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf["_sid"].to_numpy(np.int64)
        vecs = pdf["_sv"].tolist()
        j, d = _pair_dup_arrays(ids, vecs, boundary)
        return pd.DataFrame({"_j": j, "dup_of": d})

    return rows.groupBy("_slist").applyInPandas(verdicts, "_j long, dup_of long")


def semantic_dedup(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    threshold_bp: int = 9990,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    cache_out: list | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    near-duplicate pruning that scales by CLUSTERING FIRST — k-means the
    corpus (kmeans_centroids, the learned IVF quantizer), then compare
    pairs only WITHIN a cluster; a vector is a semantic duplicate when
    some lower-id cluster member's cosine ≥ threshold_bp/10⁴. Keeping the
    lowest id per duplicate group is the deterministic stand-in for the
    paper's keep-one-per-group choice.

    Scale shape: the quadratic pair scan is per-cluster (C clusters cut
    the global O(N²) to Σ|cluster|²); the self-join is keyed on list_id —
    one corpus shuffle each side, co-partitioned by Spark's join — and the
    duplicate verdict joins back on the vector id. Cluster-size skew is
    the knob: raise n_centroids until max |cluster| fits the executor
    (the same histogram-bound logic as dedup.candidate_pair_bound applies
    if a guard is wanted).

    The threshold compares the ROUNDED cosine (round(cos, 4), the repo's
    established cross-engine-stable form) so the gate never sits on a
    last-ulp disagreement between engines.

    centroids: a precomputed centroid table (id_col, vec_col) — the
    incremental path passes the BASE corpus's centroids so batch and
    corpus agree on list geometry; None learns them here (localized, see
    localized_kmeans_centroids).

    Adds: list_id, dup_of (lowest-id near-duplicate neighbor, −1 when
    kept), is_semdup."""
    cent = (
        centroids
        if centroids is not None
        else localized_kmeans_centroids(emb, n_centroids, iters, dim, id_col, vec_col)
    )
    # persist: assigned feeds the pair scan AND the verdict join — without
    # it each branch re-runs the upstream embedding projection + corpus
    # scan (guide §5). One-shot callers leak a bounded corpus-row cache
    # for the session; loop callers pass cache_out and unpersist.
    assigned = ivf_assign(emb, cent, id_col, vec_col, nprobe=1).persist()
    if cache_out is not None:
        cache_out.append(assigned)
    # r7: the within-list pair scan runs as ONE grouped NumPy pass with
    # bit-exact Spark arithmetic (list_pair_dups) — the Catalyst
    # self-join paid ~100 µs of interpreted fold per pair and shuffled
    # the corpus twice (measured 2.5× on the entry at 10× scale)
    dup = list_pair_dups(assigned, threshold_bp, id_col, vec_col)
    out = assigned.join(
        dup, F.col(id_col) == F.col("_j"), "left"
    ).drop("_j")
    return out.withColumn(
        "is_semdup", F.col("dup_of").isNotNull()
    ).withColumn("dup_of", F.coalesce(F.col("dup_of"), F.lit(-1)).cast("long"))


def quantize_unit_col(vec_col: Column) -> Column:
    """Symmetric int8 scalar quantization of the L2-NORMALIZED vector:
    q[d] = round(u[d] · 127) with u = v/‖v‖ (zero vector → all zeros).
    Normalize-then-quantize is what makes the integer dot a cosine proxy:
    dot(qa, qb) ≈ 127² · cos(a, b). An affine per-dim min/max code (FAISS
    SQ8-style) canNOT be dotted directly — the offset cross-terms swamp
    the signal — so the symmetric unit form is the correct one for
    dot-ranked candidates. Row-local, no corpus pass, no trained state:
    at 100 TB the codes are computed in the same scan that consumes them
    (or written once as a 4×-smaller column). 64 longs instead of 64
    doubles per row keeps the candidate scan cache-resident."""
    norm = F.sqrt(
        F.aggregate(
            vec_col,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    # r7: the norm is BOUND ONCE as an outer lambda variable (the
    # ngram_col lesson) — embedded directly in the per-element lambda it
    # was re-folded over the whole array once PER ELEMENT (~d² interpreted
    # ops/row: measured 18.9 s → 1.3 s for the 10× code projection),
    # identical codes (same norm double, same per-element arithmetic).
    return F.transform(
        F.array(norm),
        lambda nrm: F.transform(
            vec_col,
            lambda x: F.when(
                nrm > 0, F.round(x.cast("double") * 127.0 / nrm)
            ).otherwise(F.lit(0.0)).cast("long"),
        ),
    )[0]


def int_dot(a, b) -> Column:
    """Exact integer dot product (long fold — order-independent, so the
    candidate ranking is engine-reproducible, unlike a float dot)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    refine: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_arrow: bool = True,
) -> DataFrame:
    """Scalar-quantized ANN: candidates are scored with the EXACT integer
    dot over int8-quantized vectors (cheap, cache-friendly, deterministic),
    the top k·refine per query are re-ranked with exact cosine on the
    original doubles, and the final top-k is exact within the candidate
    set. The classic memory/recall dial: refine ↑ → recall → 1.

    Plan (r7): the integer candidate stage runs as an Arrow map over the
    corpus with the (bounded, localized) quantized query set — batch-
    local top-(k·refine) pruning, integer dots exact in any order — so
    the per-query window sees narrow candidate rows instead of the full
    N×Q expansion CARRYING both double arrays (the r6 form's window
    exchange shipped ~1 KB of vector payload per pair and paid one
    interpreted zip_with fold each: measured 12.1 s → ~2 s at the 10×
    bench). The k·refine survivors then re-attach their double vectors
    by id (survivor-broadcast joins) and the exact-cosine re-rank and
    round are the UNCHANGED Catalyst expressions. The Catalyst candidate
    join remains behind use_arrow=False (equivalence test-pinned) and as
    the too-many-queries fallback."""
    from pyspark.sql import Window

    qz = quantize_unit_col(F.col(vec_col))
    q_rows = (
        query_ids.select(F.col(id_col), qz).limit(4097).collect()
        if use_arrow
        else [None] * 4097
    )
    wi = Window.partitionBy("qid").orderBy(F.col("iscore").desc(), F.col("nid").asc())
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    if use_arrow and len(q_rows) <= 4096:
        cand = _topk_candidates_arrow(
            emb, q_rows, k * refine, id_col, vec_col,
            integer_codes=True, code_expr=qz,
        ).withColumnRenamed("_score", "iscore").drop("_snan")
        sv = (
            cand.withColumn("_irk", F.row_number().over(wi))
            .where(F.col("_irk") <= k * refine)
            .select("qid", "nid")
        )
        qv_tbl = query_ids.select(
            F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv")
        )
        nv_tbl = emb.select(
            F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv")
        )
        survivors = (
            nv_tbl.join(F.broadcast(sv), "nid")
            .join(F.broadcast(qv_tbl), "qid")
            .select("qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos"))
        )
        return (
            survivors.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "qid", "nid", F.col("rank").cast("long").alias("rank"),
                F.round("cos", 4).alias("cos_r"),
            )
        )
    c = emb.select(
        F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv"),
        qz.alias("nq"),
    )
    q = query_ids.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"),
        qz.alias("qq"),
    )
    cand = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid", "nv", "qv",
            int_dot(F.col("nq"), F.col("qq")).alias("iscore"),
        )
    )
    survivors = (
        cand.withColumn("_irk", F.row_number().over(wi))
        .where(F.col("_irk") <= k * refine)
        .select("qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos"))
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "qid", "nid", F.col("rank").cast("long").alias("rank"),
            F.round("cos", 4).alias("cos_r"),
        )
    )


def ann_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact scoring restricted to the query's LSH
    bucket. Recall < 1 by construction; the bench compares cost vs
    brute_force_topk.

    Bucketing is a projection (bucket_col) on BOTH sides — an earlier
    version joined a separate (id, bucket) table back onto the corpus,
    which shuffled the corpus against itself and computed the plane dot
    products twice."""
    from pyspark.sql import Window

    b = bucket_col(n_planes, dim, vec_col)
    q = query_ids.select(
        F.col(id_col).alias("qid"),
        as_double(F.col(vec_col)).alias("qv"),
        norm(as_double(F.col(vec_col))).alias("qn"),
        b.alias("qbucket"),
    )
    c = emb.select(
        F.col(id_col).alias("nid"),
        as_double(F.col(vec_col)).alias("nv"),
        norm(as_double(F.col(vec_col))).alias("nn"),
        b.alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), (F.col("bucket") == F.col("qbucket")) & (F.col("qid") != F.col("nid")))
        .select(
            "qid", "nid",
            cosine_pre(F.col("qv"), F.col("qn"), F.col("nv"), F.col("nn")).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "qid", "nid", F.col("rank").cast("long").alias("rank"),
            F.round("cos", 4).alias("cos_r"),
        )
    )


def code_key_col(vec_col: Column) -> Column:
    """Portable group key for the int8 unit code (quantize_unit_col): the
    comma-joined code string. Two vectors share the key iff the quantizer
    agrees on EVERY dimension — identical 64-dim unit codes mean every
    coordinate of the two unit vectors differs by < 1/127, i.e. cosine
    ≈ 1 within quantization error — so key-equality is a high-precision
    near-duplicate proxy that costs one projection, no pair scan. A string
    key (not the raw array) so any SQL engine groups on the identical
    representation."""
    return F.concat_ws(
        ",", F.transform(quantize_unit_col(vec_col), lambda x: x.cast("string"))
    )


def semantic_dedup_capped(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    threshold_bp: int = 9990,
    max_list: int = 256,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    cache_out: list | None = None,
) -> DataFrame:
    """semantic_dedup with the DEGENERATE-LIST guard (VERDICT r4 #1): the
    per-cluster pair scan is Σ|cluster|², so a corpus whose embeddings
    collapse into one k-means list (boilerplate pages, near-identical
    vectors) turns the within-list self-join into O(N²) — the same failure
    mode lsh_candidate_pairs caps with `max_bucket`.

    The guard keys on a LIST-SIZE HISTOGRAM (one narrow aggregate on the
    same list_id the pair join would shuffle on — the candidate_pair_bound
    shape, C rows, broadcast back):

      * lists with ≤ max_list members take the exact within-list pair scan
        — identical verdicts to the uncapped operator.
      * lists ABOVE max_list skip the pair scan entirely and fall back to
        EXACT-CODE GROUPING: members sharing the int8 unit-quantization
        code (code_key_col) are mutual near-duplicates by construction
        (identical codes ⇒ cosine ≈ 1 ≥ any sane threshold), so
        dup_of = the group's min id — one groupBy + one join keyed on
        (list_id, code), O(|list|) rows end-to-end, never |list|².

    Recall under the cap: a degenerate list is degenerate BECAUSE its
    members are near-identical, and near-identical vectors quantize to
    equal codes with high probability — so exactly the corpus that
    explodes the pair scan is the one the code-group fallback handles
    almost losslessly (pinned by the planted-blob test). Members of an
    oversized list whose codes differ are conservatively KEPT (the same
    documented under-detection trade as LSH's dropped buckets). Capped
    rows carry list_capped=true so downstream curation can audit.

    Unlike the LSH cap (where a doc meets its dups again in other bands),
    dropping an oversized list outright would forfeit ALL dedup for its
    members — hence the fallback instead of a drop.

    Adds: list_id, dup_of, is_semdup, list_capped."""
    cent = (
        centroids
        if centroids is not None
        else localized_kmeans_centroids(emb, n_centroids, iters, dim, id_col, vec_col)
    )
    # assigned feeds 5 branches (histogram, the small pair scan, the
    # big-list group scan, the verdict join); r7: persist UNCONDITIONALLY
    # (guide §5) — one-shot callers leak a bounded corpus-row cache for
    # the session; loop callers pass cache_out and unpersist as before.
    assigned = ivf_assign(emb, cent, id_col, vec_col, nprobe=1).persist()
    if cache_out is not None:
        cache_out.append(assigned)
    sizes = (
        assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("_list_n"))
    )
    sized = assigned.join(F.broadcast(sizes), "list_id")
    small = sized.where(F.col("_list_n") <= max_list)
    # r7: grouped NumPy pair scan (list_pair_dups) replaces the Catalyst
    # self-join — identical verdicts, one shuffle instead of two, no
    # per-pair interpreted fold
    dup_small = list_pair_dups(small, threshold_bp, id_col, vec_col)
    big = sized.where(F.col("_list_n") > max_list).select(
        "list_id",
        F.col(id_col).alias("_j"),
        code_key_col(as_double(F.col(vec_col))).alias("_ck"),
    )
    gmin = big.groupBy("list_id", "_ck").agg(F.min("_j").alias("_m"))
    dup_big = (
        big.join(gmin, ["list_id", "_ck"])
        .where(F.col("_j") > F.col("_m"))
        .select("_j", F.col("_m").alias("dup_of"))
    )
    dup = dup_small.unionByName(dup_big)
    out = sized.join(dup, F.col(id_col) == F.col("_j"), "left").drop("_j")
    return (
        out.withColumn("is_semdup", F.col("dup_of").isNotNull())
        .withColumn("dup_of", F.coalesce(F.col("dup_of"), F.lit(-1)).cast("long"))
        .withColumn("list_capped", F.col("_list_n") > max_list)
        .drop("_list_n")
    )


def semantic_dedup_incremental(
    emb_base: DataFrame,
    emb_new: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    threshold_bp: int = 9990,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    broadcast_new: bool = True,
) -> DataFrame:
    """Batch-vs-corpus SemDeDup — the nightly-ingest shape mirroring
    incremental_lsh_pairs (operators/dedup.py): the EXISTING corpus never
    self-joins; only the incoming batch is judged.

    Centroids come from the BASE corpus (learned here when centroids=None,
    or passed in — production keeps the centroid table from the last full
    build), so batch and corpus agree on list geometry and assignment is
    one broadcast-join scan per side. A new vector is a semantic duplicate
    when some base member OR some lower-id new member in its list has
    cosine ≥ threshold_bp/10⁴; dup_of = the minimum such id. When every
    base id precedes every new id (the append-only ingest contract) this
    equals full-mode semantic_dedup on the union with the same centroid
    table, restricted to the new rows (pinned by test).

    Plan: with broadcast_new=True (the normal case — the batch is orders
    of magnitude smaller than the corpus) the corpus side NEVER shuffles.
    r7 (guide §4.2): the batch is LOCALIZED once (driver-bounded exactly
    like the broadcast it replaces); new-vs-new verdicts are computed
    driver-side in NumPy, and base-vs-new runs as mapInPandas over the
    corpus scan against the in-process batch — still zero corpus
    shuffles, but the per-candidate cosine is a vectorized NumPy op with
    bit-exact Spark arithmetic (_pair_dup_arrays' accumulation contract)
    instead of ~100 µs of interpreted fold per candidate pair.
    broadcast_new=False keeps the shuffle-join fallback for batches too
    big to localize. Returns rows for the NEW batch only, same schema as
    semantic_dedup."""
    import pandas as pd

    cent = (
        centroids
        if centroids is not None
        else localized_kmeans_centroids(
            emb_base, n_centroids, iters, dim, id_col, vec_col
        )
    )
    # persist: new_assigned feeds the pair stages and the verdict join —
    # batch-sized, cheap insurance against re-running the batch embedding
    new_assigned = ivf_assign(emb_new, cent, id_col, vec_col, nprobe=1).persist()
    if not broadcast_new:
        new_b = new_assigned.select(
            "list_id",
            F.col(id_col).alias("_j"),
            as_double(F.col(vec_col)).alias("_bv"),
            norm(as_double(F.col(vec_col))).alias("_bn"),
        )
        base_a = ivf_assign(emb_base, cent, id_col, vec_col, nprobe=1).select(
            "list_id",
            F.col(id_col).alias("_i"),
            as_double(F.col(vec_col)).alias("_av"),
            norm(as_double(F.col(vec_col))).alias("_an"),
        )
        thr = F.lit(threshold_bp) / 10_000.0
        cos_ab = cosine_pre(F.col("_av"), F.col("_an"), F.col("_bv"), F.col("_bn"))
        p_base = (
            base_a.join(new_b, "list_id")
            .where(F.round(cos_ab, 4) >= thr)
            .select("_j", "_i")
        )
        new_a = new_assigned.select(
            "list_id",
            F.col(id_col).alias("_i"),
            as_double(F.col(vec_col)).alias("_av"),
            norm(as_double(F.col(vec_col))).alias("_an"),
        )
        p_new = (
            new_a.join(new_b, "list_id")
            .where(F.col("_i") < F.col("_j"))
            .where(F.round(cos_ab, 4) >= thr)
            .select("_j", "_i")
        )
        dup = (
            p_base.unionByName(p_new).groupBy("_j").agg(F.min("_i").alias("dup_of"))
        )
    else:
        import numpy as np

        spark = emb_base.sparkSession
        boundary = round_ge_boundary(threshold_bp)
        batch_rows = new_assigned.select(
            F.col("list_id").cast("long").alias("_l"),
            F.col(id_col).cast("long").alias("_sid"),
            as_double(F.col(vec_col)).alias("_sv"),
        ).collect()
        # per-(list, length) new-side matrices with EXACT sequential norms
        groups: dict = {}
        for r in batch_rows:
            v = r["_sv"]
            key = (r["_l"], -1 if v is None else len(v))
            groups.setdefault(key, ([], []))
            groups[key][0].append(r["_sid"])
            groups[key][1].append(v)
        packed: dict = {}
        for (lid, ln), (gids, gvecs) in groups.items():
            if ln < 0:
                continue
            gi = np.asarray(gids, dtype=np.int64)
            gv = np.empty((len(gids), max(ln, 1)), dtype=np.float64)
            for rix, vv in enumerate(gvecs):
                if ln > 0:
                    gv[rix, :] = vv
            nacc = np.zeros(len(gids))
            for d in range(ln):
                c = gv[:, d]
                nacc = nacc + c * c
            packed[(lid, ln)] = (gi, gv, np.sqrt(nacc))
        bc = spark.sparkContext.broadcast((packed, boundary))

        # new-vs-new verdicts: the batch is already local — compute here
        nn_ids = np.asarray([r["_sid"] for r in batch_rows], dtype=np.int64)
        nn_lists = np.asarray([r["_l"] for r in batch_rows], dtype=np.int64)
        nn_vecs = [r["_sv"] for r in batch_rows]
        partials: list[tuple[int, int]] = []
        for lid in np.unique(nn_lists):
            ix = np.nonzero(nn_lists == lid)[0]
            jj, dd = _pair_dup_arrays(
                nn_ids[ix], [nn_vecs[i] for i in ix], boundary
            )
            partials += [(int(a), int(b)) for a, b in zip(jj, dd)]

        def base_hits(it):
            bpacked, bnd = bc.value
            big = np.iinfo(np.int64).max
            for pdf in it:
                if not len(pdf):
                    continue
                lids = pdf["_l"].to_numpy(np.int64)
                bids = pdf["_sid"].to_numpy(np.int64)
                bvecs = pdf["_sv"].tolist()
                blens = np.array(
                    [-1 if v is None else len(v) for v in bvecs], dtype=np.int64
                )
                outs: dict[int, int] = {}
                for (lid, ln), (gi, gv, gn) in bpacked.items():
                    sel = np.nonzero((lids == lid) & (blens == ln))[0]
                    if not len(sel):
                        continue
                    bv = np.empty((len(sel), max(ln, 1)), dtype=np.float64)
                    for rix, oi in enumerate(sel):
                        if ln > 0:
                            bv[rix, :] = bvecs[oi]
                    nacc = np.zeros(len(sel))
                    for d in range(ln):
                        c = bv[:, d]
                        nacc = nacc + c * c
                    bn = np.sqrt(nacc)
                    D = np.zeros((len(sel), len(gi)))
                    for d in range(ln):
                        D += bv[:, d][:, None] * gv[:, d][None, :]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        C = D / (bn[:, None] * gn[None, :])
                    M = (C >= bnd) | np.isnan(C)
                    if not M.any():
                        continue
                    # min base id per new column within this Arrow batch
                    sid = bids[sel]
                    order = np.argsort(sid, kind="stable")
                    Ms = M[order]
                    anyc = Ms.any(axis=0)
                    first = Ms.argmax(axis=0)
                    cand = np.where(anyc, sid[order][first], big)
                    for jx in np.nonzero(anyc)[0]:
                        j = int(gi[jx])
                        c0 = int(cand[jx])
                        if j not in outs or c0 < outs[j]:
                            outs[j] = c0
                yield pd.DataFrame(
                    {"_j": list(outs.keys()), "dup_of": list(outs.values())},
                    dtype="int64",
                )

        base_in = ivf_assign(emb_base, cent, id_col, vec_col, nprobe=1).select(
            F.col("list_id").cast("long").alias("_l"),
            F.col(id_col).cast("long").alias("_sid"),
            as_double(F.col(vec_col)).alias("_sv"),
        )
        p_base = base_in.mapInPandas(base_hits, "_j long, dup_of long")
        p_new = spark.createDataFrame(
            pd.DataFrame(partials, columns=["_j", "dup_of"], dtype="int64")
            if partials
            else pd.DataFrame({"_j": pd.Series(dtype="int64"),
                               "dup_of": pd.Series(dtype="int64")}),
            "_j long, dup_of long",
        )
        dup = (
            p_base.unionByName(p_new)
            .groupBy("_j")
            .agg(F.min("dup_of").alias("dup_of"))
            .select("_j", "dup_of")
        )
    out = new_assigned.join(dup, F.col(id_col) == F.col("_j"), "left").drop("_j")
    return out.withColumn(
        "is_semdup", F.col("dup_of").isNotNull()
    ).withColumn("dup_of", F.coalesce(F.col("dup_of"), F.lit(-1)).cast("long"))


def recall_report(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_centroids: int = 16,
    nprobe: int = 2,
    refine: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_out: list | None = None,
) -> DataFrame:
    """First-class ANN quality evaluator (VERDICT r4 #4): recall@k of each
    approximate method vs brute-force ground truth on the SAME corpus and
    query set, as data — one (method, k, recall_bp) row per method. This
    is the dial engineers tune nprobe/n_planes/refine against at 100 TB:
    run it on a sampled query set, read the recall column, adjust.

    recall_bp = 10⁴ · |approx∩truth| div |truth| — integer basis points
    (exact, engine-portable). Ground truth is the exact brute-force top-k;
    each method's hit count is a left-semi join on (qid, nid) — truth-row
    sized, never corpus-sized. The truth subplan feeds 4 branches, so it
    is persisted (sampled-query sized, Q·k rows — bounded by the caller's
    query sample, not the corpus); cache_out receives it for unpersist."""
    truth = brute_force_topk(emb, query_ids, k, id_col, vec_col).select("qid", "nid")
    truth = truth.persist()
    if cache_out is not None:
        cache_out.append(truth)
    tot = truth.agg(F.count(F.lit(1)).alias("_tot"))
    methods = [
        ("lsh", ann_topk(emb, query_ids, k, n_planes, dim, id_col, vec_col)),
        ("ivf", ivf_topk(emb, query_ids, k, n_centroids, nprobe, id_col, vec_col)),
        (
            "quantized",
            quantized_topk(emb, query_ids, k, refine, dim, id_col, vec_col),
        ),
    ]
    rows = []
    for name, approx in methods:
        hits = (
            approx.select("qid", "nid")
            .join(truth, ["qid", "nid"], "left_semi")
            .agg(F.count(F.lit(1)).alias("_hits"))
        )
        rows.append(
            hits.crossJoin(tot).select(
                F.lit(name).alias("method"),
                F.lit(k).cast("long").alias("k"),
                F.expr("_hits * 10000 div _tot").cast("long").alias("recall_bp"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
