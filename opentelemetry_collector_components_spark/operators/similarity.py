"""Similarity search over embedding columns (array<float>).

- ``brute_force_cosine``: exact scores against a broadcast query vector —
  JVM ``zip_with``/``aggregate`` expressions, linear scan, the correctness
  baseline.
- ``nearest_centroid`` (IVF building block): assign every vector to the
  closest of K centroids; at scale this is the coarse quantizer that
  restricts search to a probe-list of cells.
- ``lsh_topk``: random-hyperplane LSH — deterministic pseudo-random planes
  derived from (plane, dim) hashes, sign-bit bucket key, search only the
  query's bucket.  Scale path: the bucket join touches a vanishing fraction
  of rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector (failed encoder emitting zeros) yields
    # NULL similarity instead of an ANSI DIVIDE_BY_ZERO job abort; NULL
    # drops out of every top-k / threshold filter downstream
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def brute_force_cosine(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine of every row against one query vector (as doubles)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(
        F.col(id_col),
        F.round(cosine(v, q), round_to).alias("cos_sim"),
    )


def topk_cosine(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine, total order (score desc, id asc) for determinism."""
    scored = brute_force_cosine(df, query_vec, id_col, vec_col, round_to=6)
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def nearest_centroid(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (IVF coarse assign).

    Centroids are literals (broadcast by construction); ties broken by
    centroid id.  One narrow map — no shuffle.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    best = _best_centroid_struct(v, centroids)
    return df.select(
        F.col(id_col),
        (-best["negid"]).cast("int").alias("centroid_id"),
        F.round(best["cos"], 4).alias("cos_sim"),
    )


def _best_centroid_struct(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """max-cosine centroid as struct(cos, negid) — ties break to lowest id."""
    scores = F.array(
        *[
            F.struct(
                F.round(cosine(vec, F.array(*[F.lit(float(x)) for x in c])), 6).alias("cos"),
                F.lit(-cid).alias("negid"),
            )
            for cid, c in centroids
        ]
    )
    return F.array_max(scores)


def _py_cosine(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    return dot / (na * nb)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` cells nearest the
    query, brute-force within them.

    Scale path: the coarse assign is a narrow map (centroid literals are
    broadcast by construction), the probe filter prunes ~(1 - nprobe/K) of
    the data before any scoring, and the final top-k is a global
    ``orderBy(...).limit(k)`` Spark executes as per-partition partial top-k
    + single tiny reduce (TakeOrderedAndProject — no full sort, no big
    shuffle).  With ``nprobe == len(centroids)`` this is exactly
    ``topk_cosine`` (the correctness gate uses that identity is NOT needed:
    the probe-restricted form itself is oracle-checked relationally).
    """
    cand = _probe_candidates(df, query_vec, centroids, nprobe, vec_col)
    return topk_cosine(cand, query_vec, k, id_col, vec_col)


def _probe_candidates(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    nprobe: int,
    vec_col: str,
) -> DataFrame:
    """Coarse-quantizer probe shared by ivf_topk / ivf_pq_topk: rows whose
    nearest centroid is among the ``nprobe`` cells closest to the query."""
    ranked = sorted(
        centroids,
        key=lambda c: (-round(_py_cosine(query_vec, [float(x) for x in c[1]]), 6), c[0]),
    )
    probes = [cid for cid, _ in ranked[:nprobe]]
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    best = _best_centroid_struct(v, centroids)
    return df.withColumn("_cid", (-best["negid"]).cast("int")).filter(
        F.col("_cid").isin(probes)
    ).drop("_cid")


def kmeans_centroids(
    df: DataFrame,
    k: int = 5,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic mini k-means (IVF coarse-quantizer training).

    Init = the k lowest-id vectors; each iteration is one distributed
    assign (narrow map) + one per-(centroid, dim) mean — the groupBy output
    is k×dims rows, so the driver collect is tiny regardless of input size.
    At 100 TB you run this on a sample; the operator is already
    sample-friendly (pass ``df.sample(...)``).
    """
    seed_rows = df.orderBy(id_col).limit(k).select(id_col, vec_col).collect()
    cents = [
        (i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seed_rows)
    ]
    for _ in range(iters):
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        best = _best_centroid_struct(v, cents)
        # two selects: a generator (posexplode) in the same projection as the
        # array_max struct access makes Spark rename the struct fields
        assigned = df.select(
            (-best["negid"]).cast("int").alias("_cid"), v.alias("_v")
        ).select("_cid", F.posexplode("_v").alias("_pos", "_val"))
        means = (
            assigned.groupBy("_cid", "_pos")
            .agg(F.avg("_val").alias("_m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["_cid"], {})[r["_pos"]] = r["_m"]
        # a centroid that received no assignments keeps its previous
        # position (standard Lloyd handling) — silently dropping it would
        # shrink the quantizer below the requested k for good
        prev = dict(cents)
        cents = [
            (
                cid,
                [by_cid[cid][p] for p in sorted(by_cid[cid])]
                if cid in by_cid
                else vec,
            )
            for cid, vec in ((c, prev[c]) for c in sorted(prev))
        ]
    return cents


def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random +-1 plane component from xxhash64."""
    return F.when(
        F.xxhash64(F.lit(plane), F.lit(dim)).bitwiseAND(F.lit(1)) == 1, F.lit(1.0)
    ).otherwise(F.lit(-1.0))


def lsh_bucket(vec: Column, n_planes: int, n_dims: int) -> Column:
    """Random-hyperplane sign bucket: bit p = sign(dot(vec, plane_p))."""
    acc = F.lit(0).cast("long")
    for p in range(n_planes):
        comps = F.array(*[_plane_component(p, d) for d in range(n_dims)])
        dot = _dot(F.transform(vec, lambda x: x.cast("double")), comps)
        acc = acc + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def _probe_buckets(qbucket: int, margins: list[float], n_probes: int) -> list[int]:
    """Multi-probe bucket sequence: the query bucket, then buckets obtained
    by flipping subsets of the query's lowest-|margin| hyperplane bits in
    ascending perturbation cost (sum of squared flipped margins) — the
    standard multi-probe LSH schedule.  A near neighbor that lands across a
    plane the query barely cleared is recovered by the cheap flips."""
    import itertools

    order = sorted(range(len(margins)), key=lambda p: abs(margins[p]))
    probes: list[tuple[float, int]] = [(0.0, qbucket)]
    for r in range(1, len(order) + 1):
        for subset in itertools.combinations(order, r):
            cost = sum(margins[p] ** 2 for p in subset)
            mask = 0
            for p in subset:
                mask |= 1 << p
            probes.append((cost, qbucket ^ mask))
        if len(probes) >= n_probes * 4:
            break
    probes.sort(key=lambda cb: cb[0])
    out: list[int] = []
    for _, b in probes:
        if b not in out:
            out.append(b)
        if len(out) == n_probes:
            break
    return out


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only rows in the query's hyperplane bucket(s).

    ``n_probes`` > 1 is the 100 TB recall lever: with P planes a single
    probe scans ~1/2^P of the corpus and misses neighbors across any
    close-margin plane; probing the lowest-cost perturbed buckets recovers
    them while still scanning only n_probes/2^P of the data.  Raise
    ``n_planes`` to shrink buckets and ``n_probes`` to buy recall back."""
    n_dims = len(query_vec)
    # driver-side replica of lsh_bucket for the literal query vector:
    # xxhash64 must match Spark's — so compute bucket AND per-plane margins
    # WITH Spark once (one row; negligible).
    spark = df.sparkSession
    qvec = F.array(*[F.lit(float(x)) for x in query_vec])
    margin_cols = [
        _dot(qvec, F.array(*[_plane_component(p, d) for d in range(n_dims)])).alias(f"m{p}")
        for p in range(n_planes)
    ]
    qrow = spark.range(1).select(
        lsh_bucket(qvec, n_planes, n_dims).alias("b"), *margin_cols
    ).collect()[0]
    buckets = _probe_buckets(
        qrow["b"], [qrow[f"m{p}"] for p in range(n_planes)], n_probes
    )
    bucketed = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), n_planes, n_dims))
    cand = bucketed.filter(F.col("_bucket").isin(buckets))
    return topk_cosine(cand, query_vec, k, id_col, vec_col)


def md5_plane_signs(n_planes: int, n_dims: int) -> list[list[float]]:
    """Deterministic +-1 hyperplane matrix from Python md5.

    Unlike the xxhash64 planes above (JVM-only), these literals can be
    embedded verbatim in BOTH the Spark plan and an ANSI-SQL oracle, making
    the LSH bucket assignment exactly reproducible outside Spark."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) & 1 else -1.0
            for d in range(n_dims)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket_literal(vec: Column, planes: list[list[float]]) -> Column:
    """Sign bucket against literal plane vectors: bit p = dot(vec, plane_p) > 0."""
    acc = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        comps = F.array(*[F.lit(float(x)) for x in plane])
        dot = _dot(F.transform(vec, lambda x: x.cast("double")), comps)
        acc = acc + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def lsh_topk_literal(
    df: DataFrame,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 10,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``lsh_topk`` with an explicit plane matrix (and the same multi-probe
    recall lever).

    The query bucket/margins are folded on the driver with the same
    sequential left-to-right IEEE adds Spark's ``aggregate`` lambda
    performs, so the Python and JVM buckets agree bit-for-bit."""
    qbucket = 0
    margins: list[float] = []
    for p, plane in enumerate(planes):
        acc = 0.0
        for x, w in zip(query_vec, plane):
            acc += float(x) * w
        margins.append(acc)
        if acc > 0:
            qbucket |= 1 << p
    buckets = _probe_buckets(qbucket, margins, n_probes)
    cand = df.filter(lsh_bucket_literal(F.col(vec_col), planes).isin(buckets))
    return topk_cosine(cand, query_vec, k, id_col, vec_col)


def embedding_near_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    block_planes: list[list[float]] | None = None,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a < b, cosine >= threshold).

    The exact form is an all-pairs join (BroadcastNestedLoopJoin — O(n^2)) —
    the correctness baseline and the oracle gate, and it must be opted into
    with ``allow_all_pairs=True`` so a production caller cannot silently
    cross-join a 100 TB corpus.  With ``block_planes`` the join is
    restricted to equal hyperplane-LSH buckets first (near-identical vectors
    collide w.h.p.), which is the scale path: per-bucket blocks instead of a
    global cross join, at the standard recall trade."""
    if block_planes is None and not allow_all_pairs:
        raise ValueError(
            "embedding_near_pairs without block_planes is an all-pairs cross "
            "join; pass block_planes for the LSH-blocked scale path or "
            "allow_all_pairs=True to opt into the exact quadratic baseline"
        )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sel = df.select(F.col(id_col).alias("_id"), v.alias("_v"))
    if block_planes is not None:
        sel = sel.withColumn("_bucket", lsh_bucket_literal(F.col("_v"), block_planes))
    a, b = sel.alias("a"), sel.alias("b")
    on = F.col("a._id") < F.col("b._id")
    if block_planes is not None:
        on = on & (F.col("a._bucket") == F.col("b._bucket"))
    cos = F.round(cosine(F.col("a._v"), F.col("b._v")), round_to)
    return (
        a.join(b, on)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-scale ANN path: vectors compress to
# m small codes (one byte each at ksub<=256), and query scoring reads an
# m x ksub lookup table instead of the raw floats (asymmetric distance
# computation, ADC).  At 100 TB this is what makes billion-vector search
# feasible: the scan touches m bytes/vector, not dims x 4.
# ---------------------------------------------------------------------------


def pq_codebooks_from_seeds(
    df: DataFrame,
    m: int,
    ksub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic sub-space codebooks from the first ``ksub`` vectors
    (same seeding convention as ``kmeans_centroids``): codebooks[s][j] is
    the j-th centroid of subspace s.  Production training would refine
    these with per-subspace k-means over a sample; the seed form keeps the
    whole PQ path a pure function of the input (oracle-replayable)."""
    rows = df.filter(F.col(id_col) < ksub).orderBy(id_col).collect()
    if not rows:
        raise ValueError("no seed vectors for PQ codebooks")
    dims = len(rows[0][vec_col])
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    dsub = dims // m
    return [
        [[float(v) for v in r[vec_col][s * dsub : (s + 1) * dsub]] for r in rows]
        for s in range(m)
    ]


def pq_codebooks_trained(
    df: DataFrame,
    m: int,
    ksub: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace Lloyd-trained PQ codebooks — the production refinement
    of ``pq_codebooks_from_seeds`` (whose docstring promises exactly this).

    Init = the seed codebooks; each iteration encodes the corpus against
    the current codebooks (Arrow-batched ``pq_encode``) and recomputes
    every codeword as the mean of its assigned subvectors.  ALL m
    subspaces train in ONE pass per iteration: the embedding explodes to
    (subspace, dim, value) rows carrying their subspace's code, and a
    single partial-aggregated groupBy emits m x ksub x dsub means — tiny
    driver collect regardless of corpus size.  Quantization error is
    non-increasing per iteration (Lloyd); empty codewords keep their
    previous position.  At 100 TB train on a sample (``df.sample(...)``),
    like ``kmeans_centroids``."""
    cbs = pq_codebooks_from_seeds(df, m, ksub, id_col, vec_col)
    dsub = len(cbs[0][0])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(v.alias("_v"))
    for _ in range(iters):
        enc = pq_encode(base, cbs, vec_col="_v")
        ex = enc.select(
            F.array(*[F.col(f"code_{s}") for s in range(m)]).alias("_codes"),
            F.posexplode("_v").alias("_pos", "_val"),
        ).select(
            (F.col("_pos") / dsub).cast("int").alias("_s"),
            F.pmod(F.col("_pos"), F.lit(dsub)).alias("_di"),
            F.element_at(
                F.col("_codes"), (F.col("_pos") / dsub).cast("int") + 1
            ).alias("_code"),
            "_val",
        )
        means = ex.groupBy("_s", "_code", "_di").agg(F.avg("_val").alias("_m")).collect()
        table: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            table.setdefault((r["_s"], r["_code"]), {})[r["_di"]] = r["_m"]
        cbs = [
            [
                [table[(s, j)][d] for d in sorted(table[(s, j)])]
                if (s, j) in table
                else cbs[s][j]
                for j in range(ksub)
            ]
            for s in range(m)
        ]
    return cbs


def pq_quantization_error(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> float:
    """Mean squared L2 between each vector and its PQ reconstruction —
    the quantity Lloyd training monotonically reduces (test hook)."""
    m, dsub = len(codebooks), len(codebooks[0][0])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    enc = pq_encode(df.select(v.alias("_v")), codebooks, vec_col="_v")
    err = F.lit(0.0)
    for s in range(m):
        cents = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in codebooks[s]]
        )
        chosen = F.element_at(cents, F.col(f"code_{s}") + 1)
        sub = F.slice(F.col("_v"), s * dsub + 1, dsub)
        err = err + F.aggregate(
            F.zip_with(sub, chosen, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    row = enc.agg(F.avg(err).alias("mse")).head()
    return float(row["mse"])


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds ``code_0..code_{m-1}``: per subspace, the index of the nearest
    centroid by squared L2 (ties -> argmin picks the lowest index).

    Arrow-batched numpy, not per-row JVM expressions: the encode is a
    dense (batch x ksub x dsub) distance computation per subspace — a
    vectorized matrix op in numpy, but an m x ksub forest of interpreted
    HOFs (or a codegen-busting 1000-term expression tree) as column
    exprs; both JVM forms measured 5-10s where this runs in <1s at the
    same size.  The distance accumulates with an explicit SEQUENTIAL loop
    over dsub (numpy's .sum() uses pairwise summation, whose different
    rounding could flip a knife-edge argmin tie against the oracle's
    sequential list_sum); first-min index matches ORDER BY d, code."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    m, dsub = len(codebooks), len(codebooks[0][0])
    cb = [np.asarray(c, dtype=np.float64) for c in codebooks]
    out_schema = StructType(
        df.schema.fields
        + [StructField(f"code_{s}", IntegerType()) for s in range(m)]
    )

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            for s in range(m):
                sub = vecs[:, s * dsub : (s + 1) * dsub]
                d = np.zeros((len(vecs), cb[s].shape[0]))
                for di in range(dsub):  # sequential over dims, see docstring
                    d += (sub[:, None, di] - cb[s][None, :, di]) ** 2
                pdf[f"code_{s}"] = d.argmin(axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(_enc, schema=out_schema)


def pq_adc_topk(
    df: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k nearest (squared L2, ascending) via ADC: the
    query's m x ksub distance lookup table is computed driver-side and
    inlined as literals; each encoded vector's approximate distance is the
    sum of m table lookups — then Spark's distributed top-k
    (TakeOrderedAndProject).  Returns (id, adc_dist)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut = [
        [
            sum(
                (float(query_vec[s * dsub + d]) - c[d]) ** 2
                for d in range(dsub)
            )
            for c in cb
        ]
        for s, cb in enumerate(codebooks)
    ]
    encoded = pq_encode(df, codebooks, vec_col)
    dist = None
    for s in range(m):
        term = F.element_at(
            F.array(*[F.lit(v) for v in lut[s]]), F.col(f"code_{s}") + 1
        )
        dist = term if dist is None else dist + term
    scored = encoded.select(
        F.col(id_col), F.round(dist, 6).alias("adc_dist")
    )
    return scored.orderBy(F.col("adc_dist").asc(), F.col(id_col)).limit(k)


def ivf_pq_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The composed production ANN shape (IVF-PQ): the coarse quantizer
    restricts the scan to the ``nprobe`` cells nearest the query, then PQ
    ADC scores ONLY those candidates — raw floats are touched once for the
    cell assignment, scoring reads m table lookups per surviving vector.
    At a billion vectors this is cells-pruning x bytes-compression
    multiplied: ~(nprobe/K) of the data, m bytes of it per row."""
    cand = _probe_candidates(df, query_vec, centroids, nprobe, vec_col)
    return pq_adc_topk(cand, query_vec, codebooks, k, id_col, vec_col)


# Documented minimum recall@10 per approximate method at the gate's
# parameterization (5 IVF cells / nprobe=2; 8x16 seed-vector PQ codebooks;
# 4 md5 hyperplanes, single-bucket probe).  Measured on the driver fixtures:
# sf0.01 -> ivf 1.0, lsh_md5 0.4, pq 0.3, ivf_pq 0.3; sf0.1 -> ivf 1.0,
# lsh_md5 0.3, pq 0.2, ivf_pq 0.2.  Floors sit one notch (0.1 = one hit
# at k=10) UNDER the worst measurement so a codec/hash regression trips
# them while single-hit fixture noise does not.  PQ-family recall is
# limited by the untrained seed codebooks — the production path trains
# per-subspace k-means (kmeans_centroids) and raises ksub, which is a
# parameter change, not a code path change.
ANN_RECALL_FLOORS = {"ivf": 0.9, "lsh_md5": 0.2, "pq": 0.1, "ivf_pq": 0.1}


def recall_at_k(
    approx: dict[str, DataFrame],
    truth: DataFrame,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Measured recall@k of each approximate ANN result against the exact
    top-k: one row per method with how many ids it returned, how many are
    true top-k members, and the recall fraction.

    The determinism gates prove each method reproduces its own definition;
    this gate measures whether that definition is any *good* — the quality
    axis the other gates can't see.  All inputs are top-k results (≤ k rows
    each), so every join here is broadcast-tiny regardless of corpus size;
    the expensive part is producing the inputs, which each method already
    bounds by its own pruning story."""
    tagged = None
    for method, df in approx.items():
        t = df.select(F.lit(method).alias("method"), F.col(id_col))
        tagged = t if tagged is None else tagged.unionByName(t)
    marks = truth.select(F.col(id_col), F.lit(1).alias("hit"))
    return (
        tagged.join(F.broadcast(marks), id_col, "left")
        .groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("n_returned"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hits"),
        )
        .withColumn("recall", F.round(F.col("n_hits") / F.lit(k), 4))
    )


def _probe_cells(vec: Column, centroids: list[tuple[int, list[float]]], nprobe: int) -> Column:
    """The ``nprobe`` max-cosine centroid ids for a vector, as an array.

    Same scoring/tie convention as ``_best_centroid_struct`` (cosine
    rounded to 6dp, ties to lowest centroid id) so single-query and batch
    probing agree; ``nprobe == 1`` reduces to the coarse-assign cell."""
    scores = F.array(
        *[
            F.struct(
                F.round(-cosine(vec, F.array(*[F.lit(float(x)) for x in c])), 6).alias(
                    "negcos"
                ),
                F.lit(cid).alias("cid"),
            )
            for cid, c in centroids
        ]
    )
    return F.transform(
        F.slice(F.sort_array(scores), 1, nprobe), lambda s: s["cid"]
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 2,
    query_id_col: str = "query_id",
    corpus_id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Batch ANN join: every query row gets its top-k corpus neighbors —
    the kNN-graph / retrieval-index construction shape (one row per
    (query, neighbor), ``cos_sim`` rounded to 4dp, rank ties broken by
    neighbor id).  ``exclude_self`` drops neighbor == query id matches for
    self-joins on a shared id space.

    Scale path — this is NOT |queries| x |corpus|: each corpus row is
    coarse-assigned to ONE cell (narrow map over broadcast centroid
    literals), each query explodes to its ``nprobe`` nearest cells, and
    candidates come from an equi-join on the cell id — a single shuffle
    keyed by cell, with per-pair cost only inside probed cells.  The
    per-query top-k is a window partitioned by the (high-cardinality)
    query id, never a global sort.  A skewed cell (imbalanced k-means)
    skews that one join partition; AQE skew-join splitting handles it,
    and the durable fix is more centroids (cells ~ sqrt(n), the SemDeDup
    sizing note above).  Reference behavior parity: generalizes
    ``ivf_topk`` (reference's single-lookup semantics) to the many-query
    batch shape a training-data pipeline needs.
    """
    if nprobe < 1 or nprobe > len(centroids):
        raise ValueError(f"nprobe must be in [1, {len(centroids)}], got {nprobe}")
    from pyspark.sql.window import Window

    cv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    corp = corpus.select(
        F.col(corpus_id_col).alias("_nid"),
        cv.alias("_cvec"),
        (-_best_centroid_struct(cv, centroids)["negid"]).cast("int").alias("_cell"),
    )
    qry = queries.select(
        F.col(query_id_col).alias("_qid"),
        cv.alias("_qvec"),
        F.explode(_probe_cells(cv, centroids, nprobe)).alias("_cell"),
    )
    # one row per (query, candidate): a corpus row lives in exactly one
    # cell and probe cells are distinct, so the equi-join cannot duplicate
    scored = qry.join(corp, "_cell").select(
        F.col("_qid"),
        F.col("_nid"),
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("_cos6"),
    )
    if exclude_self:
        scored = scored.filter(F.col("_qid") != F.col("_nid"))
    w = Window.partitionBy("_qid").orderBy(F.col("_cos6").desc(), F.col("_nid"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_nid").alias("neighbor_id"),
            F.round("_cos6", 4).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic (embedding-space) deduplication.  Public recipe
# (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the embeddings,
# then search for near-duplicate pairs ONLY within a cluster — the
# quadratic pair search shrinks from O(n^2) to O(sum of cluster^2), i.e.
# ~n^2/k for balanced clusters.  At 100 TB the paper-scale setting is
# k ~ sqrt(n) (50k clusters for LAION-440M), which keeps every per-cluster
# block small enough for an equi-join partition.
# ---------------------------------------------------------------------------


def _cluster_assigned(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(_id, _v, _cluster) projection: max-cosine centroid per vector.
    With paper-scale K (~sqrt(n) centroids) the K cosines per row make
    this the dominant compute stage — callers persist it when more than
    one plan branch consumes it."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    best = _best_centroid_struct(v, centroids)
    return df.select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        (-best["negid"]).cast("int").alias("_cluster"),
    )


def _pairs_from_assigned(assigned: DataFrame, threshold: float, round_to: int) -> DataFrame:
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = F.round(cosine(F.col("a._v"), F.col("b._v")), round_to)
    return (
        a.join(
            b,
            (F.col("a._cluster") == F.col("b._cluster"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._cluster").alias("cluster_id"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup_pairs(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    persist_intermediates: bool = True,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: assign each vector to its
    max-cosine centroid (literal centroids — broadcast by construction, a
    narrow map), then self-equi-join on the cluster id with ``id_a < id_b``
    and keep pairs at ``cosine >= threshold``.

    Scale shape: ONE shuffle keyed on cluster id; within a partition the
    pair search is quadratic in the cluster size, so the centroid count is
    the knob that bounds per-task cost (k ~ sqrt(n) keeps blocks ~sqrt(n)).
    A pathologically popular cluster is the skew risk — the mitigation is
    more centroids (finer clustering), not salting: correctness requires
    co-locating a whole cluster.  Never an all-pairs cross join.
    ``persist_intermediates`` caches the assignment projection, which
    otherwise re-runs the K-cosine assign map once per self-join side
    (cache lifetime caveats as in ``dedup.minhash_lsh_pairs``)."""
    from ..caching import maybe_persist

    assigned = maybe_persist(
        _cluster_assigned(df, centroids, id_col, vec_col), persist_intermediates
    )
    return _pairs_from_assigned(assigned, threshold, round_to)


def semantic_dedup_pairs_vectorized(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    block_rows: int = 1024,
) -> DataFrame:
    """Scale path for ``semantic_dedup_pairs``: the same within-cluster
    pair search, but each cluster's pairwise cosines come from ONE
    Arrow-batched numpy matmul (``applyInPandas`` per cluster) instead of
    the per-pair interpreted ``zip_with`` fold — measured ~5-10x faster at
    real dims, the same trade the PQ encoder documents.  Row-blocked
    (``block_rows`` x cluster) so a big cluster never materializes its
    full n x n similarity matrix.

    Float caveat: numpy's blocked summation can differ from the JVM fold
    in the last ulp, so a cosine landing exactly on the rounded threshold
    may flip versus the exact form — use ``semantic_dedup_pairs`` when
    bit-exact oracle parity matters; this form is for production volume.
    Cluster co-location is the same requirement as the equi-join form:
    one cluster : one pandas group."""
    import pandas as pd

    assigned = _cluster_assigned(df, centroids, id_col, vec_col)
    id_type = df.schema[id_col].dataType.simpleString()

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf["_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        cluster = int(pdf["_cluster"].iloc[0])
        m = np.array(pdf["_v"].tolist(), dtype=np.float64)[order]
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        out_a, out_b, out_c = [], [], []
        n = len(ids)
        for lo in range(0, n, block_rows):
            hi = min(lo + block_rows, n)
            # columns below lo are never read (pairs need j > i >= lo),
            # so multiply only against mn[lo:] — half the FLOPs of the
            # full-matrix product summed over blocks
            sim = np.round(mn[lo:hi] @ mn[lo:].T, round_to)
            for i in range(lo, hi):
                rel = i - lo
                row = sim[rel, rel + 1 :]
                hits_rel = np.nonzero(row >= threshold)[0] + rel + 1
                if hits_rel.size:
                    out_a.extend([ids[i]] * hits_rel.size)
                    out_b.extend(ids[hits_rel + lo])
                    out_c.extend(row[hits_rel - (rel + 1)])
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype=ids.dtype),
                "id_b": pd.Series(out_b, dtype=ids.dtype),
                "cluster_id": pd.Series([cluster] * len(out_a), dtype="int32"),
                "cos_sim": pd.Series(out_c, dtype="float64"),
            }
        )

    return assigned.groupBy("_cluster").applyInPandas(
        score, f"id_a {id_type}, id_b {id_type}, cluster_id int, cos_sim double"
    )


def semantic_dedup_survivors(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist_intermediates: bool = True,
) -> DataFrame:
    """SemDeDup removal policy: drop every vector with a lower-id semantic
    near-duplicate in its own cluster (same min-id-survives trade as
    ``dedup.near_dedup_survivors``, documented there).  Returns the
    surviving rows of ``df`` unchanged plus their ``cluster_id``.  The
    K-cosine assignment is computed ONCE and shared by both self-join
    sides and the survivor projection (persisted by default — it is the
    dominant stage at paper-scale centroid counts)."""
    from ..caching import maybe_persist

    assigned = maybe_persist(
        _cluster_assigned(df, centroids, id_col, vec_col), persist_intermediates
    )
    pairs = _pairs_from_assigned(assigned, threshold, round_to=4)
    removed = pairs.select(F.col("id_b").alias("_id")).distinct()
    keep = assigned.select("_id", "_cluster").join(removed, "_id", "left_anti")
    return df.join(
        keep.select(
            F.col("_id").alias(id_col), F.col("_cluster").alias("cluster_id")
        ),
        id_col,
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (the 4x-memory rung under PQ on the ANN ladder)
# ---------------------------------------------------------------------------
def _int8_code(x: Column, m: Column) -> Column:
    """Symmetric round-half-up int8 code: sign(x) * floor(|x|*127/m + 0.5),
    written as an explicit sign branch so the DuckDB replay is the same
    expression tree."""
    mag = F.floor(F.abs(x) * F.lit(127.0) / m + F.lit(0.5))
    return F.when(x < 0, -mag).otherwise(mag).cast("long")


def int8_quantize(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: codes in [-127, 127] plus
    the per-vector ``scale = max|x| / 127`` that reconstructs
    ``x ~ code * scale``.

    The first compression rung of the production ANN ladder (4x memory
    vs float32, SIMD-friendly integer dot products; FAISS
    ``SQ8`` / ScaNN int8): brute-force scan cost drops 4x before any
    pruning structure (IVF/LSH) is introduced, and the codes column is
    what an integer-dot Top-k consumes.  Pure JVM expression forest
    (transform/array_max), scan-fused, no shuffle; the max-abs scale is
    floored at 1e-30 so all-zero vectors quantize to zero codes instead
    of dividing by zero.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    m = F.greatest(F.array_max(F.transform(v, F.abs)), F.lit(1e-30))
    return df.select(
        F.col(id_col),
        F.transform(v, lambda x: _int8_code(x, m)).alias("codes"),
        m.alias("maxabs"),
    )


def int8_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Top-k by int8-quantized dot product against one query vector.

    Scores are ``idot * (m/127) * (mq/127)`` — the integer dot is exact
    (codes <= 127, so 2^53 headroom up to ~5e8 dims), the two scale
    factors are per-side doubles, and ordering is (score desc, id asc)
    for a deterministic k-boundary.  One scan + TakeOrderedAndProject;
    at production scale run it over ``int8_quantize`` output persisted
    as the compact codes table instead of re-quantizing per query.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    import math as _math

    mq = max(max(abs(float(x)) for x in query_vec), 1e-30)
    qcodes = []
    for x in (float(v) for v in query_vec):
        mag = _math.floor(abs(x) * 127.0 / mq + 0.5)
        qcodes.append(int(-mag if x < 0 else mag))
    qarr = F.array(*[F.lit(c).cast("long") for c in qcodes])
    quant = int8_quantize(df, id_col=id_col, vec_col=vec_col)
    idot = F.aggregate(
        F.zip_with(F.col("codes"), qarr, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    score = (
        idot.cast("double") * (F.col("maxabs") / F.lit(127.0))
    ) * F.lit(mq / 127.0)
    return (
        quant.select(F.col(id_col), score.alias("iscore"))
        .orderBy(F.desc("iscore"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("iscore", round_to).alias("iscore"))
    )
