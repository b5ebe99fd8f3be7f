"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: the correctness baseline.
  Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM-side, no UDF);
  probe set broadcast; ``TakeOrderedAndProject``-style window top-k.
- :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH bucketing
  (deterministic md5-derived hyperplanes), candidates from matching buckets
  (multi-probe over all bands), exact re-rank of candidates only. Recall<1
  by construction; compared against the brute-force baseline by recall in
  tests, not by hash equality.

All cosine math in float64 with left-to-right summation so the DuckDB
oracle (unnest-ordinality join, sum in element order) matches bit-for-bit
after 6-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

COS_DECIMALS = 6


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each probe vector, exact top-k most-cosine-similar other vectors.

    Output: (probe_id, rank, vec_id, cos). Probes broadcast; the big side
    streams — one pass over the embedding table per query batch.
    """
    # norms are precomputed ONCE per side (r6, guide §1.2 per-task work):
    # the probe norm on the broadcast side (5 rows, before the exchange) and
    # the row norm once per embedding row before the nested-loop join — the
    # join output previously re-folded both norms per (probe x vec) PAIR,
    # tripling the array math. Same fold expressions in the same order and
    # the same `norm(v) * norm(p)` product order, so values (and the 6-dp
    # rounded result) are bit-identical.
    probes = (
        embeddings.filter(F.col(id_col).isin(probe_ids))
        .select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pvec"))
        .withColumn("pnorm", _norm(F.col("pvec")))
    )
    rows = embeddings.withColumn("_vnorm", _norm(F.col(vec_col)))
    joined = rows.join(F.broadcast(probes), F.col(id_col) != F.col("probe_id"))
    scored = joined.select(
        "probe_id",
        id_col,
        F.round(
            _dot(F.col(vec_col), F.col("pvec"))
            / (F.col("_vnorm") * F.col("pnorm")),
            COS_DECIMALS,
        ).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", F.col("rank").cast("int").alias("rank"), id_col, "cos")
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (doc-dedup flavor): (vec_a, vec_b,
    cos) with cos >= threshold, exact. Brute-force self-join — the
    correctness baseline; at scale candidates come from
    :func:`lsh_signatures` buckets first (same verify step)."""
    # norms fold once per embedding row (below the join), not once per pair
    # (r6); same expressions, same `norm(a) * norm(b)` order — bit-identical
    a = embeddings.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                COS_DECIMALS,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def lsh_cosine_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs, the **scale path**: candidates from
    shared LSH band buckets (:func:`lsh_signatures`), exact cosine verified
    on candidates only — never an all-pairs join. Output (vec_a, vec_b, cos)
    with cos >= threshold; recall < 1 by LSH construction, but fully
    deterministic (md5-derived hyperplanes), so a SQL oracle replicating the
    same signatures matches bit-for-bit.

    At 100 TB the band-bucket equi-join shuffles on (band, key); hot buckets
    (degenerate key skew) are bounded by the band-key cardinality and AQE
    skew-join splitting; the verify join touches only candidate pairs.
    """
    sig = lsh_signatures(embeddings, dim, id_col, vec_col)
    s_a = sig.select(F.col(id_col).alias("vec_a"), "band", "key")
    s_b = sig.select(F.col(id_col).alias("vec_b"), "band", "key")
    cand = (
        s_a.join(s_b, ["band", "key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    # norms fold once per embedding row (below the verify joins), not once
    # per candidate pair (r6) — same expressions/order, bit-identical
    ea = embeddings.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    eb = embeddings.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    verified = (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                COS_DECIMALS,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    return verified


# ---- LSH (random hyperplane) -------------------------------------------------

# 16 hyperplanes -> 8 bands x 2 bits. Band width trades pruning for recall:
# wider bands prune more but miss weakly-similar neighbors. The test
# embeddings have weak separation (max cos ~0.4), so narrow bands are needed
# for recall >= 0.9; on well-clustered data raise BITS_PER_BAND to 4+ for
# much stronger pruning.
N_PLANES = 16
N_BANDS = 8
BITS_PER_BAND = N_PLANES // N_BANDS
LSH_SEED = 42


def _hyperplanes(dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy RNG state — pure
    hash-derived, reproducible everywhere)."""
    import hashlib

    planes = []
    for p in range(N_PLANES):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{LSH_SEED}:{p}:{d}".encode()).hexdigest()
            row.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_signatures(
    embeddings: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, band, key): BITS_PER_BAND-wide band keys of the 16-bit
    hyperplane sign signature. Plane dot products are column expressions over
    literal arrays (JVM-side, no UDF)."""
    planes = _hyperplanes(dim)
    bits = [
        F.when(_dot(F.col(vec_col), F.array(*[F.lit(v) for v in row])) > 0, 1).otherwise(0)
        for row in planes
    ]
    sig = sum((b * (2**i) for i, b in enumerate(bits)), F.lit(0))
    out = embeddings.select(F.col(id_col), sig.alias("sig"))
    mask = (1 << BITS_PER_BAND) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(bnd).alias("band"),
                F.shiftright(F.col("sig"), bnd * BITS_PER_BAND)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for bnd in range(N_BANDS)
        ]
    )
    return out.select(id_col, F.explode(bands).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


# ---- IVF (inverted-file) ANN --------------------------------------------------

IVF_CENTROIDS = 16  # coarse-quantizer size (≈ sqrt(n) at scale)
IVF_NPROBE = 4      # centroid lists scanned per query


def centroid_table(
    embeddings: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The deterministic coarse quantizer, SINGLE source of truth:
    (list_id, cvec) where centroid c = the corpus vector with the c-th
    smallest id. Every IVF surface (one-shot assignment/query, persisted
    index build) derives its centroids from here — the persisted index's
    oracle-identicality depends on all paths quantizing identically."""
    cents = (
        embeddings.orderBy(F.asc(id_col)).limit(n_centroids)
        .select(F.col(id_col).alias("cent_of"), F.col(vec_col).alias("cvec"))
    )
    return cents.select(
        F.row_number().over(Window.orderBy(F.asc("cent_of"))).alias("list_id"), "cvec"
    )


def ivf_assignments(
    embeddings: DataFrame,
    dim: int,
    n_centroids: int = IVF_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF build: (vec_id, list_id) — each vector assigned to its
    nearest-cosine centroid.

    The coarse quantizer is deterministic: centroid c = the corpus vector
    with the c-th smallest id (a data-dependent, reproducible sample — no
    k-means RNG), broadcast as literals. Assignment is one scan x C
    centroid dot products (C ≈ sqrt(n) at scale; the standard IVF build
    cost), expressed as a window argmax so Catalyst fuses it into the scan.
    At 100 TB the output is written ``partitionBy(list_id)`` so query-time
    nprobe pruning is directory pruning — the same shape as the term-bucket
    and sector prunes.
    """
    # the quantizer is the IVF build's hot loop: one scan x C centroids.
    # The vector norm folds ONCE per row (not once per (row, centroid)) and
    # the centroid norm once per centroid on the broadcast side (r6) —
    # same expressions, same product order, bit-identical assignment.
    cents = centroid_table(embeddings, n_centroids, id_col, vec_col).withColumn(
        "cnorm", _norm(F.col("cvec"))
    )
    scored = (
        embeddings.withColumn("_vnorm", _norm(F.col(vec_col)))
        .crossJoin(F.broadcast(cents))
        .select(
            id_col,
            "list_id",
            (
                _dot(F.col(vec_col), F.col("cvec"))
                / (F.col("_vnorm") * F.col("cnorm"))
            ).alias("ccos"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("list_id"))
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select(id_col, "list_id")
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    dim: int,
    k: int = 5,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k, IVF-Flat: scan only the ``n_probe`` centroid lists nearest
    to each query vector, exact cosine rerank inside them. Deterministic end
    to end (quantizer above), so the DuckDB oracle hash-matches; recall vs
    brute force measured in tests like the LSH variant."""
    assign = ivf_assignments(embeddings, dim, n_centroids, id_col, vec_col)
    tagged = embeddings.join(assign, id_col)
    probes = embeddings.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pvec")
    )
    cents = centroid_table(embeddings, n_centroids, id_col, vec_col)
    pscore = probes.crossJoin(F.broadcast(cents)).select(
        "probe_id",
        "pvec",
        "list_id",
        (
            _dot(F.col("pvec"), F.col("cvec"))
            / (_norm(F.col("pvec")) * _norm(F.col("cvec")))
        ).alias("ccos"),
    )
    wp = Window.partitionBy("probe_id").orderBy(F.desc("ccos"), F.asc("list_id"))
    plists = (
        pscore.withColumn("crank", F.row_number().over(wp))
        .filter(F.col("crank") <= n_probe)
        .select("probe_id", "pvec", "list_id")
    )
    cand = tagged.withColumn("_vnorm", _norm(F.col(vec_col))).join(
        F.broadcast(plists.withColumn("pnorm", _norm(F.col("pvec")))), "list_id"
    ).filter(F.col(id_col) != F.col("probe_id"))
    scored = cand.select(
        "probe_id",
        id_col,
        F.round(
            _dot(F.col(vec_col), F.col("pvec"))
            / (F.col("_vnorm") * F.col("pnorm")),
            COS_DECIMALS,
        ).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", F.col("rank").cast("int").alias("rank"), id_col, "cos")
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: LSH-bucket candidates (any shared band), exact re-rank.

    At scale this replaces the full-table scan with a band-bucket equi-join
    (the partition-pruning pattern); recall measured vs :func:`cosine_topk`.
    """
    sig = lsh_signatures(embeddings, dim, id_col, vec_col)
    psig = sig.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"), "band", "key"
    )
    cand = (
        sig.join(F.broadcast(psig), ["band", "key"])
        .filter(F.col(id_col) != F.col("probe_id"))
        .select("probe_id", id_col)
        .distinct()
    )
    probes = (
        embeddings.filter(F.col(id_col).isin(probe_ids))
        .select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pvec"))
        .withColumn("pnorm", _norm(F.col("pvec")))
    )
    scored = (
        cand.join(embeddings.withColumn("_vnorm", _norm(F.col(vec_col))), id_col)
        .join(F.broadcast(probes), "probe_id")
        .select(
            "probe_id",
            id_col,
            F.round(
                _dot(F.col(vec_col), F.col("pvec"))
                / (F.col("_vnorm") * F.col("pnorm")),
                COS_DECIMALS,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", F.col("rank").cast("int").alias("rank"), id_col, "cos")
    )
