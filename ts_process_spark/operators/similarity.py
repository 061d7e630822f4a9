"""Embedding similarity search: brute-force cosine top-k and an
LSH-bucketed approximate path.

Scale notes:
- Brute-force is the correctness baseline: broadcast the (small) query
  set against the corpus — one scan, no shuffle of the corpus side; the
  dot product is `F.aggregate`/`F.zip_with` (JVM, codegen), not a UDF.
- The sign-random-projection (SRP/SimHash-for-vectors) path buckets
  vectors by the sign pattern of dot products with seeded Rademacher
  (±1) hyperplanes; candidates only join within a bucket.  Hyperplanes
  are deterministic literals (seeded NumPy), so results are
  reproducible and the bucket assignment is SQL-expressible for the
  oracle.
- Quantized scoring: embeddings are float32; both engines compute the
  score from int64(round(x*1e6)) so cross-engine float noise is zero.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantized(col: Column) -> Column:
    """array<float> → array<long> at 1e-6 resolution (exact in both
    Spark and DuckDB: float32→double is exact, round is shared).

    Domain bound for the cross-engine equivalence: DuckDB's
    list_dot_product accumulates in DOUBLE, so quantized dots must stay
    ≤ 2^53 — i.e. component magnitudes ≲ 11 for 64-dim vectors
    (|x|·1e6 squared ×64 < 9e15).  Normalized/near-normalized embeddings
    (the fixture and any cosine use case) sit orders of magnitude below
    the bound; Spark's int64 fold itself is exact far beyond it.

    r9 note: an unrolled codegen variant (64 per-element round/cast
    expressions behind a size guard) was measured and REVERTED — the
    quantization expression is inlined into several plan sites per ANN
    query tree, and the ~400-node unrolled form cost more in Catalyst
    analysis/optimization per run than the interpreted HOF costs in
    execution (sf0.1 emb_ivf_ann: 0.52 s with this HOF form vs 1.1 s
    unrolled; sf1.0 within noise).  The per-PAIR dot stays unrolled
    (dot_long_fast) — that one runs O(pairs) times, this one O(n)."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * 1000000).cast("long")
    )


EMB_DIM = 64  # engine-wide embedding dimensionality: the SRP planes are
# seeded at 64 and quantized()'s DuckDB domain bound assumes it — the
# unrolled dot below keys its codegen fast path on this width


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("double"), lambda s, v: s + v
    )


def _balanced_sum(terms: list[Column]) -> Column:
    """Pairwise (tournament) addition — O(log n) expression depth so the
    64-term unrolled dot stays well inside codegen limits.  Integer
    addition is associative, so the result is bit-identical to the
    left-fold the HOF form computes."""
    while len(terms) > 1:
        nxt = [a + b for a, b in zip(terms[0::2], terms[1::2])]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def dot_long(a: Column, b: Column) -> Column:
    """Exact int64 dot product — general (HOF) form.  References each
    operand expression ONCE, so it is safe for operands that are
    themselves expensive expressions (``quantized(...)``) even when the
    optimizer collapses the projection into the scan."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, v: s + v
    )


def dot_long_fast(a: Column, b: Column) -> Column:
    """Exact int64 dot product — per-PAIR hot-path form (r9, guide
    §4.1).  The ``zip_with``+``aggregate`` HOF pair is CodegenFallback:
    interpreted per element with a boxed intermediate array per call,
    and it sits inside every per-pair scoring loop (SemDeDup's
    within-cell O(n²/cells) stage, kNN/SRP/IVF candidate scoring).
    For the engine-wide EMB_DIM width this unrolls into a whole-stage-
    codegen balanced sum of ``element_at`` products (primitive long
    arithmetic, no allocation); any other width falls back to the HOF
    form via a runtime size guard — which also keeps ANSI-mode
    element_at in bounds — so the value is identical for every input
    (integer addition is associative): every oracle-checked cosine is
    bit-for-bit unchanged.

    CALLER CONTRACT: operands must be materialized attributes (join /
    exchange / aggregate outputs), never in-projection expressions —
    the unrolled form references ``a``/``b`` once per element, and
    Spark's scan-adjacent project collapsing would re-evaluate an
    inline ``quantized(...)`` operand per element (measured: 133 copies
    of the transform in cosine_base's plan, a 30× regression).  Every
    cosine_qn call site scores pairs AFTER a join, where both sides are
    attributes, which is why cosine_qn uses this form."""
    hof = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, v: s + v
    )
    fast = _balanced_sum(
        [F.element_at(a, i) * F.element_at(b, i) for i in range(1, EMB_DIM + 1)]
    )
    return F.when(
        (F.size(a) == EMB_DIM) & (F.size(b) == EMB_DIM), fast
    ).otherwise(hof)


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine over quantized vectors — identical doubles on any engine
    (int dot / sqrt(int ssq) products)."""
    return dot_long(a, b) / (
        F.sqrt(dot_long(a, a).cast("double")) * F.sqrt(dot_long(b, b).cast("double"))
    )


def cosine_qn(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine_q with PRECOMPUTED squared norms: at scale the self-dot is
    O(pairs·dim) recomputed per candidate pair, vs O(vectors·dim) done
    once in cosine_base — same doubles bit-for-bit (the norm column is
    the identical int64 dot the inline form evaluated).  Uses the
    unrolled codegen dot: every call site scores pairs after a join,
    where ``a``/``b`` are materialized attributes (dot_long_fast's
    caller contract)."""
    return dot_long_fast(a, b) / (
        F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))
    )



def cosine_base(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, quantized vector) with ZERO-NORM vectors excluded: a zero
    embedding has no direction, and under ANSI mode its cosine is a
    DIVIDE_BY_ZERO that would kill the whole job for one poisoned row
    (found by the adversarial embeddings fixture).  Every cosine-scored
    op builds on this; the DuckDB oracles carry the same predicate.

    Also carries nq = ‖q‖² computed ONCE per vector (cosine_qn) and
    spreads a too-few-partition scan across the cluster first — a
    single-file corpus otherwise runs the whole pairwise-scoring stage
    on one task (dedup._ensure_parallelism, same rationale)."""
    from ts_process_spark.operators.dedup import _ensure_parallelism

    # nq via a single-reference fold: the optimizer collapses scan-
    # adjacent projects by INLINING aliases, so a form referencing ``q``
    # k times would re-evaluate the quantization k times per row; the
    # fold references it once (and the exact int64 sum of squares is
    # the same value dot_long computed)
    ssq = F.aggregate(
        F.col("q"), F.lit(0).cast("long"), lambda s, v: s + v * v
    )
    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("id"), quantized(F.col(vec_col)).alias("q")
    ).withColumn("nq", ssq)
    return base.where(F.col("nq") > 0)


def cosine_topk(
    df: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (default: the
    n_queries lowest ids).  Query side is broadcast; ranking is a
    per-query window with (score desc, id) tie-break."""
    from pyspark.sql import Window

    base = cosine_base(df, id_col, vec_col)
    if query_ids is not None:
        queries = base.where(F.col("id").isin(query_ids))
    else:
        queries = base.orderBy("id").limit(n_queries)
    queries = queries.select(
        F.col("id").alias("query_id"), F.col("q").alias("qv"),
        F.col("nq").alias("nqv"),
    )
    scored = base.join(F.broadcast(queries), F.col("id") != F.col("query_id")).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(
            cosine_qn(F.col("qv"), F.col("q"), F.col("nqv"), F.col("nq")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _ivf_cells(
    base: DataFrame, n_cells: int, codebook: "np.ndarray | None"
) -> DataFrame:
    """The coarse-quantizer centroid set: first-N corpus vectors by
    default, or a TRAINED (n_cells × dim) int64 array (pq_train_kmeans
    with m=1) as plan literals with synthetic cell ids 0..n_cells−1."""
    if codebook is None:
        return base.orderBy("id").limit(n_cells).select(
            F.col("id").alias("cell_id"), F.col("q").alias("cv"),
            F.col("nq").alias("ncv"),
        )
    rows = [
        (i, [int(v) for v in row]) for i, row in enumerate(codebook)
    ]
    return (
        base.sparkSession.createDataFrame(rows, "cell_id bigint, cv array<bigint>")
        .withColumn("ncv", dot_long(F.col("cv"), F.col("cv")))
        .where(F.col("ncv") > 0)
    )


def ivf_cell_assignments(
    df: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF coarse quantizer: the n_cells lowest-id vectors act as the
    (deterministic) codebook; every vector is assigned to the centroid
    with the highest quantized cosine (lowest cell id breaks ties).

    Scale shape: the codebook is tiny → broadcast nested-loop against
    it is O(n·n_cells) map-side work with NO shuffle of the vectors;
    the argmax is a per-id window over n_cells rows.  At 100 TB the
    codebook comes from sampled/distributed k-means (pass ``codebook``,
    e.g. pq_train_kmeans(df, m=1)); assignment — the expensive
    distributed step — has exactly this plan either way."""
    from pyspark.sql import Window

    base = cosine_base(df, id_col, vec_col)
    cells = _ivf_cells(base, n_cells, codebook)
    scored = base.join(F.broadcast(cells)).select(
        "id", "q", "nq", "cell_id",
        F.round(
            cosine_qn(F.col("q"), F.col("cv"), F.col("nq"), F.col("ncv")), 6
        ).alias("cc"),
    )
    w = Window.partitionBy("id").orderBy(F.col("cc").desc(), F.col("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "q", "nq", "cell_id")
    )


def ivf_ann_topk(
    df: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 2,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF approximate top-k: each query probes its nprobe best cells
    and brute-forces only vectors assigned there — the inverted-file
    pattern (candidate set ≈ nprobe/n_cells of the data).  Deterministic
    end to end (quantized cosine, id tie-breaks) → DuckDB-checkable."""
    from pyspark.sql import Window

    assigned = ivf_cell_assignments(df, n_cells, id_col, vec_col, codebook)
    base = cosine_base(df, id_col, vec_col)
    cells = _ivf_cells(base, n_cells, codebook)
    queries = base.orderBy("id").limit(n_queries).select(
        F.col("id").alias("query_id"), F.col("q").alias("qv"),
        F.col("nq").alias("nqv"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qc").desc(), F.col("cell_id")
    )
    probes = (
        queries.join(F.broadcast(cells))
        .select(
            "query_id", "qv", "nqv", "cell_id",
            F.round(
                cosine_qn(F.col("qv"), F.col("cv"), F.col("nqv"), F.col("ncv")),
                6,
            ).alias("qc"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qv", "nqv", "cell_id")
    )
    scored = probes.join(assigned, "cell_id").where(
        F.col("id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(
            cosine_qn(F.col("qv"), F.col("q"), F.col("nqv"), F.col("nq")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def rademacher_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic ±1 hyperplanes (sign random projection)."""
    rng = np.random.default_rng([seed, n_planes, dim])
    return rng.choice(np.array([-1, 1], dtype=np.int64), size=(n_planes, dim))


def srp_bucket(vec_q: Column, planes: np.ndarray) -> Column:
    """Bucket id = bit pattern of sign(<v, h_p>) over the hyperplanes.
    Integer dots of quantized vectors → exact, engine-independent."""
    bucket = F.lit(0).cast("long")
    for p, row in enumerate(planes):
        plane = F.array(*[F.lit(int(x)).cast("long") for x in row])
        bit = F.when(dot_long(vec_q, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, p)
    return bucket


def srp_bucket_assignments(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    planes = rademacher_hyperplanes(n_planes, 64, seed)
    # project the quantized vector ONCE, then bucket over the attribute:
    # inlining quantized(...) into srp_bucket would re-evaluate the
    # transform per plane per element under the unrolled dot (see
    # dot_long's caller contract)
    return df.select(
        F.col(id_col).alias("id"), quantized(F.col(vec_col)).alias("q")
    ).select("id", srp_bucket(F.col("q"), planes).alias("bucket"))


def srp_ann_topk(
    df: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an SRP bucket; scoring and
    ranking as in cosine_topk.  Recall < 1 by construction — the scale
    path trades it for an equi-join instead of a cross join."""
    from pyspark.sql import Window

    planes = rademacher_hyperplanes(n_planes, 64, seed)
    base = cosine_base(df, id_col, vec_col).withColumn(
        "bucket", srp_bucket(F.col("q"), planes)
    )
    a = base.alias("a")
    b = base.alias("b")
    scored = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("query_id"),
            F.col("b.id").alias("neighbor_id"),
            F.round(
                cosine_qn(F.col("a.q"), F.col("b.q"),
                          F.col("a.nq"), F.col("b.nq")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def centroids_by_label(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid in long form (label, dim, centroid): posexplode
    + sum of quantized components / count — exact int sums, one shuffle."""
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(quantized(F.col(vec_col))).alias("dim", "qv"),
    ).withColumn("dim", F.col("dim").cast("long"))
    # exact integer surrogates (sum of 1e-6-quantized components, count)
    # instead of a rounded mean: round() on an arbitrary ratio diverges
    # at representation boundaries across engines (adversarial fixture
    # hit one), and the consumer can always divide
    return ex.groupBy("label", "dim").agg(
        F.sum("qv").alias("sum_q_e6"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Pairs with quantized cosine ≥ threshold.

    DEFAULT is the multi-table SRP-blocked path (the 100-TB shape):
    each vector hashes into one bucket per table (``n_tables``
    independent sets of ``n_planes`` seeded hyperplanes), candidates are
    the distinct pairs sharing ANY (table, bucket), and only candidates
    are scored — an equi-join, never the O(n²) self-join that r1 shipped
    as the default.  Collision probability per table is
    (1 − θ/π)^n_planes, so recall rises with n_tables and approaches 1
    for true near-dups (θ→0); the recall-vs-exact metric at the fixture
    threshold is pinned in tests/test_training_ops.py.

    ``exact=True`` keeps the all-pairs form — the ground-truth oracle
    for those recall tests, deliberately not the default."""
    base = cosine_base(df, id_col, vec_col)
    if exact:
        a, b = base.alias("a"), base.alias("b")
        return (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.round(
                    cosine_qn(F.col("a.q"), F.col("b.q"),
                              F.col("a.nq"), F.col("b.nq")), 6
                ).alias("cosine"),
            )
            .where(F.col("cosine") >= threshold)
        )
    from ts_process_spark.operators.dedup import _bucket_pairs

    tables = [
        rademacher_hyperplanes(n_planes, 64, seed + t) for t in range(n_tables)
    ]
    bucketed = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        srp_bucket(F.col("q"), planes).alias("bucket"),
                    )
                    for t, planes in enumerate(tables)
                ]
            )
        ).alias("tb"),
    ).select("id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    cand = _bucket_pairs(bucketed, ["tbl", "bucket"])
    va = base.select(F.col("id").alias("id_a"), F.col("q").alias("qa"),
                     F.col("nq").alias("na"))
    vb = base.select(F.col("id").alias("id_b"), F.col("q").alias("qb"),
                     F.col("nq").alias("nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine_qn(F.col("qa"), F.col("qb"), F.col("na"), F.col("nb")),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------- product quantization


def _pq_codebook_row(base: DataFrame, n_codes: int) -> DataFrame:
    """ONE-row DataFrame carrying the deterministic PQ codebook (the
    n_codes lowest-id quantized vectors as array<array<long>>) — the
    single source the HOF encoders, the ADC lookup tables, and pq_train
    all derive from (one copy of the convention, like the codec batch
    twins)."""
    return (
        base.orderBy("id")
        .limit(n_codes)
        .agg(F.array_sort(F.collect_list(F.struct("id", "q"))).alias("cs"))
        .select(F.transform("cs", lambda s: s["q"]).alias("cws"))
    )


def _pq_codebook_row_lit(df: DataFrame, codebook: "np.ndarray") -> DataFrame:
    """The literal twin of _pq_codebook_row: a TRAINED (n_codes × dim)
    int64 codebook shipped as a one-row broadcastable DataFrame — the
    bytes ride in the plan, no scan, no action."""
    return df.sparkSession.createDataFrame(
        [([[int(v) for v in row] for row in codebook],)],
        "cws array<array<bigint>>",
    )


def _pq_subdist(ds: int):
    """Shared subspace squared-L2 builder: subdist(vec, c, j) between
    vec's j-th ds-dim slice and codeword c's — exact int64."""

    def subdist(vec: Column, c: int, j: int) -> Column:
        a = F.slice(vec, j * ds + 1, ds)
        b = F.slice(F.element_at(F.col("cws"), c + 1), j * ds + 1, ds)
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda s, v: s + v,
        )

    return subdist


def _pq_check(dim: int, m: int) -> int:
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    return dim // m


def _pq_subdists_np(Q: "np.ndarray", sub_cb: "np.ndarray") -> "np.ndarray":
    """THE shared exact-int64 subspace squared-L2 kernel: (B, dim) int64
    queries/corpus vs (n_codes, m, ds)-shaped codebook → (B, n_codes, m)
    distances — the single NumPy twin of the JVM _pq_subdist fold.  One
    copy on purpose: the arrow/HOF/training bit-parity pins assume every
    kernel computes identical numbers (review r5 #3)."""
    n_codes, m, ds = sub_cb.shape
    S = Q.reshape(len(Q), m, ds)
    diff = S[:, None, :, :] - sub_cb[None, :, :, :]
    return np.einsum("bcjk,bcjk->bcj", diff, diff)


def _pq_lut_np(
    codebook: "np.ndarray", Q: "np.ndarray", m: int
) -> "np.ndarray":
    """Per-query ADC lookup tables, exact int64: lut[q][j][c] = squared
    L2 between query q's j-th sub-vector and codeword c's — identical
    numbers to the JVM _pq_subdist fold (integer arithmetic both
    sides)."""
    n_codes, dim = codebook.shape
    d = _pq_subdists_np(Q, codebook.reshape(n_codes, m, dim // m))
    return d.transpose(0, 2, 1)  # (nq, m, n_codes)


def _round6(x: float):
    """Spark's round(double, 6): BigDecimal.valueOf(d).setScale(6,
    HALF_UP) rounds the double's decimal string repr half-up; Python's
    Decimal(repr(float)) walks the same path.  DOMAIN BOUND (review r5
    #4): Java Double.toString is only shortest-repr from JDK 19 — on
    the JDK 17 this container runs, Java and Python reprs diverge for
    magnitudes ≥ ~2^53 (measured 611/200k at large magnitude, 0/500k in
    [-1, 1]).  Cosines live in [-1, 1], far inside the safe region;
    the assert keeps any future caller honest."""
    from decimal import ROUND_HALF_UP, Decimal

    x = float(x)
    if not abs(x) < 2.0**53:  # ValueError, not assert: survives -O
        raise ValueError(f"_round6 repr-parity bound exceeded: {x}")
    return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def _probe_cells_np(
    Q: "np.ndarray", cids: "np.ndarray", C: "np.ndarray", nprobe: int
) -> list[list[int]]:
    """Top-``nprobe`` cells per query row, ranked by round(cosine, 6)
    DESC with lowest-cell-id ties — the ivf_cell_assignments /
    probe-window JVM semantics replayed exactly (exact int64 dots,
    correctly-rounded IEEE sqrt/divide, HALF_UP rounding).

    Vectorized (review r5 #2): floor(y + 0.5) on the double equals the
    JVM's decimal-repr HALF_UP everywhere except within float error of
    a .5 grid boundary, so the hot path is one NumPy pass and only rows
    holding a boundary-ambiguous cosine (|y+0.5 − nearest int| < 1e-6;
    repr-vs-double discrepancies are ~1e-10 here) replay through the
    exact Decimal comparator."""
    order = np.argsort(cids)
    cids_s = np.ascontiguousarray(np.asarray(cids)[order])
    C_s = np.ascontiguousarray(np.asarray(C)[order])
    dots = (Q @ C_s.T).astype(np.float64)  # exact: |dot| << 2^53
    nrm_q = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))
    nrm_c = np.sqrt((C_s * C_s).sum(axis=1).astype(np.float64))
    cos = dots / (nrm_q[:, None] * nrm_c[None, :])
    y = cos * 1e6 + 0.5
    qa = np.floor(y).astype(np.int64)  # == HALF_UP off-boundary
    amb_rows = np.nonzero((np.abs(y - np.round(y)) < 1e-6).any(axis=1))[0]
    k = len(cids_s)
    # composite key: max rounded cosine first, lowest cell id (= lowest
    # sorted index) on ties
    key = qa * np.int64(k + 1) - np.arange(k, dtype=np.int64)[None, :]
    if nprobe == 1:
        win = key.argmax(axis=1)
        out = [[int(cids_s[w])] for w in win]
    else:
        ordk = np.argsort(-key, axis=1, kind="stable")[:, :nprobe]
        out = [[int(cids_s[j]) for j in row] for row in ordk]
    for r in amb_rows:  # exact replay for boundary rows only
        ranked = sorted(
            ((_round6(cos[r, i]), int(cids_s[i])) for i in range(k)),
            key=lambda t: (-t[0], t[1]),
        )
        out[r] = [c for _, c in ranked[:nprobe]]
    return out


def _pq_adist(m: int) -> Column:
    """Σ_j lut[j][codes[j]] — the ADC distance (over lut/codes cols).
    Unrolled over the m static subspaces (r9): the HOF fold was
    interpreted per pair; ``lut``/``codes`` are post-join attributes and
    every index is in bounds by construction (codes ∈ [0, n_codes) from
    the encoder argmin), so the sum is pure codegen lookups — the same
    exact int64 terms in the same count, bit-identical."""
    return _balanced_sum(
        [
            F.element_at(
                F.element_at(F.col("lut"), j + 1),
                (F.element_at(F.col("codes"), j + 1) + 1).cast("int"),
            )
            for j in range(m)
        ]
    )


def pq_encode(
    df: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: "np.ndarray | None" = None,
) -> DataFrame:
    """Product-quantization encoder (Jégou et al., TPAMI 2011): the
    vector splits into ``m`` subspaces of dim/m dims; each sub-vector is
    replaced by the id of its nearest codeword (squared-L2 over the
    QUANTIZED ints — exact int64, ties → lowest code).  Codebook =
    sub-vectors of the ``n_codes`` lowest-id vectors, the same
    deterministic convention as the IVF coarse quantizer (at real scale
    both would come from sampled k-means; encode — the distributed
    step — has exactly this plan).

    Scale shape: codebook broadcast as ONE aggregated row; encoding is
    pure map-side array arithmetic in the scan projection — the corpus
    never shuffles, and the stored footprint per vector drops from
    dim floats to m small ints (the memory-compression story that makes
    100 TB ANN state fit a cluster).

    ``codebook``: a trained (n_codes × dim) int64 array (pq_train_kmeans)
    replaces the first-N convention; same plan, literal instead of scan.

    Output: (id, q, nq, codes array<int> length m)."""
    if codebook is not None:
        n_codes, dim = codebook.shape
    ds = _pq_check(dim, m)
    base = cosine_base(df, id_col, vec_col)
    subdist = _pq_subdist(ds)

    def code(j: int) -> Column:
        darr = F.array(*[subdist(F.col("q"), c, j) for c in range(n_codes)])
        return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")

    cbrow = (
        _pq_codebook_row(base, n_codes)
        if codebook is None
        else _pq_codebook_row_lit(df, codebook)
    )
    return (
        base.crossJoin(F.broadcast(cbrow))
        .select(
            "id", "q", "nq",
            F.array(*[code(j) for j in range(m)]).alias("codes"),
        )
    )


def pq_ann_topk(
    df: DataFrame,
    k: int = 3,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: "np.ndarray | None" = None,
    arrow_encode: bool = False,
) -> DataFrame:
    """Approximate top-k nearest neighbors (squared L2, ascending) via
    asymmetric distance computation over PQ codes: each query builds an
    m×n_codes lookup table of exact sub-distances to every codeword,
    and a candidate's distance is m table lookups summed — never a
    dim-length dot against the raw vector.  Queries (+LUTs) broadcast;
    the corpus side carries only the m-int codes, so the scored stream
    is O(corpus × queries) tiny rows.  At real scale this composes with
    ivf_cell_assignments (probe nprobe cells, then ADC-score only those
    cells' codes — ivfpq_ann_topk).  Ties → lowest neighbor id; exact
    for query vectors that are themselves codewords.  ``codebook``
    swaps the first-N convention for a trained array (pq_train_kmeans)
    in BOTH the encode stage and the ADC lookup tables.

    ``arrow_encode`` is the PRODUCTION throughput path: materialize the
    codebook once (pq_train — the FAISS train/add split), encode the
    corpus with the vectorized Arrow kernel instead of interpreted
    array HOFs (bit-identical codes, pinned), and compute the per-query
    ADC lookup tables DRIVER-SIDE in exact int64 NumPy, shipped as plan
    literals — query-side LUT prep is client work in every real ANN
    system, and the literal form also spares Catalyst the m×n_codes
    nested-HOF expression tree (measured: plan analysis of that tree
    dominated the fresh-query latency, not execution)."""
    if codebook is not None:
        n_codes, dim = codebook.shape
    ds = _pq_check(dim, m)
    from pyspark.sql import Window

    base = cosine_base(df, id_col, vec_col)
    if arrow_encode:
        cb = codebook if codebook is not None else pq_train(
            df, n_codes, id_col, vec_col
        )
        n_codes, dim = cb.shape
        enc = pq_encode_arrow(df, cb, m, id_col, vec_col)
        qrows = sorted(
            base.orderBy("id").limit(n_queries).select("id", "q").collect(),
            key=lambda r: r["id"],
        )
        Qm = np.array([list(r["q"]) for r in qrows], dtype=np.int64)
        luts = _pq_lut_np(cb, Qm, m)
        queries = df.sparkSession.createDataFrame(
            [
                (int(r["id"]), [[int(x) for x in row] for row in lut])
                for r, lut in zip(qrows, luts)
            ],
            "query_id bigint, lut array<array<bigint>>",
        )
    else:
        enc = pq_encode(df, m, n_codes, dim, id_col, vec_col, codebook=codebook)
        cbrow = (
            _pq_codebook_row(base, n_codes)
            if codebook is None
            else _pq_codebook_row_lit(df, codebook)
        )
        subdist = _pq_subdist(ds)
        queries = (
            base.orderBy("id")
            .limit(n_queries)
            .crossJoin(F.broadcast(cbrow))
            .select(
                F.col("id").alias("query_id"),
                F.array(*[
                    F.array(*[
                        subdist(F.col("q"), c, j) for c in range(n_codes)
                    ])
                    for j in range(m)
                ]).alias("lut"),
            )
        )
    scored = enc.join(
        F.broadcast(queries), F.col("id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        _pq_adist(m).alias("approx_d2"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "approx_d2")
    )


def ivfpq_ann_topk(
    df: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pq_codebook: "np.ndarray | None" = None,
    ivf_codebook: "np.ndarray | None" = None,
    arrow_encode: bool = False,
) -> DataFrame:
    """IVF×PQ — the production ANN composition (FAISS IVFPQ shape):
    the coarse quantizer prunes to each query's ``nprobe`` best cells,
    and candidates in those cells are scored by PQ asymmetric-distance
    lookups instead of full-dimension arithmetic.

    Scale shape: ONE map-side pass (two broadcast codebooks) attaches
    (cell_id, codes) to every vector — the corpus never shuffles and
    its search-time footprint is one small int + m codes per vector;
    each query's ADC lookup table is computed ONCE and joined onto its
    probe pairs (it is independent of cell_id — computing it per probed
    cell was nprobe× wasted compute and broadcast, review finding); the
    scored stream is O(corpus × queries × nprobe/n_cells) tiny rows
    into one per-query top-k window.  Deterministic end to end
    (quantized arithmetic, id tie-breaks).

    Engine note: the HOF encode arithmetic runs through Spark's
    higher-order array functions, which are NOT whole-stage-codegen'd
    (interpreted per element) — it is the DuckDB-replayable oracle
    twin.  ``arrow_encode=True`` is the PRODUCTION path: pq_train /
    ivf_train_cells materialize both codebooks once and
    ivfpq_attach_arrow runs the single vectorized corpus pass —
    bit-identical (cell_id, codes) to the HOF plan (pinned by
    test_ivfpq_arrow_matches_hof), identical join/topk scaffolding.

    ``pq_codebook`` / ``ivf_codebook`` swap either quantizer's first-N
    convention for trained arrays (pq_train_kmeans; m=1 for the coarse
    one) — plan literals, same shapes."""
    if pq_codebook is not None:
        n_codes, dim = pq_codebook.shape
    ds = _pq_check(dim, m)
    from pyspark.sql import Window

    base = cosine_base(df, id_col, vec_col)
    if arrow_encode:
        pcb = pq_codebook if pq_codebook is not None else pq_train(
            df, n_codes, id_col, vec_col
        )
        n_codes, dim = pcb.shape
        if ivf_codebook is not None:
            # keep the ORIGINAL row index as cell_id (mirrors _ivf_cells:
            # enumerate first, drop zero-norm centroids after)
            keep = (ivf_codebook * ivf_codebook).sum(axis=1) > 0
            civ = ivf_codebook[keep]
            cid = np.nonzero(keep)[0].astype(np.int64)
        else:
            cid, civ = ivf_train_cells(df, n_cells, id_col, vec_col)
        corpus = ivfpq_attach_arrow(df, pcb, cid, civ, m, id_col, vec_col)
        # query-side prep is driver work (the FAISS client shape): the
        # probe ranking and ADC LUTs come from exact NumPy replays of
        # the JVM semantics and ship as one tiny literal DataFrame —
        # no m×n_codes HOF tree for Catalyst to chew per query
        qrows = sorted(
            base.orderBy("id").limit(n_queries).select("id", "q").collect(),
            key=lambda r: r["id"],
        )
        Qm = np.array([list(r["q"]) for r in qrows], dtype=np.int64)
        probe_lists = _probe_cells_np(Qm, cid, civ, nprobe)
        luts = _pq_lut_np(pcb, Qm, m)
        probe_lut = df.sparkSession.createDataFrame(
            [
                (int(r["id"]), int(c), [[int(x) for x in row] for row in lut])
                for r, cells_q, lut in zip(qrows, probe_lists, luts)
                for c in cells_q
            ],
            "query_id bigint, cell_id bigint, lut array<array<bigint>>",
        )
    else:
        assigned = ivf_cell_assignments(
            df, n_cells, id_col, vec_col, ivf_codebook
        )
        cbrow = (
            _pq_codebook_row(base, n_codes)
            if pq_codebook is None
            else _pq_codebook_row_lit(df, pq_codebook)
        )
        subdist = _pq_subdist(ds)

        def code(j: int) -> Column:
            darr = F.array(
                *[subdist(F.col("q"), c, j) for c in range(n_codes)]
            )
            return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")

        corpus = assigned.crossJoin(F.broadcast(cbrow)).select(
            "id", "cell_id",
            F.array(*[code(j) for j in range(m)]).alias("codes"),
        )
        cells = _ivf_cells(base, n_cells, ivf_codebook)
        queries = base.orderBy("id").limit(n_queries).select(
            F.col("id").alias("query_id"), F.col("q").alias("qv"),
            F.col("nq").alias("nqv"),
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("qc").desc(), F.col("cell_id")
        )
        probes = (
            queries.join(F.broadcast(cells))
            .select(
                "query_id", "cell_id",
                F.round(
                    cosine_qn(
                        F.col("qv"), F.col("cv"), F.col("nqv"), F.col("ncv")
                    ),
                    6,
                ).alias("qc"),
            )
            .withColumn("rn", F.row_number().over(wq))
            .where(F.col("rn") <= nprobe)
            .select("query_id", "cell_id")
        )
        qlut = (
            queries.crossJoin(F.broadcast(cbrow))
            .select(
                "query_id",
                F.array(*[
                    F.array(*[
                        subdist(F.col("qv"), c, j) for c in range(n_codes)
                    ])
                    for j in range(m)
                ]).alias("lut"),
            )
        )
        probe_lut = probes.join(F.broadcast(qlut), "query_id")
    scored = corpus.join(F.broadcast(probe_lut), "cell_id").where(
        F.col("id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        _pq_adist(m).alias("approx_d2"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "approx_d2")
    )


def pq_train(
    df: DataFrame,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "np.ndarray":
    """ACTION (the one deliberate driver round-trip in this module):
    materialize the deterministic PQ codebook as an (n_codes × dim)
    int64 array — the train/add split every PQ system has (FAISS
    train() is a separate job too); the returned array ships to
    executors inside the task closure, bytes not rows."""
    base = cosine_base(df, id_col, vec_col)
    rows = base.orderBy("id").limit(n_codes).select("id", "q").collect()
    rows = sorted(rows, key=lambda r: r["id"])
    return np.array([list(r["q"]) for r in rows], dtype=np.int64)


def _div_round_half_away(s: "np.ndarray", n: int) -> "np.ndarray":
    """Exact int64 round-half-away-from-zero of s/n (n > 0) — the
    centroid update stays on the quantized grid with NO float ops, so
    training is bit-reproducible on any engine/partitioning."""
    a = np.abs(s)
    q = (2 * a + n) // (2 * n)
    return np.where(s < 0, -q, q).astype(np.int64)


def pq_train_kmeans(
    df: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "np.ndarray":
    """Distributed per-subspace Lloyd k-means over the quantized
    vectors — the trained replacement for pq_train's first-N
    convention (VERDICT r4 #2; FAISS trains PQ exactly this way:
    independent k-means per subspace, then the same encode/ADC).

    Determinism (a hard engine requirement): init is the deterministic
    first-N codebook; the assignment step is the exact int64 argmin the
    encoders use (first-min = lowest code ties); the update step
    accumulates exact int64 per-(subspace, code) sums — associative and
    commutative, so ANY partitioning yields the same totals — and the
    new centroid is an integer round-half-away division.  No float
    enters at any point, so two runs (or two cluster sizes) produce
    bit-identical codebooks.

    Scale shape per iteration: one vectorized Arrow pass over the
    corpus (the pq_encode_arrow kernel + per-BATCH partial sums — each
    task emits ≤ m·n_codes rows, a map-side combine in NumPy), one tiny
    hash-aggregate of those partials, one ≤ m·n_codes-row collect (the
    k-means driver sync every implementation has).  The corpus never
    shuffles; traffic per iteration is O(tasks · m · n_codes · ds).

    Returns the (n_codes × dim) int64 codebook whose row c is the
    concatenation of each subspace's c-th centroid — the layout
    pq_encode / pq_encode_arrow / the ADC LUTs already consume."""
    import pandas as pd
    from pyspark.sql import types as T

    cb = pq_train(df, n_codes, id_col, vec_col)
    n_codes, dim = cb.shape
    ds = _pq_check(dim, m)
    base = cosine_base(df, id_col, vec_col).select("id", "q")
    schema = T.StructType(
        [
            T.StructField("j", T.IntegerType(), False),
            T.StructField("c", T.IntegerType(), False),
            T.StructField("n", T.LongType(), False),
            T.StructField("s", T.ArrayType(T.LongType()), False),
        ]
    )
    sum_cols = [
        F.sum(F.element_at("s", d + 1)).alias(f"s_{d}") for d in range(ds)
    ]
    for _ in range(n_iters):
        sub_cb = np.ascontiguousarray(cb.reshape(n_codes, m, ds))

        def part(batches, _cb=sub_cb):
            cnt = np.zeros((m, n_codes), dtype=np.int64)
            sums = np.zeros((m, n_codes, ds), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                Q = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["q"]])
                S = Q.reshape(len(pdf), m, ds)
                codes = _pq_subdists_np(Q, _cb).argmin(axis=1)  # (B, m)
                for j in range(m):
                    np.add.at(cnt[j], codes[:, j], 1)
                    np.add.at(sums[j], codes[:, j], S[:, j, :])
            js, cs = np.nonzero(cnt)
            if not len(js):
                return
            yield pd.DataFrame(
                {
                    "j": js.astype(np.int32),
                    "c": cs.astype(np.int32),
                    "n": cnt[js, cs],
                    "s": [list(sums[j, c]) for j, c in zip(js, cs)],
                }
            )

        agg = (
            base.mapInPandas(part, schema=schema)
            .groupBy("j", "c")
            .agg(F.sum("n").alias("n"), *sum_cols)
        )
        new = cb.reshape(n_codes, m, ds).copy()
        for r in agg.collect():  # ≤ m·n_codes rows — the Lloyd sync
            s = np.array([r[f"s_{d}"] for d in range(ds)], dtype=np.int64)
            new[r["c"], r["j"], :] = _div_round_half_away(s, r["n"])
        # empty cells keep their previous centroid
        cb = new.reshape(n_codes, dim)
    return cb


def pq_encode_arrow(
    df: DataFrame,
    codebook: "np.ndarray",
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput-path PQ encoder: one vectorized NumPy kernel per
    Arrow batch instead of interpreted array HOFs — BIT-IDENTICAL codes
    to pq_encode.

    Exactness and parity by construction: the input rides through
    cosine_base, so QUANTIZATION HAPPENS IN THE JVM with the exact same
    F.round the HOF path uses (an earlier NumPy HALF_UP emulation could
    differ within ulp/2 of a .5 boundary — review finding), zero-norm
    and NULL vectors are excluded by the same predicate, and the
    single-file-corpus parallelism floor applies.  The kernel then only
    reshapes int64s and argmins — no float rounding anywhere."""
    import pandas as pd
    from pyspark.sql import types as T

    n_codes, dim = codebook.shape
    ds = _pq_check(dim, m)
    sub_cb = np.ascontiguousarray(codebook.reshape(n_codes, m, ds))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("codes", T.ArrayType(T.IntegerType()), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["q"]])
            d = _pq_subdists_np(Q, sub_cb)  # (B, n_codes, m)
            codes = d.argmin(axis=1).astype(np.int32)  # first-min ties
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "codes": [list(c) for c in codes],
                }
            )

    return cosine_base(df, id_col, vec_col).select("id", "q").mapInPandas(
        run, schema=schema
    )


def ivf_train_cells(
    df: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "tuple[np.ndarray, np.ndarray]":
    """ACTION twin of pq_train for the coarse quantizer: materialize the
    deterministic first-N cell centroids as (cell_ids, vectors) int64
    arrays — the train/add split the Arrow attach kernel consumes."""
    base = cosine_base(df, id_col, vec_col)
    rows = base.orderBy("id").limit(n_cells).select("id", "q").collect()
    rows = sorted(rows, key=lambda r: r["id"])
    return (
        np.array([r["id"] for r in rows], dtype=np.int64),
        np.array([list(r["q"]) for r in rows], dtype=np.int64),
    )


def ivfpq_attach_arrow(
    df: DataFrame,
    pq_codebook: "np.ndarray",
    cell_ids: "np.ndarray",
    cell_vecs: "np.ndarray",
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production IVF×PQ corpus pass: ONE vectorized Arrow kernel
    attaches (cell_id, codes) to every vector — the map-side step whose
    interpreted-HOF twin was the slowest bench row (VERDICT r4 perf-weak).

    Bit-parity with the HOF path, piece by piece:
    - PQ codes: the pq_encode_arrow kernel (int64 argmin, first-min
      ties) — pinned bit-identical.
    - cell assignment: the JVM ranks cells by round(cosine, 6) DESC with
      lowest-cell-id ties, where Spark's round(double, 6) is
      BigDecimal.valueOf(d).setScale(6, HALF_UP) — i.e. round the
      SHORTEST decimal repr half-up.  The kernel replays exactly that:
      the cosine doubles themselves are bit-identical (exact int64 dot /
      correctly-rounded IEEE sqrt/divide in both runtimes), and
      Decimal(repr(float)).quantize(1e-6, ROUND_HALF_UP) rounds the same
      shortest repr the same way.  No float-rounding emulation gap
      (the r4 lesson: NumPy HALF_UP emulation diverges within ulp/2 of
      .5 — going through the decimal string does not)."""
    import pandas as pd
    from pyspark.sql import types as T

    n_codes, dim = pq_codebook.shape
    ds = _pq_check(dim, m)
    sub_cb = np.ascontiguousarray(pq_codebook.reshape(n_codes, m, ds))
    # no pre-sort here: _probe_cells_np orders cells itself (one source
    # of the ranking convention; the per-batch argsort of n_cells ids
    # is trivial next to the distance math)
    cids = np.asarray(cell_ids, dtype=np.int64)
    C = np.asarray(cell_vecs, dtype=np.int64)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("cell_id", T.LongType(), False),
            T.StructField("codes", T.ArrayType(T.IntegerType()), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["q"]])
            codes = _pq_subdists_np(Q, sub_cb).argmin(axis=1).astype(np.int32)
            cells = np.array(
                [a[0] for a in _probe_cells_np(Q, cids, C, 1)], dtype=np.int64
            )
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "cell_id": cells,
                    "codes": [list(c) for c in codes],
                }
            )

    return cosine_base(df, id_col, vec_col).select("id", "q").mapInPandas(
        run, schema=schema
    )


# --------------------------------------------------- semantic dedup


def _semdedup_pairs_np(
    Q: "np.ndarray", threshold: float
) -> "tuple[np.ndarray, np.ndarray]":
    """Within-cell lower-id pairwise reduction, vectorized — the exact
    NumPy replay of the JVM pair plan's arithmetic for rows sorted by
    ascending id.  Returns (n_dup int64, qa_max int64 micro-units with
    -1 = no lower-id mate).

    Bit-parity, piece by piece (the ivfpq_attach_arrow discipline):
    - dot / norms: exact int64 values computed through float64 — every
      partial sum is bounded by 64·(1.19e7)² < 2^53 (the quantized()
      domain bound, asserted loudly below), so BLAS order never matters;
    - cosine: dot / (sqrt(na)·sqrt(nb)) — identical correctly-rounded
      IEEE ops on identical inputs ⇒ bit-identical doubles to the JVM;
    - round(·, 6): floor(y+0.5) on cos·1e6 equals Java BigDecimal
      HALF_UP except within float error of a .5 grid boundary; boundary
      entries (|y − round(y)| < 1e-6) replay through _round6's exact
      Decimal path (the _probe_cells_np convention);
    - the ≥-threshold count and max compare qa/1e6 — the identical
      correctly-rounded double Spark's round(double, 6) returns."""
    n, dim = Q.shape
    lim = int(np.sqrt(2.0**53 / dim))
    if n and np.abs(Q).max() > lim:
        raise ValueError(
            f"quantized component exceeds the exact-float64 bound {lim} "
            "(quantized() domain contract)"
        )
    Qf = Q.astype(np.float64)
    nq = (Qf * Qf).sum(axis=1)
    norms = np.sqrt(nq)
    n_dup = np.zeros(n, dtype=np.int64)
    qa_max = np.full(n, -1, dtype=np.int64)
    if n < 2:
        return n_dup, qa_max
    blk = max(1, (1 << 22) // n)
    for s in range(1, n, blk):
        e = min(s + blk, n)
        cos = (Qf[s:e] @ Qf.T) / (norms[s:e, None] * norms[None, :])
        y = cos * 1e6 + 0.5
        qa = np.floor(y).astype(np.int64)
        amb = np.abs(y - np.round(y)) < 1e-6
        if amb.any():
            for i, j in zip(*np.nonzero(amb)):
                qa[i, j] = int(_round6(cos[i, j]) * 1_000_000)
        lower = np.arange(n)[None, :] < np.arange(s, e)[:, None]
        r = qa / 1e6  # exact: the same correctly-rounded double as JVM
        hit = lower & (r >= threshold)
        n_dup[s:e] = hit.sum(axis=1)
        # every row i >= 1 has i lower-id mates (rows are id-sorted), so
        # the masked max is always a real qa; legit qa ∈ [-1e6, 1e6] so
        # the mask constant can never be selected.  Row 0 keeps the
        # sentinel and is emitted as NULL by the caller.
        qa_max[s:e] = np.where(lower, qa, np.int64(-(10**9))).max(axis=1)
    return n_dup, qa_max


def semantic_dedup_stats(
    df: DataFrame,
    n_cells: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: "np.ndarray | None" = None,
    arrow_pairwise: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster embeddings
    with the coarse quantizer, then within each cluster mark every item
    having a LOWER-ID cluster-mate at quantized cosine ≥ ``threshold``
    as a semantic duplicate — the deterministic min-id-survives version
    of the paper's keep-one-per-epsilon-ball policy.

    Returns one row per nonzero-norm vector: ``(id, cell_id,
    n_dup_neighbors, max_cos_lower, is_dup)`` where ``n_dup_neighbors``
    counts lower-id mates above threshold, ``max_cos_lower`` is the
    best lower-id cosine (rounded to 6 — the engine-wide oracle
    convention; NULL when the vector is its cell's lowest id) and
    ``is_dup = n_dup_neighbors > 0``.  Zero-norm vectors are excluded
    by cosine_base (no direction ⇒ no semantic identity), matching
    every other embedding op here.

    Scale shape — the SemDeDup design IS the blocking: the O(n²)
    pairwise stage runs within clusters only, so per-cluster cost is
    (n/n_cells)²·dim; production sizes the codebook at ~√n cells
    (pass ``codebook`` from pq_train_kmeans(m=1)) precisely so that
    quadratic stays bounded.  The plan: broadcast-codebook assignment
    (no corpus shuffle), ONE equi-join exchange clustering both sides
    on cell_id (AQE skew-split is the backstop for a degenerate hot
    cluster), per-pair cosine on precomputed norms, then a
    clustering-compatible per-id aggregate.  No cartesian product, no
    Python."""
    asg = ivf_cell_assignments(df, n_cells, id_col, vec_col, codebook)
    if arrow_pairwise:
        # PRODUCTION pairwise (r9): ONE hash exchange of (id, cell_id,
        # q) — 20-ish bytes + one vector per MEMBER — into a grouped
        # Arrow kernel that runs the within-cell O(n_c²) scoring as a
        # blocked matrix product, instead of materializing O(n_c²) JOIN
        # rows each carrying both 64-long vectors (the r8 plan moved
        # ~1 KB per pair through the join; the kernel moves each vector
        # once).  Bit-identical outputs by the _semdedup_pairs_np parity
        # argument, pinned against the JVM twin (arrow_pairwise=False)
        # and the DuckDB oracle.  A degenerate giant cell is inherent
        # O(n_c²) work in either shape; the kernel at least streams it
        # in bounded row blocks (the JVM join shape needed AQE to split
        # the same volume).
        import pandas as pd

        def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
            n = len(pdf)
            ids = pdf["id"].to_numpy(dtype=np.int64)
            order = np.argsort(ids)
            ids_s = ids[order]
            Q = np.stack(
                [np.asarray(v, dtype=np.int64) for v in pdf["q"]]
            )[order]
            n_dup, qa_max = _semdedup_pairs_np(Q, threshold)
            return pd.DataFrame(
                {
                    "id": ids_s,
                    "cell_id": pdf["cell_id"].to_numpy(dtype=np.int64)[:n],
                    "n_dup_neighbors": n_dup,
                    "max_cos_lower": [
                        None if i == 0 else qa_max[i] / 1e6 for i in range(n)
                    ],
                    "is_dup": n_dup > 0,
                }
            )

        out = (
            asg.select("id", "cell_id", "q")
            .groupBy("cell_id")
            .applyInPandas(
                kernel,
                schema=(
                    "id bigint, cell_id bigint, n_dup_neighbors bigint, "
                    "max_cos_lower double, is_dup boolean"
                ),
            )
        )
        return out.select(
            F.col("id").alias(id_col),
            "cell_id",
            "n_dup_neighbors",
            "max_cos_lower",
            "is_dup",
        )
    a = asg.select(
        F.col("cell_id"),
        F.col("id").alias("id_a"),
        F.col("q").alias("qa"),
        F.col("nq").alias("na"),
    )
    b = asg.select(
        F.col("cell_id").alias("cell_b"),
        F.col("id").alias("id_b"),
        F.col("q").alias("qb"),
        F.col("nq").alias("nb"),
    )
    # ONE left join replaces the r8 inner-join + rejoin shape (which
    # evaluated the assignment pipeline a THIRD time just to reattach
    # vectors with no lower-id mate): every id_a survives the left join
    # — unmatched rows carry NULL cos, which the aggregate counts as
    # zero neighbors / NULL max, exactly what the rejoin produced.
    # Values are bit-identical: same pair set, same rounded cosines.
    pairs = a.join(
        b,
        (F.col("cell_id") == F.col("cell_b")) & (F.col("id_b") < F.col("id_a")),
        "left",
    ).select(
        "id_a",
        "cell_id",
        F.round(
            cosine_qn(F.col("qa"), F.col("qb"), F.col("na"), F.col("nb")),
            6,
        ).alias("cos"),
    )
    per_id = pairs.groupBy("id_a", "cell_id").agg(
        F.coalesce(
            F.sum((F.col("cos") >= F.lit(threshold)).cast("long")),
            F.lit(0).cast("long"),
        ).alias("n_dup_neighbors"),
        F.max("cos").alias("max_cos_lower"),
    )
    return per_id.select(
        F.col("id_a").alias(id_col),
        "cell_id",
        "n_dup_neighbors",
        "max_cos_lower",
        (F.col("n_dup_neighbors") > 0).alias("is_dup"),
    )


def semantic_dedup_keep(
    df: DataFrame,
    n_cells: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: "np.ndarray | None" = None,
) -> DataFrame:
    """Keep decision from semantic_dedup_stats: a vector survives when
    no lower-id cluster-mate sits at cosine ≥ threshold (the min-id
    representative of every semantic near-dup group survives)."""
    stats = semantic_dedup_stats(
        df, n_cells, threshold, id_col, vec_col, codebook
    )
    return stats.select(
        id_col, "cell_id", "n_dup_neighbors", (~F.col("is_dup")).alias("keep")
    )
