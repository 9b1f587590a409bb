"""Count-min sketch: fixed-memory approximate frequencies.

The mergeable counting sketch for unbounded-cardinality streams: a
``depth x width`` counter grid where every item increments one bucket
per row (independent hashes).  Point estimate = min over rows — always
an OVER-estimate, with error <= 2N/width at confidence 1-(1/2)^depth.
The reference's combiner model (CombineFn with mergeable accumulators)
is exactly this shape; here the sketch IS a relational aggregate.

Design for 100 TB:
- BUILD is one ``groupBy(r, b).sum()`` — map-side partial combine
  collapses every partition to <= depth*width rows before the
  shuffle, so the shuffle is sketch-sized, never data-sized, and the
  output is bounded (depth*width rows) regardless of item
  cardinality.  That boundedness is the point: exact wordcount over
  a 100 TB crawl shuffles the vocabulary; the sketch shuffles KBs.
- MERGE across shards / days / streaming windows is elementwise add
  (``union -> groupBy(r, b).sum()``) — associative + commutative,
  the CombineFn contract.
- HASHES are md5-derived (first 8 hex digits, salted by the row
  index), the repo's portable-hash idiom — deterministic across
  engines, so the whole sketch and every estimate is value-oracled
  in DuckDB, collisions included.
- ESTIMATE broadcasts the (tiny, bounded) sketch against the query
  items: one broadcast join + min aggregate, all codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(item: Column, r: Column, width: int) -> Column:
    """Portable bucket hash: first 8 md5 hex digits of 'item|r'."""
    h = F.md5(F.concat(item.cast("string"), F.lit("|"), r.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(width)).cast("int")


def count_min_sketch(df: DataFrame, item_col: str, depth: int = 4,
                     width: int = 256,
                     weight_col: str | None = None) -> DataFrame:
    """(r, b, cnt): the depth x width counter grid.  Rows with zero
    count are absent (treat missing as 0 when estimating)."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    r = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    return (df.select(F.col(item_col).alias("__item__"), w.alias("__w__"))
            .select("__item__", "__w__", r)
            .select("r", _bucket(F.col("__item__"), F.col("r"), width)
                    .alias("b"), "__w__")
            .groupBy("r", "b").agg(F.sum("__w__").alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Elementwise add — the mergeable-accumulator contract."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, items: DataFrame, item_col: str,
                 depth: int, width: int,
                 est_col: str = "est") -> DataFrame:
    """Point estimates for every row of ``items``: min over the depth
    probe buckets (missing bucket = 0).  The sketch is bounded
    (depth*width rows), so it broadcasts."""
    r = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    probes = (items.select(F.col(item_col), r)
              .select(item_col, "r",
                      _bucket(F.col(item_col), F.col("r"), width)
                      .alias("b")))
    return (probes.join(F.broadcast(sketch), on=["r", "b"], how="left")
            .groupBy(item_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias(est_col)))


def cms_counts(df: DataFrame, item_col: str, depth: int = 4,
               width: int = 256,
               weight_col: str | None = None) -> DataFrame:
    """Sketch + estimate for every distinct item in one call:
    (item_col, est).  est >= true count always; equality iff the
    item's min-count bucket row has no colliding mass.

    Shape (optimization r13, guide §2.3/§2.4): aggregate FIRST —
    ``groupBy(item).sum(weight)`` is the one data-sized pass (map-side
    combined), and everything downstream runs over the VOCABULARY:
    buckets are md5-hashed once per distinct item (not once per
    instance), the sketch is the weighted vocab folded to its bounded
    depth*width grid, and estimates come from a single 1-row
    map-literal broadcast (``element_at`` lookups, the repo's
    scalar-broadcast crossJoin shape) instead of the old
    distinct + probe-explode + broadcast join + second vocabulary
    shuffle.  cnt(r, b) = sum of instance weights hashing to (r, b)
    either way, so every estimate — collisions included — is
    bit-identical to the explode-per-instance build.  The map row is
    bounded at depth*width entries BY CONSTRUCTION (the sketch's whole
    point), so the single-row broadcast never scales with the data."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    wc = (df.select(F.col(item_col), w.alias("__w__"))
          .groupBy(item_col).agg(F.sum("__w__").alias("__n__")))
    wcb = wc.select(
        item_col, "__n__",
        *[_bucket(F.col(item_col), F.lit(r), width).alias(f"__b{r}__")
          for r in range(depth)])
    probes = F.array(*[F.struct(F.lit(r).alias("r"),
                                F.col(f"__b{r}__").alias("b"))
                       for r in range(depth)])
    sketch = (wcb.select(F.explode(probes).alias("__rb__"), "__n__")
              .groupBy(F.col("__rb__.r").alias("r"),
                       F.col("__rb__.b").alias("b"))
              .agg(F.sum("__n__").alias("cnt")))
    skmap = sketch.agg(F.map_from_entries(F.collect_list(F.struct(
        (F.col("r") * width + F.col("b")).cast("long").alias("k"),
        F.col("cnt").alias("v")))).alias("__sk__"))
    est = F.least(*[
        F.coalesce(F.element_at(F.col("__sk__"),
                                F.lit(r * width).cast("long")
                                + F.col(f"__b{r}__").cast("long")),
                   F.lit(0).cast("long"))
        for r in range(depth)])
    return (wcb.crossJoin(F.broadcast(skmap))
            .select(item_col, est.alias("est")))


# ---------------------------------------------------------------------------
# HyperLogLog: fixed-memory mergeable distinct-count sketch
# (ApproximateUnique.java:85's job, reimplemented as the classic
# Flajolet et al. register table so it is portable and ORACLED —
# unlike Spark's built-in approx_count_distinct, whose HLL++ bias
# tables can't be mirrored in DuckDB).
#
# Design for 100 TB:
# - BUILD is one groupBy(key..., bucket).max(rho): map-side partial
#   combine collapses every partition to <= m register rows before
#   the shuffle, so the shuffle is sketch-sized (m=2^p rows per key),
#   never data-sized.  Exact countDistinct over 100 TB shuffles every
#   distinct value; the sketch shuffles KBs per key.
# - MERGE across shards / days is elementwise max — associative,
#   commutative, idempotent (the strongest CombineFn contract: safe
#   under replay/at-least-once delivery too).
# - HASH is md5-derived (15 hex digits = 60 bits: top p -> bucket,
#   low 52 -> rank window), the repo's portable-hash idiom: the whole
#   register table AND the float estimate are value-oracled in
#   DuckDB, register collisions included.  52 rank bits keep every
#   2^(52-rho) term exactly representable as a bigint, so the
#   harmonic sum is INTEGER arithmetic — order-independent, hence
#   deterministic across engines (a double accumulation would be
#   summation-order dependent and unoracle-able).
# - ESTIMATE is alpha_m * m^2 / sum(2^-M_j) with the standard
#   linear-counting small-range correction; large-range correction
#   is unnecessary (52-bit hash space).
# ---------------------------------------------------------------------------

_RANK_BITS = 52  # low 13 md5 hex digits


def _hll_alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(df: DataFrame, item_col: str, p: int = 8,
               key_cols: list[str] | None = None) -> DataFrame:
    """Register table (key..., bucket, rho): per bucket, the max
    leading-zero rank.  Buckets never observed are absent (rho 0)."""
    keys = list(key_cols or [])
    h = F.md5(F.col(item_col).cast("string"))
    bucket = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
              % F.lit(1 << p)).cast("int")
    w = F.conv(F.substring(h, 5, 13), 16, 10).cast("long")
    # msb position = length of the minimal binary string; rho = number
    # of leading zeros in the 52-bit window + 1.  bin() is minimal in
    # both Spark and DuckDB, so this is integer-exact on both.
    rho = (F.when(w == 0, F.lit(_RANK_BITS + 1))
           .otherwise(F.lit(_RANK_BITS + 1) - F.length(F.bin(w))))
    return (df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
            .groupBy(*keys, "bucket").agg(F.max("rho").alias("rho")))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Elementwise max — mergeable, idempotent."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("bucket", "rho")]
    return out.groupBy(*keys, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, p: int = 8,
                 est_col: str = "est_distinct") -> DataFrame:
    """(key..., n_registers, est_col) per key group.  The harmonic
    sum is computed as sum(2^(52-rho)) + zeros*2^52 over a common
    2^-52 denominator — pure bigint, so both engines see the exact
    same integers and the single float division that follows is
    bit-identical."""
    m = 1 << p
    keys = [c for c in sketch.columns if c not in ("bucket", "rho")]
    gb = sketch.groupBy(*keys) if keys else sketch.groupBy()
    agg = gb.agg(
        F.count("*").cast("long").alias("n_registers"),
        F.sum(F.expr(f"cast(pow(2, greatest({_RANK_BITS} - rho, 0)) "
                     f"as long)")).alias("__s__"))
    zeros = F.lit(m) - F.col("n_registers")
    s_total = (F.col("__s__")
               + zeros.cast("long") * F.lit(1 << _RANK_BITS).cast("long"))
    raw = (F.lit(_hll_alpha(m) * m * m * float(1 << _RANK_BITS))
           / s_total.cast("double"))
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear) \
           .otherwise(raw)
    return agg.select(*keys, "n_registers",
                      F.round(est, 4).alias(est_col))


def hll_distinct(df: DataFrame, item_col: str, p: int = 8,
                 key_cols: list[str] | None = None,
                 est_col: str = "est_distinct") -> DataFrame:
    """Sketch + estimate in one call: (key..., n_registers, est)."""
    return hll_estimate(hll_sketch(df, item_col, p, key_cols), p, est_col)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch: distinct counts that support SET
# ALGEBRA — union, intersection, Jaccard — which HLL registers cannot
# express.  Beyer et al., "On synopses for distinct-value estimation
# under multiset operations" (SIGMOD 2007).
#
# Design for 100 TB:
# - BUILD: distinct (key, h) — map-side partial distinct collapses
#   every partition before the shuffle — then a per-key bottom-k.
#   The sketch is <= k rows per key; everything downstream (merge,
#   pairwise overlap) is sketch-sized and broadcastable.
# - The hash is the repo's portable md5 idiom (15 hex digits =
#   60 uniform bits), so the k minima — and therefore every estimate
#   — are bit-identical in DuckDB: the sketch is deterministic, not
#   just unbiased.  All arithmetic stays on bigint hash values until
#   the single final division.
# - ESTIMATE: (k-1) * 2^60 / h_(k) (kth minimum); exact when the key
#   holds fewer than k distinct items.  Union sketch = bottom-k of
#   the merged minima; Jaccard = |A cap B restricted to union
#   bottom-k| / k; intersection = Jaccard * union estimate.
# ---------------------------------------------------------------------------

_KMV_BITS = 60  # 15 md5 hex digits


def _kmv_hash(item: Column) -> Column:
    return F.conv(F.substring(F.md5(item.cast("string")), 1, 15),
                  16, 10).cast("long")


def kmv_sketch(df: DataFrame, item_col: str, k: int = 64,
               key_cols: list[str] | None = None) -> DataFrame:
    """(key..., h): the k smallest distinct 60-bit item hashes per
    key group."""
    from pyspark.sql import Window

    keys = list(key_cols or [])
    hashed = (df.select(*keys, _kmv_hash(F.col(item_col)).alias("h"))
              .distinct())
    if not keys:
        # per-partition bottom-k pre-prune (ADVICE r6): a partition-less
        # row_number window funnels EVERY distinct hash through one
        # task — data-sized for the unkeyed case.  Stage 1 takes the
        # bottom-k inside each scan partition (parallel; bottom-k of
        # per-group bottom-ks == global bottom-k because every row is
        # in exactly one group), so stage 2's global window orders at
        # most partitions * k rows — sketch-sized.  The keyed path is
        # already bounded per key by its own partitionBy.
        pw = Window.partitionBy("__pid__").orderBy("h")
        hashed = (hashed.withColumn("__pid__", F.spark_partition_id())
                  .withColumn("__rn__", F.row_number().over(pw))
                  .filter(F.col("__rn__") <= k)
                  .drop("__pid__", "__rn__"))
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy("h")
    return (hashed.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= k).drop("__rn__"))


def kmv_estimate(sketch: DataFrame, k: int = 64,
                 est_col: str = "est_distinct") -> DataFrame:
    """(key..., est): (k-1)*2^60/h_(k), exact below k."""
    keys = [c for c in sketch.columns if c != "h"]
    gb = sketch.groupBy(*keys) if keys else sketch.groupBy()
    agg = gb.agg(F.count("*").cast("long").alias("__n__"),
                 F.max("h").alias("__hk__"))
    scale = float(k - 1) * float(1 << _KMV_BITS)
    est = F.when(F.col("__n__") < k, F.col("__n__").cast("double")) \
           .otherwise(F.lit(scale) / F.col("__hk__").cast("double"))
    return agg.select(*keys, F.round(est, 4).alias(est_col))


def kmv_overlap(df: DataFrame, item_col: str, set_col: str,
                k: int = 64) -> DataFrame:
    """Pairwise set overlap between the item-sets of every two values
    of ``set_col``: (set_a, set_b, est_jaccard, est_common) for
    set_a < set_b.  Everything after the sketch build is bounded at
    k rows per set, so the pair join is broadcast-sized."""
    s = kmv_sketch(df, item_col, k, key_cols=[set_col]) \
        .withColumnRenamed(set_col, "__g__")
    pairs = (s.select(F.col("__g__").alias("set_a")).distinct()
             .join(s.select(F.col("__g__").alias("set_b")).distinct(),
                   F.col("set_a") < F.col("set_b")))
    # union sketch per pair: bottom-k of the merged minima
    from pyspark.sql import Window

    u = (pairs.join(F.broadcast(s),
                    (F.col("__g__") == F.col("set_a"))
                    | (F.col("__g__") == F.col("set_b")))
         .select("set_a", "set_b", "h").distinct())
    w = Window.partitionBy("set_a", "set_b").orderBy("h")
    uk = (u.withColumn("__rn__", F.row_number().over(w))
          .filter(F.col("__rn__") <= k))
    ustat = uk.groupBy("set_a", "set_b").agg(
        F.count("*").cast("long").alias("__un__"),
        F.max("h").alias("__tau__"))
    # hashes present in BOTH sketches, restricted to the union bottom-k
    both = (s.alias("a").join(s.alias("b"),
                              (F.col("a.h") == F.col("b.h"))
                              & (F.col("a.__g__") < F.col("b.__g__")))
            .select(F.col("a.__g__").alias("set_a"),
                    F.col("b.__g__").alias("set_b"),
                    F.col("a.h").alias("h")))
    common = (both.join(F.broadcast(ustat), ["set_a", "set_b"])
              .filter(F.col("h") <= F.col("__tau__"))
              .groupBy("set_a", "set_b")
              .agg(F.count("*").cast("long").alias("__cn__")))
    scale = float(k - 1) * float(1 << _KMV_BITS)
    out = ustat.join(common, ["set_a", "set_b"], "left") \
        .withColumn("__cn__", F.coalesce("__cn__", F.lit(0).cast("long")))
    uest = F.when(F.col("__un__") < k, F.col("__un__").cast("double")) \
            .otherwise(F.lit(scale) / F.col("__tau__").cast("double"))
    denom = F.least(F.col("__un__"), F.lit(k)).cast("double")
    jac = F.col("__cn__").cast("double") / denom
    return out.select(
        "set_a", "set_b",
        F.round(jac, 4).alias("est_jaccard"),
        F.round(jac * uest, 4).alias("est_common"))


# ---------------------------------------------------------------------------
# Fixed-bin histogram: the mergeable QUANTILE sketch.
# (ApproximateQuantiles.java's job — the reference's buffered
# Greenwald-Khanna-style combiner — re-expressed as the simplest
# mergeable synopsis that is ALSO deterministic: an equi-width bin
# table.  Spark's own approxQuantile (GK) and the reference's
# ApproximateQuantiles both give engine-specific answers that cannot
# be value-oracled; the histogram estimate is bit-identical in DuckDB,
# so `hist_quantiles_prices` upgrades the rows-only `approx_quantiles`
# story the same way HLL upgraded `approx_distinct_users`.)
#
# Design for 100 TB:
# - BUILD is one groupBy(key..., bin).count(): map-side partial
#   combine collapses every partition to <= bins rows before the
#   shuffle — sketch-sized, never data-sized.  One pass, no sort:
#   exact percentiles over 100 TB need a global sort or multi-pass
#   selection; the sketch reads the data once.
# - MERGE across shards / days is elementwise add (union ->
#   groupBy.sum) — associative + commutative, the CombineFn contract.
# - BIN GEOMETRY is caller-pinned (lo / hi / bins) with clamped
#   overflow bins, so merge NEVER needs re-binning.  Pick lo/hi as
#   exact binary values (here 0 .. 2^19) and the bin width is an
#   exact double: floor(x / w) is then reproducible across engines.
# - ESTIMATE walks the cumulative counts once per key (a window over
#   <= bins rows per key) and linear-interpolates inside the target
#   bin.  All arithmetic stays on bigints until the single final
#   division, so the float estimate is bit-identical across engines.
# ---------------------------------------------------------------------------


def hist_sketch(df: DataFrame, value_col: str, lo: float, hi: float,
                bins: int = 256,
                key_cols: list[str] | None = None) -> DataFrame:
    """(key..., bin, cnt): equi-width bin counts; values outside
    [lo, hi) clamp into the edge bins (bin 0 / bins-1)."""
    keys = list(key_cols or [])
    w = (hi - lo) / bins
    raw = F.floor((F.col(value_col).cast("double") - F.lit(lo))
                  / F.lit(w)).cast("long")
    b = F.greatest(F.lit(0).cast("long"),
                   F.least(F.lit(bins - 1).cast("long"), raw))
    return (df.select(*keys, b.alias("bin"))
            .groupBy(*keys, "bin").agg(F.count("*").alias("cnt")))


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Elementwise add — associative + commutative."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("bin", "cnt")]
    return out.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(sketch: DataFrame, quantiles: list[float],
                   lo: float, hi: float, bins: int = 256) -> DataFrame:
    """(key..., q, est_value) per key group and requested quantile.

    Rank target r(q) = max(1, ceil(q * n)); the estimate is the linear
    interpolation inside the first bin whose cumulative count reaches
    r:  lo + bin*w + w * (r - cum_below) / cnt.  Integer cum/cnt, one
    float division — deterministic across engines.
    """
    from pyspark.sql.window import Window

    w = (hi - lo) / bins
    keys = [c for c in sketch.columns if c not in ("bin", "cnt")]
    win = (Window.partitionBy(*[F.col(c) for c in keys]).orderBy("bin")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.partitionBy(*[F.col(c) for c in keys])
    cum = (sketch
           .withColumn("__cum__", F.sum("cnt").over(win))
           .withColumn("__n__", F.sum("cnt").over(tot)))
    qf = F.explode(F.array(*[F.lit(float(q)) for q in quantiles]))
    expl = cum.withColumn("q", qf)
    r = F.greatest(F.lit(1).cast("long"),
                   F.ceil(F.col("q") * F.col("__n__")).cast("long"))
    hit = expl.filter((F.col("__cum__") >= r)
                      & (F.col("__cum__") - F.col("cnt") < r))
    est = (F.lit(lo) + F.col("bin").cast("double") * F.lit(w)
           + F.lit(w) * (r - (F.col("__cum__") - F.col("cnt"))).cast("double")
           / F.col("cnt").cast("double"))
    return hit.select(*keys, "q", F.round(est, 4).alias("est_value"))


def hist_quantiles_of(df: DataFrame, value_col: str,
                      quantiles: list[float], lo: float, hi: float,
                      bins: int = 256,
                      key_cols: list[str] | None = None) -> DataFrame:
    """Sketch + estimate in one call."""
    return hist_quantiles(hist_sketch(df, value_col, lo, hi, bins,
                                      key_cols), quantiles, lo, hi, bins)
