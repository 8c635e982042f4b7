"""Scalar function packs: string / date / math / json / array / map
(SURVEY.md §2.2.H).

The reference's scalar surface is the similarity math in ``metrics.py``
(reconstructed — SURVEY.md §2.1 R7–R11), computed row-at-a-time in CPython.
Here every scalar is a Catalyst expression evaluated inside whole-stage
codegen — the engine never drops to Python for a scalar — including the
higher-order array functions (``transform`` / ``aggregate``) over embedding
vectors, which is what keeps the §K vector math JVM-side at 100 TB.

Cross-engine pitfalls encoded below (SURVEY §7.4): Spark ``ceil``/``floor``
return BIGINT where DuckDB returns DOUBLE (cast in the oracle);
``date_trunc`` returns TIMESTAMP in Spark but DATE in DuckDB (cast both);
array L2 norms accumulate in DOUBLE sequentially in both engines, rounded
to 5 before hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import l2_norm
from ..registry import register
from ..sources.readers import load_events, load_table


@register(
    "q_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substring(p_name, 1, 5) AS name_prefix,
       concat_ws('-', p_brand, p_type) AS brand_type,
       length(p_name) AS name_len,
       trim(p_type) AS type_trim,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       (p_type LIKE 'PRO%') AS is_promo
FROM part
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.col("p_type")).alias("type_trim"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.col("p_type").like("PRO%").alias("is_promo"),
    )


@register(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       dayofweek(CAST(o_orderdate AS DATE)) AS order_dow,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_95
FROM orders
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction/truncation/arithmetic.  DuckDB ``dayofweek`` is
    0=Sunday over DATE; Spark ``dayofweek`` is 1=Sunday — subtract 1."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("order_date"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        (F.dayofweek(d) - 1).cast("long").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since_epoch_95"
        ),
    )


@register(
    "q_math_funcs",
    oracle="""
SELECT p_partkey,
       round(p_retailprice, 1) + 0.0 AS price_r1,
       round(abs(p_retailprice - 950.0), 6) + 0.0 AS dist_950,
       round(sqrt(p_retailprice), 6) + 0.0 AS price_sqrt,
       round(ln(p_retailprice), 6) + 0.0 AS price_ln,
       round(pow(p_retailprice, 2), 4) + 0.0 AS price_sq,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(sign(p_retailprice - 950.0) AS DOUBLE) AS above_950
FROM part
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        (F.round(price, 1) + F.lit(0.0)).alias("price_r1"),
        (F.round(F.abs(price - 950.0), 6) + F.lit(0.0)).alias("dist_950"),
        (F.round(F.sqrt(price), 6) + F.lit(0.0)).alias("price_sqrt"),
        (F.round(F.log(price), 6) + F.lit(0.0)).alias("price_ln"),
        (F.round(F.pow(price, 2), 4) + F.lit(0.0)).alias("price_sq"),
        F.ceil(price).alias("price_ceil"),
        F.floor(price).alias("price_floor"),
        (F.signum(price - 950.0) + F.lit(0.0)).alias("above_950"),
    )


@register(
    "q_json_funcs",
    oracle="""
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
""",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the ``events.props`` string column +
    filtering on the extracted value."""
    e = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select("event_id", "event_type", k.alias("k_val")).where(
        F.col("k_val") >= 50
    )


@register(
    "q_array_funcs",
    oracle="""
SELECT vec_id, label,
       len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_component,
       CAST(embedding[1] AS DOUBLE) AS head_1,
       CAST(embedding[2] AS DOUBLE) AS head_2,
       CAST(embedding[3] AS DOUBLE) AS head_3,
       CAST(embedding[4] AS DOUBLE) AS head_4,
       round(sqrt(list_sum(list_transform(embedding,
                                          x -> CAST(x AS DOUBLE) * x))), 5) + 0.0
           AS l2_norm
FROM embeddings
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over the 64-dim embedding column: size, element access,
    slicing, and an L2 norm via ``aggregate`` — all higher-order Catalyst
    expressions, zero Python in the loop.

    The slice demonstration (``F.slice(emb, 1, 4)``) is projected to four
    scalar columns rather than emitted as a raw ``ArrayType`` — array cells
    are not hashable by the driver's pandas canonicalizer (round-4 red row),
    the same portability rule already applied to ``q_map_funcs`` below.
    float→double casts are exact (binary32 ⊂ binary64) so no rounding is
    needed for the hash to agree."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    head = F.slice(emb, 1, 4)
    return e.select(
        "vec_id",
        "label",
        F.size(emb).cast("long").alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_component"),
        *[
            F.element_at(head, i).cast("double").alias(f"head_{i}")
            for i in (1, 2, 3, 4)
        ],
        (F.round(l2_norm(emb), 5) + F.lit(0.0)).alias("l2_norm"),
    )


@register(
    "q_map_funcs",
    oracle="""
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS clicks,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       count(DISTINCT event_type) AS n_types
FROM events
GROUP BY user_id
""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a per-user ``map<event_type, count>`` then read scalar keys
    back out.  The map itself is not in the output (map hashing is not
    portable across engines — SURVEY §2.2.H); the projected scalars make
    the construction + ``element_at`` readback exactly checkable."""
    e = load_events(spark, sf_dir)
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    mapped = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("type_counts")
    )
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at("type_counts", "click"), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at("type_counts", "purchase"), F.lit(0)).alias(
            "purchases"
        ),
        F.size(F.map_keys("type_counts")).cast("long").alias("n_types"),
    )


@register(
    "q_cond_funcs",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_norm,
       greatest(o_totalprice, 150000.0) + 0.0 AS floor_150k,
       least(o_totalprice, 450000.0) + 0.0 AS cap_450k,
       (o_orderstatus = 'F' AND o_orderpriority LIKE '1%') AS urgent_finished
FROM orders
""",
)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar pack: CASE bands, nullif/coalesce normalization,
    greatest/least clamping, boolean projection."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(price > 300000, "high")
        .when(price > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_norm"
        ),
        (F.greatest(price, F.lit(150000.0)) + F.lit(0.0)).alias("floor_150k"),
        (F.least(price, F.lit(450000.0)) + F.lit(0.0)).alias("cap_450k"),
        ((F.col("o_orderstatus") == "F") & F.col("o_orderpriority").like("1%")).alias(
            "urgent_finished"
        ),
    )


@register(
    "q_histogram",
    oracle="""
SELECT CAST(floor((o_totalprice - 0.0) / 50000.0) AS BIGINT) AS bin,
       count(*) AS n,
       round(min(o_totalprice), 2) + 0.0 AS bin_min,
       round(max(o_totalprice), 2) + 0.0 AS bin_max
FROM orders
GROUP BY 1
""",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram by arithmetic binning — the scale-friendly
    histogram (one map-side expression + one agg; no sort, no
    per-partition state), bins joinable back to any dimension."""
    o = load_table(spark, sf_dir, "orders")
    bin_ = F.floor(F.col("o_totalprice") / 50000.0)
    return o.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.min("o_totalprice"), 2) + F.lit(0.0)).alias("bin_min"),
        (F.round(F.max("o_totalprice"), 2) + F.lit(0.0)).alias("bin_max"),
    )
