"""Driver-contract query registry: SURVEY.md §2 operator shapes plus
the training-data-pipeline operators, each as a (PySpark plan,
DuckDB oracle SQL) twin over the /root/testdata parquet tables.

Conventions for oracle hash parity:
 * every computed column aliased identically on both sides;
 * money/ratio aggregates rounded (sums 2dp, ratios 4-6dp) in BOTH;
 * counts cast to BIGINT in SQL (DuckDB count is already BIGINT, but
   SUM(int) is HUGEINT -> cast);
 * all hashes md5-derived or polynomial (identical across engines —
   operators.textops);
 * timestamps formatted to microsecond strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pywdcollections_spark.operators import dedup as D
from pywdcollections_spark.operators import similarity as SIM
from pywdcollections_spark.operators import textstats as TS
from pywdcollections_spark.operators.textops import (
    md5_hash64, rolling_fingerprint, words,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _reg(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


#: schema memo per (sf_dir, table): parquet footer inference is a
#: driver-blocking job per read; one inference per table per session is
#: enough (bench runs 15+ queries over the same handful of tables)
_SCHEMA_MEMO: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    sch = _SCHEMA_MEMO.get(path)
    if sch is None:
        sch = _SCHEMA_MEMO[path] = spark.read.parquet(path).schema
    return spark.read.schema(sch).parquet(path)


def _spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive scan spreading for compute-heavy row-local plans
    (guide §2.5 "input skew: one huge unsplittable file ... repartition
    immediately after the read"). Parquet scans cannot split below
    row-group granularity, and the fixture tables are single-file,
    single-row-group — so without this every documents-table query runs
    its whole scan+compute stage in ONE task regardless of cores
    (measured r7: dedup_simhash 10.4 s at sf1.0/32 cores, ~16x the
    parallel cost). When the scan already carries at least half the
    cluster's parallelism in splits — the normal lake-scale case, where
    inputs have thousands of row groups — this is a NO-OP, so nothing
    is tuned to the sandbox. The round-robin exchange moves each text
    exactly once and replaces no other shuffle; results are unchanged
    (row sets are order-free, and Spark's sort-before-repartition keeps
    the assignment deterministic under retries).

    Only worth it where per-row compute dominates the scan (shingle /
    hash / regex passes): queries whose map side is trivial (md5-only,
    pure aggregates) keep the plain scan — the exchange would cost more
    than it parallelizes."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# §2.4 aggregations — TPC-H Q1 shape (A1/A5 partial-agg family)
@_reg("q1_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
       ROUND(AVG(l_discount), 6)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem WHERE l_shipdate <= DATE '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("date"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(disc), 2).alias("sum_disc_price"),
                 F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order")))


# §2.2 F1 — worklist predicate (staleness filter)
@_reg("f1_worklist_filter", """
SELECT l_linestatus, COUNT(*) AS n
FROM lineitem
WHERE l_returnflag = 'R'
  AND (l_shipdate IS NULL OR date_diff('day', l_shipdate, DATE '1998-01-01') > 30)
GROUP BY l_linestatus
""")
def f1_worklist_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    stale = F.col("l_shipdate").isNull() | \
        (F.datediff(F.lit("1998-01-01").cast("date"), F.col("l_shipdate")) > 30)
    return (li.filter((F.col("l_returnflag") == "R") & stale)
            .groupBy("l_linestatus").agg(F.count("*").alias("n")))


# §2.2 F2 — excluded-types anti-join
@_reg("f2_excluded_anti_join", """
SELECT c_nationkey, COUNT(*) AS n_customers
FROM customer WHERE c_nationkey NOT IN (0, 1, 2)
GROUP BY c_nationkey
""")
def f2_excluded_anti_join(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    excluded = spark.createDataFrame([(0,), (1,), (2,)], "c_nationkey bigint")
    return (cust.join(F.broadcast(excluded), "c_nationkey", "left_anti")
            .groupBy("c_nationkey").agg(F.count("*").alias("n_customers")))


# §2.2 F4 — NULL-gated copy eligibility (semi/anti pattern)
@_reg("f4_copy_eligibility", """
SELECT user_id, COUNT(*) AS n_signups
FROM events e
WHERE event_type = 'signup'
  AND NOT EXISTS (SELECT 1 FROM events p
                  WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
                    AND p.value > 90)
GROUP BY user_id
""")
def f4_copy_eligibility(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup")
    buyers = (ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 90))
              .select("user_id").distinct())
    return (signups.join(buyers, "user_id", "left_anti")
            .groupBy("user_id").agg(F.count("*").alias("n_signups")))


# §2.2 F8/F10 — prefix + extension-style predicates
@_reg("f10_pattern_predicates", """
SELECT p_brand, COUNT(*) AS n
FROM part
WHERE p_type LIKE '%BRASS' AND regexp_matches(lower(p_name), '(blue|red)')
GROUP BY p_brand
""")
def f10_pattern_predicates(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (p.filter(F.col("p_type").endswith("BRASS")
                     & F.lower(F.col("p_name")).rlike("(blue|red)"))
            .groupBy("p_brand").agg(F.count("*").alias("n")))


# §2.3 J1 — entity×sitelink-shaped 3-way equi-join
@_reg("j1_entity_sitelink_join", """
SELECT r_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""")
def j1_entity_sitelink_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
             .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
             .groupBy("r_name")
             .agg(F.count("*").alias("n_customers"),
                  F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal")))


# §2.3 J2 — staging×entity broadcast join
@_reg("j2_staging_broadcast_join", """
SELECT p_brand, ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size = 1 GROUP BY p_brand
""")
def j2_staging_broadcast_join(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 1)
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .groupBy("p_brand")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.count("*").alias("n_lines")))


# §2.3 J6 — one-hop constraint acceptance
@_reg("j6_one_hop_constraint", """
SELECT n_name, COUNT(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey IN (0, 1) GROUP BY n_name
""")
def j6_one_hop_constraint(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey").isin(0, 1))
    return (s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .groupBy("n_name").agg(F.count("*").alias("n_suppliers")))


# §2.3 J7 — cross-table duplicate anti-join
@_reg("j7_never_shipped_parts", """
SELECT p_brand, COUNT(*) AS n_parts
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey AND l_quantity > 45)
GROUP BY p_brand
""")
def j7_never_shipped_parts(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    li = (_t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
          .select(F.col("l_partkey").alias("p_partkey")).distinct())
    return (p.join(li, "p_partkey", "left_anti")
            .groupBy("p_brand").agg(F.count("*").alias("n_parts")))


# §2.3 J8 / §2.4 A5 — last-wins canonicalization with tie-break
@_reg("a5_last_wins_upsert", """
SELECT user_id, event_type, event_id, ROUND(value, 2) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
""")
def a5_last_wins_upsert(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # r7 A/B, negative result kept out: rewriting this as a map-side
    # max_by(struct(event_id,value), struct(ts,event_id)) aggregate
    # (guide §2.3) produces identical rows (event_id is unique, so
    # (ts,event_id) totally orders each group — verified exceptAll==0
    # at sf0.01/0.1/1.0) and shuffles only groups instead of every
    # event row — the right shape on a splittable lake input. But
    # struct-typed max_by falls back to SortAggregate, and on THIS
    # layout (events.parquet = one unsplittable row group -> one scan
    # task) the map-side sort of the full table is serialized into
    # that single task, while the window form's sort runs post-
    # exchange on all cores: measured ABBA medians 1.80 s (window) vs
    # 2.01 s (max_by) at sf1.0/32 cores. Keep the window locally;
    # plans/r07/a5_last_wins_upsert_*.txt holds both shapes.
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
            .select("user_id", "event_type", "event_id",
                    F.round("value", 2).alias("value")))


# §2.4 A1 — worklist counts
@_reg("a1_count_worklist", """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY o_orderstatus
""")
def a1_count_worklist(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(F.count("*").alias("n_orders"),
                 F.countDistinct("o_custkey").alias("n_customers")))


# §2.4 A4 — in-value mention dedup (sorted distinct collect)
@_reg("a4_mention_dedup", """
SELECT l_orderkey,
       array_to_string(list(DISTINCT l_suppkey ORDER BY l_suppkey), ',') AS supp_csv
FROM lineitem GROUP BY l_orderkey
""")
def a4_mention_dedup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_orderkey")
            .agg(F.concat_ws(",", F.sort_array(F.collect_set("l_suppkey")))
                 .alias("supp_csv")))


# §2.4 A6 — error/metric accumulation
@_reg("a6_metrics_accumulate", """
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 2) AS sum_value,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
FROM events GROUP BY event_type
""")
def a6_metrics_accumulate(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.round(F.sum("value"), 2).alias("sum_value"),
                 F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts")))


# §2.4 A7 — split-value pairing (625a/625b analogue)
@_reg("a7_split_pairing", """
SELECT user_id,
       date_diff('second', MIN(CASE WHEN event_type = 'signup' THEN ts END),
                           MIN(CASE WHEN event_type = 'purchase' THEN ts END)) AS gap_s
FROM events GROUP BY user_id
HAVING MIN(CASE WHEN event_type = 'signup' THEN ts END) IS NOT NULL
   AND MIN(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL
""")
def a7_split_pairing(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    first_signup = F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
    first_purchase = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    return (ev.groupBy("user_id")
            .agg(first_signup.alias("s"), first_purchase.alias("p"))
            .filter(F.col("s").isNotNull() & F.col("p").isNotNull())
            .select("user_id",
                    (F.unix_timestamp("p") - F.unix_timestamp("s")).alias("gap_s")))


# §2.5 W3/W4 — first-per-group
@_reg("w3_first_per_group", """
SELECT l_orderkey, l_partkey, ROUND(l_quantity, 2) AS qty
FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
                                   ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
      FROM lineitem) WHERE rn = 1
""")
def w3_first_per_group(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # (orderkey, linenumber) is NOT unique in the synthetic data — the
    # full tie-break makes first-per-group deterministic
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_suppkey")
    return (li.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
            .select("l_orderkey", "l_partkey", F.round("l_quantity", 2).alias("qty")))


# §2.6 C2 — id extraction (QID -> int analogue)
@_reg("c2_id_extract", """
SELECT TRY_CAST(regexp_extract(o_orderpriority, '^([0-9]+)-', 1) AS BIGINT) AS priority_num,
       COUNT(*) AS n
FROM orders GROUP BY 1
""")
def c2_id_extract(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    # try_cast: regexp_extract yields '' on no match, which ANSI-mode
    # cast would turn into a mid-job error instead of NULL
    num = F.regexp_extract("o_orderpriority", r"^([0-9]+)-", 1).try_cast("bigint")
    return o.groupBy(num.alias("priority_num")).agg(F.count("*").alias("n"))


# §2.6 C4 — date-age bucketing
@_reg("c4_date_age_buckets", """
SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n
FROM orders WHERE o_orderdate > DATE '1997-06-01' GROUP BY 1
""")
def c4_date_age_buckets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (o.filter(F.col("o_orderdate") > F.lit("1997-06-01").cast("date"))
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
            .agg(F.count("*").alias("n")))


# §2.6 C3b — flexible date coercion to timestamp + Wikidata precision
# code (9/10/11). Opt-in extension (operators/dates.py docstring): the
# default pipeline still mirrors the reference's date fallthrough.
@_reg("c3b_date_precision", """
SELECT o_orderkey, ds AS date_str,
       strftime(CASE WHEN length(ds) = 4  THEN strptime(ds, '%Y')
                     WHEN length(ds) = 7  THEN strptime(ds, '%Y-%m')
                     ELSE strptime(ds, '%Y-%m-%d') END,
                '%Y-%m-%d %H:%M:%S') AS ts_str,
       CAST(CASE length(ds) WHEN 4 THEN 9 WHEN 7 THEN 10 ELSE 11 END AS BIGINT)
         AS precision
FROM (SELECT o_orderkey,
             CASE o_orderkey % 3
               WHEN 0 THEN strftime(o_orderdate, '%Y')
               WHEN 1 THEN strftime(o_orderdate, '%Y-%m')
               ELSE strftime(o_orderdate, '%Y-%m-%d') END AS ds
      FROM orders)
""")
def c3b_date_precision(spark, sf_dir):
    from pywdcollections_spark.operators.dates import flexible_date
    o = _t(spark, sf_dir, "orders")
    mod = F.col("o_orderkey") % 3
    ds = (F.when(mod == 0, F.date_format("o_orderdate", "yyyy"))
           .when(mod == 1, F.date_format("o_orderdate", "yyyy-MM"))
           .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd")))
    fd = flexible_date(F.col("date_str"))
    return (o.select("o_orderkey", ds.alias("date_str"))
            .withColumn("fd", fd)
            .select("o_orderkey", "date_str",
                    F.date_format("fd.ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
                    F.col("fd.precision").cast("long").alias("precision")))


# §2.6 C6375 — monolingual_text coercion (opt-in; see operators/dates.py)
@_reg("c6375_monolingual", """
SELECT n_nationkey AS qid,
       CASE WHEN n_nationkey < 13 THEN 'fr' ELSE 'en' END AS lang,
       CASE WHEN n_nationkey < 13 THEN n_name ELSE trim(n_name) END AS text
FROM nation
""")
def c6375_monolingual(spark, sf_dir):
    from pywdcollections_spark.operators.dates import parse_monolingual
    n = _t(spark, sf_dir, "nation")
    raw = (F.when(F.col("n_nationkey") < 13,
                  F.concat(F.lit("fr:"), F.col("n_name")))
            .otherwise(F.col("n_name")))
    m = parse_monolingual(raw, default_lang="en")
    return n.select(F.col("n_nationkey").alias("qid"),
                    m["lang"].alias("lang"), m["text"].alias("text"))


# §2.6 C16 — coalesce fallback chain
@_reg("c16_coalesce_fallback", """
SELECT COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'fallback') AS segment,
       COUNT(*) AS n
FROM customer GROUP BY 1
""")
def c16_coalesce_fallback(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    seg = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("fallback"))
    return c.groupBy(seg.alias("segment")).agg(F.count("*").alias("n"))


# §2.6 C16b — write-side label merge (write_label/write_descriptions,
# pywdcollections.py:1109-1137): add-if-missing always, fix-if-different
# under the overwrite flag, keep otherwise.
@_reg("c16b_label_merge", """
WITH ex AS (SELECT n_nationkey AS qid, 'en' AS lang, n_name AS label FROM nation),
inc AS (
  SELECT n_nationkey AS qid, 'en' AS lang, lower(n_name) AS label
  FROM nation WHERE n_nationkey < 15
  UNION ALL
  SELECT n_nationkey, 'fr', 'fr ' || n_name FROM nation WHERE n_nationkey < 15),
m AS (
  SELECT coalesce(ex.qid, inc.qid) AS qid, coalesce(ex.lang, inc.lang) AS lang,
         ex.label AS l_old, inc.label AS l_new
  FROM ex FULL OUTER JOIN inc ON ex.qid = inc.qid AND ex.lang = inc.lang)
SELECT qid, lang,
       CASE WHEN action = 'keep' THEN l_old ELSE l_new END AS label, action
FROM (SELECT *, CASE WHEN l_old IS NULL THEN 'add'
                     WHEN l_new IS NULL OR l_new = l_old THEN 'keep'
                     ELSE 'fix' END AS action FROM m)
""")
def c16b_label_merge(spark, sf_dir):
    from pywdcollections_spark.operators.promote import merge_labels
    n = _t(spark, sf_dir, "nation")
    existing = n.select(F.col("n_nationkey").alias("qid"),
                        F.lit("en").alias("lang"), F.col("n_name").alias("label"))
    small = n.filter(F.col("n_nationkey") < 15)
    incoming = (small.select(F.col("n_nationkey").alias("qid"),
                             F.lit("en").alias("lang"),
                             F.lower("n_name").alias("label"))
                .unionByName(small.select(
                    F.col("n_nationkey").alias("qid"),
                    F.lit("fr").alias("lang"),
                    F.concat(F.lit("fr "), F.col("n_name")).alias("label"))))
    return merge_labels(existing, incoming, overwrite=True)


# §2.2 F3 — incremental change detection (left-anti on key+timestamp)
@_reg("f3_incremental_changes", """
SELECT e.event_id, e.user_id
FROM events e
WHERE NOT EXISTS (SELECT 1 FROM events s
                  WHERE s.event_id < 5000
                    AND s.event_id = e.event_id AND s.ts = e.ts)
""")
def f3_incremental_changes(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    snapshot = ev.filter(F.col("event_id") < 5000).select("event_id", "ts")
    from pywdcollections_spark.operators.promote import incremental_changes
    return (incremental_changes(snapshot, ev, key="event_id", ts_col="ts")
            .select("event_id", "user_id"))


# §2.1 S1 — transitive closure (P31/P279* analogue), iterative self-join
@_reg("s1_transitive_closure", """
WITH RECURSIVE edges AS (
  SELECT n_nationkey AS src, n_nationkey + 5 AS dst FROM nation WHERE n_nationkey < 20),
reach(src, dst) AS (
  SELECT src, dst FROM edges WHERE src IN (0, 1)
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst)
SELECT src, dst FROM reach
""")
def s1_transitive_closure(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    edges = (n.filter(F.col("n_nationkey") < 20)
             .select(F.col("n_nationkey").alias("src"),
                     (F.col("n_nationkey") + 5).alias("dst"))).cache()
    frontier = edges.filter(F.col("src").isin(0, 1))
    reach = frontier
    # fixed-point loop: bounded by graph depth (SURVEY.md §4 closure note)
    for _ in range(8):
        step = (frontier.alias("r")
                .join(edges.alias("e"), F.col("r.dst") == F.col("e.src"))
                .select(F.col("r.src").alias("src"), F.col("e.dst").alias("dst")))
        frontier = step.exceptAll(reach).distinct()
        if frontier.isEmpty():
            break
        # lineage cut per iteration (deep hierarchies would otherwise
        # rebuild an O(depth²) plan — see operators.closure.descendants)
        reach = reach.unionByName(frontier).distinct().localCheckpoint(eager=False)
        frontier = frontier.localCheckpoint(eager=False)
    return reach


# ---------------------------------------------------------------------------
# Training-data pipeline operators (documents / embeddings tables)

_WS_SQL = "list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> '')"
_H64 = "(('0x' || substr(md5({s}), 1, 15))::BIGINT)"
_P = 1_000_000_007


def _sh_sql(n: int = 2) -> str:
    """2-gram word shingles over ws (1-based list indexing in DuckDB)."""
    assert n == 2
    return ("list_distinct(list_transform(range(1, greatest(len(ws), 1)), "
            "i -> ws[i] || ' ' || ws[i+1]))")


# exact dedup: content hash + same-hash group size
@_reg("dedup_exact", """
SELECT doc_id, md5(text) AS content_md5,
       COUNT(*) OVER (PARTITION BY md5(text)) AS n_same
FROM documents
""")
def dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    return d.select("doc_id", F.md5("text").alias("content_md5"),
                    F.count("*").over(w).alias("n_same"))


# n-gram Jaccard near-dup pairs (exact, shingle-join candidate generation)
@_reg("dedup_ngram_jaccard", f"""
WITH d AS (
  SELECT doc_id, {_sh_sql()} AS sh
  FROM (SELECT doc_id, {_WS_SQL} AS ws FROM documents WHERE doc_id < 150)),
ex AS (SELECT doc_id AS doc, unnest(sh) AS shingle FROM d),
sizes AS (SELECT doc, COUNT(*) AS sz FROM ex GROUP BY doc),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_inter
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       ROUND(n_inter / (sa.sz + sb.sz - n_inter), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc = doc_a JOIN sizes sb ON sb.doc = doc_b
WHERE n_inter / (sa.sz + sb.sz - n_inter) >= 0.1
""")
def dedup_ngram_jaccard(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return D.ngram_jaccard_pairs(d, "doc_id", "text", n=2, threshold=0.1)


def _minhash_sql(k: int = 8) -> str:
    h = _H64.format(s="s")
    sig = ", ".join(
        f"coalesce(list_min(list_transform(sh, s -> (({h} % {_P}) * {2*j+1} + {7919*(j+1)}) % {_P})), {_P})"
        for j in range(k))
    return f"[{sig}]"


# MinHash + LSH banding near-dup pairs, Jaccard-verified
@_reg("dedup_minhash_lsh", f"""
WITH d AS (
  SELECT doc_id, sh, {_minhash_sql(8)} AS sig
  FROM (SELECT doc_id, {_sh_sql()} AS sh
        FROM (SELECT doc_id, {_WS_SQL} AS ws FROM documents WHERE doc_id < 150))
  WHERE len(sh) > 0),
bands AS (
  SELECT doc_id, sh, b.band,
         sig[b.band * 2 + 1]::VARCHAR || '_' || sig[b.band * 2 + 2]::VARCHAR AS bkey
  FROM d, (SELECT unnest(range(0, 4)) AS band) b),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sh AS sh_a, b.sh AS sh_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
scored AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sh_a, sh_b)) AS n_inter,
         len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)) AS n_union
  FROM cand)
SELECT doc_a, doc_b, ROUND(n_inter / n_union, 6) AS jaccard
FROM scored WHERE n_inter / n_union >= 0.1
""")
def dedup_minhash_lsh(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return D.minhash_lsh_pairs(d, "doc_id", "text", n=2, k=8, bands=4, threshold=0.1)


# near-dup CLUSTERS: connected components over the minhash pair list,
# every doc labeled with its component's min id (the canonical doc a
# dedup pipeline keeps). Spark: iterative min-label propagation to
# fixpoint; oracle: recursive reachability CTE + MIN — both yield the
# exact component minimum, so the check is exact.
@_reg("dedup_clusters", f"""
WITH RECURSIVE d AS (
  SELECT doc_id, sh, {_minhash_sql(8)} AS sig
  FROM (SELECT doc_id, {_sh_sql()} AS sh
        FROM (SELECT doc_id, {_WS_SQL} AS ws FROM documents WHERE doc_id < 150))
  WHERE len(sh) > 0),
bands AS (
  SELECT doc_id, sh, b.band,
         sig[b.band * 2 + 1]::VARCHAR || '_' || sig[b.band * 2 + 2]::VARCHAR AS bkey
  FROM d, (SELECT unnest(range(0, 4)) AS band) b),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sh AS sh_a, b.sh AS sh_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
pairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           len(list_intersect(sh_a, sh_b)) AS n_inter,
           len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)) AS n_union
    FROM cand)
  WHERE n_inter / n_union >= 0.1),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT src AS a, src AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY a
""")
def dedup_clusters(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    pairs = D.minhash_lsh_pairs(d, "doc_id", "text", n=2, k=8, bands=4,
                                threshold=0.1)
    return D.near_dup_clusters(pairs)


def _simhash_sql() -> str:
    h = _H64.format(s="w")
    th = f"list_transform(ws, w -> {h})"
    bits = " + ".join(
        f"(CASE WHEN list_aggregate(list_transform(th, h -> CASE WHEN (h >> {b}) & 1 = 1 "
        f"THEN 1 ELSE -1 END), 'sum') > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(16))
    return f"(SELECT CAST({bits} AS BIGINT) FROM (SELECT {th} AS th))"


@_reg("dedup_simhash", f"""
SELECT doc_id AS doc, {_simhash_sql()} AS simhash
FROM (SELECT doc_id, {_WS_SQL} AS ws FROM documents)
""")
def dedup_simhash(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    # r7: via the operator (explode -> one codegen HashAggregate with
    # per-bit vote sums — see dedup.simhash_fingerprints), replacing
    # the inline 16-fold over a bound token-hash array; bit-identical,
    # 4.1 -> 2.4 s at 500k docs / 32 cores
    return (D.simhash_fingerprints(d, "doc_id", "text")
            .select("doc", F.col("simhash").cast("long").alias("simhash")))


# SimHash near-dup pairs via pigeonhole Hamming banding: 4 bit-slices
# of the 16-bit fingerprint; any pair within Hamming<=3 shares a slice.
@_reg("dedup_simhash_hamming", f"""
WITH f AS (SELECT doc_id AS doc, {_simhash_sql()} AS simhash
           FROM (SELECT doc_id, {_WS_SQL} AS ws FROM documents WHERE doc_id < 300)),
bands AS (
  SELECT doc, simhash, b.band, (simhash >> (b.band * 4)) & 15 AS bkey
  FROM f, (SELECT unnest(range(0, 4)) AS band) b),
cand AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc < b.doc)
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
  FROM cand)
WHERE hamming <= 3
""")
def dedup_simhash_hamming(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return (D.simhash_hamming_pairs(d, "doc_id", "text", bands=4, max_hamming=3)
            .select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")))


_COS_SQL = ("ROUND(list_dot_product({a}, {b}) / "
            "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 4)")


def _bucket_sql(var: str, n_planes: int = 4, dim: int = 64,
                offset: int = 0) -> str:
    """Random-hyperplane sign bucket, the SQL twin of
    operators.similarity.lsh_bucket (same deterministic planes)."""
    bits = " + ".join(
        f"(CASE WHEN list_aggregate(list_transform(range(0, {dim}), d -> "
        f"{var}[d+1] * ((((({offset + j})*1024 + d) * 2654435761) % 1000) / 499.5 - 1.0)), "
        f"'sum') > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes))
    return f"({bits})"


# embedding-cosine near-dup pairs — LSH-bucketed candidates (equi join
# per hash table, no cartesian node), cosine-verified. The oracle
# reproduces the same two hyperplane families, so the check is exact.
@_reg("dedup_embedding_cosine", f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings WHERE vec_id < 200),
eb AS (SELECT vec_id, v,
              {_bucket_sql('v', 4, 64, offset=0)} AS b0,
              {_bucket_sql('v', 4, 64, offset=4)} AS b1
       FROM e),
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM eb a JOIN eb b ON a.b0 = b.b0 AND a.vec_id < b.vec_id
  UNION
  SELECT a.vec_id, b.vec_id
  FROM eb a JOIN eb b ON a.b1 = b.b1 AND a.vec_id < b.vec_id)
SELECT id_a, id_b, cos FROM (
  SELECT id_a, id_b, {_COS_SQL.format(a='ea.v', b='ez.v')} AS cos
  FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e ez ON ez.vec_id = id_b)
WHERE cos >= 0.3
""")
def dedup_embedding_cosine(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return D.embedding_lsh_cosine_pairs(e, "vec_id", "embedding",
                                        threshold=0.3, n_planes=4, dim=64,
                                        tables=2, max_id=200)


# brute-force cosine top-k (similarity-search baseline)
@_reg("similarity_topk_bruteforce", f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings WHERE vec_id < 300),
q AS (SELECT vec_id, v FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         {_COS_SQL.format(a='q.v', b='e.v')} AS cos
  FROM q JOIN e ON q.vec_id <> e.vec_id)
SELECT query_id, rank, neighbor_id, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 5
""")
def similarity_topk_bruteforce(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    q = e.filter(F.col("vec_id").isin(0, 1, 2, 3, 4))
    return (SIM.brute_force_topk(e, q, "vec_id", "embedding", k=5)
            .select("query_id", F.col("rank").cast("long").alias("rank"),
                    "neighbor_id", "cos"))


# LSH-bucketed approximate top-k with multi-probe (the scale path):
# corpus carries ONE 8-plane bucket; each query probes its bucket plus
# all 8 one-bit neighbors (recall@5 = 0.96 on planted near-dups while
# scanning ~9% of the corpus — tests/test_similarity_recall.py).
_PROBE_MASKS = [0] + [1 << i for i in range(8)]


@_reg("similarity_topk_lsh", f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings WHERE vec_id < 300),
eb AS (SELECT vec_id, v, {_bucket_sql('v', 8, 64)} AS bucket FROM e),
q AS (SELECT vec_id, v, bucket FROM eb WHERE vec_id IN (0, 1, 2, 3, 4)),
probes AS (
  SELECT vec_id, v,
         unnest(list_transform({_PROBE_MASKS}, m -> xor(bucket, m::BIGINT))) AS bucket
  FROM q),
scored AS (
  SELECT p.vec_id AS query_id, eb.vec_id AS neighbor_id,
         {_COS_SQL.format(a='p.v', b='eb.v')} AS cos
  FROM probes p JOIN eb ON p.bucket = eb.bucket AND p.vec_id <> eb.vec_id)
SELECT query_id, rank, neighbor_id, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 5
""")
def similarity_topk_lsh(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    q = e.filter(F.col("vec_id").isin(0, 1, 2, 3, 4))
    return (SIM.lsh_bucketed_topk(e, q, "vec_id", "embedding",
                                  k=5, n_planes=8, dim=64, probe_flips=1)
            .select("query_id", F.col("rank").cast("long").alias("rank"),
                    "neighbor_id", "cos"))


# IVF approximate top-k: corpus partitioned by nearest centroid (the
# 16 lowest-id vectors — deterministic; production trains k-means),
# queries probe their 4 nearest cells.
@_reg("similarity_topk_ivf", f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings WHERE vec_id < 300),
cent AS (SELECT vec_id AS cent_id, v AS centv FROM e ORDER BY vec_id LIMIT 16),
asg AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cent_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_COS_SQL.format(a='e.v', b='c.centv')} DESC,
                                       c.cent_id) AS rn
    FROM e, cent c) WHERE rn = 1),
q AS (SELECT vec_id, v FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
probes AS (
  SELECT vec_id, v, cell FROM (
    SELECT q.vec_id, q.v, c.cent_id AS cell,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_COS_SQL.format(a='q.v', b='c.centv')} DESC,
                                       c.cent_id) AS rn
    FROM q, cent c) WHERE rn <= 4),
scored AS (
  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
         {_COS_SQL.format(a='p.v', b='a.v')} AS cos
  FROM probes p JOIN asg a ON p.cell = a.cell AND p.vec_id <> a.vec_id)
SELECT query_id, rank, neighbor_id, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 5
""")
def similarity_topk_ivf(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    q = e.filter(F.col("vec_id").isin(0, 1, 2, 3, 4))
    return (SIM.ivf_topk(e, q, "vec_id", "embedding",
                         k=5, n_centroids=16, n_probe=4)
            .select("query_id", F.col("rank").cast("long").alias("rank"),
                    "neighbor_id", "cos"))


# IVF with TRAINED centroids: deterministic seeded k-means (2 fixed
# iterations, fixed-point integer centroid sums so both engines derive
# bit-identical centroids — see operators.similarity.kmeans_centroids).
def _kmeans_iter_sql(i: int, prev: str, dim: int = 64,
                     scale: int = 1_000_000) -> str:
    """One k-means iteration as CTEs: assign (argmax rounded cosine,
    ties to lowest cell) -> exact integer per-(cell,dim) sums ->
    reassembled centroid list; empty cells keep the previous centroid."""
    cos = _COS_SQL.format(a="ei.v", b="c.centv")
    return f"""
a{i} AS (SELECT vec_id, vi, cell FROM (
    SELECT ei.vec_id, ei.vi, c.cent_id AS cell,
           row_number() OVER (PARTITION BY ei.vec_id
                              ORDER BY {cos} DESC, c.cent_id) AS rn
    FROM ei, {prev} c) WHERE rn = 1),
s{i} AS (SELECT cell, d, SUM(vi[d+1]) AS sv, COUNT(*) AS n
         FROM a{i} CROSS JOIN range(0, {dim}) AS t(d) GROUP BY cell, d),
n{i} AS (SELECT cell, list(sv / ({scale}.0 * n) ORDER BY d) AS centv
         FROM s{i} GROUP BY cell),
c{i} AS (SELECT p.cent_id, COALESCE(n{i}.centv, p.centv) AS centv
         FROM {prev} p LEFT JOIN n{i} ON n{i}.cell = p.cent_id)"""


@_reg("similarity_topk_ivf_kmeans", f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings WHERE vec_id < 300),
ei AS (SELECT vec_id, v,
              list_transform(v, x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS vi
       FROM e),
c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, v AS centv
       FROM e ORDER BY vec_id LIMIT 16),
{_kmeans_iter_sql(1, 'c0')},
{_kmeans_iter_sql(2, 'c1')},
asg AS (SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cent_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_COS_SQL.format(a='e.v', b='c.centv')} DESC,
                                       c.cent_id) AS rn
    FROM e, c2 c) WHERE rn = 1),
q AS (SELECT vec_id, v FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
probes AS (SELECT vec_id, v, cell FROM (
    SELECT q.vec_id, q.v, c.cent_id AS cell,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_COS_SQL.format(a='q.v', b='c.centv')} DESC,
                                       c.cent_id) AS rn
    FROM q, c2 c) WHERE rn <= 4),
scored AS (
  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
         {_COS_SQL.format(a='p.v', b='a.v')} AS cos
  FROM probes p JOIN asg a ON p.cell = a.cell AND p.vec_id <> a.vec_id)
SELECT query_id, rank, neighbor_id, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 5
""")
def similarity_topk_ivf_kmeans(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    q = e.filter(F.col("vec_id").isin(0, 1, 2, 3, 4))
    cent = SIM.kmeans_centroids(e, "vec_id", "embedding", k=16, iters=2)
    return (SIM.ivf_topk(e, q, "vec_id", "embedding",
                         k=5, n_probe=4, centroids=cent)
            .select("query_id", F.col("rank").cast("long").alias("rank"),
                    "neighbor_id", "cos"))


# language-ID heuristic
@_reg("text_langid", f"""
WITH d AS (SELECT doc_id, {_WS_SQL} AS ws FROM documents),
h AS (SELECT doc_id,
  len(list_filter(ws, w -> list_contains(['the','a','and','of','to','in','is'], lower(w)))) AS en_hits,
  len(list_filter(ws, w -> list_contains(['le','la','et','de','un','une','est'], lower(w)))) AS fr_hits,
  len(list_filter(ws, w -> list_contains(['der','die','das','und','ein','ist','von'], lower(w)))) AS de_hits
  FROM d)
SELECT doc_id AS doc,
       CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
            WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
            WHEN de_hits > 0 THEN 'de' ELSE 'und' END AS lang_guess,
       en_hits, fr_hits, de_hits
FROM h
""")
def text_langid(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    out = TS.language_id(d, "doc_id", "text")
    return out.select("doc", "lang_guess",
                      F.col("en_hits").cast("long").alias("en_hits"),
                      F.col("fr_hits").cast("long").alias("fr_hits"),
                      F.col("de_hits").cast("long").alias("de_hits"))


# quality scoring
@_reg("text_quality", f"""
WITH d AS (SELECT doc_id, text, {_WS_SQL} AS ws,
                  length(text) AS n_chars,
                  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                  length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct
           FROM documents),
h AS (SELECT doc_id, n_chars, n_alpha, n_punct, len(ws) AS n_words,
  len(list_filter(ws, w -> list_contains(['the','a','and','of','to','in','is'], lower(w))))
  + len(list_filter(ws, w -> list_contains(['le','la','et','de','un','une','est'], lower(w))))
  + len(list_filter(ws, w -> list_contains(['der','die','das','und','ein','ist','von'], lower(w)))) AS stop
  FROM d)
SELECT doc_id AS doc, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_words AS BIGINT) AS n_words,
       ROUND(n_alpha / greatest(n_chars, 1), 4) AS alpha_ratio,
       ROUND(n_punct / greatest(n_chars, 1), 4) AS punct_ratio,
       ROUND(stop / greatest(n_words, 1), 4) AS stop_ratio,
       ROUND(n_alpha / greatest(n_words, 1), 4) AS mean_word_len,
       ROUND(((CASE WHEN n_chars < 100 THEN 0.2 WHEN n_chars < 1000 THEN 1.0 ELSE 0.7 END)
              + ROUND(n_alpha / greatest(n_chars, 1), 4)
              + least(ROUND(stop / greatest(n_words, 1), 4) * 3, 1.0)
              + (1 - least(ROUND(n_punct / greatest(n_chars, 1), 4) * 10, 1.0))) / 4, 6) AS quality
FROM h
""")
def text_quality(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    out = TS.quality_score(d, "doc_id", "text")
    return out.select("doc", F.col("n_chars").cast("long").alias("n_chars"),
                      F.col("n_words").cast("long").alias("n_words"),
                      "alpha_ratio", "punct_ratio", "stop_ratio",
                      "mean_word_len", "quality")


# token counting (whitespace + BPE-ish regex)
@_reg("text_token_counts", f"""
SELECT doc_id AS doc,
       CAST(len({_WS_SQL}) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""")
def text_token_counts(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    out = TS.token_counts(d, "doc_id", "text")
    return out.select("doc", F.col("ws_tokens").cast("long").alias("ws_tokens"),
                      F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
                      F.col("n_chars").cast("long").alias("n_chars"))


# Composed corpus-cleaning pass: quality gate -> exact-dup collapse
# (min doc_id per content hash) -> language tag + token counters.
@_reg("corpus_clean_pipeline", f"""
WITH d AS (SELECT doc_id, text, {_WS_SQL} AS ws,
                  length(text) AS n_chars,
                  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                  length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct
           FROM documents),
h AS (SELECT doc_id, text, ws, n_chars, n_alpha, n_punct, len(ws) AS n_words,
  len(list_filter(ws, w -> list_contains(['the','a','and','of','to','in','is'], lower(w)))) AS en_hits,
  len(list_filter(ws, w -> list_contains(['le','la','et','de','un','une','est'], lower(w)))) AS fr_hits,
  len(list_filter(ws, w -> list_contains(['der','die','das','und','ein','ist','von'], lower(w)))) AS de_hits
  FROM d),
q AS (SELECT doc_id, text, ws, n_chars, en_hits, fr_hits, de_hits,
      ROUND(((CASE WHEN n_chars < 100 THEN 0.2 WHEN n_chars < 1000 THEN 1.0 ELSE 0.7 END)
             + ROUND(n_alpha / greatest(n_chars, 1), 4)
             + least(ROUND((en_hits + fr_hits + de_hits) / greatest(n_words, 1), 4) * 3, 1.0)
             + (1 - least(ROUND(n_punct / greatest(n_chars, 1), 4) * 10, 1.0))) / 4, 6) AS quality
      FROM h),
kept AS (SELECT *, md5(text) AS content_md5 FROM q WHERE quality >= 0.5),
canon AS (SELECT content_md5, MIN(doc_id) AS doc_id FROM kept GROUP BY 1),
uniq AS (SELECT k.* FROM kept k
         JOIN canon c ON k.doc_id = c.doc_id AND k.content_md5 = c.content_md5)
SELECT doc_id AS doc, content_md5, quality,
       CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
            WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
            WHEN de_hits > 0 THEN 'de' ELSE 'und' END AS lang_guess,
       CAST(len(ws) AS BIGINT) AS ws_tokens,
       CAST(n_chars AS BIGINT) AS n_chars
FROM uniq
""")
def corpus_clean_pipeline(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"))
    return TS.clean_corpus(d, "doc_id", "text", min_quality=0.5)


# document fingerprinting (rolling hash)
@_reg("text_fingerprint", f"""
SELECT doc_id AS doc,
       list_reduce(list_transform(
         string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ''),
         c -> ascii(c)::BIGINT),
         (a, b) -> (a * 31 + b) % {_P}) AS fingerprint
FROM documents WHERE length(trim(text)) > 0
""")
def text_fingerprint(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents")).filter(F.length(F.trim("text")) > 0)
    return TS.fingerprints(d, "doc_id", "text")


# corpus profiling: ROLLUP over (lang, source) — partial-agg friendly
# multi-level stats in one pass (the shape a 100 TB corpus profile job
# runs; subtotals come free from the same shuffle)
@_reg("corpus_profile_rollup", """
SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(n_chars), 4) AS avg_chars
FROM documents GROUP BY ROLLUP (lang, source)
""")
def corpus_profile_rollup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (d.rollup("lang", "source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"))
            .select(F.coalesce("lang", F.lit("ALL")).alias("lang"),
                    F.coalesce("source", F.lit("ALL")).alias("source"),
                    "n_docs", "total_chars", "avg_chars"))


# exact length quantiles per language (Spark `percentile` and DuckDB
# `quantile_cont` share the linear-interpolation definition, so the
# check is exact at 4dp)
@_reg("text_length_quantiles", """
SELECT lang,
       ROUND(quantile_cont(n_chars, 0.25), 4) AS p25,
       ROUND(quantile_cont(n_chars, 0.50), 4) AS p50,
       ROUND(quantile_cont(n_chars, 0.75), 4) AS p75,
       ROUND(quantile_cont(n_chars, 0.95), 4) AS p95
FROM documents GROUP BY lang
""")
def text_length_quantiles(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy("lang")
            .agg(*[F.round(F.expr(f"percentile(n_chars, {q})"), 4).alias(n)
                   for q, n in [(0.25, "p25"), (0.50, "p50"),
                                (0.75, "p75"), (0.95, "p95")]]))


# deterministic content-hash sampling: the reproducible train/eval
# split a pipeline needs (same rows in ANY engine / at ANY scale —
# no RAND(), no per-run drift; pushes down as a cheap filter)
@_reg("corpus_sample_hash", f"""
SELECT doc_id, lang FROM documents
WHERE {_H64.format(s='text')} % 10 = 0
""")
def corpus_sample_hash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (d.filter(md5_hash64(F.col("text")) % 10 == 0)
            .select("doc_id", "lang"))


# non-distinct word bigrams (the counting twin of _sh_sql, which dedups)
_GRAMS_SQL = ("list_transform(range(1, greatest(len(ws), 1)), "
              "i -> ws[i] || ' ' || ws[i+1])")


# benchmark decontamination: docs sharing any word 2-gram with the
# benchmark set (here: every 20th doc stands in for an eval set) are
# flagged with their distinct-shingle hit count. Scale shape: tiny
# benchmark side -> broadcast; corpus side dedups shingles in-row
# before the explode (operators/corpusops.py).
@_reg("decontam_ngram", f"""
WITH d AS (SELECT doc_id, {_WS_SQL} AS ws FROM documents),
bsh AS (SELECT DISTINCT unnest({_GRAMS_SQL}) AS shingle FROM d WHERE doc_id % 20 = 0),
dsh AS (SELECT doc_id AS doc, unnest(list_distinct({_GRAMS_SQL})) AS shingle FROM d)
SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM dsh JOIN bsh USING (shingle)
GROUP BY doc
""")
def decontam_ngram(spark, sf_dir):
    from pywdcollections_spark.operators.corpusops import contamination_hits
    d = _spread(_t(spark, sf_dir, "documents"))
    bench = d.filter(F.col("doc_id") % 20 == 0)
    return contamination_hits(d, bench, "doc_id", "text", n=2) \
        .select("doc", F.col("n_hits").cast("long").alias("n_hits"))


# Gopher-style repetition features: duplicate-word / duplicate-line
# fractions + top-bigram slot coverage (operators/corpusops.py)
@_reg("quality_repetition", f"""
WITH d AS (SELECT doc_id, text, {_WS_SQL} AS ws FROM documents),
b AS (SELECT doc_id, ws,
        list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                    l -> l <> '') AS lines,
        {_GRAMS_SQL} AS grams
      FROM d),
ex AS (SELECT doc_id, unnest(grams) AS gram FROM b),
cnt AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM ex GROUP BY 1, 2),
top AS (SELECT doc_id, MAX(cnt) AS top_bigram_cnt FROM cnt GROUP BY 1)
SELECT b.doc_id AS doc,
       CAST(len(ws) AS BIGINT) AS n_words,
       CASE WHEN len(ws) > 0
            THEN ROUND(1 - len(list_distinct(ws)) / len(ws), 6)
            ELSE 0.0 END AS dup_word_frac,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CASE WHEN len(lines) > 0
            THEN ROUND(1 - len(list_distinct(lines)) / len(lines), 6)
            ELSE 0.0 END AS dup_line_frac,
       CAST(COALESCE(top_bigram_cnt, 0) AS BIGINT) AS top_bigram_cnt,
       CASE WHEN len(ws) > 1
            THEN ROUND(COALESCE(top_bigram_cnt, 0) / (len(ws) - 1), 6)
            ELSE 0.0 END AS top_bigram_frac
FROM b LEFT JOIN top USING (doc_id)
""")
def quality_repetition(spark, sf_dir):
    from pywdcollections_spark.operators.corpusops import repetition_stats
    d = _spread(_t(spark, sf_dir, "documents"))
    return repetition_stats(d, "doc_id", "text")


# PII scrubbing: the fixture corpus carries no PII, so both sides
# append deterministic contact footers to a subset of docs first —
# the oracle then checks counts AND the scrubbed-text md5 (regex
# dialect parity: patterns restricted to Java==RE2 syntax,
# operators/corpusops.py EMAIL_RE/IPV4_RE/PHONE_RE)
from pywdcollections_spark.operators.corpusops import (  # noqa: E402
    EMAIL_RE, IPV4_RE, PHONE_RE)

_PII_SQL = ("""
WITH aug AS (
  SELECT doc_id, text ||
    (CASE WHEN doc_id % 7 = 0
          THEN ' contact user' || doc_id::VARCHAR || '@example.com now'
          ELSE '' END) ||
    (CASE WHEN doc_id % 11 = 0
          THEN ' from 10.0.' || (doc_id % 256)::VARCHAR || '.1 tel +4915123456'
               || (doc_id % 10)::VARCHAR
          ELSE '' END) AS text
  FROM documents)
SELECT doc_id AS doc,
       CAST(len(regexp_extract_all(text, '""" + EMAIL_RE + """')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '""" + IPV4_RE + """')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '""" + PHONE_RE + """')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '""" + EMAIL_RE + """', '[EMAIL]', 'g'),
           '""" + IPV4_RE + """', '[IP]', 'g'),
           '""" + PHONE_RE + """', '[PHONE]', 'g')) AS scrubbed_md5
FROM aug
""")


@_reg("pii_scrub", _PII_SQL)
def pii_scrub_q(spark, sf_dir):
    from pywdcollections_spark.operators.corpusops import pii_scrub
    d = _spread(_t(spark, sf_dir, "documents"))
    footer = (
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                        F.lit("@example.com now"))).otherwise(F.lit("")))
    footer2 = (
        F.when(F.col("doc_id") % 11 == 0,
               F.concat(F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
                        F.lit(".1 tel +4915123456"),
                        (F.col("doc_id") % 10).cast("string"))).otherwise(F.lit("")))
    aug = d.select("doc_id", F.concat("text", footer, footer2).alias("text"))
    return pii_scrub(aug, "doc_id", "text") \
        .select("doc", "n_emails", "n_ipv4", "n_phones", "scrubbed_md5")


# sequence packing: stable (bucket, shard, start_offset) layout via a
# per-bucket running token sum — parallel across hash lanes, never a
# global single-partition window (operators/corpusops.py)
@_reg("pack_sequences", f"""
WITH t AS (
  SELECT doc_id AS doc,
         CAST(len({_WS_SQL}) AS BIGINT) AS n_tokens,
         ({_H64.format(s='doc_id::VARCHAR')} % 8) AS bucket
  FROM documents)
SELECT doc, bucket, n_tokens,
       CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS start_offset,
       CAST(floor((SUM(n_tokens) OVER w - n_tokens) / 128) AS BIGINT) AS shard
FROM t
WINDOW w AS (PARTITION BY bucket ORDER BY doc
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""")
def pack_sequences_q(spark, sf_dir):
    from pywdcollections_spark.operators.corpusops import pack_sequences
    d = _spread(_t(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.size(words(F.col("text"))).alias("ws_tokens"))
    return pack_sequences(toks, "doc_id", "ws_tokens",
                          ctx_tokens=128, n_buckets=8)


# alias-trie scorer (north-star "batched dictionary + alias-trie
# scorer"; operators/alias_link.py): mention -> word-boundary prefixes
# (the trie's root-to-node paths) -> equi-join the alias dim -> longest
# match wins, min-qid tie-break, integer cross-multiplied min_score.
# Demo corpus: region||nation mentions against a nation+region alias
# dim — "MIDDLE EAST division NATION_9" must resolve through the
# 2-word alias, 'territory ...' mentions have no alias prefix (drop),
# and long-tail mentions fall under the score threshold (drop).
@_reg("alias_link_residue", """
WITH m AS (
  SELECT r_name || ' division ' || n_name AS mention
  FROM nation JOIN region ON n_regionkey = r_regionkey
  UNION ALL SELECT 'territory ' || r_name FROM region
  UNION ALL SELECT n_name ||
    ' one two three four five six seven eight nine ten eleven twelve'
  FROM nation
), a AS (
  SELECT lower(n_name) AS alias_lc, n_nationkey::BIGINT AS qid FROM nation
  UNION ALL SELECT lower(r_name), (100 + r_regionkey)::BIGINT FROM region
), norm AS (
  SELECT mention,
         trim(regexp_replace(lower(mention),
                             '[^\\p{L}\\p{N}]+', ' ', 'g')) AS mention_norm
  FROM m
), words AS (
  SELECT mention, mention_norm, string_split(mention_norm, ' ') AS w FROM norm
), pref AS (
  SELECT mention, mention_norm, array_to_string(w[1:k], ' ') AS prefix
  FROM words CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS k) ks
  WHERE k <= len(w)
), cand AS (
  SELECT p.mention, a.qid,
         length(p.prefix)::BIGINT AS matched_len,
         length(p.mention_norm)::BIGINT AS mention_len,
         row_number() OVER (PARTITION BY p.mention
                            ORDER BY length(p.prefix) DESC, a.qid) AS rn
  FROM pref p JOIN a ON p.prefix = a.alias_lc
)
SELECT mention, qid, matched_len, mention_len
FROM cand WHERE rn = 1 AND matched_len * 10000 >= 1500 * mention_len
""")
def alias_link_residue(spark, sf_dir):
    from pywdcollections_spark.operators.alias_link import (alias_link,
                                                            normalize_aliases)
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    m = (nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
         .select(F.concat("r_name", F.lit(" division "), "n_name")
                 .alias("mention"))
         .unionByName(region.select(
             F.concat(F.lit("territory "), "r_name").alias("mention")))
         .unionByName(nation.select(
             F.concat("n_name", F.lit(" one two three four five six seven "
                                      "eight nine ten eleven twelve"))
             .alias("mention"))))
    aliases = normalize_aliases(
        nation.select(F.col("n_name").alias("alias"),
                      F.col("n_nationkey").cast("long").alias("qid"))
        .unionByName(region.select(
            F.col("r_name").alias("alias"),
            (F.col("r_regionkey") + 100).cast("long").alias("qid"))))
    return alias_link(m, aliases, mention_col="mention",
                      max_words=4, min_score=0.15)


# ---------------------------------------------------------------------------
# Flagship KG pipeline vs the independent golden generator
#
# The oracle side is the GOLDEN fixture: testkit.validate_golden
# re-derives the expected (subj, pred, obj_raw, obj_norm, source) rows
# for the same (n_pages, seed, head_templates) in pure Python row loops
# sharing NO code with the engine's set-based operators; the rows are
# written once to a deterministic parquet that the oracle SQL reads, so
# the driver's hash check compares the Spark pipeline against a fully
# independent reimplementation of the reference writers
# (pywdcollections.py:1061-1337).

_GOLDEN_FIXTURE = {"n_pages": 150, "seed": 42, "head_templates": 25}


def _golden_cache_token() -> str:
    """Content token for the cached golden parquet (ADVICE r4): the
    filename embeds a hash of the generator SOURCE plus the uid, so a
    semantic change to the golden generator invalidates the cache
    instead of serving stale fixture rows, and two users on one box
    don't collide in shared /tmp."""
    import hashlib
    import os
    import pathlib

    tk = pathlib.Path(__file__).parent / "testkit"
    h = hashlib.md5()
    for name in ("generate.py", "validate_golden.py"):
        h.update((tk / name).read_bytes())
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return f"u{uid}_{h.hexdigest()[:10]}"


_GOLDEN_PATH = ("/tmp/pywdc_golden_kg_harvest_n150_s42_h25_"
                f"{_golden_cache_token()}.parquet")


def ensure_golden_harvest_parquet() -> str:
    """Write the golden expected-triples parquet if absent (atomic
    rename; content is a pure function of the fixture params). Called
    from both the query and the oracle_sql() accessor so the file
    exists whichever side the driver evaluates first."""
    import os
    import uuid

    import pandas as pd

    if not os.path.exists(_GOLDEN_PATH):
        from pywdcollections_spark.testkit.validate_golden import expected_validation
        valid, _ = expected_validation(
            _GOLDEN_FIXTURE["n_pages"], _GOLDEN_FIXTURE["seed"],
            head_templates=_GOLDEN_FIXTURE["head_templates"])
        pdf = pd.DataFrame(valid)[["subj", "pred", "obj_raw", "obj_norm", "source"]]
        tmp = f"{_GOLDEN_PATH}.tmp-{uuid.uuid4().hex}"
        pdf.to_parquet(tmp)
        os.replace(tmp, _GOLDEN_PATH)
    return _GOLDEN_PATH


@_reg("kg_harvest_fixture", f"""
SELECT subj, pred, obj_raw, obj_norm, source
FROM read_parquet('{_GOLDEN_PATH}')
""")
def kg_harvest_fixture(spark, sf_dir):
    """Flagship KG pipeline over the deterministic fixture pages table
    (BASELINE.json north_rule), hash-checked against the independent
    golden-generator parquet (see ensure_golden_harvest_parquet)."""
    from pywdcollections_spark.config import demo_config
    from pywdcollections_spark.plans.pipeline import build_kg
    from pywdcollections_spark.testkit import spark_tables as TK
    ensure_golden_harvest_parquet()
    n = _GOLDEN_FIXTURE["n_pages"]
    pages = TK.pages_df(spark, n, seed=_GOLDEN_FIXTURE["seed"],
                        head_templates=_GOLDEN_FIXTURE["head_templates"])
    dims = TK.dim_dfs(spark, n, seed=_GOLDEN_FIXTURE["seed"])
    return (build_kg(spark, pages, demo_config(), dims)["triples"]
            .select("subj", "pred", "obj_raw", "obj_norm", "source"))


# Multimodal feature extraction. The synthetic payload is a pure
# function of media_id (testable plumbing; real codecs stubbed), so the
# oracle recomputes header dims + chunk means from range(64) directly —
# no table needed. The array<float> feature column is serialized to a
# fixed-format csv so the driver's canonicalization can hash it.
@_reg("multimodal_features", """
WITH m AS (SELECT range AS i FROM range(64)),
f AS (
  SELECT i,
         array_to_string(list_transform(range(0, 8), c ->
           printf('%.4f', ROUND(
             list_aggregate(list_transform(range(c*8, c*8+8), j -> (i*j) % 251),
                            'sum') / 8.0, 4))), ',') AS feature_csv
  FROM m)
SELECT i AS media_id, 'image' AS kind,
       CAST(((i >> 8) & 255) * 256 + (i & 255) AS BIGINT)       AS height,
       CAST(((i*3) & 255) * 256 + ((i*7) & 255) AS BIGINT)      AS width,
       CAST(68 AS BIGINT) AS n_bytes, feature_csv
FROM m JOIN f USING (i)
""")
def multimodal_features(spark, sf_dir):
    """Binary media column plumbing (decode core stubbed — no codecs in
    the container; Spark-side schema/batching/vectorization is real)."""
    from pywdcollections_spark.operators.multimodal import (
        extract_media_features, synthetic_media)
    feats = extract_media_features(synthetic_media(spark, 64))
    return feats.select(
        "media_id", "kind",
        F.col("height").cast("long").alias("height"),
        F.col("width").cast("long").alias("width"),
        "n_bytes",
        F.concat_ws(",", F.transform(
            "feature",
            lambda x: F.format_string("%.4f", x.cast("double")))).alias("feature_csv"))


# Frame-sampling plumbing over the same deterministic payloads: body
# byte j of media i is (i*j)%251, frames are 8-byte records, stride 2.
@_reg("multimodal_frame_sample", """
WITH m AS (SELECT range AS i FROM range(64)),
k AS (SELECT unnest([0, 2, 4, 6]) AS frame_idx)
SELECT i AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(4 + frame_idx * 8 AS BIGINT) AS offset,
       CAST(8 AS BIGINT) AS frame_bytes,
       ROUND(list_aggregate(list_transform(range(frame_idx*8, frame_idx*8 + 8),
                                           j -> (i*j) % 251), 'sum') / 8.0, 4) AS mean
FROM m, k
""")
def multimodal_frame_sample(spark, sf_dir):
    from pywdcollections_spark.operators.multimodal import (
        sample_frames, synthetic_media)
    fr = sample_frames(synthetic_media(spark, 64), frame_bytes=8, stride=2)
    return fr.select("media_id",
                     F.col("frame_idx").cast("long").alias("frame_idx"),
                     "offset",
                     F.col("frame_bytes").cast("long").alias("frame_bytes"),
                     "mean")
