"""Snapshot diff / data-versioning operators.

A 100 TB corpus is rebuilt incrementally: every pipeline run
publishes a new snapshot and the operational questions are "what
changed since the last one" (audit) and "ship only the delta"
(incremental downstream rebuilds). The reference has no analogue —
its ETL overwrites documents via per-record upserts
(etl_cricsheet_to_mongo.py:136) with no way to ask what an upsert
batch DID. ``snapshot_diff`` answers that as one declarative plan.

Shape: full-outer join of the two snapshots on the business key,
row status decided column-by-column with null-safe equality:

- ``added``     — key present only in the new snapshot
- ``removed``   — key present only in the old snapshot
- ``changed``   — key in both, at least one compared column differs
- ``unchanged`` — key in both, all compared columns null-safe-equal

Scale posture: ONE co-partitioned shuffle join on the key; both
sides are pruned to (key ∪ compared) columns before the exchange, so
a diff over a wide 100 TB table moves only the audited columns. For
very wide compare lists the standard lever is to pre-hash the
compared columns into a 16-byte digest per side (xxhash64 / md5) so
the exchange carries key+digest instead of the payload — same plan
shape, and `changed` rows are re-verified column-wise after the
match. The driver query compares column-wise directly (digest-free)
so the DuckDB oracle is exact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.functions.scalar import cents
from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-status diff of two snapshots of the same logical table.

    Returns one row per key present in either snapshot with columns
    ``<key_cols>``, ``status`` and, for every compared column ``c``,
    ``old_<c>`` / ``new_<c>``. Null-safe equality throughout: a
    column going NULL→NULL is unchanged, NULL→value is changed.
    """
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [o[f"__ok_{k}"].eqNullSafe(n[f"__nk_{k}"]) for k in key_cols],
    )
    joined = o.join(n, cond, "full_outer")
    # presence markers, NOT key.isNotNull(): the join matches NULL
    # keys null-safely, so a NULL business key is a legal matched row
    in_old = joined["__in_old"].isNotNull()
    in_new = joined["__in_new"].isNotNull()
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
        F.lit(True),
    )
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    keys = [
        F.coalesce(joined[f"__ok_{k}"], joined[f"__nk_{k}"]).alias(k)
        for k in key_cols
    ]
    return joined.select(
        *keys,
        status.alias("status"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )  # __in_old/__in_new markers are dropped by the explicit select


# Deterministic synthetic snapshot pair derived from orders: the old
# snapshot is missing every 101st key (those read as "added"), the
# new snapshot dropped every 97th key ("removed"), and every 11th
# surviving key got a +$1.00 reprice ("changed").
OLD_SKIP = 101
NEW_SKIP = 97
REPRICE_EVERY = 11
REPRICE_CENTS = 100


def dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: audit summary of a snapshot diff — per-status
    row count, key checksum, and the net reprice delta in cents
    (all integers, so partial aggregation is exact)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        cents(F.col("o_totalprice")).alias("price_c"),
    )
    old = orders.filter(
        F.pmod(F.col("o_orderkey"), F.lit(OLD_SKIP)) != 0
    )
    new = orders.filter(
        F.pmod(F.col("o_orderkey"), F.lit(NEW_SKIP)) != 0
    ).withColumn(
        "price_c",
        F.col("price_c")
        + F.when(
            F.pmod(F.col("o_orderkey"), F.lit(REPRICE_EVERY)) == 0,
            F.lit(REPRICE_CENTS),
        ).otherwise(F.lit(0)),
    )
    diff = snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "price_c"]
    )
    return (
        diff.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.sum(
                F.when(
                    F.col("status") == "changed",
                    F.col("new_price_c") - F.col("old_price_c"),
                )
            ).alias("price_delta_c"),
        )
        .orderBy("status")
    )


ORACLE_DATASET_DIFF = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
), old AS (
  SELECT * FROM base WHERE o_orderkey % {OLD_SKIP} <> 0
), new AS (
  SELECT o_orderkey, o_orderstatus,
         price_c + CASE WHEN o_orderkey % {REPRICE_EVERY} = 0
                        THEN {REPRICE_CENTS} ELSE 0 END AS price_c
  FROM base WHERE o_orderkey % {NEW_SKIP} <> 0
), diff AS (
  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
         CASE WHEN old.o_orderkey IS NULL THEN 'added'
              WHEN new.o_orderkey IS NULL THEN 'removed'
              WHEN old.o_orderstatus IS NOT DISTINCT FROM new.o_orderstatus
               AND old.price_c IS NOT DISTINCT FROM new.price_c
              THEN 'unchanged'
              ELSE 'changed' END AS status,
         old.price_c AS old_price_c, new.price_c AS new_price_c
  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
)
SELECT status,
       COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(SUM(CASE WHEN status = 'changed'
                     THEN new_price_c - old_price_c END) AS BIGINT)
           AS price_delta_c
FROM diff
GROUP BY status
ORDER BY status
"""


# --------------------------------------------------------------------------
# incremental aggregate maintenance

INC_CUTOFF = "2024-01-20"  # snapshot covers [start, cutoff), delta the rest


def merge_partial_aggs(
    snapshot: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Merge two partial-aggregate tables (same schema: keys +
    additive measures) into the aggregate of their union — the
    incremental-view-maintenance core: refreshing a 100 TB rollup
    after a day of new data costs one pass over the DELTA plus a
    shuffle of two aggregate-sized (not fact-sized) tables, never a
    rescan of the base. Works for any commutative-monoid measure
    (counts, integer sums, min/max would need their own combine);
    averages must be carried as (sum, count) pairs — the same
    decomposition Spark's own partial aggregation uses."""
    measures = [c for c in snapshot.columns if c not in keys]
    return (
        snapshot.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in measures])
    )


def incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: maintain a per-(event_type, day) rollup
    incrementally — aggregate the pre-cutoff snapshot and the
    post-cutoff delta separately, merge the partials, and the result
    must equal the direct aggregate over all events (the oracle
    computes it that way). Value mass is summed in integer micros so
    the partial-merge is exact, not approximately associative."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "ts",
        F.round(F.col("value") * 1e6, 0).cast("long").alias("value_micro"),
    )
    cutoff = F.lit(INC_CUTOFF).cast("timestamp_ntz")

    def agg(part: DataFrame) -> DataFrame:
        return part.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_micro").alias("value_micro_total"),
        )

    snapshot = agg(ev.filter(F.col("ts") < cutoff))
    delta = agg(ev.filter(F.col("ts") >= cutoff))
    return merge_partial_aggs(
        snapshot, delta, ["event_type", "day"]
    ).orderBy("event_type", "day")


MAD_K = 3  # flag hours beyond 3 robust deviations


def rollup_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection over the hourly event rollup —
    the alerting pass a monitoring pipeline runs on every metric
    stream: per event type, flag hours whose count deviates from the
    type's MEDIAN by more than {MAD_K}× the median absolute
    deviation. Median/MAD, not mean/stddev: one genuinely anomalous
    hour inflates a stddev enough to hide itself (masking); the
    breakdown point of the median makes the detector stable.

    Exactness: counts are integers; medians of integers are exact
    halves (.0/.5 — exactly representable doubles with identical
    interpolation on both engines), so the flag comparisons are
    deterministic. Plan: one map-combined rollup shuffle, a tiny
    per-type robust-stats aggregate (two exact percentiles),
    broadcast back onto the rollup — the fact table is read once."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 3600000000"
            ).alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    med = hourly.groupBy("event_type").agg(
        F.percentile("n", 0.5).alias("med")
    )
    dev = hourly.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("n") - F.col("med")), 0.5).alias("mad"),
        F.first("med").alias("med"),
    )
    return (
        hourly.join(F.broadcast(mad), "event_type")
        .filter(
            F.abs(F.col("n") - F.col("med")) > MAD_K * F.col("mad")
        )
        .select(
            "event_type",
            "hr",
            "n",
            F.round("med", 1).alias("med"),
            F.round("mad", 1).alias("mad"),
        )
        .orderBy("event_type", "hr")
    )


ORACLE_ROLLUP_ANOMALIES = f"""
WITH hourly AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 AS hr,
         COUNT(*) AS n
  FROM events GROUP BY event_type, hr
), med AS (
  SELECT event_type, quantile_cont(n, 0.5) AS med
  FROM hourly GROUP BY event_type
), mad AS (
  SELECT h.event_type,
         quantile_cont(ABS(h.n - m.med), 0.5) AS mad,
         ANY_VALUE(m.med) AS med
  FROM hourly h JOIN med m ON h.event_type = m.event_type
  GROUP BY h.event_type
)
SELECT h.event_type, h.hr, h.n,
       ROUND(s.med, 1) AS med, ROUND(s.mad, 1) AS mad
FROM hourly h JOIN mad s ON h.event_type = s.event_type
WHERE ABS(h.n - s.med) > {MAD_K} * s.mad
ORDER BY h.event_type, h.hr
"""


ORACLE_INCREMENTAL_ROLLUP = """
SELECT event_type,
       strftime(ts, '%Y-%m-%d') AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
           AS value_micro_total
FROM events
GROUP BY event_type, day
ORDER BY event_type, day
"""


# --------------------------------------------------------------------------
# CDC apply (change-data-capture log → snapshot)

CDC_BASE_SKIP = 97      # snapshot is missing every 97th key
CDC_UPD_EVERY = 5       # seq-1 UPDATE: +$1.00 reprice
CDC_DEL_EVERY = 11      # seq-2 DELETE
CDC_INS_PRICE_BUMP = 7  # seq-3 INSERT of the missing keys, +7c


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC log to a snapshot: changes carry full row images
    with an op ('U' upsert-image, 'D' delete) and a total-order
    sequence number per key; the highest sequence wins and a final
    'D' removes the key (Debezium-style envelope, collapsed).

    Plan: the snapshot unions in as sequence-0 images, ONE exchange
    on the key, a per-key row_number by descending sequence, keep
    rank 1 where the op isn't a delete. No join node — applying a
    day's log to a 100 TB snapshot costs one co-partitioned shuffle
    of (snapshot + log), the same floor as the diff. Ties beyond the
    sequence are broken deterministically by op so a replayed log
    cannot flap the result."""
    from pyspark.sql import Window

    snap = snapshot.withColumn(seq_col, F.lit(0).cast("long")).withColumn(
        op_col, F.lit("U")
    )
    unioned = snap.unionByName(changes.select(*snap.columns))
    w = Window.partitionBy(*keys).orderBy(
        F.desc(seq_col), F.desc(op_col)
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != "D"))
        .drop("__rn", seq_col, op_col)
    )


def cdc_apply_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: apply a three-step synthetic CDC log (reprice,
    delete, late insert — with keys hit by BOTH the reprice and the
    later delete, so sequence ordering is load-bearing) and report
    the per-status row count and cent mass of the applied table."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        cents(F.col("o_totalprice")).alias("price_c"),
    )
    key = F.col("o_orderkey")
    snapshot = orders.filter(F.pmod(key, F.lit(CDC_BASE_SKIP)) != 0)
    upd = (
        snapshot.filter(F.pmod(key, F.lit(CDC_UPD_EVERY)) == 0)
        .withColumn("price_c", F.col("price_c") + 100)
        .withColumn("seq", F.lit(1).cast("long"))
        .withColumn("op", F.lit("U"))
    )
    dele = (
        snapshot.filter(F.pmod(key, F.lit(CDC_DEL_EVERY)) == 0)
        .withColumn("seq", F.lit(2).cast("long"))
        .withColumn("op", F.lit("D"))
    )
    ins = (
        orders.filter(F.pmod(key, F.lit(CDC_BASE_SKIP)) == 0)
        .withColumn("price_c", F.col("price_c") + CDC_INS_PRICE_BUMP)
        .withColumn("seq", F.lit(3).cast("long"))
        .withColumn("op", F.lit("U"))
    )
    changes = upd.unionByName(dele).unionByName(ins)
    applied = cdc_apply(snapshot, changes, ["o_orderkey"])
    return (
        applied.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price_c").alias("price_c_total"),
            F.sum("o_orderkey").alias("key_checksum"),
        )
        .orderBy("o_orderstatus")
    )


ORACLE_CDC_APPLY = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
), snapshot AS (
  SELECT *, 0 AS seq, 'U' AS op FROM base
  WHERE o_orderkey % {CDC_BASE_SKIP} <> 0
), upd AS (
  SELECT o_orderkey, o_orderstatus, price_c + 100 AS price_c,
         1 AS seq, 'U' AS op
  FROM snapshot WHERE o_orderkey % {CDC_UPD_EVERY} = 0
), del AS (
  SELECT o_orderkey, o_orderstatus, price_c, 2 AS seq, 'D' AS op
  FROM snapshot WHERE o_orderkey % {CDC_DEL_EVERY} = 0
), ins AS (
  SELECT o_orderkey, o_orderstatus,
         price_c + {CDC_INS_PRICE_BUMP} AS price_c, 3 AS seq, 'U' AS op
  FROM base WHERE o_orderkey % {CDC_BASE_SKIP} = 0
), unioned AS (
  SELECT * FROM snapshot UNION ALL SELECT * FROM upd
  UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                               ORDER BY seq DESC, op DESC) AS rn
  FROM unioned
)
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(price_c) AS BIGINT) AS price_c_total,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
FROM ranked
WHERE rn = 1 AND op <> 'D'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Right-to-be-forgotten cascade (GDPR/CCPA erasure audit)
# ---------------------------------------------------------------------------

FORGET_MOD = 97  # deterministic erasure cohort: custkey % 97 == 0


def forget_users_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure-request propagation: delete a customer cohort and
    everything reachable from it through foreign keys — customers →
    their orders → those orders' line items, plus the events keyed
    by the same ids — and emit the audit row compliance actually
    requires (before/deleted/after per table, with the invariant
    after = before − deleted checkable by eye).

    The deletion set is small relative to the fact tables (an
    erasure batch usually is), so every cascade step is a keys-only
    semi/anti-join; join strategy is left to AQE — it broadcasts the
    key sets while they fit and falls back to shuffled semi-joins
    when the cohort scales with the tables (here it's a fixed
    fraction of customers, so a forced broadcast would OOM at
    100 TB). The one genuinely scale-sensitive step is orders-of-
    deleted-customers → order-key set: it's a filter + projection of
    the orders table, reduced to keys only before the join. At
    100 TB this audit IS the delete job's dry-run plan; the write
    path is partition-overwrite (`operators/sinks.py` backfill) or a
    Delta/Iceberg DELETE with the same anti-join underneath.

    Deterministic cohort (custkey ≡ 0 mod {FORGET_MOD}) so the audit
    is oracle-checkable; a real request list arrives as a table and
    binds to the same plan."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    ev = load_table(spark, sf_dir, "events").select("user_id")

    doomed_c = cust.filter(F.col("c_custkey") % FORGET_MOD == 0)
    # no broadcast hints: the doomed cohort is a fixed fraction of
    # customers/orders, so it scales with SF — AQE broadcasts the key
    # sets while they fit and falls back to shuffled semi-joins at
    # 100 TB; the audit's plan shape (keys-only semi-joins) holds
    # either way
    doomed_o = orders.join(
        doomed_c,
        orders["o_custkey"] == doomed_c["c_custkey"],
        "left_semi",
    ).select("o_orderkey")
    doomed_li = li.join(
        doomed_o,
        li["l_orderkey"] == doomed_o["o_orderkey"],
        "left_semi",
    )
    doomed_ev = ev.filter(F.col("user_id") % FORGET_MOD == 0)

    def audit(name: str, total: DataFrame, doomed: DataFrame) -> DataFrame:
        t = total.agg(F.count(F.lit(1)).alias("rows_before"))
        d = doomed.agg(F.count(F.lit(1)).alias("rows_deleted"))
        return t.crossJoin(d).select(
            F.lit(name).alias("table_name"),
            "rows_before",
            "rows_deleted",
            (F.col("rows_before") - F.col("rows_deleted")).alias(
                "rows_after"
            ),
        )

    rows = [
        audit("customer", cust, doomed_c),
        audit("orders", orders, doomed_o),
        audit("lineitem", li, doomed_li),
        audit("events", ev, doomed_ev),
    ]
    return reduce(DataFrame.unionByName, rows).orderBy("table_name")


ORACLE_FORGET_CASCADE = f"""
WITH doomed_c AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {FORGET_MOD} = 0
), doomed_o AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM doomed_c)
), audit AS (
  SELECT 'customer' AS table_name,
         (SELECT COUNT(*) FROM customer) AS rows_before,
         (SELECT COUNT(*) FROM doomed_c) AS rows_deleted
  UNION ALL
  SELECT 'orders',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM doomed_o)
  UNION ALL
  SELECT 'lineitem',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_o))
  UNION ALL
  SELECT 'events',
         (SELECT COUNT(*) FROM events),
         (SELECT COUNT(*) FROM events WHERE user_id % {FORGET_MOD} = 0)
)
SELECT table_name, rows_before, rows_deleted,
       rows_before - rows_deleted AS rows_after
FROM audit
ORDER BY table_name
"""


# ---------------------------------------------------------------------------
# Retention GC plan — what a time-travel VACUUM would delete
# ---------------------------------------------------------------------------

GC_RETAIN_DAYS = 90


def retention_gc_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel retention planner (the Delta VACUUM / Iceberg
    expire-snapshots decision, computed BEFORE deleting anything):
    treating each customer's order sequence as that account's SCD2
    version chain (version valid from its order date to the next
    order's date), report per market segment how many versions a
    90-day retention policy may delete — a version is deletable iff
    it was SUPERSEDED before the retention cutoff (its valid_to <
    max_date − 90d); the latest version per key is always kept
    (valid_to = ∞). The deletable fraction is the storage the GC
    reclaims; the kept tail is what time-travel queries can still
    reach.

    Shape: one customer-keyed window (lead) builds valid_to, the
    global cutoff arrives as a 1-row broadcast, and the readout is a
    segment rollup — integer day arithmetic end to end."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("d"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    versions = o.select(
        "o_custkey",
        "d",
        F.lead("d", 1).over(w).alias("valid_to"),
    )
    cutoff = o.agg(
        (F.max("d") - F.lit(GC_RETAIN_DAYS)).alias("cut")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    flagged = (
        versions.crossJoin(F.broadcast(cutoff))
        .join(cust, versions.o_custkey == cust.c_custkey)
        .select(
            "c_mktsegment",
            F.when(
                F.col("valid_to").isNotNull()
                & (F.col("valid_to") < F.col("cut")),
                1,
            )
            .otherwise(0)
            .alias("deletable"),
        )
    )
    return (
        flagged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.sum("deletable").alias("n_deletable"),
        )
        .select(
            "c_mktsegment",
            "n_versions",
            "n_deletable",
            (F.col("n_versions") - F.col("n_deletable")).alias("n_kept"),
            F.round(
                F.col("n_deletable").cast("double")
                / F.col("n_versions").cast("double"),
                6,
            ).alias("deletable_frac"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_RETENTION_GC = f"""
WITH o AS (
  SELECT o_custkey, o_orderkey,
         epoch_us(o_orderdate) // 86400000000 AS d
  FROM orders
), versions AS (
  SELECT o_custkey, d,
         LEAD(d, 1) OVER (PARTITION BY o_custkey
                          ORDER BY d, o_orderkey) AS valid_to
  FROM o
), cutoff AS (SELECT MAX(d) - {GC_RETAIN_DAYS} AS cut FROM o),
flagged AS (
  SELECT c_mktsegment,
         CASE WHEN valid_to IS NOT NULL AND valid_to < cut
              THEN 1 ELSE 0 END AS deletable
  FROM versions, cutoff
  JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, COUNT(*) AS n_versions,
       CAST(SUM(deletable) AS BIGINT) AS n_deletable,
       COUNT(*) - CAST(SUM(deletable) AS BIGINT) AS n_kept,
       ROUND(CAST(SUM(deletable) AS DOUBLE) / COUNT(*), 6)
         AS deletable_frac
FROM flagged
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Referential-integrity audit across the star schema
# ---------------------------------------------------------------------------

def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan scan over every foreign-key edge of the star schema
    (lineitem→orders/part/supplier, orders→customer,
    customer/supplier→nation, nation→region) — the referential-
    integrity audit a lakehouse runs after every ingest, because
    parquet enforces nothing: one row per FK edge with child row
    count and orphan count. Each edge is a left-anti join on the key
    (broadcastable dimension side where AQE chooses; the big fact
    edges co-partition), and the seven counts union into a
    7-row report.

    An orphan count of zero everywhere is the precondition for every
    join in this catalog being lossless inner joins."""
    edges = [
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey -> part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey -> customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey -> nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey -> region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
    frames = []
    for fk_name, child, ck, parent, pk in edges:
        c = load_table(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("k"))
        orphans = c.join(p, "k", "left_anti")
        frames.append(
            c.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
                F.broadcast(
                    orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
                )
            ).select(F.lit(fk_name).alias("fk_edge"), "n_child", "n_orphans")
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("fk_edge")


ORACLE_FK_INTEGRITY = """
SELECT * FROM (
  SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
         (SELECT COUNT(*) FROM lineitem) AS n_child,
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
           AS n_orphans
  UNION ALL
  SELECT 'lineitem.l_partkey -> part',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
            ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)
  UNION ALL
  SELECT 'lineitem.l_suppkey -> supplier',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s
            ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL)
  UNION ALL
  SELECT 'orders.o_custkey -> customer',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
  UNION ALL
  SELECT 'customer.c_nationkey -> nation',
         (SELECT COUNT(*) FROM customer),
         (SELECT COUNT(*) FROM customer c LEFT JOIN nation n
            ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
  UNION ALL
  SELECT 'supplier.s_nationkey -> nation',
         (SELECT COUNT(*) FROM supplier),
         (SELECT COUNT(*) FROM supplier s LEFT JOIN nation n
            ON s.s_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
  UNION ALL
  SELECT 'nation.n_regionkey -> region',
         (SELECT COUNT(*) FROM nation),
         (SELECT COUNT(*) FROM nation n LEFT JOIN region r
            ON n.n_regionkey = r.r_regionkey WHERE r.r_regionkey IS NULL)
)
ORDER BY fk_edge
"""


QUERIES: dict[str, QuerySpec] = {
    "fk_integrity_audit": QuerySpec(
        fk_integrity_audit,
        ORACLE_FK_INTEGRITY,
        ["J6", "A4", "P11", "X-curation"],
    ),
    "retention_gc_plan": QuerySpec(
        retention_gc_plan,
        ORACLE_RETENTION_GC,
        ["§2.8", "A1", "J1", "X-layout", "X-curation"],
    ),
    "forget_users_cascade": QuerySpec(
        forget_users_cascade,
        ORACLE_FORGET_CASCADE,
        ["J6", "A4", "X-curation"],
    ),
    "dataset_diff": QuerySpec(
        dataset_diff, ORACLE_DATASET_DIFF, ["J6", "A1", "X-versioning"]
    ),
    "cdc_apply_audit": QuerySpec(
        cdc_apply_audit,
        ORACLE_CDC_APPLY,
        ["A9", "A10", "S3", "X-versioning"],
    ),
    "incremental_rollup": QuerySpec(
        incremental_rollup,
        ORACLE_INCREMENTAL_ROLLUP,
        ["A1", "A9", "X-versioning", "X-ts"],
    ),
    "rollup_anomalies": QuerySpec(
        rollup_anomalies,
        ORACLE_ROLLUP_ANOMALIES,
        ["A1", "A6", "X-ts", "X-quality"],
    ),
}
