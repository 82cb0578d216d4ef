"""Driver-checkable queries that run THROUGH the Mongo-pipeline
compiler (plans/mongo_pipeline.py) — each is one of the reference's
three pipeline shapes (mongo_analytics_examples.py) re-targeted at
the star schema, submitted as a raw pipeline document and compiled
to a DataFrame plan. The DuckDB oracle states the same query in SQL,
so the compiler itself sits inside the correctness gate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.plans.mongo_pipeline import compile_pipeline
from cricket_analytics_nosql_spark.sources.tables import load_table


def mongo_pipeline_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """runs_by_batter shape (mongo_analytics_examples.py:19-28):
    $group multi-accumulator → $addFields derived rate → $sort desc →
    $limit — submitted as a pipeline document."""
    pipeline = [
        {
            "$group": {
                "_id": "$l_suppkey",
                "balls": {"$sum": 1},
                "big_lots": {
                    "$sum": {"$cond": [{"$gte": ["$l_quantity", 45.0]}, 1, 0]}
                },
                "max_qty": {"$max": "$l_quantity"},
            }
        },
        {
            "$addFields": {
                "big_lot_pct": {
                    "$divide": [
                        {"$multiply": [{"$toDouble": "$big_lots"}, 100]},
                        "$balls",
                    ]
                }
            }
        },
        {"$sort": {"big_lots": -1, "_id": 1}},
        {"$limit": 10},
    ]
    return compile_pipeline(load_table(spark, sf_dir, "lineitem"), pipeline)


ORACLE_MONGO_GROUP_TOPK = """
SELECT l_suppkey AS _id, COUNT(*) AS balls,
       CAST(SUM(CASE WHEN l_quantity >= 45.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS big_lots,
       MAX(l_quantity) AS max_qty,
       CAST(SUM(CASE WHEN l_quantity >= 45.0 THEN 1 ELSE 0 END) AS DOUBLE)
         * 100 / COUNT(*) AS big_lot_pct
FROM lineitem
GROUP BY l_suppkey
ORDER BY big_lots DESC, _id ASC
LIMIT 10
"""


def mongo_pipeline_match_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kohli_vs_southee shape (mongo_analytics_examples.py:41-48):
    $match point predicates → global $group (_id: None) with a
    conditional count."""
    pipeline = [
        {"$match": {"l_returnflag": "R", "l_linestatus": "F"}},
        {
            "$group": {
                "_id": None,
                "balls": {"$sum": 1},
                "discounted": {
                    "$sum": {"$cond": [{"$gt": ["$l_discount", 0.0]}, 1, 0]}
                },
            }
        },
        {"$project": {"balls": 1, "discounted": 1}},
    ]
    return compile_pipeline(load_table(spark, sf_dir, "lineitem"), pipeline)


ORACLE_MONGO_MATCH_GLOBAL = """
SELECT COUNT(*) AS balls,
       CAST(SUM(CASE WHEN l_discount > 0.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS discounted
FROM lineitem
WHERE l_returnflag = 'R' AND l_linestatus = 'F'
"""


def mongo_pipeline_unwind_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$project computed array → $unwind (the Cypher UNWIND / F2
    shape, neo4j_loader.py:44-46) → $group → $sort/$limit: token
    frequencies via the pipeline dialect."""
    pipeline = [
        {"$project": {"p_partkey": 1, "words": {"$split": ["$p_name", " "]}}},
        {"$unwind": "$words"},
        {"$group": {"_id": "$words", "n": {"$sum": 1}}},
        {"$sort": {"n": -1, "_id": 1}},
        {"$limit": 20},
    ]
    return compile_pipeline(load_table(spark, sf_dir, "part"), pipeline)


ORACLE_MONGO_UNWIND_TOPK = """
SELECT w AS _id, COUNT(*) AS n
FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
GROUP BY w
ORDER BY n DESC, _id ASC
LIMIT 20
"""


def mongo_pipeline_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$lookup + $unwind + $group — the pipeline dialect's join
    (J1): orders enriched with their customer, aggregated per market
    segment. The foreign side pre-groups per key, so the join carries
    one row per customer, and the oracle is the plain SQL join."""
    pipeline = [
        {
            "$lookup": {
                "from": "customer",
                "localField": "o_custkey",
                "foreignField": "c_custkey",
                "as": "cust",
            }
        },
        {"$unwind": "$cust"},
        {
            "$group": {
                "_id": "$cust.c_mktsegment",
                "n_orders": {"$sum": 1},
                "max_price": {"$max": "$o_totalprice"},
            }
        },
        {"$sort": {"n_orders": -1, "_id": 1}},
    ]
    return compile_pipeline(
        load_table(spark, sf_dir, "orders"),
        pipeline,
        collections={"customer": load_table(spark, sf_dir, "customer")},
    )


ORACLE_MONGO_LOOKUP = """
SELECT c_mktsegment AS _id, COUNT(*) AS n_orders,
       MAX(o_totalprice) AS max_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY n_orders DESC, _id ASC
"""


def mongo_pipeline_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$bucket histogram (right-open boundaries, default bucket for
    out-of-range) — order-value distribution with per-bucket count
    and max."""
    pipeline = [
        {
            "$bucket": {
                "groupBy": "$o_totalprice",
                "boundaries": [0.0, 50000.0, 100000.0, 200000.0, 400000.0],
                "default": -1.0,
                "output": {
                    "n": {"$sum": 1},
                    "hi": {"$max": "$o_totalprice"},
                },
            }
        },
        {"$sort": {"_id": 1}},
    ]
    return compile_pipeline(load_table(spark, sf_dir, "orders"), pipeline)


ORACLE_MONGO_BUCKET = """
WITH b AS (
  SELECT CAST(CASE WHEN o_totalprice >= 0 AND o_totalprice < 50000 THEN 0.0
              WHEN o_totalprice >= 50000 AND o_totalprice < 100000 THEN 50000.0
              WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 100000.0
              WHEN o_totalprice >= 200000 AND o_totalprice < 400000 THEN 200000.0
              ELSE -1.0 END AS DOUBLE) AS _id,
         o_totalprice
  FROM orders
)
SELECT _id, COUNT(*) AS n, MAX(o_totalprice) AS hi
FROM b GROUP BY _id ORDER BY _id
"""


def mongo_pipeline_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline dialect's WRITE path ($merge → upsert-by-key,
    the reference's replace_one(upsert=True) sink,
    etl_cricsheet_to_mongo.py:136): seed a balances target from
    customer, upsert per-customer open-order spend into it through
    the compiler, then answer from the re-read target — also through
    the compiler. Money stays in integer cents across the merge so
    partial-aggregation order can't move a bit."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from cricket_analytics_nosql_spark.functions.scalar import cents

    target = os.path.join(tempfile.mkdtemp(prefix="merge_"), "balances")
    seed = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("_id"), cents("c_acctbal").alias("balance_c")
    )
    seed.write.mode("overwrite").parquet(target)
    cents_expr = {
        "$toLong": {"$round": [{"$multiply": ["$o_totalprice", 100]}, 0]}
    }
    merged = compile_pipeline(
        load_table(spark, sf_dir, "orders"),
        [
            {"$match": {"o_orderstatus": "O"}},
            {"$group": {"_id": "$o_custkey", "balance_c": {"$sum": cents_expr}}},
            {
                "$merge": {
                    "into": "balances",
                    "on": "_id",
                    "whenMatched": "replace",
                    "whenNotMatched": "insert",
                }
            },
        ],
        sinks={"balances": target},
    )
    return compile_pipeline(
        merged,
        [
            {
                "$project": {
                    "_id": 1,
                    "balance": {
                        "$divide": [{"$toDouble": "$balance_c"}, 100]
                    },
                }
            },
            {"$sort": {"_id": 1}},
        ],
    )


def mongo_pipeline_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$setWindowFields through the compiler: per-customer running
    order spend (documents [unbounded, current] frame) and order
    ordinal, trimmed to each customer's first 3 orders — the Mongo
    window-function dialect compiled to one Exchange(custkey) +
    partition-local Window, same plan as windows.py's native running
    total. Money in integer cents end-to-end."""
    cents_expr = {
        "$toLong": {"$round": [{"$multiply": ["$o_totalprice", 100]}, 0]}
    }
    pipeline = [
        {
            "$setWindowFields": {
                "partitionBy": "$o_custkey",
                "sortBy": {"o_orderdate": 1, "o_orderkey": 1},
                "output": {
                    "run_c": {
                        "$sum": cents_expr,
                        "window": {"documents": ["unbounded", "current"]},
                    },
                    "ord_no": {"$documentNumber": {}},
                },
            }
        },
        {"$match": {"ord_no": {"$lte": 3}}},
        {
            "$project": {
                "o_custkey": 1,
                "o_orderkey": 1,
                "ord_no": 1,
                "running_spend": {
                    "$divide": [{"$toDouble": "$run_c"}, 100]
                },
            }
        },
        {"$sort": {"o_custkey": 1, "ord_no": 1}},
    ]
    return compile_pipeline(load_table(spark, sf_dir, "orders"), pipeline)


ORACLE_MONGO_WINDOW = """
WITH w AS (
  SELECT o_custkey, o_orderkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_c,
         ROW_NUMBER()
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS ord_no
  FROM orders
)
SELECT o_custkey, o_orderkey, ord_no,
       CAST(run_c AS DOUBLE) / 100 AS running_spend
FROM w WHERE ord_no <= 3
ORDER BY o_custkey, ord_no
"""


ORACLE_MONGO_MERGE = """
WITH old AS (
  SELECT c_custkey AS _id,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS balance_c
  FROM customer
), new AS (
  SELECT o_custkey AS _id,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS balance_c
  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
)
SELECT COALESCE(new._id, old._id) AS _id,
       CAST(COALESCE(new.balance_c, old.balance_c) AS DOUBLE) / 100 AS balance
FROM old FULL OUTER JOIN new ON old._id = new._id
ORDER BY _id
"""


def mongo_pipeline_graph_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$graphLookup — the pipeline dialect's recursive traversal,
    over the bidirectional trade graph (operators/graph.py): from 3
    seed customers, all edge-docs reachable within one recursive hop
    (shortest-path ≤ 1), reported as counts. Bounded-depth BFS and a
    recursive CTE agree on the reachable SET, which is what the
    oracle counts (first-reach depths are BFS-specific bookkeeping)."""
    from cricket_analytics_nosql_spark.operators.graph import (
        trade_graph_edges,
    )

    seeds = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 3)
        .select((F.col("c_custkey") * 2).alias("start"))
    )
    pipeline = [
        {
            "$graphLookup": {
                "from": "trade",
                "startWith": "$start",
                "connectFromField": "dst",
                "connectToField": "src",
                "as": "reach",
                "maxDepth": 1,
            }
        },
        {"$project": {"start": 1, "n_reached": {"$size": "$reach"}}},
        {"$sort": {"start": 1}},
    ]
    return compile_pipeline(
        seeds,
        pipeline,
        collections={
            "trade": trade_graph_edges(spark, sf_dir).select("src", "dst")
        },
    )


ORACLE_MONGO_GRAPH_LOOKUP = """
WITH RECURSIVE base AS (
  SELECT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), e AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM base
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM base
), seeds AS (
  SELECT c_custkey * 2 AS seed FROM customer WHERE c_custkey < 3
), reach(seed, src, dst, depth) AS (
  SELECT s.seed, e.src, e.dst, 0 FROM seeds s JOIN e ON e.src = s.seed
  UNION
  SELECT r.seed, e.src, e.dst, r.depth + 1
  FROM reach r JOIN e ON e.src = r.dst
  WHERE r.depth < 1
)
SELECT seed AS start, COUNT(DISTINCT (src, dst)) AS n_reached
FROM reach
GROUP BY seed
ORDER BY start
"""


def mongo_pipeline_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array-lambda expression dialect ($split → $filter/$map/
    $reduce with $$this/$$value bindings) end-to-end over documents:
    per-language counts of long tokens and total token characters.
    All lambdas compile to native higher-order functions (filter/
    transform/aggregate) — one narrow pass, one aggregation."""
    pipeline = [
        {"$addFields": {"toks": {"$split": ["$text", " "]}}},
        {"$project": {
            "lang": 1,
            "n_long": {"$size": {"$filter": {
                "input": "$toks",
                "cond": {"$gte": [{"$strLenCP": "$$this"}, 5]},
            }}},
            "chars": {"$reduce": {
                "input": {"$map": {"input": "$toks",
                                   "in": {"$strLenCP": "$$this"}}},
                "initialValue": 0,
                "in": {"$add": ["$$value", "$$this"]},
            }},
        }},
        {"$group": {
            "_id": "$lang",
            "docs": {"$sum": 1},
            "long_tokens": {"$sum": "$n_long"},
            "token_chars": {"$sum": "$chars"},
        }},
        {"$sort": {"_id": 1}},
    ]
    return compile_pipeline(load_table(spark, sf_dir, "documents"), pipeline)


ORACLE_MONGO_ARRAY_OPS = """
SELECT lang AS _id, COUNT(*) AS docs,
       CAST(SUM(len(list_filter(string_split(text, ' '),
                                x -> length(x) >= 5))) AS BIGINT)
         AS long_tokens,
       CAST(SUM(list_aggregate(list_transform(string_split(text, ' '),
                                              x -> length(x)), 'sum'))
            AS BIGINT) AS token_chars
FROM documents
GROUP BY lang
ORDER BY _id
"""


def mongo_pipeline_densify_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$densify + $fill end-to-end: hourly event counts on a sparse
    slice of the log (event_id % 97), densified to the full 24-hour
    grid per event type and zero-filled — the gap-repair idiom of
    time-series rollups, in the pipeline dialect."""
    pipeline = [
        {"$match": {"event_id": {"$mod": [97, 0]}}},
        {"$addFields": {"hour": {"$hour": "$ts"}}},
        {"$group": {"_id": {"et": "$event_type", "h": "$hour"},
                    "n": {"$sum": 1}}},
        {"$project": {"_id": 0, "event_type": "$_id.et",
                      "hour": "$_id.h", "n": 1}},
        {"$densify": {"field": "hour", "partitionByFields": ["event_type"],
                      "range": {"step": 1, "bounds": [0, 24]}}},
        {"$fill": {"output": {"n": {"value": 0}}}},
        {"$sort": {"event_type": 1, "hour": 1}},
    ]
    return compile_pipeline(load_table(spark, sf_dir, "events"), pipeline)


ORACLE_MONGO_DENSIFY_FILL = """
WITH f AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS h
  FROM events WHERE event_id % 97 = 0
), c AS (
  SELECT event_type, h, COUNT(*) AS n FROM f GROUP BY 1, 2
), types AS (
  SELECT DISTINCT event_type FROM f
), grid AS (
  SELECT t.event_type, CAST(r.range AS BIGINT) AS hour
  FROM types t, range(0, 24) r
)
SELECT g.event_type, g.hour, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.hour = c.h
ORDER BY g.event_type, g.hour
"""



# Deterministic demo query vector for $vectorSearch: 64 values in
# [-0.9, 0.9] from a fixed integer pattern — identical literals are
# embedded in the Spark plan and the SQL oracle text.
VS_QUERY_VECTOR = [((i * 37) % 19 - 9) / 10 for i in range(64)]
_VS_QNORM = __import__("math").sqrt(sum(x * x for x in VS_QUERY_VECTOR))


def mongo_pipeline_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atlas-dialect ``$vectorSearch`` as the pipeline's first stage
    (exact mode), with the score surfaced through
    ``{"$meta": "vectorSearchScore"}`` — the pipeline front-end
    reaching the ANN family. Top-10 vectors for a fixed demo query
    vector; the oracle recomputes the identical Atlas score
    (1 + cosine) / 2 in SQL."""
    pipeline = [
        {
            "$vectorSearch": {
                "queryVector": VS_QUERY_VECTOR,
                "path": "embedding",
                "numCandidates": 200,
                "limit": 10,
                "index": "emb_idx",
            }
        },
        {"$addFields": {"score": {"$round": [{"$meta": "vectorSearchScore"}, 6]}}},
        {"$project": {"vec_id": 1, "label": 1, "score": 1}},
    ]
    return compile_pipeline(load_table(spark, sf_dir, "embeddings"), pipeline)


_VS_Q_SQL = "[" + ", ".join(repr(x) for x in VS_QUERY_VECTOR) + "]::DOUBLE[]"

ORACLE_MONGO_VECTOR_SEARCH = f"""
WITH scored AS (
  SELECT vec_id, label,
         (1.0 + list_inner_product(CAST(embedding AS DOUBLE[]), {_VS_Q_SQL})
                / ({_VS_QNORM!r} *
                   sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))))
           / 2.0 AS raw_score
  FROM embeddings
), topk AS (
  SELECT vec_id, label, raw_score FROM scored
  ORDER BY raw_score DESC, vec_id ASC LIMIT 10
)
SELECT vec_id, label, ROUND(raw_score, 6) AS score FROM topk
"""


def mongo_pipeline_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atlas-dialect ``$search`` (text operator) as the pipeline's
    first stage, scored with the engine's BM25 and surfaced through
    ``{"$meta": "searchScore"}`` — the pipeline front-end reaching
    full-text search. Top-20 for the fixed 3-term query; the oracle
    recomputes the identical BM25 formula in SQL."""
    pipeline = [
        {
            "$search": {
                "text": {"query": "spark join stream", "path": "text"}
            }
        },
        {"$addFields": {"score": {"$meta": "searchScore"}}},
        {"$project": {"doc_id": 1, "lang": 1, "score": 1}},
        {"$sort": {"score": -1, "doc_id": 1}},
        {"$limit": 20},
    ]
    return compile_pipeline(load_table(spark, sf_dir, "documents"), pipeline)


ORACLE_MONGO_SEARCH = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       LATERAL (SELECT unnest(string_split(lower(text), ' ')) AS term) t
  WHERE length(t.term) > 0
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT AVG(dl) AS avgdl, COUNT(*) AS n_docs FROM dl
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN ('spark', 'join', 'stream')
  GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         ROUND(SUM(
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * tf * (1.2 + 1)
           / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
         ), 6) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT d.doc_id, d.lang, s.score
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
ORDER BY s.score DESC, d.doc_id ASC
LIMIT 20
"""


QUERIES: dict[str, QuerySpec] = {
    "mongo_pipeline_search": QuerySpec(
        mongo_pipeline_search, ORACLE_MONGO_SEARCH, ["X-text", "§2.9", "T1"]
    ),
    "mongo_pipeline_vector_search": QuerySpec(
        mongo_pipeline_vector_search, ORACLE_MONGO_VECTOR_SEARCH,
        ["X-sim", "§2.9"],
    ),
    "mongo_pipeline_densify_fill": QuerySpec(
        mongo_pipeline_densify_fill, ORACLE_MONGO_DENSIFY_FILL,
        ["§2.8", "P12"],
    ),
    "mongo_pipeline_array_ops": QuerySpec(
        mongo_pipeline_array_ops, ORACLE_MONGO_ARRAY_OPS,
        ["§2.9", "X-text"],
    ),
    "mongo_pipeline_graph_lookup": QuerySpec(
        mongo_pipeline_graph_lookup, ORACLE_MONGO_GRAPH_LOOKUP,
        ["G1", "G2", "§3.3"],
    ),
    "mongo_pipeline_group_topk": QuerySpec(
        mongo_pipeline_group_topk, ORACLE_MONGO_GROUP_TOPK,
        ["A1", "A2", "A3", "A5", "T1"],
    ),
    "mongo_pipeline_match_global": QuerySpec(
        mongo_pipeline_match_global, ORACLE_MONGO_MATCH_GLOBAL,
        ["P10", "A4", "P14"],
    ),
    "mongo_pipeline_unwind_topk": QuerySpec(
        mongo_pipeline_unwind_topk, ORACLE_MONGO_UNWIND_TOPK,
        ["F2", "A8", "T2"],
    ),
    "mongo_pipeline_lookup": QuerySpec(
        mongo_pipeline_lookup, ORACLE_MONGO_LOOKUP, ["J1", "A1"]
    ),
    "mongo_pipeline_bucket": QuerySpec(
        mongo_pipeline_bucket, ORACLE_MONGO_BUCKET, ["A1", "P9"]
    ),
    "mongo_pipeline_merge": QuerySpec(
        mongo_pipeline_merge, ORACLE_MONGO_MERGE, ["S3", "J6", "A9"]
    ),
    "mongo_pipeline_window": QuerySpec(
        mongo_pipeline_window, ORACLE_MONGO_WINDOW, ["§2.8", "T1"]
    ),
}
