"""MongoDB aggregation-pipeline → DataFrame compiler.

The reference's entire query surface is *lists of pipeline stage
documents* shipped to mongod (SURVEY.md §3.2: "this list IS the
reference's query IR" — e.g. ``mongo_analytics_examples.py:19-28``:
``$group → $addFields → $sort → $limit``). This module compiles that
IR onto DataFrames, so a reference user can run their existing
pipeline documents unchanged while Catalyst plans the execution —
the literal "switch to this repo and run every query you run today"
path.

Supported surface = every stage/operator the reference uses, plus
the natural closures ($unwind for the Cypher UNWIND shape, the
comparison/boolean family for $match):

- stages: ``$match``, ``$project``, ``$addFields``, ``$group``,
  ``$sort``, ``$limit``, ``$unwind``, ``$count``
- accumulators: ``$sum``, ``$avg``, ``$min``, ``$max``, ``$first``,
  ``$last``, ``$push`` (collect_list), ``$addToSet`` (collect_set)
- expressions: field paths (``"$a.b"``), literals, ``$cond``,
  ``$ifNull``, ``$size``, ``$add``, ``$subtract``, ``$multiply``,
  ``$divide``, ``$concat``, ``$toDouble``, ``$toInt``, ``$toString``,
  comparison (``$eq $ne $gt $gte $lt $lte $in``), boolean
  (``$and $or $not``), ``$literal``

Semantics notes (Mongo → Spark):
- ``$group._id`` of ``None`` is the global aggregate
  (mongo_analytics_examples.py:43-46, operator A4); a field path
  groups by it and emits the key as ``_id``; a document groups by
  several paths and emits a struct ``_id``.
- ``$sum: 1`` is the count idiom (A2) — compiled to ``count(*)``
  so nulls behave identically.
- ``$size`` of a missing/null array is an error in Mongo unless
  wrapped in ``$ifNull`` — the reference always wraps
  (mongo_analytics_examples.py:33,46, operator P13); we compile
  ``$size`` directly to ``F.size`` (which is -1 on null under
  legacy, null under ANSI) and rely on the same ``$ifNull`` wrap.
- ``$sort`` before ``$limit`` fuses to TakeOrderedAndProject in the
  physical plan — the bounded-heap top-k Mongo implements by stage
  fusion falls out of Catalyst for free (SURVEY §4).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Expression compiler
# ---------------------------------------------------------------------------

_BINOPS = {
    "$eq": lambda a, b: a == b,
    "$ne": lambda a, b: a != b,
    "$gt": lambda a, b: a > b,
    "$gte": lambda a, b: a >= b,
    "$lt": lambda a, b: a < b,
    "$lte": lambda a, b: a <= b,
    "$subtract": lambda a, b: a - b,
    "$divide": lambda a, b: a / b,
}

_VARARG = {
    "$add": lambda cols: _fold(cols, lambda a, b: a + b),
    "$multiply": lambda cols: _fold(cols, lambda a, b: a * b),
    "$and": lambda cols: _fold(cols, lambda a, b: a & b),
    "$or": lambda cols: _fold(cols, lambda a, b: a | b),
    "$concat": lambda cols: F.concat(*cols),
}


def _fold(cols: list[Column], op) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = op(out, c)
    return out


def compile_expr(e: Any) -> Column:
    """Mongo expression document → Column."""
    if isinstance(e, str) and e.startswith("$"):
        return F.col(e[1:])
    if e is None or isinstance(e, (int, float, bool, str)):
        return F.lit(e)
    if isinstance(e, list):
        # bare array literal, e.g. {"$ifNull": ["$wickets", []]}
        return F.array(*[compile_expr(x) for x in e])
    if isinstance(e, dict):
        if len(e) != 1:
            raise ValueError(f"expression must have one operator: {e}")
        (op, arg), = e.items()
        if op == "$literal":
            return F.lit(arg)
        if op == "$cond":
            if isinstance(arg, dict):
                branches = [arg["if"], arg["then"], arg["else"]]
            else:
                branches = list(arg)
            cond, then, other = (compile_expr(a) for a in branches)
            return F.when(cond, then).otherwise(other)
        if op == "$ifNull":
            return F.coalesce(*[compile_expr(a) for a in arg])
        if op == "$size":
            return F.size(compile_expr(arg))
        if op == "$not":
            inner = arg[0] if isinstance(arg, list) else arg
            return ~compile_expr(inner)
        if op == "$in":
            value, arr = arg
            return compile_expr(value).isin(*[a for a in arr])
        if op == "$split":
            s, delim = arg
            return F.split(compile_expr(s), delim)
        if op == "$toDouble":
            return compile_expr(arg).cast("double")
        if op == "$toInt":
            return compile_expr(arg).cast("int")
        if op == "$toString":
            return compile_expr(arg).cast("string")
        if op in _BINOPS:
            a, b = (compile_expr(x) for x in arg)
            return _BINOPS[op](a, b)
        if op in _VARARG:
            return _VARARG[op]([compile_expr(x) for x in arg])
        raise ValueError(f"unsupported expression operator: {op}")
    raise ValueError(f"cannot compile expression: {e!r}")


# ---------------------------------------------------------------------------
# $match predicate compiler (query dialect, not expression dialect)
# ---------------------------------------------------------------------------

_MATCH_OPS = {
    "$eq": lambda c, v: c == v,
    "$ne": lambda c, v: c != v,
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
    "$in": lambda c, v: c.isin(*v),
    "$nin": lambda c, v: ~c.isin(*v),
    "$exists": lambda c, v: c.isNotNull() if v else c.isNull(),
}


def compile_match(spec: dict) -> Column:
    """{"field": value | {"$gt": v, ...}, ...} with implicit AND —
    the reference's point-lookup form (mongo_analytics_examples.py:42,
    operator P10)."""
    preds: list[Column] = []
    for field, cond in spec.items():
        if field == "$expr":
            preds.append(compile_expr(cond))
            continue
        col = F.col(field)
        if isinstance(cond, dict):
            for op, v in cond.items():
                preds.append(_MATCH_OPS[op](col, v))
        else:
            preds.append(col == cond)
    return _fold(preds, lambda a, b: a & b) if preds else F.lit(True)


# ---------------------------------------------------------------------------
# Accumulators + stages
# ---------------------------------------------------------------------------

_ACCUMULATORS = {
    "$sum": lambda c: F.sum(c),
    "$avg": lambda c: F.avg(c),
    "$min": lambda c: F.min(c),
    "$max": lambda c: F.max(c),
    "$first": lambda c: F.first(c),
    "$last": lambda c: F.last(c),
    "$push": lambda c: F.collect_list(c),
    "$addToSet": lambda c: F.collect_set(c),
}


def _compile_group(df: DataFrame, spec: dict) -> DataFrame:
    _id = spec["_id"]
    aggs = []
    for name, acc_doc in spec.items():
        if name == "_id":
            continue
        (acc, arg), = acc_doc.items()
        if acc == "$sum" and arg == 1:
            aggs.append(F.count(F.lit(1)).alias(name))  # A2 count idiom
        else:
            aggs.append(_ACCUMULATORS[acc](compile_expr(arg)).alias(name))
    if _id is None:
        return df.agg(*aggs)  # A4 global aggregate
    if isinstance(_id, str):
        keyed = df.withColumn("_id", compile_expr(_id))
        return keyed.groupBy("_id").agg(*aggs)
    if isinstance(_id, dict):
        key = F.struct(
            *[compile_expr(v).alias(k) for k, v in _id.items()]
        )
        return df.withColumn("_id", key).groupBy("_id").agg(*aggs)
    raise ValueError(f"unsupported $group _id: {_id!r}")


def _compile_project(df: DataFrame, spec: dict) -> DataFrame:
    cols: list[Column] = []
    explicit_id = "_id" in spec
    for name, rule in spec.items():
        if rule == 0:
            continue
        if rule == 1:
            cols.append(F.col(name))
        else:
            cols.append(compile_expr(rule).alias(name))
    # Mongo keeps _id unless projected away; only mirror when present
    if not explicit_id and "_id" in df.columns:
        cols.insert(0, F.col("_id"))
    return df.select(*cols)


def _compile_sort(df: DataFrame, spec: dict) -> DataFrame:
    keys = [
        F.col(f).asc() if direction >= 0 else F.col(f).desc()
        for f, direction in spec.items()
    ]
    return df.orderBy(*keys)


def _compile_unwind(df: DataFrame, spec: Any) -> DataFrame:
    path = spec["path"] if isinstance(spec, dict) else spec
    name = path[1:]
    # F2: UNWIND/explode of an array field, ancestors carried along
    return df.withColumn(name, F.explode(F.col(name)))


def _compile_lookup(
    df: DataFrame, spec: dict, collections: dict[str, DataFrame]
) -> DataFrame:
    """``$lookup`` (equality form) — Mongo's left outer join: embeds
    the matching foreign rows as an array of structs under ``as``
    (empty array on no match, like Mongo). Compiled as: pre-group the
    foreign side per key into a struct array, then one left
    equi-join — the foreign aggregation is shuffle-partitioned on the
    key, so the join carries one row per distinct key, not one per
    foreign row. ``$unwind`` of the array afterwards restores the
    flat-join shape (J1)."""
    right = collections[spec["from"]]
    as_name = spec["as"]
    grouped = right.groupBy(
        F.col(spec["foreignField"]).alias("__lookup_key")
    ).agg(
        F.collect_list(F.struct(*right.columns)).alias(as_name)
    )
    joined = df.join(
        grouped,
        df[spec["localField"]] == grouped["__lookup_key"],
        "left",
    ).drop("__lookup_key")
    return joined.withColumn(
        as_name, F.coalesce(F.col(as_name), F.array())
    )


def compile_pipeline(
    df: DataFrame,
    pipeline: list[dict],
    collections: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Compile a Mongo aggregation pipeline onto ``df``. Stages are
    applied in order; Catalyst then optimizes the WHOLE chain (pushes
    $match into the scan, prunes columns across stages, fuses
    $sort+$limit) — the optimizations the reference author had to
    hand-encode in stage order (SURVEY §4) happen regardless of
    stage order here. ``collections`` resolves foreign collection
    names for ``$lookup`` / ``$unionWith``."""
    for stage in pipeline:
        if len(stage) != 1:
            raise ValueError(f"pipeline stage must have one key: {stage}")
        (op, spec), = stage.items()
        if op == "$match":
            df = df.filter(compile_match(spec))
        elif op == "$project":
            df = _compile_project(df, spec)
        elif op == "$addFields":
            for name, rule in spec.items():
                df = df.withColumn(name, compile_expr(rule))
        elif op == "$group":
            df = _compile_group(df, spec)
        elif op == "$sort":
            df = _compile_sort(df, spec)
        elif op == "$limit":
            df = df.limit(int(spec))
        elif op == "$count":
            df = df.agg(F.count(F.lit(1)).alias(spec))
        elif op == "$unwind":
            df = _compile_unwind(df, spec)
        elif op == "$bucket":
            gb = compile_expr(spec["groupBy"])
            bounds = spec["boundaries"]
            bucket = F.lit(spec.get("default"))
            # right-open [b_i, b_{i+1}) buckets, labelled by lower bound
            for i in range(len(bounds) - 1, 0, -1):
                bucket = F.when(
                    (gb >= F.lit(bounds[i - 1])) & (gb < F.lit(bounds[i])),
                    F.lit(bounds[i - 1]),
                ).otherwise(bucket)
            output = spec.get("output", {"count": {"$sum": 1}})
            df = _compile_group(
                df.withColumn("__bucket", bucket),
                {"_id": "$__bucket", **output},
            )
        elif op == "$sortByCount":
            # sugar: $group by expr + count + sort desc (Mongo docs)
            df = _compile_group(
                df, {"_id": spec, "count": {"$sum": 1}}
            ).orderBy(F.col("count").desc(), F.col("_id").asc())
        elif op == "$replaceRoot":
            root = spec["newRoot"] if isinstance(spec, dict) else spec
            df = df.select(compile_expr(root).alias("__root")).select(
                "__root.*"
            )
        elif op == "$facet":
            # fan-out: each sub-pipeline over the SAME input, results
            # embedded as one array-of-structs column each, one row out
            faceted = []
            for name, subpipe in spec.items():
                sub = compile_pipeline(df, subpipe, collections)
                faceted.append(
                    sub.agg(
                        F.collect_list(F.struct(*sub.columns)).alias(name)
                    )
                )
            out = faceted[0]
            for frame in faceted[1:]:
                out = out.crossJoin(frame)
            df = out
        elif op == "$lookup":
            if not collections:
                raise ValueError("$lookup requires a collections resolver")
            df = _compile_lookup(df, spec, collections)
        elif op == "$unionWith":
            if not collections:
                raise ValueError("$unionWith requires a collections resolver")
            name = spec["coll"] if isinstance(spec, dict) else spec
            df = df.unionByName(
                collections[name], allowMissingColumns=True
            )
        else:
            raise ValueError(f"unsupported pipeline stage: {op}")
    return df
