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
  ``$sort``, ``$limit``, ``$skip``, ``$unwind`` (incl.
  ``preserveNullAndEmptyArrays`` / ``includeArrayIndex``),
  ``$count``, ``$setWindowFields`` (window functions: running
  frames, rank family, $shift), and the write stages ``$out`` /
  ``$merge`` (terminal, via a ``sinks`` path resolver)
- accumulators: ``$sum``, ``$avg``, ``$min``, ``$max``, ``$first``,
  ``$last``, ``$push`` (collect_list), ``$addToSet`` (collect_set)
- expressions: field paths (``"$a.b"``), literals, ``$cond``,
  ``$ifNull``, ``$size``, ``$add``, ``$subtract``, ``$multiply``,
  ``$divide``, ``$concat``, ``$toDouble``, ``$toInt``, ``$toString``,
  ``$toLong``, ``$round``, date ops (``$year $month $dayOfMonth
  $hour $dateToString $dateTrunc``), comparison
  (``$eq $ne $gt $gte $lt $lte $in``), boolean
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

import math

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


def compile_expr(e: Any, env: dict[str, Column] | None = None) -> Column:
    """Mongo expression document → Column. ``env`` binds ``$$var``
    references inside array-operator lambdas ($filter/$map/$reduce);
    ``$$this`` / ``$$value`` and user-named ``as`` variables resolve
    through it."""

    def ce(x: Any) -> Column:
        return compile_expr(x, env)

    if isinstance(e, str) and e.startswith("$$"):
        name = e[2:].split(".", 1)[0]
        if env is None or name not in env:
            raise ValueError(f"unbound expression variable: {e}")
        bound = env[name]
        if "." in e[2:]:  # $$this.field on struct elements
            return bound[e[2:].split(".", 1)[1]]
        return bound
    if isinstance(e, str) and e.startswith("$"):
        return F.col(e[1:])
    if e is None or isinstance(e, (int, float, bool, str)):
        return F.lit(e)
    if isinstance(e, list):
        # bare array literal, e.g. {"$ifNull": ["$wickets", []]}
        return F.array(*[ce(x) for x in e])
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
            cond, then, other = (ce(a) for a in branches)
            return F.when(cond, then).otherwise(other)
        if op == "$ifNull":
            return F.coalesce(*[ce(a) for a in arg])
        if op == "$size":
            return F.size(ce(arg))
        if op == "$not":
            inner = arg[0] if isinstance(arg, list) else arg
            return ~ce(inner)
        if op == "$in":
            value, arr = arg
            v = ce(value)
            if isinstance(arr, str) and arr.startswith("$"):
                # field-path array operand: {"$in": ["$x", "$tags"]}
                return F.array_contains(F.col(arr[1:]), v)
            if isinstance(arr, list):
                if all(
                    not (isinstance(a, str) and a.startswith("$"))
                    and not isinstance(a, dict)
                    for a in arr
                ):
                    return v.isin(*arr)
                # element expressions: membership over a built array
                return F.array_contains(
                    F.array(*[ce(a) for a in arr]), v
                )
            raise ValueError(
                f"$in: second operand must be a list or array field path: {arr!r}"
            )
        if op == "$split":
            s, delim = arg
            return F.split(ce(s), delim)
        if op == "$regexMatch":
            spec = dict(arg)
            pattern = spec["regex"]
            if not isinstance(pattern, str):
                raise ValueError("$regexMatch: regex must be a literal string")
            opts = spec.get("options", "")
            if opts not in ("", "i"):
                raise ValueError(
                    f"$regexMatch: unsupported options {opts!r} (only 'i')"
                )
            if opts == "i":
                pattern = "(?i)" + pattern
            return ce(spec["input"]).rlike(pattern)
        if op == "$toDouble":
            return ce(arg).cast("double")
        if op == "$toInt":
            return ce(arg).cast("int")
        if op == "$toLong":
            return ce(arg).cast("long")
        if op == "$year":
            return F.year(ce(arg))
        if op == "$month":
            return F.month(ce(arg))
        if op == "$dayOfMonth":
            return F.dayofmonth(ce(arg))
        if op == "$hour":
            return F.hour(ce(arg))
        if op == "$dateToString":
            # {"$dateToString": {"format": "%Y-%m-%d", "date": expr}}
            fmt = arg["format"]
            for mongo, java in (
                ("%Y", "yyyy"), ("%m", "MM"), ("%d", "dd"),
                ("%H", "HH"), ("%M", "mm"), ("%S", "ss"),
            ):
                fmt = fmt.replace(mongo, java)
            return F.date_format(ce(arg["date"]), fmt)
        if op == "$meta":
            if arg == "vectorSearchScore":
                return F.col("__vs_score")
            if arg == "searchScore":
                return F.col("__search_score")
            raise ValueError(f"$meta: unsupported metadata {arg!r}")
        if op == "$dateTrunc":
            # {"$dateTrunc": {"date": expr, "unit": "day"|"hour"|...}}
            return F.date_trunc(arg["unit"], ce(arg["date"]))
        if op == "$round":
            # [num, place]; note: Spark rounds half-up where Mongo
            # rounds half-to-even — exact halves of the chosen place
            # differ (documented divergence)
            if isinstance(arg, list):
                num, place = (arg + [0])[:2]
            else:
                num, place = arg, 0
            return F.round(ce(num), int(place))
        if op == "$toString":
            return ce(arg).cast("string")
        if op == "$toUpper":
            return F.upper(ce(arg))
        if op == "$toLower":
            return F.lower(ce(arg))
        if op == "$trim":
            # {"$trim": {"input": expr[, "chars": str]}}
            spec = arg if isinstance(arg, dict) else {"input": arg}
            inp = ce(spec["input"])
            if "chars" in spec:
                return F.trim(inp, F.lit(spec["chars"]))
            return F.trim(inp)
        if op == "$strLenCP":
            return F.length(ce(arg))
        if op == "$substrCP":
            # [str, start, len] — Mongo 0-based → Spark 1-based
            s, start, n = arg
            return F.substring(ce(s), int(start) + 1, int(n))
        if op == "$arrayElemAt":
            # Mongo 0-based (negative = from end); element_at is
            # 1-based with the same negative convention
            a, idx = arg
            i = int(idx)
            return F.element_at(ce(a), i + 1 if i >= 0 else i)
        if op == "$slice":
            # [arr, n] (first/last n) or [arr, pos, n] — positions
            # 0-based from the front, negative from the end, exactly
            # Spark's slice() convention after the +1 shift
            if len(arg) == 2:
                a, n = arg
                n = int(n)
                return (
                    F.slice(ce(a), 1, n)
                    if n >= 0
                    else F.slice(ce(a), n, -n)
                )
            a, pos, n = arg
            pos = int(pos)
            return F.slice(ce(a), pos + 1 if pos >= 0 else pos, int(n))
        if op == "$concatArrays":
            return F.concat(*[ce(x) for x in arg])
        if op in ("$filter", "$map"):
            spec = dict(arg)
            var = spec.get("as", "this")
            body_key = "cond" if op == "$filter" else "in"

            def lam(x: Column) -> Column:
                inner = dict(env or {})
                inner[var] = x
                inner["this"] = x  # $$this always works
                return compile_expr(spec[body_key], inner)

            fn = F.filter if op == "$filter" else F.transform
            return fn(ce(spec["input"]), lam)
        if op == "$reduce":
            spec = dict(arg)

            def merge(acc: Column, x: Column) -> Column:
                inner = dict(env or {})
                inner["value"] = acc
                inner["this"] = x
                return compile_expr(spec["in"], inner)

            return F.aggregate(
                ce(spec["input"]), ce(spec["initialValue"]), merge
            )
        if op == "$switch":
            out = None
            for br in arg["branches"]:
                c, t = ce(br["case"]), ce(br["then"])
                out = F.when(c, t) if out is None else out.when(c, t)
            if out is None:
                raise ValueError("$switch: at least one branch required")
            if "default" in arg:
                out = out.otherwise(ce(arg["default"]))
            return out
        if op == "$abs":
            return F.abs(ce(arg))
        if op == "$ceil":
            return F.ceil(ce(arg))
        if op == "$floor":
            return F.floor(ce(arg))
        if op == "$sqrt":
            return F.sqrt(ce(arg))
        if op == "$exp":
            return F.exp(ce(arg))
        if op == "$ln":
            return F.log(ce(arg))
        if op == "$log10":
            return F.log10(ce(arg))
        if op == "$pow":
            a, b = arg
            return F.pow(ce(a), ce(b))
        if op == "$max" and isinstance(arg, list):
            return F.greatest(*[ce(x) for x in arg])
        if op == "$min" and isinstance(arg, list):
            return F.least(*[ce(x) for x in arg])
        if op in _BINOPS:
            a, b = (ce(x) for x in arg)
            return _BINOPS[op](a, b)
        if op in _VARARG:
            return _VARARG[op]([ce(x) for x in arg])
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
    "$regex": lambda c, v: c.rlike(v),
    "$mod": lambda c, v: (c % v[0]) == v[1],
}


def _compile_field_cond(col: Column, cond: Any) -> Column:
    if isinstance(cond, dict):
        preds = []
        for op, v in cond.items():
            if op == "$not":
                preds.append(~_compile_field_cond(col, v))
            elif op in _MATCH_OPS:
                preds.append(_MATCH_OPS[op](col, v))
            else:
                raise ValueError(f"unsupported $match operator: {op}")
        return _fold(preds, lambda a, b: a & b)
    return col == cond


def compile_match(spec: dict) -> Column:
    """{"field": value | {"$gt": v, ...}, ...} with implicit AND —
    the reference's point-lookup form (mongo_analytics_examples.py:42,
    operator P10) — plus the boolean connectors of the query dialect:
    top-level ``$and`` / ``$or`` / ``$nor`` (lists of sub-queries),
    per-field ``$not``, and ``$regex`` / ``$mod``."""
    preds: list[Column] = []
    for field, cond in spec.items():
        if field == "$expr":
            preds.append(compile_expr(cond))
        elif field in ("$and", "$or", "$nor"):
            subs = [compile_match(s) for s in cond]
            if field == "$and":
                preds.append(_fold(subs, lambda a, b: a & b))
            elif field == "$or":
                preds.append(_fold(subs, lambda a, b: a | b))
            else:
                preds.append(~_fold(subs, lambda a, b: a | b))
        else:
            preds.append(_compile_field_cond(F.col(field), cond))
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


_ORDER_SENSITIVE = {"$first", "$last", "$push"}


def _compile_group(
    df: DataFrame, spec: dict, sort_spec: dict | None = None
) -> DataFrame:
    """$group. The Mongo idiom '$sort then $group {$first: ...}'
    (top-1-per-group) depends on row order surviving into the
    aggregation — Spark gives NO such guarantee through a shuffle, so
    when an order-sensitive accumulator ($first/$last/$push) follows
    a $sort whose keys are still live columns, the sort is compiled
    INTO the aggregation: a row_number window over (group key, sort
    order) adds a per-group ordinal, then $first = min_by(ordinal),
    $last = max_by(ordinal), $push = array_sort by ordinal. One extra
    vertex-sized window sort, same single shuffle, deterministic at
    any partition count. Without a preceding $sort the accumulators
    fall back to F.first/F.last/collect_list, which is exactly
    Mongo's own contract: unordered input ⇒ unspecified result."""
    from pyspark.sql import Window

    _id = spec["_id"]
    if isinstance(_id, str):
        key_expr = compile_expr(_id)
    elif isinstance(_id, dict) and any(k.startswith("$") for k in _id):
        # operator expression as the key, e.g. {"$toLong": "$x"}
        key_expr = compile_expr(_id)
    elif isinstance(_id, dict):
        key_expr = F.struct(*[compile_expr(v).alias(k) for k, v in _id.items()])
    elif _id is None:
        key_expr = None
    else:
        raise ValueError(f"unsupported $group _id: {_id!r}")

    ordered = sort_spec is not None and any(
        next(iter(d)) in _ORDER_SENSITIVE
        for n, d in spec.items()
        if n != "_id"
    )
    if ordered and not all(f in df.columns for f in sort_spec):
        ordered = False  # sort keys projected away: natural-order fallback
    rn = "__mongo_rn"
    if ordered:
        w = Window.partitionBy(
            *([key_expr] if key_expr is not None else [])
        ).orderBy(*_sort_cols(sort_spec))
        df = df.withColumn(rn, F.row_number().over(w))

    aggs = []
    for name, acc_doc in spec.items():
        if name == "_id":
            continue
        (acc, arg), = acc_doc.items()
        if acc == "$sum" and arg == 1:
            aggs.append(F.count(F.lit(1)).alias(name))  # A2 count idiom
        elif ordered and acc == "$first":
            aggs.append(F.min_by(compile_expr(arg), F.col(rn)).alias(name))
        elif ordered and acc == "$last":
            aggs.append(F.max_by(compile_expr(arg), F.col(rn)).alias(name))
        elif ordered and acc == "$push":
            aggs.append(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(rn).alias("o"), compile_expr(arg).alias("v"))
                        )
                    ),
                    lambda s: s.v,
                ).alias(name)
            )
        else:
            aggs.append(_ACCUMULATORS[acc](compile_expr(arg)).alias(name))
    if _id is None:
        return df.agg(*aggs)  # A4 global aggregate
    return df.withColumn("_id", key_expr).groupBy("_id").agg(*aggs)


def _compile_project(df: DataFrame, spec: dict) -> DataFrame:
    """Mongo $project is modal: ALL-exclusion specs (every non-_id
    value 0) keep everything except the named fields (→ df.drop);
    inclusion specs keep only the named fields (plus _id unless
    excluded). Mixing inclusion and exclusion outside _id is an
    error in Mongo and raises here too — silently treating a 0 as
    'skip' inside an inclusion list would drop every other column.

    Dotted paths preserve Mongo's nesting: inclusion ``{"a.b": 1}``
    rebuilds ``a`` as a struct containing only ``b`` (siblings under
    the same root merge); exclusion ``{"a.b": 0}`` drops the subfield
    in place (``Column.dropFields``)."""
    id_rule = spec.get("_id")
    non_id = {k: v for k, v in spec.items() if k != "_id"}
    exclusions = [k for k, v in non_id.items() if v == 0]
    if exclusions:
        if len(exclusions) != len(non_id):
            raise ValueError(
                "$project cannot mix inclusion and exclusion "
                f"(excluded {exclusions}, spec {spec!r})"
            )
        out = df
        plain = [e for e in exclusions if "." not in e]
        for e in exclusions:
            if "." in e:
                root, rest = e.split(".", 1)
                # unknown roots are inert, like Mongo's unknown
                # exclusion paths (plain exclusions get the same
                # tolerance via the 'in out.columns' filter below)
                if root in out.columns:
                    out = out.withColumn(
                        root, F.col(root).dropFields(rest)
                    )
        drops = plain + (["_id"] if id_rule == 0 else [])
        return out.drop(*[c for c in drops if c in out.columns])
    if not non_id:
        # only _id mentioned: {"_id": 0} drops it, {"_id": 1} keeps it alone
        if id_rule == 0:
            return df.drop("_id") if "_id" in df.columns else df
        return df.select("_id")
    # dotted keys (inclusion OR expression): group by root, rebuild
    # the nested struct. Leaves are Columns; a prefix/extension
    # collision between two paths ('a.b' and 'a.b.c') raises like
    # Mongo's path-collision error.
    trees: dict[str, dict] = {}
    for name, rule in non_id.items():
        if "." in name:
            parts = name.split(".")
            node = trees.setdefault(parts[0], {})
            if not isinstance(node, dict):
                raise ValueError(f"$project: path collision at {parts[0]!r}")
            for i, p in enumerate(parts[1:-1], start=1):
                node = node.setdefault(p, {})
                if not isinstance(node, dict):
                    raise ValueError(
                        "$project: path collision at "
                        f"{'.'.join(parts[: i + 1])!r}"
                    )
            if parts[-1] in node:
                raise ValueError(f"$project: path collision at {name!r}")
            node[parts[-1]] = (
                F.col(name) if rule == 1 else compile_expr(rule)
            )

    def _build(tree: dict) -> Column:
        return F.struct(
            *[
                (_build(v) if isinstance(v, dict) else v).alias(k)
                for k, v in tree.items()
            ]
        )

    cols: list[Column] = []
    emitted_roots: set[str] = set()
    for name, rule in non_id.items():
        if "." in name:
            root = name.split(".", 1)[0]
            if root not in emitted_roots:
                emitted_roots.add(root)
                cols.append(_build(trees[root]).alias(root))
        elif rule == 1:
            if name in trees:
                raise ValueError(
                    f"$project: {name!r} listed both whole and by subfield"
                )
            cols.append(F.col(name))
        else:
            if name in trees:
                raise ValueError(
                    f"$project: {name!r} listed both whole and by subfield"
                )
            cols.append(compile_expr(rule).alias(name))
    # Mongo keeps _id unless projected away
    if id_rule == 0:
        pass
    elif id_rule == 1 or ("_id" in spec and id_rule is not None):
        head = F.col("_id") if id_rule == 1 else compile_expr(id_rule).alias("_id")
        cols.insert(0, head)
    elif "_id" not in spec and "_id" in df.columns:
        cols.insert(0, F.col("_id"))
    return df.select(*cols)


def _sort_cols(spec: dict) -> list[Column]:
    return [
        F.col(f).asc() if direction >= 0 else F.col(f).desc()
        for f, direction in spec.items()
    ]


def _compile_sort(df: DataFrame, spec: dict) -> DataFrame:
    return df.orderBy(*_sort_cols(spec))


def _compile_unwind(df: DataFrame, spec: Any) -> DataFrame:
    """F2: UNWIND/explode of an array field, ancestors carried along.
    Document form supports ``preserveNullAndEmptyArrays`` (→
    explode_outer) and ``includeArrayIndex`` (→ posexplode)."""
    path = spec["path"] if isinstance(spec, dict) else spec
    name = path[1:]
    preserve = isinstance(spec, dict) and spec.get(
        "preserveNullAndEmptyArrays", False
    )
    idx = spec.get("includeArrayIndex") if isinstance(spec, dict) else None
    if idx is not None:
        gen = F.posexplode_outer(F.col(name)) if preserve else F.posexplode(
            F.col(name)
        )
        other = [c for c in df.columns if c != name]
        return df.select(*other, gen.alias(idx, name))
    gen = F.explode_outer(F.col(name)) if preserve else F.explode(F.col(name))
    return df.withColumn(name, gen)


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
    flat-join shape (J1).

    Null keys follow Mongo: a null localField matches foreign docs
    whose foreignField is also null (``eqNullSafe``), not the empty
    array a plain equi-join would silently produce. The ``as`` name
    (and the internal join key) must not collide with an existing
    input column — Mongo would overwrite; here it raises.

    The ``let``/``pipeline`` form routes to
    ``_compile_lookup_pipeline``."""
    if "pipeline" in spec or "let" in spec:
        return _compile_lookup_pipeline(df, spec, collections)
    right = collections[spec["from"]]
    as_name = spec["as"]
    for clash in (as_name, "__lookup_key"):
        if clash in df.columns:
            raise ValueError(
                f"$lookup output column {clash!r} collides with an "
                "existing input column"
            )
    grouped = right.groupBy(
        F.col(spec["foreignField"]).alias("__lookup_key")
    ).agg(
        F.collect_list(F.struct(*right.columns)).alias(as_name)
    )
    joined = df.join(
        grouped,
        df[spec["localField"]].eqNullSafe(grouped["__lookup_key"]),
        "left",
    ).drop("__lookup_key")
    return joined.withColumn(
        as_name, F.coalesce(F.col(as_name), F.array())
    )


def _compile_lookup_pipeline(
    df: DataFrame, spec: dict, collections: dict[str, DataFrame]
) -> DataFrame:
    """``$lookup`` with ``let`` + ``pipeline`` — Mongo's correlated
    join form. Supported sub-pipeline: a leading ``$match`` whose
    predicate is ``$expr`` (arbitrary expression over foreign fields
    and ``$$var`` bindings — compiled through the same ``env``
    machinery as $filter/$map), optionally followed by a
    ``$project`` over the foreign columns. Anything else raises.

    Plan: matches are grouped per DISTINCT ``let``-value tuple, not
    per input row — rows sharing bindings share one probe — then
    joined back onto the input on the let expressions (null-safe,
    left). The join condition is exactly the compiled ``$expr``, so
    equality bindings give Catalyst an equi-join it can hash; pure
    theta conditions degrade to the same BNL join SQL would.

    Mongo 5.0's concise form (``localField``/``foreignField``
    together with a pipeline) adds the implicit null-safe equality
    on top of whatever the sub-pipeline matches."""
    right = collections[spec["from"]]
    as_name = spec["as"]
    lets: dict[str, Any] = dict(spec.get("let", {}))
    sub = list(spec.get("pipeline", []))
    if as_name in df.columns:
        raise ValueError(
            f"$lookup output column {as_name!r} collides with an "
            "existing input column"
        )
    # concise form: implicit equality joins the explicit $expr
    concise = "localField" in spec or "foreignField" in spec
    if concise:
        if "localField" not in spec or "foreignField" not in spec:
            raise ValueError(
                "$lookup: localField and foreignField must appear together"
            )
        lets["__concise"] = "$" + spec["localField"]
    if sub and "$match" in sub[0] and "$expr" in sub[0]["$match"]:
        cond_doc = sub[0]["$match"]["$expr"]
        rest = sub[1:]
    elif concise:
        cond_doc = None  # equality only
        rest = sub
    else:
        raise ValueError(
            "$lookup pipeline form: sub-pipeline must start with "
            "{'$match': {'$expr': ...}}"
        )
    if len(rest) > 1 or (rest and "$project" not in rest[0]):
        raise ValueError(
            "$lookup pipeline form: only an optional trailing $project "
            "is supported after the $expr $match"
        )
    let_cols = {v: f"__let_{v}" for v in lets}
    clash = [c for c in let_cols.values() if c in right.columns]
    if clash:
        raise ValueError(f"$lookup: let columns collide with foreign: {clash}")
    keyframe = df.select(
        *[compile_expr(e).alias(let_cols[v]) for v, e in lets.items()]
    ).distinct()
    env = {v: F.col(c) for v, c in let_cols.items()}
    cond = compile_expr(cond_doc, env) if cond_doc is not None else F.lit(True)
    if concise:
        # null-safe like the equality-form $lookup (null local keys
        # match null foreign keys, per Mongo)
        cond = cond & F.col(let_cols["__concise"]).eqNullSafe(
            right[spec["foreignField"]]
        )
    matched = keyframe.join(right, cond, "inner")
    if rest:
        keep = _project_columns(right, rest[0]["$project"])
    else:
        keep = list(right.columns)
    grouped = matched.groupBy(*let_cols.values()).agg(
        F.collect_list(F.struct(*[F.col(c) for c in keep])).alias(as_name)
    )
    join_cond = None
    for v, c in let_cols.items():
        this = compile_expr(lets[v]).eqNullSafe(grouped[c])
        join_cond = this if join_cond is None else (join_cond & this)
    out = df.join(grouped, join_cond, "left").drop(*let_cols.values())
    return out.withColumn(as_name, F.coalesce(F.col(as_name), F.array()))


def _project_columns(right: DataFrame, proj: dict) -> list[str]:
    """Column subset a simple inclusion/exclusion $project keeps
    (used for the foreign side of the pipeline-form $lookup, where
    the projection must be a plain column selection)."""
    non_id = {k: v for k, v in proj.items() if k != "_id"}
    if non_id and all(v == 0 for v in non_id.values()):
        return [c for c in right.columns if c not in non_id]
    bad = [k for k, v in non_id.items() if v not in (1, True)]
    if bad:
        raise ValueError(
            f"$lookup pipeline form: $project supports plain column "
            f"selection only, got expressions for {bad}"
        )
    return [k for k in non_id if k in right.columns]


def _compile_set_window_fields(df: DataFrame, spec: dict) -> DataFrame:
    """``$setWindowFields`` → Spark Window functions. Supported:
    ``partitionBy`` (expression), ``sortBy``, and ``output`` fields
    using ``$sum/$avg/$min/$max/$count`` (with an optional
    ``window.documents [a, b]`` row frame; 'unbounded'/'current'/int
    bounds — with no explicit window the frame is the whole
    partition, Mongo's default, whether or not sortBy is present),
    ``$rank`` / ``$denseRank`` / ``$documentNumber``, and ``$shift``
    (by > 0 → lead, by < 0 → lag, with ``default``). One Exchange on
    the partition key, ranking/frames computed partition-locally —
    the same plan the native windows.py operators produce."""
    from pyspark.sql import Window

    part = spec.get("partitionBy")
    sort_by = spec.get("sortBy")
    w = Window.partitionBy(
        *([compile_expr(part)] if part is not None else [])
    )
    if sort_by:
        w = w.orderBy(*_sort_cols(sort_by))

    def bound(b: Any, *, is_lower: bool) -> int:
        if b == "unbounded":
            return (
                Window.unboundedPreceding if is_lower
                else Window.unboundedFollowing
            )
        if b == "current":
            return Window.currentRow
        return int(b)

    out = df
    for name, odoc in spec["output"].items():
        odoc = dict(odoc)
        win = odoc.pop("window", None)
        (op, arg), = odoc.items()
        if op in ("$rank", "$denseRank", "$documentNumber"):
            if not sort_by:
                raise ValueError(f"$setWindowFields: {op} requires sortBy")
            fn = {
                "$rank": F.rank,
                "$denseRank": F.dense_rank,
                "$documentNumber": F.row_number,
            }[op]
            out = out.withColumn(name, fn().over(w))
            continue
        if op == "$shift":
            if not sort_by:
                raise ValueError("$setWindowFields: $shift requires sortBy")
            by = int(arg.get("by", 1))
            default = arg.get("default")
            expr = compile_expr(arg["output"])
            col = (
                F.lead(expr, by, default) if by >= 0 else F.lag(expr, -by, default)
            )
            out = out.withColumn(name, col.over(w))
            continue
        if op not in (
            "$sum", "$avg", "$min", "$max", "$count",
            "$first", "$last", "$push",
        ):
            raise ValueError(f"$setWindowFields: unsupported {op}")
        if op in ("$first", "$last", "$push") and not sort_by:
            # without an ordering these are Mongo's 'unspecified
            # result' — refuse rather than return partition-order noise
            raise ValueError(f"$setWindowFields: {op} requires sortBy")
        if op == "$count" or (op == "$sum" and arg == 1):
            agg = F.count(F.lit(1))
        elif op == "$push":
            # struct-wrap so null elements survive (collect_list drops
            # bare nulls; Mongo's $push keeps them) — same trick as
            # the $group-stage $push
            agg = F.collect_list(F.struct(compile_expr(arg).alias("v")))
        else:
            agg = {
                "$sum": F.sum, "$avg": F.avg, "$min": F.min, "$max": F.max,
                "$first": F.first, "$last": F.last,
            }[op](compile_expr(arg))
        frame = w
        if win is not None:
            if "documents" not in win:
                raise ValueError(
                    "$setWindowFields: only documents (row) frames supported"
                )
            lo, hi = win["documents"]
            frame = w.rowsBetween(
                bound(lo, is_lower=True), bound(hi, is_lower=False)
            )
        elif sort_by:
            # Mongo's default window is the WHOLE partition even when
            # sortBy is present (sortBy alone only drives rank/shift
            # functions); Spark's implicit frame under an orderBy is
            # [unbounded, current], so the full frame must be set
            # explicitly or every accumulator silently turns into a
            # running value.
            frame = w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        col = agg.over(frame)
        if op == "$push":
            col = F.transform(col, lambda x: x["v"])  # unwrap
        out = out.withColumn(name, col)
    return out


def _compile_fill(df: DataFrame, spec: dict) -> DataFrame:
    """``$fill`` → null repair. ``{"value": expr}`` compiles to a
    coalesce (pure narrow map); ``{"method": "locf"}`` compiles to
    ``last(col, ignorenulls=True)`` over a running row frame — one
    Exchange on the partition key, carry-forward computed
    partition-locally. ``method: "linear"`` is not supported (it
    needs both neighbours; raise rather than approximate)."""
    from pyspark.sql import Window

    part = spec.get("partitionBy")
    sort_by = spec.get("sortBy")
    w = Window.partitionBy(
        *([compile_expr(part)] if part is not None else [])
    )
    if sort_by:
        w = w.orderBy(*_sort_cols(sort_by))
    for field, rule in spec["output"].items():
        if "value" in rule:
            df = df.withColumn(
                field, F.coalesce(F.col(field), compile_expr(rule["value"]))
            )
        elif rule.get("method") == "locf":
            if not sort_by:
                raise ValueError("$fill: locf requires sortBy")
            df = df.withColumn(
                field,
                F.coalesce(
                    F.col(field),
                    F.last(F.col(field), ignorenulls=True).over(
                        w.rowsBetween(
                            Window.unboundedPreceding, Window.currentRow
                        )
                    ),
                ),
            )
        else:
            raise ValueError(f"$fill: unsupported output rule {rule!r}")
    return df


def _compile_densify(df: DataFrame, spec: dict) -> DataFrame:
    """``$densify`` → generate the missing steps of a numeric field.
    Generated documents carry only the partition fields + the
    densified field (all other columns null), exactly Mongo's
    contract. Plan: per-partition (or global) min/max aggregate →
    ``sequence`` → ``explode`` → anti-join against the existing
    (partition, field) pairs → union. The aggregates are tiny
    (one row per partition); the anti-join shuffles on the same
    keys the data is already grouped by."""
    import math

    from pyspark.sql import types as T

    field = spec["field"]
    parts = list(spec.get("partitionByFields", []))
    rng = spec["range"]
    raw_step = rng["step"]
    bounds = rng.get("bounds", "full")
    f = F.col(field)
    field_type = df.schema[field].dataType
    integral = isinstance(
        field_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    if integral and float(raw_step) != int(raw_step):
        # a fractional step over an int column would generate values
        # the column's type cannot hold — Mongo (schemaless) emits
        # doubles here; a typed engine must refuse, not truncate
        raise ValueError(
            f"$densify: fractional step {raw_step!r} over integral "
            f"field {field!r} — cast the field to double first"
        )
    step = int(raw_step) if integral else float(raw_step)

    def span_from(lo_c: Column, hi_c: Column) -> Column:
        """Values lo, lo+step, ... ≤ hi (empty when hi < lo)."""
        if integral:
            return F.when(
                hi_c >= lo_c, F.sequence(lo_c, hi_c, F.lit(step))
            ).otherwise(F.array().cast(f"array<{field_type.simpleString()}>"))
        n = F.floor((hi_c - lo_c) / F.lit(step)).cast("int")
        return F.when(
            n >= 0,
            F.transform(
                F.sequence(F.lit(0), n),
                lambda i: (
                    lo_c + i.cast("double") * F.lit(step)
                ).cast(field_type),
            ),
        ).otherwise(F.array().cast(f"array<{field_type.simpleString()}>"))

    if isinstance(bounds, list):
        lo, hi = bounds
        # [lower, upper): the last generated value is the largest
        # lo + k*step strictly below hi
        k = math.ceil((hi - lo) / step) - 1  # largest k: lo + k*step < hi
        last = lo + max(k, -1) * step
        per = (
            df.select(*parts).distinct() if parts
            else df.sparkSession.range(1).select()
        )
        dense = per.select(
            *parts,
            F.explode(span_from(F.lit(lo), F.lit(last))).alias(field),
        )
    else:
        if bounds == "partition":
            if not parts:
                raise ValueError(
                    "$densify: bounds 'partition' needs partitionByFields"
                )
            ext = df.groupBy(*parts).agg(
                F.min(f).alias("__lo"), F.max(f).alias("__hi")
            )
        elif bounds == "full":
            glob = df.agg(F.min(f).alias("__lo"), F.max(f).alias("__hi"))
            ext = (
                df.select(*parts).distinct().crossJoin(F.broadcast(glob))
                if parts else glob
            )
        else:
            raise ValueError(f"$densify: unsupported bounds {bounds!r}")
        dense = ext.select(
            *parts,
            F.explode(span_from(F.col("__lo"), F.col("__hi"))).alias(field),
        )
    missing = dense.join(
        df.select(*parts, field).distinct(), [*parts, field], "left_anti"
    )
    return df.unionByName(missing, allowMissingColumns=True)


# runaway guard for $graphLookup traversals with no explicit maxDepth
_GL_CAP = 50


def _compile_graph_lookup(
    df: DataFrame, spec: dict, collections: Any
) -> DataFrame:
    """``$graphLookup`` → iterative frontier-expansion BFS over the
    foreign collection, the pipeline dialect's recursive traversal.

    Reachability is computed per DISTINCT start value, not per input
    row — rows sharing a seed share one traversal — then joined back
    onto the input. Each round: explode the frontier's connectFrom
    values → equi-join the foreign collection's connectToField →
    anti-join the visited set → accumulate. The loop follows the
    engine's iterative discipline (PageRank, connected components):
    ``localCheckpoint`` every round to cut lineage, stop on an empty
    frontier (O(1) count on a checkpointed frame), hard cap as a
    runaway guard. Foreign-doc identity for the visited set is the
    full document struct (Mongo dedups on _id; a full-struct dedup
    is the schema-agnostic equivalent).

    Output: the ``as`` column holds the array of reached documents,
    each a struct of the foreign collection's columns (+ the long
    ``depthField`` if requested, 0 = first hop), array-sorted for
    determinism (Mongo leaves the order unspecified).

    ``restrictSearchWithMatch`` filters the foreign collection before
    traversal (equivalent to Mongo filtering every candidate level).
    Without an explicit ``maxDepth`` the traversal runs to exhaustion
    like Mongo; a runaway guard raises — rather than silently
    truncating — if the frontier is still live after ``_GL_CAP`` rounds.
    Seed equality is null-safe (same reasoning as ``_compile_lookup``:
    null startWith matches a null connectToField)."""
    if not collections:
        raise ValueError("$graphLookup requires a collections resolver")
    foreign = collections[spec["from"]]
    if spec.get("restrictSearchWithMatch"):
        foreign = foreign.filter(
            compile_match(spec["restrictSearchWithMatch"])
        )
    start = compile_expr(spec["startWith"])
    from_f, to_f = spec["connectFromField"], spec["connectToField"]
    as_f = spec["as"]
    depth_f = spec.get("depthField")
    explicit_depth = "maxDepth" in spec
    max_depth = int(spec["maxDepth"]) if explicit_depth else _GL_CAP
    if as_f in df.columns:
        raise ValueError(f"$graphLookup: column {as_f!r} already exists")

    doc = F.struct(*[F.col(c) for c in foreign.columns]).alias("__doc")
    fr = foreign.select(
        doc, F.col(to_f).alias("__to"), F.col(from_f).alias("__from")
    )
    seeds = df.select(start.alias("__seed")).distinct()
    # depth 0: foreign docs whose connectTo equals the start value
    frontier = (
        seeds.join(fr, F.col("__seed").eqNullSafe(F.col("__to")))
        .select("__seed", "__doc", "__from", F.lit(0).alias("__depth"))
        .distinct()
        .localCheckpoint()
    )
    reached = frontier
    exhausted = False
    for depth in range(1, max_depth + 1):
        if frontier.isEmpty():
            exhausted = True
            break
        candidates = (
            frontier.select("__seed", F.col("__from").alias("__hop"))
            .distinct()
            .join(fr, F.col("__hop") == F.col("__to"))
            .select("__seed", "__doc", "__from")
            .distinct()
        )
        seen = reached.select(
            F.col("__seed").alias("__s2"), F.col("__doc").alias("__seen")
        )
        frontier = (
            candidates.join(
                seen,
                (candidates["__seed"] == seen["__s2"])
                & (candidates["__doc"] == seen["__seen"]),
                "left_anti",
            )
            .withColumn("__depth", F.lit(depth))
            .localCheckpoint()
        )
        reached = reached.unionByName(frontier).localCheckpoint()
    if not explicit_depth and not exhausted and not frontier.isEmpty():
        raise ValueError(
            f"$graphLookup: traversal still expanding after {_GL_CAP} "
            "rounds with no maxDepth — set maxDepth explicitly "
            "(Mongo's default is unbounded; silently truncating would "
            "return incomplete results)"
        )
    if depth_f:
        elem = F.struct(
            *[F.col("__doc")[c].alias(c) for c in foreign.columns],
            F.col("__depth").cast("long").alias(depth_f),
        )
    else:
        elem = F.col("__doc")
    agg = reached.groupBy("__seed").agg(
        F.array_sort(F.collect_list(elem)).alias("__arr")
    )
    out = df.join(agg, start.eqNullSafe(agg["__seed"]), "left").drop("__seed")
    fill = F.coalesce(
        F.col("__arr"),
        F.array().cast(agg.schema["__arr"].dataType),
    )
    return out.withColumn(as_f, fill).drop("__arr")


def _apply_out_sink(
    df: DataFrame, spec: Any, sinks: dict[str, str]
) -> DataFrame:
    """``$out``: replace the target collection with the pipeline
    result (etl_cricsheet_to_mongo.py:136's drop-and-reload mode).
    The result is materialized (localCheckpoint) before the
    overwrite so a pipeline reading from its own target can't
    clobber its input mid-plan; returns the re-read target."""
    name = spec if isinstance(spec, str) else spec["coll"]
    if name not in sinks:
        raise ValueError(f"$out: no sink path registered for {name!r}")
    spark = df.sparkSession
    out = df.localCheckpoint()
    out.write.mode("overwrite").parquet(sinks[name])
    return spark.read.parquet(sinks[name])


def _apply_merge_sink(
    df: DataFrame, spec: Any, sinks: dict[str, str]
) -> DataFrame:
    """``$merge``: upsert the pipeline result into the target by key
    — the pipeline dialect of the reference's
    ``replace_one(upsert=True)`` sink (etl_cricsheet_to_mongo.py:136)
    and of ``operators.etl.upsert_by_key``. Supported: whenMatched
    ∈ {replace, keepExisting, merge}, whenNotMatched ∈ {insert, discard}
    (Mongo's defaults for the reference's shape are replace/insert).
    Three key-joins against the existing target — all equi-joins,
    shuffle-partitioned on the merge key — then one overwrite;
    at 100 TB the same dataflow lands on a partition-overwrite or
    Delta MERGE sink instead of a whole-table rewrite."""
    name = spec["into"] if isinstance(spec, dict) else spec
    if name not in sinks:
        raise ValueError(f"$merge: no sink path registered for {name!r}")
    path = sinks[name]
    on = spec.get("on", "_id") if isinstance(spec, dict) else "_id"
    keys = [on] if isinstance(on, str) else list(on)
    when_matched = (
        spec.get("whenMatched", "replace") if isinstance(spec, dict) else "replace"
    )
    when_not_matched = (
        spec.get("whenNotMatched", "insert") if isinstance(spec, dict) else "insert"
    )
    if when_matched not in ("replace", "keepExisting", "merge"):
        raise ValueError(f"$merge: unsupported whenMatched {when_matched!r}")
    if when_not_matched not in ("insert", "discard"):
        raise ValueError(
            f"$merge: unsupported whenNotMatched {when_not_matched!r}"
        )
    spark = df.sparkSession
    new = df.dropDuplicates(keys)
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(path)
    except AnalysisException as e:
        # ONLY path-absence means "first write". Any other read
        # failure (corrupt file, permissions, schema error) must
        # surface — treating it as absence would overwrite the
        # target with just the incoming rows and silently destroy
        # every previously merged row.
        if "PATH_NOT_FOUND" not in str(e):
            raise
        existing = None
    if existing is None:
        result = new if when_not_matched == "insert" else new.limit(0)
    else:
        kept_unmatched = existing.join(new.select(*keys), keys, "left_anti")
        if when_matched == "replace":
            matched = new.join(existing.select(*keys), keys, "left_semi")
        elif when_matched == "merge":
            # field-wise document merge (Mongo's whenMatched: merge):
            # incoming non-null fields win, existing fields survive
            # where the incoming doc lacks or nulls them; columns only
            # on one side pass through. DOCUMENTED DIVERGENCE: a
            # fixed-schema frame cannot distinguish an absent field
            # from an explicit null, so an incoming null can never
            # clear an existing value (Mongo's $mergeObjects would
            # set it to null when the field is explicitly present) —
            # to clear a field, use whenMatched: replace
            n = new.select(
                *keys,
                *[
                    F.col(c).alias(f"__new_{c}")
                    for c in new.columns
                    if c not in keys
                ],
            )
            merged_cols = [
                (
                    F.coalesce(F.col(f"__new_{c}"), F.col(c)).alias(c)
                    if c in new.columns
                    else F.col(c)
                )
                for c in existing.columns
                if c not in keys
            ]
            extra = [
                F.col(f"__new_{c}").alias(c)
                for c in new.columns
                if c not in keys and c not in existing.columns
            ]
            matched = (
                existing.join(n, keys, "inner")
                .select(*keys, *merged_cols, *extra)
            )
        else:
            matched = existing.join(new.select(*keys), keys, "left_semi")
        result = kept_unmatched.unionByName(matched, allowMissingColumns=True)
        if when_not_matched == "insert":
            inserted = new.join(existing.select(*keys), keys, "left_anti")
            result = result.unionByName(inserted, allowMissingColumns=True)
    # sever lineage from the files about to be overwritten
    result = result.localCheckpoint()
    result.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _compile_vector_search(df: DataFrame, spec: dict) -> DataFrame:
    """``$vectorSearch`` (Atlas dialect, exact mode): score every row
    against the literal query vector and keep the top ``limit`` —
    compiled to the ANN family's native-expression cosine
    (operators/similarity.py), so the pipeline dialect reaches the
    vector-search surface. The score is exposed to later stages as
    Mongo does, via ``{"$meta": "vectorSearchScore"}``, using the
    Atlas normalization score = (1 + cosine) / 2.

    Exact (ENN) rather than candidate-pruned: ``numCandidates`` is
    accepted and ignored, like Atlas's ``exact: true`` path; the IVF
    probe (ivf_topk) is the engine's approximate alternative when
    recall/latency trade-offs matter. Ordering ties on the score are
    broken by the collection's first column for determinism."""
    from cricket_analytics_nosql_spark.operators.similarity import dot

    qv = [float(x) for x in spec["queryVector"]]
    path = spec["path"]
    k = int(spec["limit"])
    # math.sqrt, not **0.5: correctly-rounded sqrt matches the SQL
    # oracle's sqrt() for every input, pow(x, 0.5) only usually
    qnorm = math.sqrt(sum(x * x for x in qv))
    q = F.array(*[F.lit(x) for x in qv])
    v = F.col(path).cast("array<double>")
    cos = dot(q, v) / (F.lit(qnorm) * F.sqrt(dot(v, v)))
    tiebreak = F.col(df.columns[0])
    return (
        df.withColumn("__vs_score", (F.lit(1.0) + cos) / F.lit(2.0))
        .orderBy(F.desc("__vs_score"), F.asc(tiebreak))
        .limit(k)
    )


def _compile_search(df: DataFrame, spec: dict) -> DataFrame:
    """``$search`` (Atlas Search dialect, the ``text`` operator):
    BM25-score every document whose ``path`` column contains at
    least one query term and expose the score to later stages via
    ``{"$meta": "searchScore"}`` — the pipeline front-end reaching
    the engine's full-text scorer (operators/text.py bm25_search;
    identical tokenization, k1/b constants, and idf formula, so a
    pipeline-submitted search scores exactly like the native one).

    Non-matching documents are dropped, as Atlas does. The corpus
    statistics (doc lengths, avgdl, df) derive from ``df`` itself —
    the collection IS the index; at scale the tf/dl frames are the
    thing a real deployment materializes. Scores are rounded at 6dp
    so downstream sorts are reproducible cross-engine."""
    from cricket_analytics_nosql_spark.operators.text import BM25_B, BM25_K1

    text_op = spec.get("text")
    if not text_op:
        raise ValueError("$search: only the 'text' operator is supported")
    path = text_op["path"]
    qt = [t for t in str(text_op["query"]).lower().split() if t]
    if not qt:
        raise ValueError("$search: empty query")
    id_col = df.columns[0]
    toks = df.select(
        id_col,
        F.explode(
            F.filter(
                F.split(F.lower(F.col(path)), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("__term"),
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl"))
    stats = dl.agg(
        F.avg("__dl").alias("__avgdl"), F.count(F.lit(1)).alias("__n_docs")
    )
    tf = (
        toks.filter(F.col("__term").isin(qt))
        .groupBy(id_col, "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    df_ = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    norm = F.col("__tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("__dl") / F.col("__avgdl")
    )
    term_score = idf * F.col("__tf") * (BM25_K1 + 1) / norm
    scored = (
        tf.join(F.broadcast(df_), "__term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(term_score), 6).alias("__search_score"))
    )
    return df.join(scored, id_col)


def compile_pipeline(
    df: DataFrame,
    pipeline: list[dict],
    collections: dict[str, DataFrame] | None = None,
    sinks: dict[str, str] | None = None,
) -> DataFrame:
    """Compile a Mongo aggregation pipeline onto ``df``. Stages are
    applied in order; Catalyst then optimizes the WHOLE chain (pushes
    $match into the scan, prunes columns across stages, fuses
    $sort+$limit) — the optimizations the reference author had to
    hand-encode in stage order (SURVEY §4) happen regardless of
    stage order here. ``collections`` resolves foreign collection
    names for ``$lookup`` / ``$unionWith``.

    A ``$sort`` is remembered across order-preserving stages so a
    later ``$group`` with $first/$last/$push compiles the ordering
    into the aggregation (see ``_compile_group``) instead of relying
    on row order surviving the shuffle."""
    pending_sort: dict | None = None
    sort_poison: str | None = None
    for stage_idx, stage in enumerate(pipeline):
        if len(stage) != 1:
            raise ValueError(f"pipeline stage must have one key: {stage}")
        (op, spec), = stage.items()
        if op == "$group" and sort_poison and _has_order_sensitive(spec):
            # the pending $sort's key values were rewritten between
            # the $sort and this ordered $group; Mongo would order by
            # the ORIGINAL values, which no longer exist as columns —
            # refuse rather than silently order by the new ones
            raise ValueError(sort_poison)
        if op == "$vectorSearch":
            if stage_idx != 0:
                raise ValueError(
                    "$vectorSearch must be the first pipeline stage"
                )
            df = _compile_vector_search(df, spec)
        elif op == "$search":
            if stage_idx != 0:
                raise ValueError("$search must be the first pipeline stage")
            df = _compile_search(df, spec)
        elif op == "$match":
            df = df.filter(compile_match(spec))
        elif op == "$project":
            df = _compile_project(df, spec)
        elif op == "$addFields":
            from pyspark.sql import types as T

            for name, rule in spec.items():
                if "." in name:
                    # dotted path sets the nested field in place,
                    # preserving the document shape (Mongo
                    # semantics); a missing or non-struct root is
                    # created/replaced as a fresh nested document,
                    # also per Mongo
                    root, rest = name.split(".", 1)
                    root_is_struct = root in df.columns and isinstance(
                        df.schema[root].dataType, T.StructType
                    )
                    if root_is_struct:
                        df = df.withColumn(
                            root,
                            F.col(root).withField(rest, compile_expr(rule)),
                        )
                    else:
                        nested = compile_expr(rule)
                        for part in reversed(rest.split(".")):
                            nested = F.struct(nested.alias(part))
                        df = df.withColumn(root, nested)
                else:
                    df = df.withColumn(name, compile_expr(rule))
        elif op == "$group":
            df = _compile_group(df, spec, sort_spec=pending_sort)
        elif op == "$sort":
            df = _compile_sort(df, spec)
        elif op == "$limit":
            df = df.limit(int(spec))
        elif op == "$skip":
            df = df.offset(int(spec))
        elif op == "$count":
            df = df.agg(F.count(F.lit(1)).alias(spec))
        elif op == "$setWindowFields":
            df = _compile_set_window_fields(df, spec)
        elif op == "$fill":
            df = _compile_fill(df, spec)
        elif op == "$densify":
            df = _compile_densify(df, spec)
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
        elif op == "$bucketAuto":
            # equi-height buckets: boundaries at the k/N quantiles
            # (exact percentile — swap for approx_percentile at
            # scale, same plan shape). DIVERGENCE from Mongo,
            # documented: no 'granularity' rounding; buckets are
            # labelled {min, max} like Mongo's _id document. The
            # quantile frame is N+1 scalars — broadcast back, the
            # fact side never shuffles before its aggregation.
            gb = compile_expr(spec["groupBy"])
            n = int(spec["buckets"])
            if spec.get("granularity"):
                raise ValueError("$bucketAuto: granularity unsupported")
            qs = [i / n for i in range(n + 1)]
            bounds_df = df.select(
                F.percentile(gb, F.array(*[F.lit(q) for q in qs])).alias("__qs")
            )
            with_b = df.crossJoin(F.broadcast(bounds_df))
            q_arr = F.col("__qs")
            # right-open except the last bucket, which is closed;
            # null groupBy values sort FIRST in Mongo's BSON order,
            # so they land in bucket 0 (a bare `<` would leave them
            # falling through every When into the LAST bucket)
            bucket = F.lit(n - 1)
            for i in range(n - 1, 0, -1):
                bucket = F.when(gb < q_arr[i], F.lit(i - 1)).otherwise(bucket)
            bucket = F.when(gb.isNull(), F.lit(0)).otherwise(bucket)
            output = spec.get("output", {"count": {"$sum": 1}})
            df = _compile_group(
                with_b.withColumn("__bucket", bucket)
                .withColumn(
                    "__bucket_id",
                    F.struct(
                        q_arr[F.col("__bucket")].alias("min"),
                        q_arr[F.col("__bucket") + 1].alias("max"),
                    ),
                )
                .drop("__qs"),
                {"_id": "$__bucket_id", **output},
            ).orderBy(F.col("_id.min"))
        elif op == "$sortByCount":
            # sugar: $group by expr + count + sort desc (Mongo docs)
            df = _compile_group(
                df, {"_id": spec, "count": {"$sum": 1}}
            ).orderBy(F.col("count").desc(), F.col("_id").asc())
        elif op == "$unset":
            # sugar for an all-exclusion $project (which also gives
            # dotted paths the in-place subfield drop)
            fields = [spec] if isinstance(spec, str) else list(spec)
            df = _compile_project(df, {f: 0 for f in fields})
        elif op in ("$replaceRoot", "$replaceWith"):
            if op == "$replaceRoot":
                root = spec["newRoot"] if isinstance(spec, dict) else spec
            else:
                root = spec
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
        elif op == "$graphLookup":
            df = _compile_graph_lookup(df, spec, collections)
        elif op == "$unionWith":
            if not collections:
                raise ValueError("$unionWith requires a collections resolver")
            name = spec["coll"] if isinstance(spec, dict) else spec
            df = df.unionByName(
                collections[name], allowMissingColumns=True
            )
        elif op in ("$out", "$merge"):
            if stage is not pipeline[-1]:
                raise ValueError(f"{op} must be the final pipeline stage")
            if not sinks:
                raise ValueError(f"{op} requires a sinks path resolver")
            if op == "$out":
                df = _apply_out_sink(df, spec, sinks)
            else:
                df = _apply_merge_sink(df, spec, sinks)
        else:
            raise ValueError(f"unsupported pipeline stage: {op}")
        if op == "$sort":
            pending_sort = spec
            sort_poison = None
        elif op in ("$addFields", "$project", "$unset") and pending_sort:
            disturbed = _disturbed_sort_keys(op, spec, pending_sort)
            if disturbed:
                pending_sort = None
                sort_poison = (
                    f"{op} rewrites/removes $sort key(s) {sorted(disturbed)}; "
                    "a later ordered $group ($first/$last/$push) would order "
                    "by the rewritten values, not the order the $sort "
                    "established — assign to a new field name, or move the "
                    "$sort after this stage"
                )
        elif op not in ("$match", "$limit", "$skip", "$addFields", "$project"):
            # $group consumed it; other stages don't preserve row order
            pending_sort = None
    if "__vs_score" in df.columns:
        # internal $vectorSearch score column: visible to stages via
        # {"$meta": "vectorSearchScore"} only, never in the output
        df = df.drop("__vs_score")
    if "__search_score" in df.columns:
        # same contract for $search's {"$meta": "searchScore"}
        df = df.drop("__search_score")
    return df


def _has_order_sensitive(group_spec: dict) -> bool:
    return any(
        next(iter(d)) in _ORDER_SENSITIVE
        for n, d in group_spec.items()
        if n != "_id"
    )


def _paths_overlap(a: str, b: str) -> bool:
    """True when writing/removing path ``a`` can change the value at
    path ``b`` (equal, or one is a prefix segment of the other —
    'a.b' disturbs 'a' and vice versa)."""
    return a == b or a.startswith(b + ".") or b.startswith(a + ".")


def _disturbed_sort_keys(op: str, spec: Any, sort_spec: dict) -> set[str]:
    """Sort keys whose VALUES do not survive this stage unchanged.
    $project inclusion entries of literal 1/True keep the original
    column; anything else (expression, exclusion, omission from an
    inclusion list, $unset) loses or rewrites it. Paths are compared
    segment-wise: a dotted write into a struct disturbs a sort on
    the whole struct and vice versa."""
    keys = set(sort_spec)
    if op == "$addFields":
        return {k for k in keys if any(_paths_overlap(w, k) for w in spec)}
    if op == "$unset":
        fields = {spec} if isinstance(spec, str) else set(spec)
        return {k for k in keys if any(_paths_overlap(w, k) for w in fields)}
    # $project
    non_id = {k: v for k, v in spec.items() if k != "_id"}
    if non_id and all(v == 0 for v in non_id.values()):  # exclusion mode
        return {
            k for k in keys if any(_paths_overlap(w, k) for w in non_id)
        }
    # inclusion mode: key K survives verbatim iff some rule-1 entry
    # covers it whole (W == K, or W is an ancestor path of K). A
    # dotted inclusion UNDER K rebuilds K's struct (different value);
    # an expression at/inside K rewrites it; anything else drops it.
    return {
        k
        for k in keys
        if not any(
            r in (1, True) and (w == k or k.startswith(w + "."))
            for w, r in non_id.items()
        )
    }
