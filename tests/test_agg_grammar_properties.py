"""Property sweep over the AggregatorFactory / PostAggregator grammar:
random spec shapes (simple aggs, sketches, filtered wrappers, arithmetic
and estimate post-aggs) evaluated by ``group_aggregate`` must match an
independent plain-PySpark evaluation of the same semantics — the
fuzz-shaped net under the grammar the targeted tests can't cover
combinatorially."""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.functions.aggregators import group_aggregate

N_CASES = 25


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(7)
    rows = [
        Row(
            g=f"g{rng.randrange(4)}",
            u=rng.randrange(40),
            v=round(rng.uniform(-50, 50), 3),
        )
        for _ in range(800)
    ]
    return spark.createDataFrame(rows)


def _plain_agg(spec, cond=None):
    """Independent plain-Spark evaluation of one aggregator spec."""
    t = spec["type"]
    if t == "filtered":
        f = spec["filter"]
        cond = F.col(f["dimension"]) == F.lit(f["value"])
        return _plain_agg(spec["aggregator"], cond)

    def val(field):
        c = F.col(field)
        return F.when(cond, c) if cond is not None else c

    name = spec["name"]
    if t == "count":
        base = F.when(cond, F.lit(1)) if cond is not None else F.lit(1)
        return F.count(base).alias(name)
    field = spec["fieldName"]
    fns = {
        "longSum": lambda c: F.sum(c.cast("long")).cast("long"),
        "doubleSum": lambda c: F.sum(c.cast("double")),
        "longMin": lambda c: F.min(c.cast("long")),
        "longMax": lambda c: F.max(c.cast("long")),
        "doubleMin": lambda c: F.min(c.cast("double")),
        "doubleMax": lambda c: F.max(c.cast("double")),
        # exact reference for the sketches: true distinct count (both
        # HLL (coupon regime) and KMV (under-full) are exact here)
        "hyperUnique": lambda c: F.count_distinct(c).cast("double"),
        "thetaSketch": lambda c: F.count_distinct(c).cast("double"),
    }
    return fns[t](val(field)).alias(name)


def _rand_agg(rng, i):
    t = rng.choice([
        "count", "longSum", "doubleSum", "longMin", "longMax",
        "doubleMin", "doubleMax", "hyperUnique", "thetaSketch",
    ])
    field = "u" if t in ("hyperUnique", "thetaSketch") else "v"
    spec = {"type": t, "name": f"a{i}"}
    if t != "count":
        spec["fieldName"] = field
    if rng.random() < 0.3:
        spec = {
            "type": "filtered",
            "filter": {"type": "selector", "dimension": "g",
                       "value": f"g{rng.randrange(4)}"},
            "aggregator": spec,
        }
    return spec


def _numeric_names(aggs):
    out = []
    for a in aggs:
        inner = a.get("aggregator", a)
        if inner["type"] not in ("hyperUnique", "thetaSketch"):
            out.append(inner["name"])
    return out


def _sketch_names(aggs):
    out = []
    for a in aggs:
        inner = a.get("aggregator", a)
        if inner["type"] in ("hyperUnique", "thetaSketch"):
            out.append((inner["name"], inner["type"]))
    return out


@pytest.mark.slow
def test_grammar_sweep_matches_plain_spark(spark, data):
    rng = random.Random(42)
    for case in range(N_CASES):
        dims = ["g"] if rng.random() < 0.7 else []
        aggs = [_rand_agg(rng, i) for i in range(rng.randrange(1, 4))]
        posts = []
        nums = _numeric_names(aggs)
        if len(nums) >= 2 and rng.random() < 0.6:
            posts.append({
                "type": "arithmetic", "name": "p_arith",
                "fn": rng.choice(["+", "-", "*"]),
                "fields": [
                    {"type": "fieldAccess", "fieldName": nums[0]},
                    {"type": "fieldAccess", "fieldName": nums[1]},
                ],
            })
        for name, t in _sketch_names(aggs):
            if rng.random() < 0.6:
                posts.append(
                    {"type": "thetaSketchEstimate", "name": f"p_{name}",
                     "field": {"type": "fieldAccess", "fieldName": name}}
                    if t == "thetaSketch"
                    else {"type": "hyperUniqueCardinality",
                          "name": f"p_{name}", "fieldName": name}
                )

        got_df = group_aggregate(
            data, dims, aggs, posts or None, time_column=None)

        plain_aggs = [_plain_agg(a) for a in aggs]
        exp_df = (data.groupBy(*dims).agg(*plain_aggs) if dims
                  else data.agg(*plain_aggs))

        out_names = [a.get("aggregator", a)["name"] for a in aggs]
        got = {
            tuple(r[d] for d in dims): r
            for r in got_df.collect()
        }
        exp = {
            tuple(r[d] for d in dims): r
            for r in exp_df.collect()
        }
        assert set(got) == set(exp), f"case {case}: group keys differ"
        for key, er in exp.items():
            gr = got[key]
            for n in out_names:
                g, e = gr[n], er[n]
                if isinstance(e, float):
                    assert g == pytest.approx(e, rel=1e-9, abs=1e-9), (
                        case, key, n, g, e)
                else:
                    assert g == e, (case, key, n, g, e)
            for p in posts:
                pn = p["name"]
                if p["type"] == "arithmetic":
                    r0 = er[p["fields"][0]["fieldName"]]
                    r1 = er[p["fields"][1]["fieldName"]]
                    if r0 is None or r1 is None:
                        # a null aggregate (e.g. filtered min over a group
                        # with no matching rows) propagates — SQL semantics
                        assert gr[pn] is None, (case, key, pn, gr[pn])
                        continue
                    a0, a1 = float(r0), float(r1)
                    e = {"+": a0 + a1, "-": a0 - a1, "*": a0 * a1}[p["fn"]]
                else:
                    # estimate post-aggs equal the finalized aggregator
                    src = pn[2:]
                    e = float(er[src])
                assert gr[pn] == pytest.approx(e, rel=1e-9, abs=1e-9), (
                    case, key, pn, gr[pn], e)
