"""route_explode_static must be row-identical to route_explode: the
static router is a pure plan-shape optimization (inlined predicates +
array_compact/explode instead of a BroadcastNestedLoopJoin), never a
semantics change."""

from pyspark.sql import functions as F

from hetman_spark.operators.route import route_explode, route_explode_static
from hetman_spark.plans.pipeline import build_parsed
from hetman_spark.sources.lookup import DEFAULT_SINKS, lang_lookup, routes_df
from hetman_spark.sources.webtext import generate_webtext


def test_static_router_matches_join_router(spark):
    df = build_parsed(generate_webtext(spark, 2000, n_splits=4)).drop("html").join(
        F.broadcast(lang_lookup(spark)), "lang", "left"
    )
    cols = ["lang", "status_class", "region"]
    key = ["sink_id", "url"]
    dyn = route_explode(df, routes_df(spark), predicate_cols=cols).select(
        *key, "add_tags", "format"
    )
    stat = route_explode_static(df, DEFAULT_SINKS, predicate_cols=cols).select(
        *key, "add_tags", "format"
    )
    assert dyn.count() == stat.count()
    # order-insensitive row equality including tags/format payloads
    d = dyn.withColumn("add_tags", F.to_json(F.col("add_tags")))
    s = stat.withColumn("add_tags", F.to_json(F.col("add_tags")))
    assert d.exceptAll(s).count() == 0
    assert s.exceptAll(d).count() == 0


def test_static_router_no_bnlj(spark):
    df = build_parsed(generate_webtext(spark, 200, n_splits=2)).drop("html").join(
        F.broadcast(lang_lookup(spark)), "lang", "left"
    )
    out = route_explode_static(df, DEFAULT_SINKS, ["lang", "status_class", "region"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
