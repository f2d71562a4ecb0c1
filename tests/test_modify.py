"""Modifier + tag-merge goldens.

- modifier: /root/reference/internal/modifier/modifier_test.go:38-80
- tag merge precedence: /root/reference/internal/forwarder/loki.go:33
  (lo.Assign right-most wins) and forwarder_test.go stream shape
- signature: /root/reference/internal/workflow/workflow_test.go:9-17
"""

from pyspark.sql import functions as F

from hetman_spark.config import ModifierConfig, ReplaceFieldSetting, SinkConfig
from hetman_spark.operators.modify import apply_modifier, merge_tags


def test_modifier_golden(spark):
    # input parsed {c:3,d:4,message:sensitive,password:sensitive};
    # add parsed.foo=bar, drop parsed.message, replace password .* -> ****
    cfg = ModifierConfig(
        add_fields={"parsed.foo": "bar"},
        drop_fields=("parsed.message",),
        replace_fields=(ReplaceFieldSetting("parsed.password", ".*", "****"),),
    )
    df = spark.createDataFrame(
        [({"c": "3", "d": "4", "message": "sensitive", "password": "sensitive"},)],
        "parsed map<string,string>",
    )
    out = df.select(apply_modifier(F.col("parsed"), cfg).alias("p")).collect()[0]["p"]
    assert out["foo"] == "bar"
    assert "message" not in out
    assert out["password"] == "****"
    assert out["c"] == "3" and out["d"] == "4"


def test_replace_skips_empty_and_missing(spark):
    # reference skips when gjson fetch is empty (modifier.go:88-93)
    cfg = ModifierConfig(replace_fields=(ReplaceFieldSetting("parsed.x", "a", "b"),))
    df = spark.createDataFrame([({"x": "", "y": "aa"},), ({"y": "aa"},)], "parsed map<string,string>")
    out = [r["p"] for r in df.select(apply_modifier(F.col("parsed"), cfg).alias("p")).collect()]
    assert out[0] == {"x": "", "y": "aa"}
    assert out[1] == {"y": "aa"}


def test_replace_replaces_all_matches(spark):
    # Go ReplaceAllString == Spark regexp_replace (all occurrences)
    cfg = ModifierConfig(replace_fields=(ReplaceFieldSetting("parsed.v", r"\d", "#"),))
    df = spark.createDataFrame([({"v": "a1b2c3"},)], "parsed map<string,string>")
    out = df.select(apply_modifier(F.col("parsed"), cfg).alias("p")).collect()[0]["p"]
    assert out["v"] == "a#b#c#"


def test_merge_tags_precedence(spark):
    # labels > parsed > add_tags (right-most wins in lo.Assign)
    df = spark.createDataFrame(
        [(
            {"k": "add", "only_add": "a", "shared_pl": "add"},
            {"k": "parsed", "only_parsed": "p", "shared_pl": "parsed"},
            {"k": "label", "only_label": "l"},
        )],
        "a map<string,string>, p map<string,string>, l map<string,string>",
    )
    out = df.select(merge_tags(F.col("a"), F.col("p"), F.col("l")).alias("t")).collect()[0]["t"]
    assert out == {
        "k": "label",
        "only_add": "a",
        "only_parsed": "p",
        "only_label": "l",
        "shared_pl": "parsed",
    }


def test_merge_tags_null_maps(spark):
    df = spark.createDataFrame([({"a": "1"},)], "a map<string,string>")
    out = df.select(
        merge_tags(
            F.col("a"),
            F.lit(None).cast("map<string,string>"),
            F.lit(None).cast("map<string,string>"),
        ).alias("t")
    ).collect()[0]["t"]
    assert out == {"a": "1"}


def test_forwarder_signature_golden():
    # workflow_test.go:9-17
    s = SinkConfig(url="http://localhost:8088", add_tags={"a": "b", "foo": "bar"})
    assert s.signature("foobar") == "4e42b6523eb13e5756dc76adec0a96c1"
