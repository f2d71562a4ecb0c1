"""Parser golden tests — cases verbatim from
/root/reference/internal/parser/parser_test.go:90-208."""

from pyspark.sql import functions as F

from hetman_spark.operators.parse import (
    grok_to_regex,
    make_grok_pandas_udf,
    parse_grok,
    parse_json_dynamic,
    parse_json_static,
    parse_syslog_rfc3164,
    parse_syslog_rfc5424,
)

NGINX_PATTERN = (
    '$remote_addr - $remote_user [$time_local] "$request" '
    '$status $bytes_sent "$referrer" "$user_agent"'
)
NGINX_LINE = (
    '127.0.0.1 - - [09/Jun/2023:22:42:19 +0000] "GET / HTTP/1.1" 200 612 "-" '
    '"Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) '
    'Chrome/99.0.4844.84 Safari/537.36"'
)
NGINX_EXPECTED = {
    "bytes_sent": "612",
    "referrer": "-",
    "remote_addr": "127.0.0.1",
    "remote_user": "-",
    "request": "GET / HTTP/1.1",
    "status": "200",
    "time_local": "09/Jun/2023:22:42:19 +0000",
    "user_agent": (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/99.0.4844.84 Safari/537.36"
    ),
}


def _one(df, col="p"):
    return df.select(col).collect()[0][col]


def test_grok_to_regex_fields():
    _, fields = grok_to_regex(NGINX_PATTERN)
    assert fields == [
        "remote_addr", "remote_user", "time_local", "request",
        "status", "bytes_sent", "referrer", "user_agent",
    ]


def test_nginx_parse_jvm(spark):
    # golden: parser_test.go:91-107
    df = spark.createDataFrame([(NGINX_LINE,)], "line string")
    row = _one(df.select(parse_grok(F.col("line"), NGINX_PATTERN).alias("p")))
    assert row.asDict() == NGINX_EXPECTED


def test_nginx_parse_pandas_udf(spark):
    udf, fields = make_grok_pandas_udf(NGINX_PATTERN)
    df = spark.createDataFrame([(NGINX_LINE,)], "line string")
    row = _one(df.select(udf(F.col("line")).alias("p")))
    assert row.asDict() == NGINX_EXPECTED


def test_nginx_parse_failure_is_null_not_dropped(spark):
    # P6: parse failures forward the record unparsed (parser.go:148-155,201)
    df = spark.createDataFrame([("not an access log",), (NGINX_LINE,)], "line string")
    out = df.select(parse_grok(F.col("line"), NGINX_PATTERN).alias("p")).collect()
    assert len(out) == 2
    assert out[0]["p"] is None
    assert out[1]["p"] is not None


def test_json_parse_static(spark):
    # golden: parser_test.go:108-124
    line = (
        '{"timestamp": "2023-06-10T01:14:26.000Z", "level": "info", '
        '"source": "stdout", "message": "This is an info message from stdout"}'
    )
    df = spark.createDataFrame([(line,)], "line string")
    row = _one(
        df.select(
            parse_json_static(F.col("line"), ["timestamp", "level", "source", "message"]).alias("p")
        )
    )
    assert row.asDict() == {
        "timestamp": "2023-06-10T01:14:26.000Z",
        "level": "info",
        "source": "stdout",
        "message": "This is an info message from stdout",
    }


def test_json_parse_dynamic_strings_only(spark):
    # strings-only rule: getKeyValuePairs, parser.go:239-255
    df = spark.createDataFrame(
        [('{"a":"1","n":2,"obj":{"x":"y"},"b":"2","arr":[1],"f":false}',),
         ("not json",)],
        "line string",
    )
    out = df.select(parse_json_dynamic(F.col("line")).alias("p")).collect()
    assert out[0]["p"] == {"a": "1", "b": "2"}
    assert out[1]["p"] is None  # row kept, parse null (P6)


def test_syslog_rfc5424(spark):
    # golden: parser_test.go:125-138
    line = (
        "<165>1 2003-10-11T22:14:15.003Z mymachine.example.com eventlog - ID47 "
        '[exampleSDID@32473 iut="3" eventSource="Application" eventID="1011"] '
        "SBOM application event log entry..."
    )
    df = spark.createDataFrame([(line,)], "line string")
    row = _one(df.select(parse_syslog_rfc5424(F.col("line")).alias("p")))
    assert row.asDict() == {
        "app_name": "eventlog",
        "hostname": "mymachine.example.com",
        "message": "SBOM application event log entry...",
        "msg_id": "ID47",
        "proc_id": "-",
        "structured_data": '[exampleSDID@32473 iut="3" eventSource="Application" eventID="1011"]',
    }


def test_syslog_rfc3164(spark):
    # golden: parser_test.go:139-149
    line = "<34>Oct 11 22:14:15 mymachine su: 'su root' failed for lonvick on /dev/pts/8"
    df = spark.createDataFrame([(line,)], "line string")
    row = _one(df.select(parse_syslog_rfc3164(F.col("line")).alias("p")))
    assert row.asDict() == {
        "content": "'su root' failed for lonvick on /dev/pts/8",
        "hostname": "mymachine",
        "tag": "su",
    }
