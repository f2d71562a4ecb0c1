"""P5 multiline stitching — golden from
/root/reference/internal/parser/parser_test.go:150-207 (java stack
trace, pattern ^[[:space:]], continuations joined by single spaces)."""

from hetman_spark.operators.multiline import stitch_multiline

JAVA_STACK_TRACE = """2023-07-21 08:22:43.784+0000 [id=146]   INFO    h.r.SynchronousCommandTransport$ReaderThread#run: I/O error in channel jenkins-agent-for-golang-0000axictwwg0
java.net.SocketException: Socket closed
        at java.base/sun.nio.ch.NioSocketImpl.endRead(NioSocketImpl.java:248)
        at java.base/sun.nio.ch.NioSocketImpl.implRead(NioSocketImpl.java:327)
\tat java.base/sun.nio.ch.NioSocketImpl.read(NioSocketImpl.java:350)
\tat java.base/sun.nio.ch.NioSocketImpl$1.read(NioSocketImpl.java:803)
\tat java.base/java.net.Socket$SocketInputStream.read(Socket.java:966)
2023-07-21 08:22:43.795+0000 [id=149]   INFO    i.j.docker.DockerTransientNode$1#println: Removed Node for node 'jenkins-agent-for-golang-0000axictwwg0'."""

# Go's POSIX class [[:space:]]; Java/Python equivalent
PATTERN = r"^\s"


def test_java_stack_trace_stitch(spark):
    lines = JAVA_STACK_TRACE.split("\n")
    rows = [("f1", i, line) for i, line in enumerate(lines)]
    df = spark.createDataFrame(rows, "file_id string, line_no long, line string")
    out = stitch_multiline(df, PATTERN).orderBy("line_no").collect()

    # reference emits: anchor line0 alone; anchor line1 + its
    # continuations joined by " "; trailing anchor alone
    # (parser_test.go:187-189)
    assert [r["line"] for r in out] == [
        lines[0],
        " ".join(lines[1:-1]),
        lines[-1],
    ]


def test_stitch_multiple_files_independent(spark):
    rows = [
        ("a", 0, "anchor1"),
        ("a", 1, " cont1"),
        ("b", 0, "anchorB"),
        ("a", 2, "anchor2"),
        ("b", 1, " contB"),
    ]
    df = spark.createDataFrame(rows, "file_id string, line_no long, line string")
    out = {(r["file_id"], r["anchor_id"]): r["line"] for r in stitch_multiline(df, PATTERN).collect()}
    # join adds one space; the continuation keeps its own leading space
    # (reference joins raw lines: parser_test.go:188)
    assert out == {
        ("a", 1): "anchor1  cont1",
        ("a", 2): "anchor2",
        ("b", 1): "anchorB  contB",
    }
