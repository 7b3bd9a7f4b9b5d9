"""Spider-trap URL guards (functions/urls.url_trap_metrics): per-reason
hand cases, rule precedence, absent components, JVM-only shuffle-free
plan."""

from ganda_spark.functions.urls import url_trap_metrics


def _urls(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "seq long, url string"
    )


def test_each_trap_reason(spark):
    out = url_trap_metrics(
        _urls(
            spark,
            [
                "http://h.test/" + "/".join(f"d{i}" for i in range(17)),
                "http://h.test/cal/2024/cal/2024/cal/2024",
                "http://h.test/p?" + "&".join(f"k{i}=v" for i in range(9)),
                "http://h.test/p/" + "x" * 2100,
                "http://h.test/a/b?k=v",
            ],
        )
    )
    r = {row.seq: row for row in out.collect()}
    assert r[0].trap_reason == "depth" and r[0].depth == 17 and r[0].is_trap
    assert r[1].trap_reason == "repeat" and r[1].max_seg_repeat == 3
    assert r[2].trap_reason == "params" and r[2].n_params == 9
    assert r[3].trap_reason == "length" and r[3].url_len > 2048
    assert r[4].trap_reason == "ok" and not r[4].is_trap
    assert (r[4].depth, r[4].n_params, r[4].max_seg_repeat) == (2, 1, 1)


def test_rule_precedence_depth_first(spark):
    """A URL tripping several rules reports the FIRST in the fixed order
    depth > params > repeat > length — deterministic reason labels."""
    deep_and_repeated = "http://h.test/" + "/".join(["loop"] * 20)
    row = url_trap_metrics(_urls(spark, [deep_and_repeated])).collect()[0]
    assert row.depth == 20 and row.max_seg_repeat == 20
    assert row.trap_reason == "depth"


def test_absent_components(spark):
    out = url_trap_metrics(
        _urls(spark, ["http://h.test", "http://h.test/", "http://h.test?a=1"])
    )
    r = {row.seq: row for row in out.collect()}
    assert r[0].depth == 0 and r[0].n_params == 0 and r[0].max_seg_repeat == 0
    assert r[1].depth == 0
    assert r[2].depth == 0 and r[2].n_params == 1
    assert all(not row.is_trap for row in r.values())


def test_thresholds_are_parameters(spark):
    u = ["http://h.test/a/b/c"]
    strict = url_trap_metrics(_urls(spark, u), max_depth=2).collect()[0]
    loose = url_trap_metrics(_urls(spark, u), max_depth=3).collect()[0]
    assert strict.trap_reason == "depth" and loose.trap_reason == "ok"


def test_jvm_only_shuffle_free_plan(spark):
    out = url_trap_metrics(_urls(spark, ["http://h.test/a"]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


# -- canonicalize_params (tracking-param strip + canonical order) -----------

from pyspark.sql import functions as F

from ganda_spark.functions.urls import canonicalize_params


def _canon(spark, urls):
    df = _urls(spark, urls).select(
        "seq", canonicalize_params(F.col("url")).alias("c")
    )
    return [r.c for r in df.orderBy("seq").collect()]


def test_param_canonicalization(spark):
    assert _canon(
        spark,
        [
            "http://h.test/p?utm_source=x&b=2&a=1&fbclid=zzz",
            "http://h.test/p?z=9&a=1",
            "http://h.test/p?utm_medium=email",
            "http://h.test/p?",
            "http://h.test/p",
        ],
    ) == [
        "http://h.test/p?a=1&b=2",   # stripped + sorted
        "http://h.test/p?a=1&z=9",   # order canonicalized
        "http://h.test/p",           # fully stripped -> no '?'
        "http://h.test/p",           # bare '?' dropped
        "http://h.test/p",           # untouched
    ]


def test_param_canon_collapses_aliases(spark):
    """The point of the operator: tracking aliases of one page map to ONE
    seen-set identity."""
    aliases = [
        "http://h.test/a?x=1&utm_source=tw",
        "http://h.test/a?utm_campaign=c&x=1",
        "http://h.test/a?x=1&fbclid=abc&utm_medium=m",
    ]
    assert len(set(_canon(spark, aliases))) == 1


def test_param_canon_preserves_real_params(spark):
    """Non-tracking params survive byte-for-byte, including values with
    'utm_' NOT in key position and repeated keys."""
    assert _canon(
        spark, ["http://h.test/s?q=utm_test&page=2&q=second"]
    ) == ["http://h.test/s?page=2&q=second&q=utm_test"]
