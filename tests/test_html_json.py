"""HTML->text normalize stage (I5/T7) + JSON status hooks (T6)."""

import json

import pytest
from pyspark.sql import functions as F

from aspublic_spark.functions.html import html_text_udf, html_to_text
from aspublic_spark.functions.json_hooks import normalize_status_json


# -- pure-function goldens (collector.py:102 behavior) -----------------

def test_links_ignored_text_kept():
    out = html_to_text('<p>Hello <a href="https://example.test/x">world</a>!</p>')
    assert out == "Hello world!"
    assert "example.test" not in out  # ignore_links=True


def test_entities_decoded_and_strip():
    assert html_to_text("  <p>&amp; fish &lt;3&gt;</p>  ") == "& fish <3>"


def test_block_tags_separate_tokens():
    out = html_to_text("alpha<br>beta<p>gamma</p>delta")
    # block tags become separators — tokens never glue together
    assert out.split() == ["alpha", "beta", "gamma", "delta"]


def test_script_style_dropped():
    out = html_to_text("<style>p{}</style><p>ok</p><script>var x=1;</script>")
    assert out == "ok"


def test_malformed_html_never_raises():
    assert isinstance(html_to_text("<p><a href='x" + "<" * 50), str)
    assert html_to_text(None) == "" and html_to_text("") == ""


def test_no_wrapping_body_width_0():
    long = "word " * 200
    assert html_to_text(f"<p>{long.strip()}</p>") == long.strip()


# -- Spark-side: UDF + policy filter over HTML input -------------------

def test_html_udf_and_policy_filter(spark):
    from aspublic_spark.operators.filters import FilterPolicy, apply_policies

    rows = [
        ("c1", 0, '<p>clean <a href="http://spam.example">text</a></p>'),
        ("c1", 1, "<p>buy cheap <b>pills</b> now</p>"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    plain = df.withColumn("text", html_text_udf("text"))
    got = {r["turn_idx"]: r["text"] for r in plain.collect()}
    assert got[0] == "clean text" and got[1] == "buy cheap pills now"
    kept = apply_policies(
        plain, "conv_id", ["text"], None, [FilterPolicy(patterns=["cheap pills"])]
    )
    assert [r["turn_idx"] for r in kept.collect()] == [0]


# -- JSON hooks (T6): from_json + casts, minimalStatus projection ------

STATUS = {
    "url": "https://inst.example/@u/1",
    "content": '<p>Hello <a href="https://x.test">fediverse</a> &amp; friends</p>',
    "spoiler_text": "cw: greetings",
    "created_at": "2024-03-01T12:00:00Z",
    "language": "en",
    "in_reply_to_id": None,
    "account": {"bot": False},
    "media_attachments": [],
}


def test_normalize_status_json(spark):
    s2 = dict(STATUS, url="http://b.example/2", in_reply_to_id="9",
              media_attachments=[{"type": "image"}], account={"bot": True})
    bad = "{not json"
    df = spark.createDataFrame(
        [(json.dumps(STATUS),), (json.dumps(s2),), (bad,), ("{}",)], "value string"
    )
    out = {r["url"]: r for r in normalize_status_json(df).collect()}
    # unparseable + url-less rows dropped, like the collector's
    # try/except-per-status
    assert set(out) == {"inst.example/@u/1", "b.example/2"}
    a = out["inst.example/@u/1"]
    assert a["text"] == "Hello fediverse & friends"
    assert a["subject"] == "cw: greetings"
    assert a["language"] == "en" and a["bot"] is False
    assert a["reply"] is False and a["attachments"] is False
    assert a["created"] > 1_700_000_000
    b = out["b.example/2"]
    assert b["bot"] is True and b["reply"] is True and b["attachments"] is True
