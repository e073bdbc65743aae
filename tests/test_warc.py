"""WARC reader: synthesize → parse round-trip, resync, file reads."""

import os

import pytest

from verde_spark.sources.warc import (
    parse_warc,
    read_warc,
    split_warc_records,
    warc_bytes,
    warc_table_from_documents,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_parse_roundtrip_pure():
    recs = [
        ("https://a.com/1", "2020-01-01T00:00:01Z", b"<html>one</html>"),
        ("https://b.com/2", "2020-01-01T00:00:02Z", "café".encode()),
        ("https://c.com/3", "2020-01-01T00:00:03Z", b""),
    ]
    parsed = list(parse_warc(warc_bytes(recs)))
    assert [(p["url"], p["warc_ts"], p["html"]) for p in parsed] == recs
    assert all(p["http_status"] == 200 for p in parsed)


def test_parse_skips_non_response_and_resyncs():
    good = warc_bytes([("https://a.com/x", "2021-02-03T04:05:06Z", b"BODY")])
    warcinfo = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
    )
    broken = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: oops\r\n\r\n"
    parsed = list(parse_warc(warcinfo + broken + good))
    assert len(parsed) == 1
    assert parsed[0]["url"] == "https://a.com/x"
    assert parsed[0]["html"] == b"BODY"


def test_parse_non_http_block_kept_raw():
    blob = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://raw.com/\r\n"
        b"WARC-Date: 2020-05-05T05:05:05Z\r\nContent-Length: 3\r\n\r\nraw\r\n\r\n"
    )
    (rec,) = parse_warc(blob)
    assert rec["html"] == b"raw" and rec["http_status"] is None


def test_documents_roundtrip_distributed(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    blobs = warc_table_from_documents(docs, files=4)
    records = split_warc_records(blobs)
    got = {
        r["url"]: (r["html"], r["http_status"], r["warc_ts"])
        for r in records.collect()
    }
    want = {
        f"https://example.com/doc/{r['doc_id']}": r["text"]
        for r in docs.collect()
    }
    assert len(got) == len(want)
    for url, text in want.items():
        html, status, ts = got[url]
        assert bytes(html).decode("utf-8") == text
        assert status == 200
        assert ts is not None


def test_read_warc_from_files(spark, tmp_path):
    recs = [
        (f"https://site{i}.com/p", f"2022-01-01T00:00:{i:02d}Z", f"body{i}".encode())
        for i in range(6)
    ]
    (tmp_path / "a.warc").write_bytes(warc_bytes(recs[:3]))
    (tmp_path / "b.warc").write_bytes(warc_bytes(recs[3:]))
    df = read_warc(spark, str(tmp_path))
    rows = sorted(df.collect(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [r[0] for r in recs]
    assert [bytes(r["html"]) for r in rows] == [r[2] for r in recs]
    assert all(r["warc_file"].endswith(".warc") for r in rows)


def test_streaming_warc_ingest(spark, tmp_path):
    """The WARC front door works as a Structured Streaming source: a
    directory of .warc files streamed via binaryFile → the SAME
    split_warc_records mapInPandas → records arrive incrementally (new
    files in the directory become new micro-batches)."""
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    recs = [
        (f"https://s{i}.com/", f"2023-03-0{i + 1}T00:00:00Z", f"doc{i}".encode())
        for i in range(4)
    ]
    (warc_dir / "a.warc").write_bytes(warc_bytes(recs[:2]))

    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, "
            "content binary"
        )
        .load(str(warc_dir))
    )
    out = split_warc_records(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("warc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got1 = {r["url"] for r in spark.sql("select * from warc_stream").collect()}
    assert got1 == {r[0] for r in recs[:2]}

    # a new segment lands → the next run picks up only the new records
    (warc_dir / "b.warc").write_bytes(warc_bytes(recs[2:]))
    q2 = (
        out.writeStream.format("memory")
        .queryName("warc_stream2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = {r["url"] for r in spark.sql("select * from warc_stream2").collect()}
    assert {r[0] for r in recs} <= got2


def test_split_is_shuffle_free(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(
        warc_bytes([("https://x.com/", "2020-01-01T00:00:00Z", b"x")])
    )
    plan = read_warc(spark, str(tmp_path))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_parse_negative_content_length_terminates():
    """A corrupt/adversarial negative Content-Length must resync forward
    (review r5: pos moved BACKWARDS past the record's own marker and the
    parser re-parsed the same record forever)."""
    good = warc_bytes([("https://a.com/x", "2021-02-03T04:05:06Z", b"BODY")])
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://evil.com/\r\n"
        b"WARC-Date: 2020-01-01T00:00:00Z\r\nContent-Length: -300\r\n\r\n"
    )
    parsed = list(parse_warc(bad + good))
    assert len(parsed) == 1 and parsed[0]["url"] == "https://a.com/x"


def test_warc_table_rejects_string_ids(spark):
    """Non-integral doc ids fail at validation time with a clear message,
    not with an int() ValueError inside the applyInPandas task."""
    docs = spark.createDataFrame(
        [("doc-001", "text")], "doc_id string, text string"
    )
    with pytest.raises(ValueError, match="integral"):
        warc_table_from_documents(docs, files=1)
