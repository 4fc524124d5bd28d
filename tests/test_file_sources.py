"""JSONL/CSV landing sources: explicit-schema reads, rejected-row
side-channel, and the landing→parquet compaction round trip."""

from __future__ import annotations

import pytest

from numalogic_prometheus_spark.sources.files import (
    DOCUMENTS_SCHEMA,
    compact_to_parquet,
    read_csv,
    read_jsonl,
)


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10}',
                '{"doc_id": 2, "text": "gamma", "lang": "de", "source": "s1", "n_chars": 5}',
                "{this is not json",
                '{"unrelated_key": 42}',
                '{"doc_id": 3, "text": "delta", "lang": "fr", "source": "s0", "n_chars": 5}',
            ]
        )
    )
    return str(p)


def test_jsonl_valid_and_rejected(spark, jsonl_dir):
    valid, rejected = read_jsonl(spark, jsonl_dir, DOCUMENTS_SCHEMA)
    rows = {r["doc_id"]: r for r in valid.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["text"] == "alpha beta" and rows[2]["lang"] == "de"
    assert valid.columns == [f.name for f in DOCUMENTS_SCHEMA.fields]
    rej = [r["raw_record"] for r in rejected.collect()]
    # the unparsable line lands verbatim; the wrong-shape record is
    # quarantined too (all declared columns null)
    assert len(rej) == 2
    assert any("not json" in r for r in rej)


def test_csv_valid_and_rejected(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello world,en,s0,11\n"
        "2,guten tag,de,s1,9\n"
        "oops,not-a-long,xx,s2,NOT_A_NUMBER\n"
    )
    valid, rejected = read_csv(spark, str(p), DOCUMENTS_SCHEMA)
    assert {r["doc_id"] for r in valid.collect()} == {1, 2}
    assert rejected.count() == 1


def test_compaction_round_trip(spark, jsonl_dir, tmp_path):
    valid, _ = read_jsonl(spark, jsonl_dir, DOCUMENTS_SCHEMA)
    out = str(tmp_path / "compact")
    compact_to_parquet(valid, out, partition_cols=["source"])
    back = spark.read.parquet(out)
    assert back.count() == 3
    # hive partitioning materialized for pruning
    assert {r["source"] for r in back.select("source").distinct().collect()} == {
        "s0",
        "s1",
    }
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got[1] == "alpha beta"


def test_csv_header_dropped_per_file_not_by_value(spark, tmp_path):
    """ADVICE r2: a DATA row that happens to equal the header string must
    not vanish — only the first header-looking line of each file is the
    header. Here that row can't parse as data (doc_id='doc_id' is not a
    long) so it must surface in `rejected`, not be silently dropped."""
    hdr = "doc_id,text,lang,source,n_chars"
    (tmp_path / "a.csv").write_text(
        f"{hdr}\n1,hello,en,s0,5\n{hdr}\n2,welt,de,s1,4\n"
    )
    (tmp_path / "b.csv").write_text(f"{hdr}\n3,salut,fr,s0,5\n")
    valid, rejected = read_csv(spark, str(tmp_path), DOCUMENTS_SCHEMA)
    assert {r["doc_id"] for r in valid.collect()} == {1, 2, 3}
    rej = [r["raw_record"] for r in rejected.collect()]
    assert rej == [hdr]  # the mid-file imposter row, quarantined not lost
