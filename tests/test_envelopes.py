"""Maxwell / Canal envelope adapters — normalization into the canonical
change-event frame (SURVEY §2.1 S1/S5, alongside the Debezium adapter)."""

from __future__ import annotations

import json

from nifi_dicom_spark.model import CHANGE_EVENTS_SCHEMA
from nifi_dicom_spark.sources.envelopes import parse_canal, parse_maxwell


def _maxwell(op, image, position, xid=7, part=None):
    row = {
        "value": json.dumps(
            {
                "database": "db",
                "table": "transcripts",
                "type": op,
                "ts": 1704067200,
                "xid": xid,
                "commit": True,
                "position": position,
                "data": image,
                "old": {"text": "prev"} if op == "update" else None,
            }
        )
    }
    if part is not None:
        row["part"] = part
    return row


IMG = {
    "conv_id": "c1",
    "turn_idx": 3,
    "role": "user",
    "text": 'hi "there"\nnewline',
    "tool": None,
    "ts": "2024-01-01 00:00:00",
}


def test_maxwell_parse_semantics(spark):
    rows = [
        _maxwell("insert", IMG, "master.000006:800911", part=0),
        _maxwell(
            "update",
            dict(IMG, text="edited", tool="bash"),
            "master.000006:800950",
            part=1,
        ),
        _maxwell("delete", IMG, "master.000007:104", part=0),
        _maxwell("bootstrap-insert", IMG, "master.000007:300", part=0),
        _maxwell("table-create", IMG, "master.000007:400", part=1),  # DDL
    ]
    df = spark.createDataFrame(
        [(r["value"], r["part"]) for r in rows], "value string, part int"
    )
    out = parse_maxwell(df, partition_col="part").orderBy("offset").collect()

    assert [f.name for f in parse_maxwell(df).schema.fields] == [
        f.name for f in CHANGE_EVENTS_SCHEMA.fields
    ]
    assert [r.op for r in out] == ["insert", "update", "delete", "insert", None]
    assert [r.partition_id for r in out] == [0, 1, 0, 0, 1]
    # position "file:pos" composes into a total order across file rolls
    assert out[0].offset == 6 * 2**32 + 800911
    assert out[2].offset == 7 * 2**32 + 104
    assert out[0].offset < out[1].offset < out[2].offset
    # the image is ALWAYS `data` (Maxwell puts the deleted row there)
    assert out[2].conv_id == "c1" and out[2].turn_idx == 3
    assert out[1].tool == "bash"
    assert out[0].text == 'hi "there"\nnewline'
    assert str(out[0].ts) == "2024-01-01 00:00:00"


def _canal(op, images, batch_id, ddl=False):
    return json.dumps(
        {
            "data": images,
            "database": "db",
            "es": 1589373515000,
            "id": batch_id,
            "isDdl": ddl,
            "old": None,
            "pkNames": ["conv_id", "turn_idx"],
            "sql": "ALTER TABLE t ADD COLUMN x INT" if ddl else "",
            "table": "transcripts",
            "ts": 1589373515477,
            "type": op,
        }
    )


def test_canal_parse_semantics(spark):
    # Canal flat messages stringify EVERY value
    simg = {
        "conv_id": "c9",
        "turn_idx": "5",
        "role": "assistant",
        "text": "answer",
        "tool": None,
        "ts": "2024-06-01 12:30:00",
    }
    rows = [
        (_canal("INSERT", [simg, dict(simg, turn_idx="6")], 3),),
        (_canal("DELETE", [dict(simg, turn_idx="5")], 4),),
        (_canal("ALTER", None, 5, ddl=True),),  # DDL: no rows
        (_canal("UPDATE", [], 6),),  # empty data array: no rows
    ]
    df = spark.createDataFrame(rows, "value string")
    out = parse_canal(df).orderBy("offset").collect()

    assert [f.name for f in parse_canal(df).schema.fields] == [
        f.name for f in CHANGE_EVENTS_SCHEMA.fields
    ]
    assert len(out) == 3  # 2 inserts + 1 delete; DDL and empty drop out
    assert [r.op for r in out] == ["insert", "insert", "delete"]
    # id * 2^16 + element position: within-batch order is total
    assert [r.offset for r in out] == [3 * 65536, 3 * 65536 + 1, 4 * 65536]
    # string-typed images cast to the canonical types
    assert [r.turn_idx for r in out] == [5, 6, 5]
    assert out[0].turn_idx == 5 and isinstance(out[0].turn_idx, int)
    assert str(out[0].ts) == "2024-06-01 12:30:00"


def test_envelopes_are_streaming_safe(spark, tmp_path):
    import os

    d = tmp_path / "wire"
    os.makedirs(d)
    (d / "a.json").write_text(
        _maxwell("insert", IMG, "master.000001:4")["value"] + "\n"
    )
    stream = spark.readStream.schema("value string").text(str(d))
    assert parse_maxwell(stream).isStreaming
    assert parse_canal(stream).isStreaming  # pure expressions both


def test_canal_feeds_lww_merge(spark):
    """End-to-end: a Canal batch with an in-batch update resolves by the
    derived offset order (later element wins)."""
    from nifi_dicom_spark.operators.dedup import lww_dedup

    simg = {
        "conv_id": "c1",
        "turn_idx": "1",
        "role": "user",
        "text": "v1",
        "tool": None,
        "ts": "2024-01-01 00:00:00",
    }
    df = spark.createDataFrame(
        [
            (_canal("INSERT", [simg], 1),),
            (_canal("UPDATE", [dict(simg, text="v2"), dict(simg, text="v3")], 2),),
        ],
        "value string",
    )
    ev = parse_canal(df)
    winner = lww_dedup(ev, ["conv_id", "turn_idx"]).collect()
    assert len(winner) == 1 and winner[0].text == "v3"
