"""Avro OCF codec + Iceberg manifest export tests (VERDICT r11 #3).

No Avro library exists in this environment, so spec conformance is
carried by HAND-COMPUTED golden bytes (Avro spec examples: zigzag
vectors, the '\x06foo' string example, block framing) plus loud
malformation coverage — the same posture as the JPEG/GIF golden
tests. The exporter tests certify the Iceberg shape: mandated
field-ids, ADDED/EXISTING statuses from the commit bookkeeping, and
the independent reader reconstructing exactly the JSON log's live
set.
"""

from __future__ import annotations

import io
import json
import os
import struct

import pytest
from pyspark.sql import functions as F

from lakehouse_homeserver_spark.sources.avromanifest import (
    MANIFEST_LIST_SCHEMA,
    MANIFEST_SCHEMA,
    _decode,
    _encode,
    _read_long,
    _write_long,
    bound_from_bytes,
    bound_to_bytes,
    export_avro_manifests,
    live_files_from_avro,
    read_manifest,
    read_manifest_list,
    read_ocf,
    write_ocf,
)
from lakehouse_homeserver_spark.sources.snapshot import SnapshotTable


def _enc_long(n):
    b = io.BytesIO()
    _write_long(b, n)
    return b.getvalue()


def test_zigzag_varint_golden_vectors():
    """The Avro spec's own table: 0->00, -1->01, 1->02, -2->03, 2->04,
    -64->7f, 64->80 01."""
    assert _enc_long(0) == b"\x00"
    assert _enc_long(-1) == b"\x01"
    assert _enc_long(1) == b"\x02"
    assert _enc_long(-2) == b"\x03"
    assert _enc_long(2) == b"\x04"
    assert _enc_long(-64) == b"\x7f"
    assert _enc_long(64) == b"\x80\x01"
    for n in (0, 1, -1, 63, -64, 8191, -2**31, 2**31 - 1, 2**62, -2**62):
        assert _read_long(io.BytesIO(_enc_long(n))) == n


def test_binary_encoding_golden_record():
    """Spec example: string 'foo' encodes as 06 66 6f 6f; a record is
    the concatenation of its field encodings."""
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    out = io.BytesIO()
    _encode(out, schema, {"a": 1, "b": "foo"})
    assert out.getvalue() == b"\x02\x06foo"
    # nullable union: index 0 = null -> just 00; index 1 -> 02 + value
    out = io.BytesIO()
    _encode(out, ["null", "long"], None)
    assert out.getvalue() == b"\x00"
    out = io.BytesIO()
    _encode(out, ["null", "long"], 3)
    assert out.getvalue() == b"\x02\x06"
    # array [3, 27] -> count 2, items, terminator 0 (spec example)
    out = io.BytesIO()
    _encode(out, {"type": "array", "items": "long"}, [3, 27])
    assert out.getvalue() == b"\x04\x06\x36\x00"


def test_ocf_roundtrip_codecs_and_determinism():
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "i", "type": "int"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "b", "type": "bytes"},
            {"name": "f", "type": "boolean"},
            {"name": "xs", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "double"}},
        ],
    }
    rows = [
        {"i": -7, "s": "héllo", "b": b"\x00\xff", "f": True,
         "xs": [1, -2, 3], "m": {"a": 1.5, "b": -0.25}},
        {"i": 0, "s": None, "b": b"", "f": False, "xs": [], "m": {}},
    ]
    for codec in ("null", "deflate"):
        blob = write_ocf(schema, rows, codec=codec)
        got_schema, meta, got = read_ocf(blob)
        assert got == rows
        assert got_schema == schema
        assert meta["avro.codec"] == codec.encode()
        # byte-stable: same input -> identical file (content-derived sync)
        assert write_ocf(schema, rows, codec=codec) == blob
    # empty file: header only, zero blocks
    assert read_ocf(write_ocf(schema, []))[2] == []


def test_ocf_malformations_are_loud():
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    blob = write_ocf(schema, [{"x": 1}, {"x": 2}], codec="null")
    with pytest.raises(ValueError, match="magic"):
        read_ocf(b"Obj\x02" + blob[4:])
    with pytest.raises(ValueError, match="sync marker"):
        read_ocf(blob[:-1] + bytes([blob[-1] ^ 0x01]))
    with pytest.raises(ValueError, match="truncated"):
        read_ocf(blob[:-8])
    with pytest.raises(ValueError, match="codec"):
        read_ocf(write_ocf(schema, [{"x": 1}]).replace(b"deflate", b"snappyx"))
    # record count larger than the block's payload -> truncation raise
    idx = len(blob) - 16 - 1 - 1 - 2  # sync + 2 payload bytes + size + count
    assert blob[idx] == 0x04  # count=2
    t = bytearray(blob)
    t[idx] = 0x08  # claim 4 records
    with pytest.raises(ValueError, match="truncated|block"):
        read_ocf(bytes(t))


def test_ocf_multiblock_and_sized_array_blocks():
    """Reader handles multi-block files and the spec's negative-count
    (size-prefixed) array block form the writer never emits."""
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    one = write_ocf(schema, [{"x": 5}], codec="null")
    # block for {"x": 5} under codec null: count=1 -> 0x02, size=1 ->
    # 0x02, payload 0x0a, then the sync marker
    block = one[-(1 + 1 + 1 + 16):]
    assert block[:3] == b"\x02\x02\x0a"
    two = one + block
    _s, _m, records = read_ocf(two)
    assert records == [{"x": 5}, {"x": 5}]

    arr_schema = {"type": "array", "items": "long"}
    # size-prefixed block: count -2 (zigzag 0x03), byte-size 2, items 3,27,
    # terminator
    buf = io.BytesIO(b"\x03\x04\x06\x36\x00")
    assert _decode(buf, arr_schema) == [3, 27]


def test_iceberg_bound_serialization_golden():
    """Iceberg spec Appendix D: little-endian numerics, UTF-8 strings."""
    assert bound_to_bytes("long", 1) == b"\x01" + b"\x00" * 7
    assert bound_to_bytes("integer", -1) == b"\xff\xff\xff\xff"
    assert bound_to_bytes("double", 1.5) == struct.pack("<d", 1.5)
    assert bound_to_bytes("string", "naïve") == "naïve".encode("utf-8")
    for typ, v in (("long", -99), ("integer", 7), ("double", -0.5),
                   ("string", "x y")):
        assert bound_from_bytes(typ, bound_to_bytes(typ, v)) == v
    with pytest.raises(ValueError, match="8 bytes"):
        bound_from_bytes("long", b"\x01\x02")
    with pytest.raises(ValueError, match="no bound serialization"):
        bound_to_bytes("date", 3)


def test_manifest_schemas_carry_spec_field_ids():
    """The Iceberg spec mandates field-ids in the Avro schema JSON;
    spot-check the published id assignments."""
    ml = {f["name"]: f["field-id"] for f in MANIFEST_LIST_SCHEMA["fields"]}
    assert ml["manifest_path"] == 500
    assert ml["manifest_length"] == 501
    assert ml["sequence_number"] == 515
    assert ml["added_rows_count"] == 512
    assert ml["key_metadata"] == 519
    me = {f["name"]: f["field-id"] for f in MANIFEST_SCHEMA["fields"]}
    assert me == {"status": 0, "snapshot_id": 1, "sequence_number": 3,
                  "file_sequence_number": 4, "data_file": 2}
    df = {f["name"]: f["field-id"]
          for f in MANIFEST_SCHEMA["fields"][4]["type"]["fields"]}
    assert df["file_path"] == 100
    assert df["record_count"] == 103
    assert df["lower_bounds"] == 125
    assert df["upper_bounds"] == 128


@pytest.fixture()
def nations(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/nation.parquet")


def test_export_statuses_bounds_and_independent_read(
    spark, tmp_path, nations
):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(nations)
    t.append(nations.filter(F.col("n_nationkey") < 5))
    v = t.latest_version()
    out = export_avro_manifests(t, v)
    assert os.path.exists(out["manifest_list"])

    # manifest-list bookkeeping
    (mf,) = read_manifest_list(out["manifest_list"])
    assert mf["content"] == 0 and mf["partition_spec_id"] == 0
    assert mf["added_files_count"] + mf["existing_files_count"] == out[
        "n_files"
    ]
    assert mf["added_rows_count"] == 5
    assert mf["existing_rows_count"] == 25

    # entry statuses match the commit's own added-set
    e = t.entry(v)
    statuses = {
        x["data_file"]["file_path"]: x["status"]
        for x in read_manifest(out["manifest"])
    }
    assert {f for f, s in statuses.items() if s == 1} == set(e["added"])
    assert set(statuses) == set(e["manifest"])

    # independent reconstruction == JSON live set, counts, and bounds
    files = live_files_from_avro(t.path, v)
    assert {f["file"] for f in files} == set(e["manifest"])
    assert sum(f["record_count"] for f in files) == 30
    by_file = {f["file"]: f for f in files}
    for fname, stats in e["stats"].items():
        lo = {kv["key"]: kv["value"]
              for kv in by_file[fname]["lower_bounds"]}
        # n_nationkey is schema field 1 -> field-id 1, integer
        assert bound_from_bytes("integer", lo[1]) == stats["n_nationkey"][0]


def test_export_refuses_pending_mor_deletes(spark, tmp_path, nations):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(nations)
    t.delete_where(
        F.col("n_nationkey") == 3, mode="mor", equality_on=["n_nationkey"]
    )
    with pytest.raises(NotImplementedError, match="merge-on-read"):
        export_avro_manifests(t)
