"""Testdata contract — every assumption the query surface makes about
the driver-generated parquet, asserted in ONE place.

Round 3 lesson: the driver regenerated /root/testdata between rounds and
changed events.ts from TIMESTAMP(NANOS) to timestamp[us]; the stale
encoding assumption broke 21 queries, 31 tests, and the whole bench —
and the failure surfaced as DATATYPE_MISMATCH deep inside query plans.
This module pins each assumption explicitly so the NEXT regeneration
fails here first, with a message naming the drifted contract. Ingest
code should stay schema-driven regardless (see catalog.normalize_event_ts);
this file is the early-warning net, not the fix.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.fixture(params=SF_DIRS)
def sf(request):
    return request.param


def _schema(sf, name):
    return pq.read_schema(f"{sf}/{name}.parquet")


def test_events_ts_encoding_is_supported(sf):
    """catalog.normalize_event_ts handles timestamps and integral nanos;
    anything else (e.g. a string encoding) needs a new branch."""
    t = str(_schema(sf, "events").field("ts").type)
    assert t.startswith("timestamp") or t == "int64", (
        f"events.ts drifted to {t}; extend core.catalog.normalize_event_ts"
    )


def test_documents_columns(sf):
    s = _schema(sf, "documents")
    got = {f.name: str(f.type) for f in s}
    for col, typ in {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
    }.items():
        assert got.get(col) == typ, f"documents.{col} is {got.get(col)}, not {typ}"


def test_documents_lang_set(sf):
    """heatmap_chart_data and several curation oracles enumerate the
    language set as literal columns on both engines."""
    import duckdb

    langs = {
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT lang FROM '{sf}/documents.parquet'"
        ).fetchall()
    }
    assert langs == {"de", "en", "es", "fr", "zh"}, f"lang set drifted: {langs}"


def test_embeddings_contract(sf):
    """Image queries derive pixels from the first 12 dims; IVF queries
    use integer labels as quantizer cells and query ids 0..2."""
    import duckdb

    s = _schema(sf, "embeddings")
    got = {f.name: str(f.type) for f in s}
    assert got.get("vec_id") == "int64", got
    assert got.get("label") in ("int32", "int64"), got
    assert got.get("embedding", "").startswith("list<"), got
    dim, nq = duckdb.sql(
        f"SELECT min(len(embedding)), count(*) FILTER (WHERE vec_id IN (0,1,2)) "
        f"FROM '{sf}/embeddings.parquet'"
    ).fetchone()
    assert dim >= 12, f"embedding dim {dim} < 12 (image pixel derivation)"
    assert nq == 3, "query ids 0,1,2 missing from embeddings"


def test_events_columns(sf):
    s = _schema(sf, "events")
    names = {f.name for f in s}
    assert {"event_id", "ts", "user_id", "event_type", "value", "props"} <= names


def test_events_types_and_props_are_json(sf):
    """json_map_extract / variant_props_stats parse props as a JSON
    object; event pivots enumerate the five event types."""
    import duckdb

    types = {
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT event_type FROM '{sf}/events.parquet'"
        ).fetchall()
    }
    assert types <= {"click", "view", "purchase", "signup", "error"}, types
    bad = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/events.parquet' "
        f"WHERE props IS NOT NULL AND json_valid(props) = false"
    ).fetchone()[0]
    assert bad == 0, f"{bad} events rows with non-JSON props"


def test_tpch_tables_present(sf):
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        assert _schema(sf, t) is not None
