"""Tabular sinks (reference: tests/hyteg/dataexport+import/TableTest.cpp)."""

import sqlite3

import pytest

from hyteg_tpu.io.tables import FixedSizeSQLDB, KeyValueStore, Table


def test_sql_db(tmp_path):
    db = FixedSizeSQLDB(str(tmp_path / "runs.db"))
    db.set_constant_entry("solver", "gmg")
    db.set_constant_entry("level", 5)
    for it, res in enumerate([1.0, 0.1, 0.01]):
        db.set_variable_entry("iteration", it)
        db.set_variable_entry("residual", res)
        db.write_row_on_root()
    with sqlite3.connect(str(tmp_path / "runs.db")) as con:
        rows = con.execute(
            "SELECT iteration, residual, solver, level FROM runs "
            "ORDER BY iteration").fetchall()
    assert rows == [(0, 1.0, "gmg", 5), (1, 0.1, "gmg", 5),
                    (2, 0.01, "gmg", 5)]


def test_sql_db_schema_guard(tmp_path):
    db = FixedSizeSQLDB(str(tmp_path / "x.db"))
    db.set_variable_entry("a", 1)
    db.write_row_on_root()
    db.set_variable_entry("b", 2)
    with pytest.raises(ValueError):
        db.write_row_on_root()


def test_keyvalue_store(tmp_path):
    kv = KeyValueStore()
    kv.store("dofs", 12345)
    kv.store("time", 1.5)
    assert kv["dofs"] == 12345
    p = tmp_path / "kv.tex"
    kv.write_latex(str(p), prefix="run/")
    text = p.read_text()
    assert "run/dofs/.initial = {12345}" in text
    assert str(kv).splitlines()[0].startswith("dofs")


def test_table(tmp_path):
    t = Table(["level", "error", "rate"])
    t.add_row(3, 1e-2, "-")
    t.add_row(4, 2.5e-3, 4.0)
    t.add_element(1, "rate", 4.0)
    s = str(t)
    assert "level" in s and "2.5e-03" in s or "0.0025" in s
    t.write_latex(str(tmp_path / "t.tex"))
    tex = (tmp_path / "t.tex").read_text()
    assert "\\toprule" in tex and "level & error & rate" in tex
    t.write_text(str(tmp_path / "t.txt"))
    assert (tmp_path / "t.txt").read_text().startswith("level")
