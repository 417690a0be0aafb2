"""Tabular metric sinks: SQLite DB, LaTeX key-value store, and tables.

Reference: src/hyteg/dataexport/SQL.hpp:37 (FixedSizeSQLDB with constant +
variable columns per row), KeyValueStore.hpp:57, Table.hpp:71 (LaTeX
export, golden-file tested by tests/hyteg/dataexport+import/TableTest.cpp).
"""

from __future__ import annotations

import sqlite3
from typing import Any


class FixedSizeSQLDB:
    """Rows = constant entries (set once) + variable entries (per row),
    written to an SQLite table (reference: FixedSizeSQLDB)."""

    def __init__(self, path: str, table: str = "runs"):
        self.path = path
        self.table = table
        self._const: dict[str, Any] = {}
        self._var: dict[str, Any] = {}
        self._columns: list[str] | None = None

    def set_constant_entry(self, key: str, value) -> None:
        self._const[key] = value

    def set_variable_entry(self, key: str, value) -> None:
        self._var[key] = value

    def _sql_type(self, v) -> str:
        if isinstance(v, bool):
            return "INTEGER"
        if isinstance(v, int):
            return "INTEGER"
        if isinstance(v, float):
            return "REAL"
        return "TEXT"

    def write_row_on_root(self) -> None:
        """Commit one row (reference: writeRowOnRoot)."""
        row = {**self._const, **self._var}
        cols = sorted(row)
        if self._columns is None:
            self._columns = cols
            with sqlite3.connect(self.path) as db:
                spec = ", ".join(f'"{c}" {self._sql_type(row[c])}'
                                 for c in cols)
                db.execute(f'CREATE TABLE IF NOT EXISTS {self.table} ({spec})')
        if cols != self._columns:
            raise ValueError(
                f"row schema changed: {cols} != {self._columns}")
        with sqlite3.connect(self.path) as db:
            ph = ", ".join("?" for _ in cols)
            names = ", ".join(f'"{c}"' for c in cols)
            db.execute(
                f"INSERT INTO {self.table} ({names}) VALUES ({ph})",
                [row[c] if isinstance(row[c], (int, float, bool)) else str(row[c])
                 for c in cols],
            )


class KeyValueStore:
    """Ordered key-value pairs with LaTeX export
    (reference: KeyValueStore.hpp:57 — \\pgfkeys output)."""

    def __init__(self):
        self._store: dict[str, Any] = {}

    def store(self, key: str, value) -> None:
        self._store[key] = value

    def __getitem__(self, key):
        return self._store[key]

    def write_latex(self, path: str, prefix: str = "") -> None:
        with open(path, "w") as f:
            f.write("\\pgfkeys{\n")
            for k, v in self._store.items():
                f.write(f"  {prefix}{k}/.initial = {{{v}}},\n")
            f.write("}\n")

    def __str__(self) -> str:
        w = max((len(k) for k in self._store), default=0)
        return "\n".join(f"{k:<{w}}  {v}" for k, v in self._store.items())


class Table:
    """Fixed-column table with aligned text and LaTeX (booktabs) export
    (reference: Table.hpp:71)."""

    def __init__(self, columns: list[str]):
        self.columns = list(columns)
        self.rows: list[list[Any]] = []

    def add_row(self, *values) -> None:
        if len(values) != len(self.columns):
            raise ValueError(f"expected {len(self.columns)} values")
        self.rows.append(list(values))

    def add_element(self, row: int, col: str, value) -> None:
        while len(self.rows) <= row:
            self.rows.append([""] * len(self.columns))
        self.rows[row][self.columns.index(col)] = value

    def __str__(self) -> str:
        cells = [self.columns] + [[str(v) for v in r] for r in self.rows]
        widths = [max(len(r[c]) for r in cells)
                  for c in range(len(self.columns))]
        lines = []
        for r in cells:
            lines.append("  ".join(f"{v:<{w}}" for v, w in zip(r, widths)))
        return "\n".join(lines)

    def write_text(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(str(self) + "\n")

    def write_latex(self, path: str) -> None:
        with open(path, "w") as f:
            f.write("\\begin{tabular}{" + "c" * len(self.columns) + "}\n")
            f.write("\\toprule\n")
            f.write(" & ".join(self.columns) + " \\\\\n\\midrule\n")
            for r in self.rows:
                f.write(" & ".join(str(v) for v in r) + " \\\\\n")
            f.write("\\bottomrule\n\\end{tabular}\n")
