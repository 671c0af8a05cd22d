"""Declared (informational) key constraints.

Session statements::

    DECLARE PRIMARY KEY ON <source> (c1[, c2…]) [VERIFY]
    DECLARE UNIQUE [KEY] ON <source> (c1[, c2…]) [VERIFY]
    DECLARE FOREIGN KEY ON <source> (c1…) REFERENCES <source2> (d1…) [VERIFY]

``<source>`` is a quoted file path (``'/data/orders.parquet'``) or a
table/view name. Declarations are TRUSTED metadata in the spirit of
Spark 4.0's informational table constraints and warehouse RELY
constraints: the compiler may use them to drop provably-no-op work
(payload-free FK→PK inner joins — compiler._eliminate_fk_joins). A
false declaration can silently change results — the standard
informational-constraint contract; ``VERIFY`` runs the uniqueness /
referential-completeness checks eagerly (one aggregate scan for a key,
one anti-join for a foreign key) and raises on violation.

Semantics:

* primary/unique — the column tuple is UNIQUE and NON-NULL in the
  source (both are required for join elimination: an inner join on a
  nullable unique key still drops null-key rows).
* foreign key — every source row has a non-null match in the
  referenced source (referential completeness INCLUDING non-null FK
  columns; with the referenced key unique this makes an inner join on
  the pair exactly row-preserving on the FK side).

The reference engine delegates key declarations to DuckDB's own
``PRIMARY KEY``/``FOREIGN KEY`` table constraints
(/root/reference/README.md — plain DuckDB DDL passes through); file
scans cannot carry DDL in either engine, so this session-level
declaration surface is the Spark-side analogue.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from .errors import PsqlCompileError

__all__ = ["KeyConstraints", "parse_declare"]


def source_key(kind: str, text: str) -> tuple[str, str]:
    """Canonical identity for a constraint-bearing source: absolute
    path for file scans, lower-cased name for tables/views."""
    if kind == "path":
        return ("path", os.path.abspath(os.path.expanduser(text.strip())))
    return ("table", text.strip().strip('"`').lower())


def _cols(text: str) -> tuple[str, ...]:
    cols = tuple(
        c.strip().strip('"`').lower() for c in text.split(",") if c.strip()
    )
    if not cols or any(not re.fullmatch(r"\w+", c) for c in cols):
        raise PsqlCompileError(
            f"DECLARE: malformed column list ({text.strip()!r})"
        )
    if len(set(cols)) != len(cols):
        raise PsqlCompileError(f"DECLARE: duplicate column in ({text})")
    return cols


@dataclass
class KeyConstraints:
    """Session registry of declared keys. ``uniques`` maps a source to
    its declared unique column SETS (order-insensitive); ``fks`` maps
    (source, fk column set) to the referenced source plus the pairwise
    fk→pk column mapping."""

    uniques: dict[tuple[str, str], set[frozenset[str]]] = field(
        default_factory=dict
    )
    fks: dict[
        tuple[tuple[str, str], frozenset[str]],
        tuple[tuple[str, str], dict[str, str]],
    ] = field(default_factory=dict)

    def declare_unique(self, src: tuple[str, str], cols: tuple[str, ...]) -> None:
        self.uniques.setdefault(src, set()).add(frozenset(cols))

    def declare_fk(
        self,
        src: tuple[str, str],
        cols: tuple[str, ...],
        ref: tuple[str, str],
        ref_cols: tuple[str, ...],
    ) -> None:
        if len(cols) != len(ref_cols):
            raise PsqlCompileError(
                "DECLARE FOREIGN KEY: column count mismatch "
                f"({len(cols)} vs {len(ref_cols)})"
            )
        self.fks[(src, frozenset(cols))] = (ref, dict(zip(cols, ref_cols)))

    def is_unique(self, src: tuple[str, str], cols: set[str]) -> bool:
        return frozenset(cols) in self.uniques.get(src, set())

    def fk_target(
        self, src: tuple[str, str], cols: set[str]
    ) -> tuple[tuple[str, str], dict[str, str]] | None:
        return self.fks.get((src, frozenset(cols)))


_SRC = r"(?:'(?:[^']|'')*'|[\w.\"`]+)"

_KEY_RE = re.compile(
    rf"(?is)^\s*declare\s+(?P<kind>primary\s+key|unique(?:\s+key)?)\s+on\s+"
    rf"(?P<src>{_SRC})\s*\((?P<cols>[^)]*)\)\s*(?P<verify>verify)?\s*;?\s*$"
)
_FK_RE = re.compile(
    rf"(?is)^\s*declare\s+foreign\s+key\s+on\s+(?P<src>{_SRC})\s*"
    rf"\((?P<cols>[^)]*)\)\s+references\s+(?P<ref>{_SRC})\s*"
    rf"\((?P<refcols>[^)]*)\)\s*(?P<verify>verify)?\s*;?\s*$"
)


def _src_parts(text: str) -> tuple[str, str]:
    t = text.strip()
    if t.startswith("'"):
        return ("path", t[1:-1].replace("''", "'"))
    return ("table", t)


def parse_declare(stmt: str):
    """Parse a DECLARE … KEY statement; None when ``stmt`` is not one.
    Returns ("unique"|"fk", src(kind,text), cols, ref, ref_cols, verify)
    with ref/ref_cols None for unique keys."""
    m = _KEY_RE.match(stmt)
    if m is not None:
        return (
            "unique",
            _src_parts(m.group("src")),
            _cols(m.group("cols")),
            None,
            None,
            m.group("verify") is not None,
        )
    m = _FK_RE.match(stmt)
    if m is not None:
        return (
            "fk",
            _src_parts(m.group("src")),
            _cols(m.group("cols")),
            _src_parts(m.group("ref")),
            _cols(m.group("refcols")),
            m.group("verify") is not None,
        )
    if re.match(r"(?is)^\s*declare\s+(primary|unique|foreign)\b", stmt):
        raise PsqlCompileError(
            "DECLARE: expected PRIMARY KEY/UNIQUE ON <source> (cols) or "
            "FOREIGN KEY ON <source> (cols) REFERENCES <source> (cols)"
        )
    return None
