"""Error types for the PSQL-on-Spark engine.

The reference surfaces two error classes: DuckDB parser errors on the
rewritten text (``/root/reference/test/sql/psql.test:25-29``) and
pass-through errors for non-piped statements
(``/root/reference/test/sql/psql.test:8-12``). We mirror that split:
``PsqlParseError`` for anything our scanner/stage-parser rejects (with a
``syntax error at or near "tok"`` message shape matching the reference's
observable behavior), and Spark's own exceptions pass through untouched.
"""

from __future__ import annotations


class PsqlError(Exception):
    """Base class for engine errors."""


class PsqlParseError(PsqlError):
    """Raised when PSQL text cannot be parsed into stages/clauses.

    Message shape follows the reference's observable errors, e.g.
    ``syntax error at or near "j"`` (/root/reference/test/sql/psql.test:29).
    """

    def __init__(self, message: str, *, near: str | None = None, position: int | None = None):
        if near is not None and "at or near" not in message:
            prefix = f"{message}: " if message else ""
            message = f'{prefix}syntax error at or near "{near}"'
        super().__init__(message)
        self.near = near
        self.position = position


class PsqlCompileError(PsqlError):
    """Raised when a parsed stage cannot be compiled onto Spark."""
