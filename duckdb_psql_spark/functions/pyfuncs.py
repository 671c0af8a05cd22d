"""String-similarity functions Spark lacks, registered as pandas UDFs.

DuckDB ships ``damerau_levenshtein`` (TRUE Damerau-Levenshtein — the
Lowrance-Wagner unrestricted variant: damerau_levenshtein('CA','ABC')=2,
not OSA's 3) and ``jaro_similarity`` / ``jaro_winkler_similarity``
(standard Winkler: prefix scale 0.1, max prefix 4, 0.7 boost threshold).
Spark has only ``levenshtein``; these register the missing three under
their DuckDB names.

Execution note: these are inherently scalar per-row string DPs — DuckDB
runs them as per-row C++ too. The pandas UDF keeps transfer Arrow-batched;
the per-row Python loop is the honest cost of a function with no
vectorizable closed form. Semantics are differentially tested against
DuckDB on randomized inputs (tests/test_operators.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


def damerau_levenshtein_py(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    inf = la + lb
    # charset-indexed last-occurrence row for the transposition lookback
    da: dict[str, int] = {}
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = inf
    for i in range(la + 1):
        d[i + 1][1] = i
        d[i + 1][0] = inf
    for j in range(lb + 1):
        d[1][j + 1] = j
        d[0][j + 1] = inf
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            m = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitution
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[k][m] + (i - k - 1) + 1 + (j - m - 1),  # transposition
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def jaro_py(a: str, b: str) -> float:
    """Jaro similarity (match window, transposition halves)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0  # DuckDB: jaro('','') = 0.0, not the textbook 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_match = [False] * la
    b_match = [False] * lb
    matches = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_match[j] and a[i] == b[j]:
                a_match[i] = True
                b_match[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler_py(a: str, b: str, scale: float = 0.1, boost: float = 0.7) -> float:
    sim = jaro_py(a, b)
    if sim > boost:
        prefix = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            prefix += 1
        sim += prefix * scale * (1.0 - sim)
    return sim


def _series_op(fn, fill):
    def run(a: pd.Series, b: pd.Series) -> pd.Series:
        out = [
            fill if (x is None or y is None) else fn(x, y)
            for x, y in zip(a, b)
        ]
        return pd.Series(out, dtype="object")

    return run


def register_similarity_udfs(spark: SparkSession) -> None:
    """Register the DuckDB-named similarity functions on the session.

    Idempotent (re-registering replaces); called from PsqlSession so the
    names resolve inside any compiled statement.
    """
    spark.udf.register(
        "damerau_levenshtein",
        pandas_udf(_series_op(damerau_levenshtein_py, None), "bigint"),
    )
    spark.udf.register(
        "jaro_similarity",
        pandas_udf(_series_op(jaro_py, None), "double"),
    )
    spark.udf.register(
        "jaro_winkler_similarity",
        pandas_udf(_series_op(jaro_winkler_py, None), "double"),
    )


def _unary_str_op(fn):
    def run(a: pd.Series) -> pd.Series:
        return pd.Series(
            [None if x is None else fn(x) for x in a], dtype="object"
        )

    return run


def register_unicode_udfs(spark: SparkSession) -> None:
    """DuckDB's unicode-normalization function family.

    ``nfc_normalize`` (duckdb.org/docs/sql/functions/char) has no Spark
    builtin; Python's unicodedata implements the same Unicode NFC
    algorithm (both sides track the Unicode standard), Arrow-batched so
    the exchange cost is one column copy per batch, not per row.
    """
    import unicodedata

    spark.udf.register(
        "nfc_normalize",
        pandas_udf(
            _unary_str_op(lambda s: unicodedata.normalize("NFC", s)), "string"
        ),
    )
    # strip_accents: NFD-decompose, drop combining marks (DuckDB's
    # implementation is the same ICU transform)
    spark.udf.register(
        "strip_accents",
        pandas_udf(
            _unary_str_op(
                lambda s: "".join(
                    c for c in unicodedata.normalize("NFD", s)
                    if not unicodedata.combining(c)
                )
            ),
            "string",
        ),
    )


def register_math_udfs(spark: SparkSession) -> None:
    """DuckDB math functions with no Spark builtin: gamma/lgamma/nextafter.

    C-library semantics on both sides (Python's math wraps libm, DuckDB
    calls std::tgamma/lgamma/nextafter), Arrow-batched.
    """
    import math

    def _unary_f(fn):
        def run(a: pd.Series) -> pd.Series:
            return pd.Series(
                [None if x is None else fn(float(x)) for x in a],
                dtype="object",
            )

        return run

    spark.udf.register("gamma", pandas_udf(_unary_f(math.gamma), "double"))
    spark.udf.register("lgamma", pandas_udf(_unary_f(math.lgamma), "double"))
    spark.udf.register(
        "nextafter",
        pandas_udf(_series_op(lambda a, b: math.nextafter(a, b), None), "double"),
    )
