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


def levenshtein_bytes_py(a: str, b: str) -> int:
    """Levenshtein over UTF-8 BYTES — DuckDB's semantics (multi-byte
    characters count per byte: levenshtein('héllo','hello') = 2). Only
    the non-ASCII slow path calls this (shims gate on an ASCII rlike);
    ASCII inputs use Spark's JVM builtin, where byte == char."""
    xa, xb = a.encode("utf-8"), b.encode("utf-8")
    if xa == xb:
        return 0
    m, n = len(xa), len(xb)
    if m == 0 or n == 0:
        return m or n
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        ca = xa[i - 1]
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != xb[j - 1]),
            )
        prev = cur
    return prev[n]


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
        "levenshtein_bytes",
        pandas_udf(_series_op(levenshtein_bytes_py, None), "bigint"),
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


# ---------------------------------------------------------------------------
# Grapheme-cluster functions (DuckDB: utf8proc UAX #29; here: a UAX-29
# subset covering combining marks, ZWJ emoji sequences, variation
# selectors, skin-tone modifiers, and regional-indicator pairs — the
# cases real corpora hit. Hangul-jamo composition and a handful of
# exotic Grapheme_Cluster_Break classes are not segmented (documented
# divergence; precomposed Hangul — the form in actual text — is fine).
# ---------------------------------------------------------------------------

def graphemes_py(s: str) -> list[str]:
    import unicodedata

    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        j = i + 1
        # CRLF is one cluster
        if s[i] == "\r" and j < n and s[j] == "\n":
            j += 1
        while j < n:
            c = s[j]
            if (
                unicodedata.category(c) in ("Mn", "Mc", "Me")
                or "\ufe00" <= c <= "\ufe0f"  # variation selectors
                or "\U0001F3FB" <= c <= "\U0001F3FF"
            ):
                j += 1
                continue
            if c == "\u200d":  # ZWJ joins the next base char too
                j += 1
                if j < n:
                    j += 1
                continue
            break
        # regional-indicator flags pair up
        if (
            "\U0001F1E6" <= s[i] <= "\U0001F1FF"
            and j == i + 1
            and j < n
            and "\U0001F1E6" <= s[j] <= "\U0001F1FF"
        ):
            j += 1
        out.append(s[i:j])
        i = j
    return out


def substring_grapheme_py(s: str, start: int, count: int) -> str:
    """DuckDB substring index math over clusters: negative start counts
    from the END (duckdb substring('abc', -1, 3) = 'c'), 0/negative
    window positions clamp to the first cluster."""
    g = graphemes_py(s)
    n = len(g)
    pos = n + start + 1 if start < 0 else start
    lo = max(pos, 1)
    hi = pos + max(count, 0)  # exclusive, 1-based
    return "".join(g[lo - 1 : max(hi - 1, 0)])


def _left_right_grapheme(s: str, cnt: int, right: bool) -> str:
    g = graphemes_py(s)
    if cnt < 0:  # like left('abc', -1) = 'ab': drop |cnt| from the other end
        keep = max(len(g) + cnt, 0)
    else:
        keep = min(cnt, len(g))
    return "".join(g[-keep:] if right else g[:keep]) if keep else ""


# ---------------------------------------------------------------------------
# JSON functions DuckDB ships beyond Spark's builtin surface.
# Divergence (documented): malformed JSON yields NULL here where DuckDB
# raises Invalid Input Error — consistent with the engine's
# corrupt-payload posture (one bad row must not kill a 100 TB job).
# ---------------------------------------------------------------------------

_JNUM_ORDER = {"NULL": 0, "UBIGINT": 1, "BIGINT": 2, "DOUBLE": 3}


def _jtype_name(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "BOOLEAN"
    if isinstance(v, int):
        return "UBIGINT" if v >= 0 else "BIGINT"
    if isinstance(v, float):
        return "DOUBLE"
    if isinstance(v, str):
        return "VARCHAR"
    return "ARRAY" if isinstance(v, list) else "OBJECT"


def _jstructure(v):
    if isinstance(v, list):
        if not v:
            return ["NULL"]
        m = _jstructure(v[0])
        for e in v[1:]:
            m = _jstruct_merge(m, _jstructure(e))
        return [m]
    if isinstance(v, dict):
        if not v:
            return "JSON"  # probe: json_structure('{}') = '"JSON"'
        return {k: _jstructure(x) for k, x in v.items()}
    return _jtype_name(v)


def _jstruct_merge(a, b):
    if a == b:
        return a
    if a == "NULL":
        return b
    if b == "NULL":
        return a
    if (
        isinstance(a, str)
        and isinstance(b, str)
        and a in _JNUM_ORDER
        and b in _JNUM_ORDER
    ):
        return a if _JNUM_ORDER[a] >= _JNUM_ORDER[b] else b
    if isinstance(a, list) and isinstance(b, list):
        return [_jstruct_merge(a[0], b[0])]
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = _jstruct_merge(out[k], v) if k in out else v
        return out
    return "JSON"


def _jwalk(doc, path):
    """Resolve '/a/0' JSON-pointer or '$.a[0]' / bare-key paths."""
    import re as _re

    cur = doc
    try:
        if path.startswith("/"):
            parts = [p for p in path[1:].split("/") if p != ""]
        else:
            p = path[1:] if path.startswith("$") else path
            parts = [a or b for a, b in _re.findall(r"\.([^.\[\]]+)|\[(\d+)\]", p)]
            if not parts and p:
                parts = [p]
        for part in parts:
            if isinstance(cur, dict):
                cur = cur[part]
            elif isinstance(cur, list):
                cur = cur[int(part)]
            else:
                return (False, None)
        return (True, cur)
    except (KeyError, IndexError, ValueError):
        return (False, None)


def _jmatch(t, n) -> bool:
    if isinstance(n, dict) and isinstance(t, dict):
        return all(k in t and _jmatch(t[k], n[k]) for k in n)
    if isinstance(n, list) and isinstance(t, list):
        return all(any(_jmatch(e, x) for e in t) for x in n)
    if isinstance(t, bool) != isinstance(n, bool):
        return False
    if isinstance(t, (int, float)) and isinstance(n, (int, float)):
        return float(t) == float(n)
    return type(t) is type(n) and t == n


def _jsearch(t, n) -> bool:
    if _jmatch(t, n):
        return True
    if isinstance(t, list):
        return any(_jsearch(e, n) for e in t)
    if isinstance(t, dict):
        return any(_jsearch(v, n) for v in t.values())
    return False


def json_merge_patch_py(a, b):
    """RFC 7386 merge patch (DuckDB semantics: NULL input -> the other)."""
    import json

    if a is None:
        return b
    if b is None:
        return a
    try:
        da, db = json.loads(a), json.loads(b)
    except ValueError:
        return None

    def merge(x, y):
        if not isinstance(y, dict):
            return y
        out = dict(x) if isinstance(x, dict) else {}
        for k, v in y.items():
            if v is None:
                out.pop(k, None)
            else:
                out[k] = merge(out.get(k), v)
        return out

    return json.dumps(merge(da, db), separators=(",", ":"))


def register_textops_udfs(spark: SparkSession) -> None:
    """Grapheme-cluster + JSON-analysis + bitstring functions."""
    import json

    def _g_len(a: pd.Series) -> pd.Series:
        return pd.Series(
            [None if x is None else len(graphemes_py(x)) for x in a],
            dtype="object",
        )

    spark.udf.register("length_grapheme", pandas_udf(_g_len, "bigint"))

    def _g_side(right):
        def run(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    None if x is None or c is None
                    else _left_right_grapheme(x, int(c), right)
                    for x, c in zip(a, b)
                ],
                dtype="object",
            )

        return run

    spark.udf.register("left_grapheme", pandas_udf(_g_side(False), "string"))
    spark.udf.register("right_grapheme", pandas_udf(_g_side(True), "string"))

    def _g_sub(a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if x is None or i is None or k is None
                else substring_grapheme_py(x, int(i), int(k))
                for x, i, k in zip(a, b, c)
            ],
            dtype="object",
        )

    spark.udf.register("substring_grapheme", pandas_udf(_g_sub, "string"))

    def _loads(x):
        try:
            return True, json.loads(x)
        except ValueError:
            return False, None

    def _j_type(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, p in zip(a, b):
            if x is None:
                out.append(None)
                continue
            ok, doc = _loads(x)
            if ok and p is not None:
                ok, doc = _jwalk(doc, p)
            out.append(_jtype_name(doc) if ok else None)
        return pd.Series(out, dtype="object")

    spark.udf.register("json_type", pandas_udf(_j_type, "string"))

    def _j_structure(a: pd.Series) -> pd.Series:
        out = []
        for x in a:
            ok, doc = _loads(x) if x is not None else (False, None)
            out.append(
                json.dumps(_jstructure(doc), separators=(",", ":"))
                if ok
                else None
            )
        return pd.Series(out, dtype="object")

    spark.udf.register("json_structure", pandas_udf(_j_structure, "string"))

    spark.udf.register(
        "json_merge_patch",
        pandas_udf(_series_op(json_merge_patch_py, None), "string"),
    )

    def _j_contains(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for h, nd in zip(a, b):
            if h is None or nd is None:
                out.append(None)
                continue
            ok1, dh = _loads(h)
            ok2, dn = _loads(nd)
            out.append(_jsearch(dh, dn) if ok1 and ok2 else None)
        return pd.Series(out, dtype="object")

    spark.udf.register("json_contains", pandas_udf(_j_contains, "boolean"))

    def _unbin(a: pd.Series) -> pd.Series:
        import re as _re

        out = []
        for x in a:
            if x is None:
                out.append(None)
            elif x == "":
                out.append(b"")
            elif _re.fullmatch("[01]+", x):
                out.append(int(x, 2).to_bytes((len(x) + 7) // 8, "big"))
            else:
                out.append(None)
        return pd.Series(out, dtype="object")

    bin_udf = pandas_udf(_unbin, "binary")
    spark.udf.register("unbin", bin_udf)
    spark.udf.register("from_binary", bin_udf)
