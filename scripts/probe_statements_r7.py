"""Statement-level dialect probe: run whole statements through BOTH
engines (PsqlSession and DuckDB) and diff the full result sets.

Complements scripts/probe_functions.py (single-expression probes) for
constructs that only appear at statement level: set operations BY NAME,
aggregate tails (regr_*/covar_*), map functions over columns, INSERT BY
NAME, SELECT ALL, etc.

Usage: python scripts/probe_statements_r7.py [filter-substring]
"""

from __future__ import annotations

import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

# Each entry: (label, statement). Statements are self-contained (VALUES
# lists), run verbatim in both engines, compared row-set-wise (sorted).
PROBES: list[tuple[str, str]] = [
    ("union_by_name", "select 1 as a, 2 as b union by name select 3 as b, 4 as a order by a"),
    ("union_all_by_name", "select 1 as a, 2 as b union all by name select 2 as b, 1 as a order by a, b"),
    ("union_by_name_widen", "select 1 as a union all by name select 2 as b order by a nulls first, b nulls first"),
    ("select_all", "select all x from (values (1), (1), (2)) t(x) order by x"),
    ("regr_slope", "select regr_slope(y, x) as c from (values (1.0, 2.0), (2.0, 4.5), (3.0, 6.5)) t(x, y)"),
    ("regr_intercept", "select regr_intercept(y, x) as c from (values (1.0, 2.0), (2.0, 4.5), (3.0, 6.5)) t(x, y)"),
    ("regr_r2", "select regr_r2(y, x) as c from (values (1.0, 2.0), (2.0, 4.5), (3.0, 6.5)) t(x, y)"),
    ("regr_count", "select regr_count(y, x) as c from (values (1.0, 2.0), (2.0, NULL), (3.0, 6.5)) t(x, y)"),
    ("regr_avgx", "select regr_avgx(y, x) as c from (values (1.0, 2.0), (2.0, 4.5)) t(x, y)"),
    ("regr_avgy", "select regr_avgy(y, x) as c from (values (1.0, 2.0), (2.0, 4.5)) t(x, y)"),
    ("regr_sxx", "select regr_sxx(y, x) as c from (values (1.0, 2.0), (2.0, 4.5), (3.0, 6.5)) t(x, y)"),
    ("regr_syy", "select regr_syy(y, x) as c from (values (1.0, 2.0), (2.0, 4.5), (3.0, 6.5)) t(x, y)"),
    ("regr_sxy", "select regr_sxy(y, x) as c from (values (1.0, 2.0), (2.0, 4.5), (3.0, 6.5)) t(x, y)"),
    ("covar_pop", "select covar_pop(y, x) as c from (values (1.0, 2.0), (2.0, 4.5), (3.0, 6.5)) t(x, y)"),
    ("covar_samp", "select covar_samp(y, x) as c from (values (1.0, 2.0), (2.0, 4.5), (3.0, 6.5)) t(x, y)"),
    ("corr_agg", "select corr(y, x) as c from (values (1.0, 2.0), (2.0, 4.5), (3.0, 6.5)) t(x, y)"),
    ("map_concat_stmt", "select map_concat(map([1,2],['a','b']), map([2,3],['c','d'])) as m"),
    ("map_entries_stmt", "select map_entries(map([1,2],['a','b'])) as m"),
    ("map_keys_col", "select map_keys(m) as k from (select map([1,2],['x','y']) as m) t"),
    ("map_values_col", "select map_values(m) as v from (select map([1,2],['x','y']) as m) t"),
    ("cardinality_map", "select cardinality(map([1,2],['a','b'])) as c"),
    ("quantile_disc_list", "select quantile_disc(x, [0.25, 0.5, 0.75]) as q from (values (1),(2),(3),(4),(5),(6),(7),(8)) t(x)"),
    ("quantile_cont_list", "select quantile_cont(x, [0.25, 0.5]) as q from (values (1.0),(2.0),(3.0),(4.0)) t(x)"),
    ("mad_stmt", "select mad(x) as c from (values (1.0),(2.0),(3.0),(10.0)) t(x)"),
    ("arg_min_n", "select arg_min(s, x, 2) as c from (values ('a', 3), ('b', 1), ('c', 2)) t(s, x)"),
    ("arg_max_n", "select arg_max(s, x, 2) as c from (values ('a', 3), ('b', 1), ('c', 2)) t(s, x)"),
    ("count_if", "select count_if(x > 1) as c from (values (1),(2),(3)) t(x)"),
    ("grouping_id", "select a, b, grouping(a, b) as g, count(*) as n from (values (1,1),(1,2),(2,1)) t(a,b) group by grouping sets ((a), (b), (a, b), ()) order by g, a nulls first, b nulls first"),
    ("distinct_on_multi", "select distinct on (a) a, b from (values (1, 'x'), (1, 'y'), (2, 'z')) t(a, b) order by a, b"),
    ("insert_returning", None),  # session-stateful; probed separately below
    ("values_alias_cols", "select * from (values (1, 'a'), (2, 'b')) v(id, name) order by id"),
    ("windowed_count_if", "select x, count_if(x % 2 = 0) over (order by x) as c from (values (1),(2),(3),(4)) t(x) order by x"),
    ("string_split_regex", "select string_split_regex('a1b22c', '[0-9]+') as s"),
    ("str_split_regex", "select str_split_regex('a1b22c', '[0-9]+') as s"),
    ("regexp_split_to_array", "select regexp_split_to_array('a1b22c', '[0-9]+') as s"),
    ("regexp_split_to_table", "select * from regexp_split_to_table('a,b,c', ',') order by 1"),
    ("generate_subscripts2", "select generate_subscripts([10,20,30], 1) as i"),
    ("list_zip_trail", "select list_zip([1,2,3],[4,5], true) as z"),
    ("to_hex_big", "select to_hex(255) as h, hex(255) as h2"),
    ("from_hex", "select unhex('414243') as b"),
    ("bin_str", "select bin('1010') as b"),
    ("bit_position", "select bit_position('010'::BIT, '0110101'::BIT) as p"),
    ("get_bit_stmt", "select get_bit('0110'::BIT, 1) as b"),
    ("set_bit_stmt", "select set_bit('0110'::BIT, 1, 1) as b"),
    ("bitstring_stmt", "select bitstring('0101011', 12) as b"),
    ("typeof_stmt", "select typeof(1 + 0.5) as t"),
    ("current_schema", "select current_schema() as s"),
    ("current_schemas", "select current_schemas(true) as s"),
    ("txid_current", "select txid_current() >= 0 as c"),
    ("uuid_len", "select length(cast(uuid() as varchar)) as c"),
    ("gen_random_uuid_len", "select length(cast(gen_random_uuid() as varchar)) as c"),
    ("decode_encode", "select decode(encode('héllo')) as s"),
    ("ord_chr", "select ord('é') as o, chr(233) as c"),
    ("unicode_fn", "select unicode('é') as u"),
    ("to_base", "select to_base(42, 16) as b"),
    ("from_base64_stmt", "select from_base64('QUJD') as b"),
    ("isoyear", "select isoyear(date '2022-01-01') as y"),
    ("weekofyear_stmt", "select weekofyear(date '2022-01-01') as w"),
    ("dayofyear_iso", "select isodow(date '2022-01-02') as d"),
    ("julian_stmt", "select julian(date '2000-01-01') as j"),
    ("make_timestamptz", "select make_timestamp(2022, 3, 4, 5, 6, 7.5) as t"),
    ("epoch_ns", "select epoch_ns(timestamp '2001-01-01 00:00:00.123456') as e"),
    ("epoch_us", "select epoch_us(timestamp '2001-01-01 00:00:00.123456') as e"),
    ("timezone_fns", "select timezone('UTC', timestamp '2001-01-01 05:00:00') as t"),
    ("century_stmt", "select century(date '2001-01-01') as c"),
    ("millennium_stmt", "select millennium(date '2001-01-01') as m"),
    ("era_extract", "select extract(era from date '2001-01-01') as e"),
    ("last_day_stmt", "select last_day(date '2004-02-05') as d"),
    ("monthname_stmt", "select monthname(date '2004-02-05') as m, dayname(date '2004-02-05') as d"),
    ("time_type", "select time '11:30:00.123456' as t"),
    ("interval_mul", "select interval 2 day * 3 as i"),
    ("date_diff_named", "select datediff('month', date '2022-01-15', date '2022-03-01') as d"),
    ("datesub_named", "select datesub('month', date '2022-01-15', date '2022-03-01') as d"),
    ("datepart_list", "select date_part(['year', 'month'], date '2022-03-05') as p"),
    # --- batch 9 fixes (this session) ---
    ("grouping_multi", "select a, b, grouping(a, b) as g, count(*) as n from (values (1,1),(1,2),(2,1)) t(a,b) group by grouping sets ((a), (b), (a, b), ()) order by g, a nulls first, b nulls first"),
    ("distinct_on_values", "select distinct on (a) a, b from (values (1, 'x'), (1, 'y'), (2, 'z')) t(a, b) order by a, b desc"),
    ("map_concat_lastwin", "select map_concat(map([1],['a']), map([2],['b']), map([1],['c'])) as m"),
    ("bin_varchar", "select bin('1010') as b1, bin('abc') as b2"),
    ("bin_int", "select bin(0) as b0, bin(10) as b1, bin(255) as b2, bin(cast(-1 as tinyint)) as b3"),
    ("era_fn", "select era(date '2001-01-01') as e1, era(date '0001-01-01' - interval 400 year) as e0"),
    ("era_extract2", "select extract(era from date '2001-01-01') as e"),
    ("current_schema2", "select current_schema() as s"),
    ("current_schemas2", "select current_schemas(true) as s1, current_schemas(false) as s2"),
    ("timezone_naive", "select timezone('America/New_York', timestamp '2001-01-01 05:00:00') as t"),
    ("datesub_alias", "select datesub('month', date '2022-01-15', date '2022-03-16') as d, datesub('day', timestamp '2022-01-01 10:00:00', timestamp '2022-01-03 09:00:00') as d2"),
    ("bit_fns", "select get_bit('0110'::BIT, 1) as g, set_bit('0110'::BIT, 0, 1) as s, bit_position('11'::BIT, '0110101'::BIT) as p, bitstring('0101011', 12) as bs, bitstring('0000', 4) as bz"),
    ("uuid_gen_random", "select length(cast(gen_random_uuid() as varchar)) as c"),
    # --- batch 10: operator tail (probe-driven) ---
    ("intdiv_op", "select 7 // 2 as a, -7 // 2 as b, 7.5 // 2 as c"),
    ("pow_ops", "select 2 ** 10 as a, 2 ^ 10 as b"),
    ("factorial_op", "select 5! as f"),
    ("startswith_op", "select 'abc' ^@ 'ab' as a, 'abc' ^@ 'bc' as b"),
    ("like_ops", "select 'abc' ~~ 'a%' as a, 'abc' !~~ 'x%' as b"),
    ("first_ordered", "select first(x order by y desc) as f, last(x order by y desc) as l from (values (1, 2), (3, 4)) t(x, y)"),
    ("list_comprehension", "select [upper(x) for x in ['a','b','c'] if x != 'a'] as l"),
    ("min_columns_star", "select min(columns(*)) from (values (1, 5), (2, 3)) t(a, b)"),
    ("is_distinct_ops", "select 1 is distinct from 2 as a, null is not distinct from null as b"),
    ("group_order_all", "select x % 2 as p, count(*) as n from (values (1),(2),(3)) t(x) group by all order by all"),
    ("lambda_index", "select list_transform(['a','b'], (x, i) -> x || i) as l"),
    ("apply_lambda", "select apply([1,2], x -> x + 1) as l"),
    ("struct_insert_stmt", "select struct_insert({'a': 1}, b := 2) as s"),
    ("struct_dot_literal", "select ({'a': 1, 'b': 2}).a as v"),
    ("map_brace_literal", "select map {1: 'a', 2: 'b'} as m"),
    ("concat_mixed_types", "select 'a' || 1 as s, repeat('ab', 3) as r"),
    ("greatest_null_skip", "select greatest(1, null, 3) as g, least(1, null) as l"),
    ("xor_int", "select xor(5, 3) as x"),
    ("interval_cast_str", "select cast(extract(day from '5 days'::interval) as int) as d"),
    ("array_slice_string", "select array_slice('hello', 2, 4) as s"),
    ("list_any_value", "select list_any_value([null, 2, 3]) as v"),
    ("list_has_allany", "select list_has_all([1,2,3], [2,3]) as a, list_has_any([1,2], [3]) as b"),
    # --- batch 11: JSON tail ---
    ("json_group_array", "select json_group_array(x) as j from (values (7)) t(x)"),
    ("json_group_object", "select json_group_object(k, v) as j from (values ('a', 1)) t(k, v)"),
    ("json_array_ctor", "select json_array(1, 'x', null) as j"),
    ("json_object_ctor", "select json_object('a', 1, 'b', 'x') as j"),
    ("json_array_length2", "select json_array_length('[1,2,3]') as n, json_array_length('{\"a\":[1,2]}', '$.a') as m"),
    ("json_quote2", "select json_quote(42) as a, json_quote('x') as b"),
    ("json_merge2", "select json_merge_patch('{\"a\":1,\"b\":2}', '{\"b\":3,\"c\":4}') as j"),
    ("json_valid2", "select json_valid('{\"a\":1}') as a, json_valid('nope') as b"),
    ("json_contains2", "select json_contains('{\"a\":1}', '1') as a, json_contains('[1,2]', '3') as b"),
    ("list_histogram2", "select list_histogram([1,1,2,null]) as h, list_histogram(['a','b','a']) as h2"),
    ("histogram_agg", "select histogram(x) as h from (values (1),(1),(2)) t(x)"),
    ("approx_quantile2", "select approx_quantile(x, 0.5) as q from (values (1),(2),(3)) t(x)"),
    # --- batch 12: syntax sugar ---
    ("method_chain", "select ('ab' || 'c').length() as n, [1,2,3].list_sum() as s"),
    ("method_chain_nested", "select [4,1,3].list_sort().list_reverse() as l"),
    ("trailing_comma", "select 1 as a, 2 as b,"),
    ("columns_star_exclude", "select min(columns(* exclude (b))) from (values (1, 5), (2, 3)) t(a, b)"),
    ("filter_no_where", "select count(*) filter (x > 1) as c, sum(x) filter (x > 0) as s from (values (1),(2),(-3)) t(x)"),
    ("values_toplevel", "values (1, 'a'), (2, 'b') order by 1"),
    ("describe_query", "describe select 1 as x, 'a' as s, 1.5 as d"),
    # --- batch 13 (round 8): function-catalog tail + json_transform ---
    ("regr_avgx_decimal", "select round(regr_avgx(a, b), 6) as v from (values (1.0, 2.0), (2.0, 4.0), (3.0, 5.0)) t(a, b)"),
    ("to_binary_alias", "select to_binary('ab') as s, to_binary(42) as n"),
    ("current_database_memory", "select current_database() as v"),
    ("constant_or_null_fn", "select constant_or_null(7, 1) as a, constant_or_null(7, null) as b, constant_or_null(7, 1, null) as c"),
    ("json_transform_struct", """select json_transform('{"a": 5, "b": "x", "c": [1,2]}', '{"a":"INTEGER","b":"VARCHAR","c":["INTEGER"]}') as v"""),
    ("json_transform_lenient_null", """select json_transform('{"a": "bad"}', '{"a":"INTEGER"}').a as v"""),
    ("json_transform_scalar_top", """select json_transform('{"a": 5}', '"INTEGER"') as n, json_transform('"hi"', '"VARCHAR"') as s"""),
    ("json_transform_strict_ok", """select json_transform_strict('{"a": 5}', '{"a":"INTEGER"}').a as v"""),
    ("age_calendar", "select age(timestamp '2001-04-10', timestamp '1957-06-13') as a, age(timestamp '2020-03-30', timestamp '2020-01-31') as b, age(timestamp '2020-01-31', timestamp '2020-03-31') as c"),
    ("like_backslash_literal", r"select '50%' like '50\%' as a, 'a\b' like 'a\b' as b, '100%' like '100!%' escape '!' as c"),
    ("list_unique_nonnull", "select list_unique([1,1,2,null]) as a, list_unique([]) as b, string_agg(x) as c from (values ('p'),('q')) t(x)"),
    ("series_inverted_empty", "select range(0) as a, range(1, 0) as b, generate_series(5, 1) as c, generate_series(-1) as d, generate_series(5, 1, -2) as e"),
    ("series_date_timestamps", "select generate_series(date '2020-01-01', date '2020-01-03', interval 1 day) as v"),
    ("extract_units_r8", "select extract(century from date '2001-01-01') as a, extract(millennium from date '2000-12-31') as b, extract(decade from date '1995-06-17') as c, extract(millisecond from timestamp '1995-06-17 10:30:45.123456') as d, extract(microsecond from timestamp '1995-06-17 10:30:45.123456') as e, extract(isoyear from date '2020-01-01') as f"),
    ("format_fmt_specs", "select format('{:>6}', 'x') as a, format('{:<6}|', 'x') as b, format('{:>8.2f}', 3.14159) as c, format('{:+d}', 7) as d"),
]

# Documented divergences (SURVEY §8.2): a DIFF on these labels is the
# accepted behavior, reported as DOC not DIFF.
#   quantile_cont_list — DOUBLE-input convention: the engine interpolates
#     in double (1.75); DuckDB casts back to the input DECIMAL scale with
#     truncation (1.7).
#   typeof_stmt — decimal literal arithmetic widths: Spark types 1 + 0.5
#     as DECIMAL(3,1), DuckDB as DECIMAL(12,1); values equal.
DOCUMENTED = {"quantile_cont_list", "typeof_stmt"}


def main() -> None:
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    from duckdb_psql_spark import PsqlSession, default_spark

    sess = PsqlSession(default_spark())
    con = duckdb.connect()

    import datetime
    import decimal

    def norm(v):
        """Structure-normalize a value: Rows and DuckDB's struct dicts →
        sorted key/value tuples, maps → sorted pairs (DuckDB returns
        column-of-lists {'key': [...], 'value': [...]}), tz-aware
        datetimes → naive UTC, Decimal → float."""
        from pyspark.sql import Row

        if isinstance(v, Row):
            d = v.asDict()
            # the engine's unnamed-struct convention (col1..colN) maps to
            # DuckDB's plain tuples — compare positionally
            if all(re.fullmatch(r"col\d+", k) for k in d):
                return tuple(norm(x) for x in d.values())
            return tuple(sorted((k, norm(x)) for k, x in d.items()))
        if isinstance(v, dict):
            if set(v) == {"key", "value"} and isinstance(v["key"], list):
                return tuple(
                    sorted((norm(k), norm(x)) for k, x in zip(v["key"], v["value"]))
                )
            return tuple(sorted((k, norm(x)) for k, x in v.items()))
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        if isinstance(v, decimal.Decimal):
            v = float(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # HUGEINT results map to decimal(38,0) engine-side (the
            # repo-wide convention) — compare integral values as ints
            return int(v) if v.is_integer() and abs(v) < 2**53 else round(v, 9)
        return v

    def canon(rows):
        return sorted(tuple(repr(norm(v)) for v in r) for r in rows)

    ok = fail = 0
    for label, stmt in PROBES:
        if stmt is None or (filt and filt not in label):
            continue
        try:
            want = canon(con.execute(stmt).fetchall())
        except Exception as e:
            print(f"SKIP   {label}: oracle error: {str(e).splitlines()[0][:100]}")
            continue
        try:
            got = canon([tuple(r) for r in sess.sql(stmt).collect()])
        except Exception as e:
            print(f"ENGERR {label}: {str(e).splitlines()[0][:160]}")
            fail += 1
            continue
        if got == want:
            ok += 1
        elif label in DOCUMENTED:
            print(f"DOC    {label}: documented divergence (SURVEY §8.2)")
            ok += 1
        else:
            print(f"DIFF   {label}:\n  want {want[:4]}\n  got  {got[:4]}")
            fail += 1
    print(f"\n{ok} OK / {fail} fail")


if __name__ == "__main__":
    main()
