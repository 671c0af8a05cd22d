"""Probe-driven dialect gap finder: run candidate DuckDB expressions
through BOTH engines (PsqlSession pass-through path and DuckDB) and
report ok / mismatch / engine-error / oracle-error for each.

The round-7 batches (SURVEY 8.9b) were built from exactly this loop;
this script makes the probe list a committed, re-runnable artifact.

Usage: python scripts/probe_functions.py [filter-substring]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Each entry: (label, expression). Run as `select <expr> as c` in both
# engines; compared on the single value (float tolerance 1e-9 relative).
PROBES: list[tuple[str, str]] = [
    # --- embedding / fixed-array math (charter-adjacent) ---
    ("array_cross_product", "array_cross_product(cast([1.0,2.0,3.0] as float[3]), cast([4.0,5.0,6.0] as float[3]))"),
    ("list_cosine_similarity", "list_cosine_similarity([1.0,2.0,3.0], [4.0,5.0,6.0])"),
    ("list_distance", "list_distance([1.0,2.0], [4.0,6.0])"),
    ("list_inner_product", "list_inner_product([1.0,2.0,3.0], [4.0,5.0,6.0])"),
    ("list_dot_product", "list_dot_product([1.0,2.0], [3.0,4.0])"),
    # --- list/array aliases over existing list machinery ---
    ("array_cat", "array_cat([1,2], [3])"),
    ("array_apply", "array_apply([1,2,3], x -> x * 2)"),
    ("array_filter", "array_filter([1,2,3,4], x -> x % 2 = 0)"),
    ("array_transform", "array_transform([1,2], x -> x + 1)"),
    ("array_unique", "array_unique([1,1,2,2,2,3,NULL])"),
    ("array_indexof", "array_indexof([7,8,9], 9)"),
    ("array_resize", "array_resize([1,2], 4, 0)"),
    ("list_resize", "list_resize([1,2], 4)"),
    ("array_reverse", "array_reverse([1,2,3])"),
    ("list_where", "list_where([1,2,3], [true,false,true])"),
    ("list_select", "list_select([10,20,30], [1,3])"),
    ("list_grade_up", "list_grade_up([3,1,2])"),
    ("list_reduce", "list_reduce([1,2,3,4], (a, b) -> a + b)"),
    # --- string ---
    ("printf", "printf('%d-%s', 7, 'x')"),
    ("format", "format('{}-{}', 3, 'y')"),
    ("format_bytes", "format_bytes(1234567)"),
    ("formatReadableSize", "formatReadableSize(1234567)"),
    ("editdist3", "editdist3('kitten', 'sitting')"),
    ("regexp_escape", "regexp_escape('a.b*c')"),
    ("regexp_full_match", "regexp_full_match('abc', '[a-c]+')"),
    ("like_escape", "like_escape('a%b', 'a$%b', '$')"),
    ("ilike_escape", "ilike_escape('A%b', 'a$%B', '$')"),
    ("not_like_escape", "not_like_escape('a%b', 'a$%b', '$')"),
    ("length_grapheme", "length_grapheme('héllo')"),
    ("left_grapheme", "left_grapheme('héllo', 2)"),
    ("right_grapheme", "right_grapheme('héllo', 2)"),
    ("substring_grapheme", "substring_grapheme('héllo', 2, 3)"),
    ("octet_length", "octet_length(unhex('c3a97a'))"),
    ("parse_filename", "parse_filename('/a/b/c.txt')"),
    ("parse_filename_noext", "parse_filename('/a/b/c.txt', true)"),
    ("parse_dirname", "parse_dirname('/a/b/c.txt')"),
    ("parse_dirpath", "parse_dirpath('/a/b/c.txt')"),
    ("parse_path", "parse_path('/a/b/c.txt')"),
    ("to_base", "to_base(255, 16)"),
    ("unbin", "unbin('0110')"),
    ("from_binary", "from_binary('0110')"),
    ("sha256", "sha256('abc')"),
    ("md5_number_upper", "md5_number_upper('abc') = 12704604231530709392"),
    ("md5_number_lower", "md5_number_lower('abc') = 8250560606382298838"),
    # --- date/time ---
    ("today", "today() >= date '2026-01-01'"),
    ("get_current_timestamp", "get_current_timestamp() > timestamp '2026-01-01'"),
    ("current_localtimestamp", "current_localtimestamp() > timestamp '2026-01-01'"),
    ("transaction_timestamp", "transaction_timestamp() > timestamp '2026-01-01'"),
    ("epoch_ns", "epoch_ns(timestamp '2021-01-01 01:02:03.0045')"),
    ("epoch_us", "epoch_us(timestamp '2021-01-01 01:02:03.0045')"),
    ("julian", "julian(date '2021-06-01')"),
    ("isoyear", "isoyear(date '2021-01-01')"),
    ("dayofyear", "dayofyear(date '2021-02-03')"),
    ("millennium", "millennium(date '2021-02-03')"),
    ("make_timestamptz", "make_timestamptz(2021, 3, 4, 5, 6, 7.5) is not null"),
    ("try_strptime_ok", "try_strptime('2021-03-04', '%Y-%m-%d')"),
    ("try_strptime_bad", "try_strptime('garbage', '%Y-%m-%d') is null"),
    ("to_weeks", "date '2021-01-01' + to_weeks(2)"),
    ("to_quarters", "date '2021-01-01' + to_quarters(1)"),
    ("to_decades", "date '2021-01-01' + to_decades(1)"),
    ("to_centuries", "date '2021-01-01' + to_centuries(1)"),
    ("to_millennia", "date '2021-01-01' + to_millennia(1)"),
    ("timezone_hour", "timezone_hour(timestamp '2021-01-01 10:00:00')"),
    ("timezone_minute", "timezone_minute(timestamp '2021-01-01 10:00:00')"),
    # --- struct / map ---
    ("struct_insert", "struct_insert({'a': 1}, b := 2)"),
    ("map_concat", "map_concat(map {'a': 1}, map {'b': 2})"),
    ("map_entries", "map_entries(map {'a': 1, 'b': 2})"),
    ("map_extract", "map_extract(map {'a': 1}, 'a')"),
    ("map_values", "map_values(map {'a': 1, 'b': 2})"),
    ("map_keys", "map_keys(map {'a': 1, 'b': 2})"),
    ("map_from_entries", "map_from_entries([{'k': 'a', 'v': 1}])['a']"),
    ("cardinality", "cardinality(map {'a': 1, 'b': 2})"),
    # --- json ---
    ("json_type", "json_type('[1,2]')"),
    ("json_structure", "json_structure('{\"a\": 1}')"),
    ("json_merge_patch", "json_merge_patch('{\"a\":1}', '{\"b\":2}')"),
    ("json_quote", "json_quote('a\"b')"),
    ("row_to_json", "row_to_json(row(1, 'x'))"),
    ("array_to_json", "array_to_json([1,2,3])"),
    ("json_contains", "json_contains('{\"a\":1,\"b\":2}', '1')"),
    ("from_json", "from_json('{\"a\": 7}', '{\"a\": \"INTEGER\"}').a"),
    # --- aggregates (probe via VALUES) ---
    ("approx_quantile", "(select approx_quantile(x, 0.5) between 40 and 60 from (select unnest(range(1, 101)) as x))"),
    ("reservoir_quantile", "(select reservoir_quantile(x, 0.5) between 30 and 70 from (select unnest(range(1, 101)) as x))"),
    ("kurtosis_pop", "(select round(kurtosis_pop(x), 6) from (values (1.0),(2.0),(4.0),(8.0)) t(x))"),
    ("sum_no_overflow", "(select sum_no_overflow(x) from (values (1),(2)) t(x))"),
    ("count_star", "(select count_star() from (values (1),(2)) t(x))"),
    ("arg_max_null", "(select arg_max_null(a, b) from (values ('x', 1),(NULL, 9)) t(a, b))"),
    ("arg_min_null", "(select arg_min_null(a, b) from (values ('x', 1),(NULL, 0)) t(a, b))"),
    ("regr_intercept", "(select round(regr_intercept(y, x), 6) from (values (1.0,2.0),(2.0,4.0),(3.0,5.0)) t(x, y))"),
    ("regr_r2", "(select round(regr_r2(y, x), 6) from (values (1.0,2.0),(2.0,4.0),(3.0,5.0)) t(x, y))"),
    ("regr_sxy", "(select round(regr_sxy(y, x), 6) from (values (1.0,2.0),(2.0,4.0),(3.0,5.0)) t(x, y))"),
    ("constant_or_null", "(select constant_or_null(7, x) from (values (1),(NULL)) t(x))"),
    # --- misc ---
    ("current_database", "current_database() is not null"),
    ("current_schema", "current_schema() is not null"),
    ("current_setting", "current_setting('threads') is not null"),
    ("txid_current", "txid_current() >= 0"),
    ("vector_type", "vector_type(1) is not null"),
    ("unpivot_list", "unpivot_list([1,2],[3,4])"),
    ("parse_dirname_bare", "parse_dirname('c.txt')"),
    ("parse_dirpath_rootonly", "parse_dirpath('/')"),
    ("parse_dirpath_one", "parse_dirpath('/a')"),
    ("parse_dirname_trail", "parse_dirname('a/')"),
    ("parse_path_backslash", "parse_path('a/b', 'backslash')"),
    ("format_bytes_trunc", "format_bytes(2040109465)"),
    ("format_bytes_neg", "format_bytes(-1)"),
    ("format_bytes_singular", "format_bytes(1)"),
    ("substr_grapheme_neg", "substring_grapheme('abc', -2, 2)"),
    ("substr_grapheme_2arg", "substring_grapheme('abcdef', 3)"),
    ("struct_insert_nested", "struct_insert({'a': 1}, b := {'c': 3})"),
    ("json_type_path", "json_type('{\"a\":[1,{\"b\":null}]}', '/a')"),
    ("json_structure_mixed", "json_structure('[{\"a\":1},{\"a\":null,\"b\":2}]')"),
    ("json_structure_conflict", "json_structure('[1, \"a\"]')"),
    ("json_contains_subset", "json_contains('{\"a\":1,\"b\":2}', '{\"a\":1}')"),
    ("json_contains_arr", "json_contains('[1,2]', '[2]')"),
    ("json_merge_nested", "json_merge_patch('{\"a\":{\"x\":1}}', '{\"a\":{\"y\":2}}')"),
    ("try_strptime_list", "try_strptime('04/15/2023', ['%d/%m/%Y', '%m/%d/%Y'])"),
    ("list_select_oob", "list_select([10,20,30], [1,5])"),
    ("unbin_partial", "unbin('111100001111')"),
    # --- round-7 fifth/sixth batch additions ---
    ("lambda_index_1based", "list_transform([10,20], (x, i) -> x + i)"),
    ("lambda_filter_index", "list_filter([10,20,30], (x, i) -> i > 1)"),
    ("list_reduce_acc", "list_reduce([1,2,3], (a, b) -> a + b)"),
    ("stepped_slice", "[1,2,3,4,5][1:5:2]"),
    ("stepped_slice_clamped", "[1,2,3,4,5][2:100:3]"),
    ("list_sum", "list_sum([1,2,3])"),
    ("list_avg", "list_avg([2.0,4.0])"),
    ("list_aggregate_max", "list_aggregate([3,1,2], 'max')"),
    ("bit_count", "bit_count(255)"),
    ("regexp_split_part", "split_part('a,b,c', ',', 2)"),
    ("bar_full", "bar(3, 0, 5, 5)"),
    ("bar_partial", "bar(1, 0, 3, 8)"),
    ("bar_empty_pads", "bar(0.01, 0, 5, 5)"),
    ("printf_float_decimal", "printf('%.2f|%s', 3.14159, 'x')"),
    ("format_spec_braces", "format('{:.2f}', 3.14159)"),
    ("left_negative", "left('abc', -1)"),
    ("right_negative", "right('abc', -1)"),
    ("substring_zero_start", "substring('hello', 0, 3)"),
    ("fmod_floored", "fmod(7, -3)"),
    ("div_zero_null", "1 / 0"),
    ("mod_zero_null", "mod(1, 0)"),
    ("cast_bool_int", "cast(true as int)"),
    ("cast_strlit_away", "cast('0.5' as int)"),
    # --- round-9 version-drift batch (VERDICT r8 #8): the q_fn_bit_r8
    # red came from a DuckDB-version representation change (BIT cells
    # surfaced differently by the driver's newer oracle). These pin the
    # whole BIT surface through version-stable ::VARCHAR spellings plus
    # the operator forms, so the next drifting family is caught by this
    # committed probe list before the driver's oracle sees it. ---
    ("bit_cast_roundtrip", "'0101'::BIT::VARCHAR"),
    ("bit_get", "get_bit('01100101'::BIT, 2)"),
    ("bit_set_varchar", "set_bit('01100101'::BIT, 2, 1)::VARCHAR"),
    ("bit_position2", "bit_position('11'::BIT, '0110101'::BIT)"),
    ("bitstring_pad", "bitstring('0101011', 12)::VARCHAR"),
    ("bit_count_bits", "bit_count('01101'::BIT)"),
    ("bit_length_bits", "bit_length('01101'::BIT)"),
    ("bit_and_op", "('0110'::BIT & '0101'::BIT)::VARCHAR"),
    ("bit_or_op", "('0110'::BIT | '0101'::BIT)::VARCHAR"),
    ("bit_xor_op", "xor('0110'::BIT, '0101'::BIT)::VARCHAR"),
    ("bit_not_op", "(~('0110'::BIT))::VARCHAR"),
    ("bit_shift_left", "('0110'::BIT << 2)::VARCHAR"),
    ("bit_shift_right", "('0110'::BIT >> 1)::VARCHAR"),
    ("octet_length_bit", "octet_length('01101'::BIT)"),
    # families newer DuckDBs renamed/retyped in the 1.1-1.4 line —
    # probed through stable spellings
    ("era_bc_stable", "era(date '0001-01-01' - interval 1 year)"),
    ("hugeint_varchar", "cast(170141183460469231731687303715884105727 as varchar)"),
    ("uhugeint_md5_varchar", "md5_number_lower('x')::VARCHAR"),
    ("interval_varchar", "(interval 14 month)::VARCHAR"),
    ("interval_mixed_varchar", "(interval '1 day 2 hours 3 minutes')::VARCHAR"),
    ("decimal_div_scale", "(1.0::DECIMAL(18,3) / 3)::VARCHAR"),
    ("time_varchar", "(time '13:45:30.123')::VARCHAR"),
    ("timestamptz_epoch", "cast(epoch(timestamptz '2001-01-01 05:00:00+00') as bigint)"),
    ("blob_hex_stable", "hex('ab'::BLOB)"),
    # --- round-10 version-drift batch (VERDICT r9 #7): the json path
    # tail, BIT edge widths + aggregates, and interval normalization
    # corners, all through 1.0-stable spellings. Found and fixed FIVE
    # gap families: 2-arg json_keys / bare-pointer paths / [#-N]
    # back-index / .* [*] wildcards / list-of-paths (variant-reader
    # compositions), json_group_structure (bracket-stripped merged
    # structure, with the VARCHAR-vs-::JSON implicit-cast split),
    # BIT-carrier bit_and/or/xor aggregates (collect_list fold),
    # epoch(interval) (365.25-day years + 30-day leftover months),
    # and timestamp-difference ::VARCHAR rendering. ---
    ("json_keys_path", "json_keys('{\"a\":{\"x\":1,\"y\":2}}', '$.a')"),
    ("json_keys_missing_null", "json_keys('{\"a\":1}', '$.missing') is null"),
    ("json_keys_nonobj_empty", "json_keys('{\"a\":[1]}', '$.a')"),
    ("json_keys_arr_empty", "json_keys('[1,2]')"),
    ("json_extract_bare_pointer", "json_extract_path('{\"a\":{\"b\":7}}', 'a/b')"),
    ("json_backidx", "json_extract('[1,2,3]', '$[#-1]')"),
    ("json_backidx_nested", "json_extract('{\"a\":[1,2,3]}', '$.a[#-2]')"),
    ("json_backidx_chain", "json_extract('[[1,2],[3,4]]', '$[#-1][0]')"),
    ("json_backidx_oob", "json_extract('[1,2]', '$[#-5]') is null"),
    ("json_wild_obj", "json_extract('{\"a\":{\"b\":1},\"c\":{\"b\":2}}', '$.*.b')"),
    ("json_wild_partial", "json_extract('{\"a\":{\"b\":1},\"c\":{\"x\":2}}', '$.*.b')"),
    ("json_wild_none_empty", "json_extract('{\"a\":{\"x\":1}}', '$.b.*')"),
    ("json_wild_scalar_empty", "json_extract('5', '$.*')"),
    ("json_wild_arr", "json_extract('[{\"x\":1},{\"x\":2}]', '$[*].x')"),
    ("json_wild_arr_all", "json_extract('{\"a\":[1,2]}', '$.a[*]')"),
    ("json_wild_deep", "json_extract('{\"a\":{\"b\":{\"c\":5}}}', '$.*.b.c')"),
    ("json_wild_string_form", "json_extract_string('{\"a\":{\"b\":\"hi\"},\"c\":{\"b\":2}}', '$.*.b')"),
    ("json_multi_path", "json_extract('{\"a\":1,\"b\":2}', ['$.a','$.b'])"),
    ("json_group_structure_vc", "(select json_group_structure(j) from (values ('{\"a\":1}'),('{\"a\":2,\"b\":\"x\"}')) t(j))"),
    ("json_group_structure_js", "(select json_group_structure(j::JSON) from (values ('{\"a\":1}'),('{\"a\":2,\"b\":\"x\"}')) t(j))"),
    ("json_group_structure_int", "(select json_group_structure(x) from (values (1),(2)) t(x))"),
    ("json_cast_roundtrip", "('{\"a\":1}'::JSON)::VARCHAR"),
    ("bit_agg_and", "(select bit_and(x::BIT)::VARCHAR from (values ('0110'),('0101')) t(x))"),
    ("bit_agg_or", "(select bit_or(x::BIT)::VARCHAR from (values ('0110'),('0101')) t(x))"),
    ("bit_agg_xor", "(select bit_xor(x::BIT)::VARCHAR from (values ('0110'),('0101')) t(x))"),
    ("bit_agg_null_skip", "(select bit_and(x::BIT)::VARCHAR from (values ('0110'),(NULL),('0101')) t(x))"),
    ("bit_agg_int_passthru", "(select bit_and(x) from (values (6),(5)) t(x))"),
    ("bit_wide70", "bitstring('1', 70)::VARCHAR"),
    ("bit_shift_over_width", "('0110'::BIT << 10)::VARCHAR"),
    ("bit_concat", "('01'::BIT || '10'::BIT)::VARCHAR"),
    ("bit_cmp_lex", "'01'::BIT < '10'::BIT"),
    ("bit_pos_missing_zero", "bit_position('111'::BIT, '0101'::BIT)"),
    ("bit_set_wide", "set_bit(bitstring('1',9), 0, 1)::VARCHAR"),
    ("epoch_interval_dt", "epoch(interval '1 day 2 hours')"),
    ("epoch_interval_frac", "epoch(interval '1.5 seconds')"),
    ("epoch_interval_neg", "epoch(interval '-2 days')"),
    ("epoch_interval_ym", "epoch(interval '14 months')"),
    ("epoch_interval_ym_neg", "epoch(interval '-14 months')"),
    ("epoch_ts_frac", "epoch(timestamp '2021-01-01 00:00:01.5')"),
    ("tsdiff_varchar", "(timestamp '2021-03-02 01:00:00' - timestamp '2021-02-27 23:30:00')::VARCHAR"),
    ("tsdiff_varchar_neg", "(timestamp '2021-01-01 00:00:00' - timestamp '2021-01-02 03:00:00')::VARCHAR"),
    ("iv_400days", "(interval '400 days')::VARCHAR"),
    ("iv_90min", "(interval '90 minutes')::VARCHAR"),
    ("iv_frac_sec", "(interval '1.5 seconds')::VARCHAR"),
    ("iv_ms", "(interval '1234 milliseconds')::VARCHAR"),
    ("iv_13mo", "(interval '13 months')::VARCHAR"),
    ("iv_div_even", "(interval '4 days' / 2)::VARCHAR"),
    # JSON null VALUES are SQL NULL in every extraction form (fuzzer
    # seed-777 find: the engine rendered the 'null' text); a json string
    # "null" stays quoted/unquoted-but-present
    ("json_null_value_sqlnull", "json_extract('{\"a\":null}', '$.a') is null"),
    ("json_null_arrow_sqlnull", "('{\"a\":null}'::JSON -> 'a') is null"),
    ("json_null_backidx", "json_extract('[null,1]', '$[#-2]') is null"),
    ("json_null_wild", "json_extract(json_object('z', 1, 'a', cast(null as int)), '$.*')"),
    ("json_null_keys", "json_keys('{\"a\":null}', '$.a') is null"),
    ("json_null_string_literal", "json_extract_string('{\"a\":\"null\"}', '$.a')"),
    ("json_null_quoted_kept", "json_extract('{\"a\":\"null\"}', '$.a')"),
    # --- round-10 batch 2: list/slice/time_bucket tail ---
    ("list_contains_nulllist", "list_contains([1,null], 2)"),
    ("list_contains_found", "list_contains([1,null], 1)"),
    ("list_contains_nullneedle", "list_contains([1,null], null) is null"),
    ("array_contains_nullelem", "array_contains([1,null], 2)"),
    ("list_concat_rnull", "list_concat([1], NULL)"),
    ("list_concat_lnull", "list_concat(NULL, [2])"),
    ("list_concat_bothnull", "list_concat(NULL, NULL) is null"),
    ("array_pop_back", "array_pop_back([1,2,3])"),
    ("array_pop_back_one", "array_pop_back([1])"),
    ("array_pop_front", "array_pop_front([1,2,3])"),
    ("list_slice_negend", "list_slice([1,2,3,4], 2, -1)"),
    ("list_slice_negboth", "list_slice([1,2,3,4], -3, -2)"),
    ("list_slice_clamp", "list_slice([1,2,3,4], 2, 99)"),
    ("list_slice_str_neg", "array_slice('abcd', 2, -1)"),
    ("list_any_value", "list_any_value([null, 3, 4])"),
    ("list_intersect_sorted", "list_sort(list_intersect([1,2,3], [2,3,4]))"),
    ("time_bucket_offset", "time_bucket(interval 10 minute, timestamp '2021-03-01 10:37:12', interval 3 minute)"),
    ("time_bucket_month", "time_bucket(interval 1 month, date '2021-03-17')"),
    ("time_bucket_3mo", "time_bucket(interval 3 months, timestamp '2021-02-17 10:00:00')"),
    ("time_bucket_year", "time_bucket(interval 1 year, date '2021-08-17')"),
    ("timezone_utc_offset", "timezone(timestamp '2021-01-01 05:00:00')"),
    ("damerau_levenshtein", "damerau_levenshtein('abc', 'acb')"),
    ("jaro_winkler", "round(jaro_winkler_similarity('martha', 'marhta'), 6)"),
    # --- round-10 batch 3: aggregate/regex/format tail ---
    ("sem_agg", "(select round(sem(x), 6) from (values (1.0),(2.0),(4.0)) t(x))"),
    ("regexp_extract_named", "regexp_extract('ab12', '(?P<w>[a-z]+)', ['w'])"),
    ("regexp_extract_named_swap", "regexp_extract('ab12', '(?P<w>[a-z]+)(?P<n>[0-9]+)', ['n', 'w'])"),
    ("regexp_extract_plainlist", "regexp_extract('ab12', '([a-z]+)([0-9]+)', ['alpha', 'num'])"),
    ("format_thousands", "format('{:,}', 1234567)"),
    ("histogram_agg", "(select histogram(x) from (values (1),(2),(2)) t(x))"),
    ("quantile_disc_list", "(select quantile_disc(x, [0.5, 1.0]) from (values (1),(2),(3)) t(x))"),
    # quantile_cont over DOUBLE agrees; over DECIMAL inputs DuckDB keeps
    # the input's decimal SCALE (1.75 displays as 1.7) while the engine
    # interpolates in double — value-equal, narrower display; documented
    ("quantile_cont_list_double", "(select quantile_cont(x, [0.25, 0.5]) from (values (1.0::DOUBLE),(2.0::DOUBLE),(3.0::DOUBLE),(4.0::DOUBLE)) t(x))"),
    ("string_agg_distinct", "(select string_agg(distinct a, ',' order by a) from (values ('b'),('a'),('b')) t(a))"),
    ("list_distinct_agg", "(select list(distinct x order by x) from (values (1),(2),(1)) t(x))"),
    ("count_if_agg", "(select count_if(x > 1) from (values (1),(2),(3)) t(x))"),
    ("str_split_regex", "string_split_regex('a1b22c', '[0-9]+')"),
    ("base64_blob_roundtrip", "from_base64(to_base64('spark'::BLOB))::VARCHAR"),
    # --- round-10 batch 4: fold-shim aggregates in WINDOW position ---
    ("product_window", "(select max(p) from (select product(x) over (order by x) as p from (values (2.0),(3.0)) t(x)) q)"),
    ("list_window", "(select sum(n) from (select len(list(x) over (order by x rows between 1 preceding and current row)) as n from (values (1),(2)) t(x)) q)"),
    ("array_agg_window_len", "(select len(array_agg(x) over (partition by 1)) from (values (1),(2),(3)) t(x) limit 1)"),
    # distinct-on inside a SUBQUERY stays a documented boundary (the
    # rewrite is statement-level); the statement form is value-checked
    # in tests/test_conformance.py
    ("mode_window", "(select max(m) from (select mode(x) over (order by x) as m from (values (1),(1),(2)) t(x)) q)"),
    # --- round-10 batch 5: math/date/string-distance/aggregate tail ---
    ("jaccard_str", "jaccard('duck', 'luck')"),
    ("hamming_str", "hamming('duck', 'luck')"),
    ("mismatches_str", "mismatches('duck', 'luck')"),
    ("monthname_fn", "monthname(date '1992-09-20')"),
    ("dayname_fn", "dayname(date '1992-09-20')"),
    ("weekofyear_fn", "weekofyear(date '1992-01-01')"),
    ("isodow_fn", "isodow(date '1992-09-20')"),
    ("dayofmonth_fn", "dayofmonth(date '1992-09-20')"),
    ("yearweek_fn", "yearweek(date '1992-01-01')"),
    ("epoch_ms_fn", "epoch_ms(timestamp '1992-09-20 11:30:00.123')"),
    ("epoch_us_fn", "epoch_us(timestamp '1992-09-20 11:30:00.123456')"),
    ("epoch_ns_fn", "epoch_ns(timestamp '1992-09-20 11:30:00.123456')"),
    ("epoch_ms_back", "epoch_ms(715951800123)::VARCHAR"),
    ("to_timestamp_fn", "to_timestamp(715951800)::VARCHAR"),
    ("make_timestamp_us", "make_timestamp(715951800123456)::VARCHAR"),
    ("gamma_fn", "gamma(5)"),
    ("lgamma_fn", "lgamma(6.5)"),
    ("factorial_fn", "factorial(10)"),
    ("factorial_op", "10!"),
    ("even_fn", "even(2.1)"),
    ("even_neg", "even(-2.1)"),
    ("cbrt_fn", "cbrt(27.0)"),
    ("atan2_fn", "atan2(1.0, 2.0)"),
    ("gcd_fn", "gcd(12, 18)"),
    ("lcm_fn", "lcm(4, 6)"),
    ("isfinite_fn", "isfinite(1.0/0.0)"),
    ("isinf_fn", "isinf('inf'::DOUBLE)"),
    ("signbit_fn", "signbit(-0.0)"),
    ("cot_fn", "cot(0.5)"),
    ("nextafter_fn", "nextafter(1.0, 2.0)"),
    ("bin_fn", "bin(42)"),
    ("bin_varchar", "bin('11')"),
    ("skewness_agg", "(select round(skewness(x), 6) from (values (1.0),(2.0),(2.0),(9.0)) t(x))"),
    ("mad_agg", "(select mad(x) from (values (1.0),(2.0),(9.0)) t(x))"),
    ("median_even", "(select median(x) from (values (1),(2),(3),(4)) t(x))"),
    ("favg_agg", "(select favg(x) from (values (1.0),(2.0),(3.0)) t(x))"),
    ("fsum_agg", "(select fsum(x) from (values (1.0),(2.5),(3.25)) t(x))"),
    ("covar_pop_agg", "(select covar_pop(x, y) from (values (1.0, 2.0),(2.0, 4.0),(3.0, 5.0)) t(x, y))"),
    ("covar_samp_agg", "(select round(covar_samp(x, y), 9) from (values (1.0, 2.0),(2.0, 4.0),(3.0, 5.0)) t(x, y))"),
    ("approx_cd_exactish", "(select approx_count_distinct(x) between 90 and 110 from (select unnest(range(100)) x) t)"),
    ("generate_series_list", "generate_series(1, 9, 3)"),
    ("generate_series_down", "generate_series(5, 1, -2)"),
    ("range_list_excl", "range(1, 9, 3)"),
    ("range_list_1arg", "range(4)"),
    ("range_list_empty", "range(3, 3)"),
    ("range_list_2arg", "range(2, 5)"),
    ("range_list_down", "range(5, 1, -2)"),
    ("range_ts_interval", "range(timestamp '2020-01-01', timestamp '2020-01-03', interval 1 day)"),
    ("range_tvf", "(select count(*) from range(5))"),
    ("to_timestamp_frac", "to_timestamp(0.5)::VARCHAR"),
    # --- round-10 batch 6: map/struct/string/date tail ---
    ("map_literal_bracket", "map(['a','b'], [1,2])['a']"),
    ("map_cardinality", "cardinality(map(['a','b'], [1,2]))"),
    ("map_keys_fn", "map_keys(map(['a','b'], [1,2]))"),
    ("map_values_fn", "map_values(map(['a','b'], [1,2]))"),
    ("map_extract_fn", "map_extract(map(['a','b'], [1,2]), 'b')"),
    ("map_entries_fn", "map_entries(map(['a'], [1]))"),
    ("map_from_entries_fn", "map_from_entries([{'k': 'x', 'v': 7}])['x']"),
    ("map_contains_fn", "map_contains(map(['a'], [1]), 'a')"),
    ("element_at_fn", "element_at(map(['a','b'], [1,2]), 'a')"),
    ("struct_pack_fn", "struct_pack(a := 1, b := 'x').a"),
    ("struct_extract_fn", "struct_extract({'a': 5, 'b': 6}, 'b')"),
    ("struct_extract_pos", "struct_extract(row(7, 8), 2)"),
    ("struct_insert_fn", "struct_insert({'a': 1}, b := 2).b"),
    ("row_ctor", "struct_extract(row(1, 'x'), 2)"),
    ("ascii_fn", "ascii('A')"),
    ("chr_fn", "chr(66)"),
    ("ord_fn", "ord('é')"),
    ("unicode_fn", "unicode('héllo')"),
    ("strip_accents_fn", "strip_accents('héllo wörld')"),
    ("nfc_normalize_fn", "nfc_normalize('é')"),
    ("date_diff_fn", "date_diff('month', date '1992-01-15', date '1992-09-20')"),
    ("datediff_alias", "datediff('day', date '1992-01-01', date '1992-01-31')"),
    ("date_add_iv", "date_add(date '1992-01-31', interval 1 month)"),
    ("date_sub_fn", "date_sub('month', date '1992-01-15', date '1992-09-20')"),
    ("datepart_fn", "datepart('quarter', date '1992-09-20')"),
    ("datepart_list", "datepart(['year', 'month'], date '1992-09-20')"),
    ("repeat_str", "repeat('ab', 3)"),
    ("translate_fn", "translate('12345', '143', 'ax')"),
    ("starts_with_fn", "starts_with('spark', 'sp')"),
    ("strpos_fn", "strpos('hello', 'll')"),
    ("instr_fn", "instr('hello', 'll')"),
    ("position_in", "position('ll' in 'hello')"),
    ("sha1_fn", "sha1('abc')"),
    ("list_reverse_sort_fn", "list_reverse_sort([2, 9, 4, NULL])"),
    ("list_sort_dirs", "list_sort([3, 1, NULL, 2], 'DESC', 'NULLS FIRST')"),
    ("to_base_fn", "to_base(42, 16)"),
    ("bar_fn", "bar(3, 0, 6, 6)"),
    # --- round-10 batch 7: list/blob/date tail ---
    ("list_zip_fn", "list_zip([1, 2], ['a', 'b'])"),
    ("list_zip_uneven", "list_zip([1, 2, 3], ['a'])"),
    ("list_value_fn", "list_value(3, 1, 2)"),
    ("list_pack_fn", "list_pack(7, 8)"),
    ("list_element_fn", "list_element([10, 20, 30], 2)"),
    ("list_has_all_fn", "list_has_all([1,2,3], [2,3])"),
    ("list_has_any_fn", "list_has_any([1,2,3], [9,3])"),
    ("array_length_fn", "array_length([1,2,3])"),
    ("string_to_array_fn", "string_to_array('a,b,,c', ',')"),
    ("array_to_string_fn", "array_to_string(['x','y'], '-')"),
    ("regexp_split_arr", "regexp_split_to_array('a1b22c', '[0-9]+')"),
    ("century_fn", "century(date '1992-09-20')"),
    ("decade_fn", "date_part('decade', date '1992-09-20')"),
    ("millennium_part", "date_part('millennium', date '1992-09-20')"),
    ("to_hex_fn", "to_hex(255)"),
    ("from_hex_fn", "from_hex('c3a97a')::VARCHAR"),
    ("hex_blob_fn", "hex('abc'::BLOB)"),
    ("unhex_roundtrip", "unhex(hex('spark'::BLOB))::VARCHAR"),
    ("encode_fn", "encode('héllo')::VARCHAR"),
    ("decode_fn", "decode('abc'::BLOB)"),
    ("prefix_fn", "prefix('hello', 'he')"),
    ("suffix_fn", "suffix('hello', 'lo')"),
    ("jaro_sim_fn", "round(jaro_similarity('duck', 'luck'), 6)"),
    ("jaro_winkler_fn", "round(jaro_winkler_similarity('duck', 'luck'), 6)"),
    ("union_value_fn", "union_value(num := 2)"),
    ("union_tag_fn", "union_tag(union_value(num := 2))"),
    ("union_extract_hit", "union_extract(union_value(num := 7), 'num')"),
    # --- round-11 batch 8: map/bit/math/date tail (version-stable) ---
    ("map_keys_fn", "map_keys(map {'a': 1, 'b': 2})"),
    ("map_values_fn", "map_values(map {'a': 1, 'b': 2})"),
    ("map_entries_fn", "map_entries(map {'a': 1})"),
    ("map_from_entries_fn", "map_from_entries([{'k': 'x', 'v': 1}])['x']"),
    ("map_concat_fn", "map_concat(map {'a': 1}, map {'b': 2})['b']"),
    ("map_extract_fn", "map_extract(map {'a': 7}, 'a')"),
    ("cardinality_map", "cardinality(map {'a': 1, 'b': 2})"),
    ("element_at_map", "element_at(map {'a': 3}, 'a')"),
    ("map_empty", "cardinality(map {})"),
    ("bit_count_int", "bit_count(255)"),
    ("get_bit_fn", "get_bit('0101'::BIT, 1)"),
    ("set_bit_fn", "set_bit('0101'::BIT, 0, 1)::VARCHAR"),
    ("bit_position_fn", "bit_position('010'::BIT, '1110101'::BIT)"),
    ("bit_length_str", "bit_length('abc')"),
    ("lshift_int", "5 << 2"),
    ("rshift_int", "20 >> 2"),
    ("xor_fn", "xor(5, 3)"),
    ("gcd_fn", "greatest_common_divisor(42, 57)"),
    ("lcm_fn", "least_common_multiple(42, 57)"),
    ("gamma_fn", "round(gamma(5.5), 6)"),
    ("lgamma_fn", "round(lgamma(10.5), 6)"),
    ("factorial_fn", "factorial(10)"),
    ("factorial_op", "7!"),
    ("even_fn", "even(2.9)"),
    ("even_neg", "even(-2.9)"),
    ("signbit_fn", "signbit(-0.0)"),
    ("cot_fn", "round(cot(0.5), 9)"),
    ("atan2_fn", "round(atan2(1.0, 2.0), 9)"),
    ("nextafter_fn", "nextafter(1.0, 2.0) > 1.0"),
    ("cbrt_fn", "round(cbrt(27.0), 9)"),
    ("log2_fn", "log2(8.0)"),
    ("log_base", "log(3, 81.0)"),
    ("fdiv_fn", "fdiv(7.5, 2.0)"),
    ("fmod_fn", "fmod(7.5, 2.0)"),
    ("isfinite_fn", "isfinite(1.0/0.0)"),
    ("isnan_fn", "isnan('nan'::DOUBLE)"),
    ("isinf_fn", "isinf(-1.0/0.0)"),
    ("time_bucket_iv", "time_bucket(interval '2 hours', timestamp '2021-03-04 05:06:07')"),
    ("time_bucket_origin", "time_bucket(interval '10 minutes', timestamp '2021-03-04 05:06:07', timestamp '2021-01-01 00:03:00')"),
    ("last_day_fn", "last_day(date '2024-02-05')"),
    ("monthname_fn", "monthname(date '2021-09-20')"),
    ("dayname_fn", "dayname(date '2021-09-20')"),
    ("weekofyear_fn", "weekofyear(date '2021-01-04')"),
    ("yearweek_fn", "yearweek(date '2021-01-04')"),
    ("age_two_ts", "age(timestamp '2021-06-15 12:00:00', timestamp '2019-03-20 06:30:00')::VARCHAR"),
    ("date_trunc_quarter", "date_trunc('quarter', date '2021-08-20')"),
    ("date_trunc_week", "date_trunc('week', date '2021-01-01')"),
    ("timezone_extract", "timezone(timestamp '2021-01-01 00:00:00')"),
    ("damerau_fn", "damerau_levenshtein('duck', 'udck')"),
    ("hamming_fn", "hamming('duck', 'luck')"),
    ("mismatches_fn", "mismatches('duck', 'luck')"),
    ("levenshtein_fn", "levenshtein('kitten', 'sitting')"),
    ("contains_str", "contains('hello', 'll')"),
    ("contains_list", "contains([1,2,3], 2)"),
    ("contains_map", "contains(map {'a': 1}, 'a')"),
    ("regexp_extract_named", "regexp_extract('2023-07-09', '(\\d+)-(\\d+)', ['y', 'm']).y"),
    ("regexp_extract_all_g", "regexp_extract_all('a1b22c', '[0-9]+')"),
    ("str_split_regex_fn", "str_split_regex('a1b22c', '[0-9]+')"),
    ("flatten_fn", "flatten([[1, 2], [3]])"),
    ("range_date", "range(date '2021-01-01', date '2021-01-04', interval 1 day)"),
    ("generate_series_ts", "generate_series(timestamp '2021-01-01', timestamp '2021-01-01 03:00:00', interval 90 minutes)"),
    ("lpad_trunc", "lpad('hello', 3, 'x')"),
    ("rpad_multi", "rpad('ab', 7, '123')"),
    ("ltrim_chars", "ltrim('xyxhello', 'xy')"),
    ("rtrim_chars", "rtrim('helloyx', 'xy')"),
    ("trim_chars", "trim('xxhixx', 'x')"),
    ("greatest_str", "greatest('apple', 'pear', 'banana')"),
    ("least_mixed_num", "least(3, 1.5)"),
    ("nvl2_null", "ifnull(NULL, 'fallback')"),
    ("typeof_fn", "typeof(1::BIGINT)"),
    ("typeof_list", "typeof([1,2])"),
    ("typeof_nested_list", "typeof([[1,2],[3]])"),
    ("typeof_deep_list", "typeof([[[1]]])"),
    # union_extract with a key the union lacks binder-errors in BOTH
    # engines (probe-pinned; tests/test_enums.py asserts the message)
    # --- round-12 batch 9: deep-nesting / nested-comparison tail
    # (VERDICT r11 #8: the map/struct/nested tail). NOTE the container
    # DuckDB's map subscript returns a LIST of matching values
    # (map {'x': 9}['x'] = [9]) — these probes pin that exact shape.
    ("nest_struct_list_map_r12", "{'a': {'b': [map {'x': 9}]}}.a.b[1]['x']"),
    ("map_int_key_r12", "map {1: 'x', 2: 'y'}[2]"),
    ("map_date_key_r12", "map {date '1992-01-01': 7}[date '1992-01-01']"),
    ("list_of_map_r12", "[map {'k': 1}][1]['k']"),
    ("map_of_list_r12", "map {'a': [1,2,3]}['a'][1][2]"),
    ("struct_eq_r12", "{'a': 1, 'b': 2} = {'a': 1, 'b': 2}"),
    ("list_eq_r12", "[1,2,3] = [1,2,3]"),
    ("list_lt_r12", "[1,2] < [1,3]"),
    ("struct_lt_r12", "{'a': 1} < {'a': 2}"),
    ("struct_of_struct_r12", "{'o': {'i': 42}}.o.i"),
    ("list_slice_step_r12", "[1,2,3,4,5,6][1:6:2]"),
    ("list_neg_slice_r12", "[1,2,3,4,5][-3:-1]"),
    ("nested_lambda_r12",
     "list_transform([[1,2],[3]], x -> list_reduce(x, (a,b) -> a+b))"),
    ("struct_update_chain_r12",
     "struct_insert(struct_insert({'a':1}, b := 2), c := 3).c"),
    ("unnest_struct_scalar_r12", "unnest({'a': 1, 'b': 2})"),
    ("list_sort_structs_r12", "list_sort([{'a': 2}, {'a': 1}])[1].a"),
    ("list_agg_nested_r12",
     "(select list(x) from (values ([1,2]),([3])) t(x))[2][1]"),
    ("map_two_lists_idx_r12", "map(['a','b'],[[1],[2,3]])['b'][1][2]"),
    ("row_compare_r12", "row(1,2) = row(1,2)"),
    ("coalesce_list_r12", "coalesce(NULL::INT[], [7])[1]"),
    ("case_struct_r12", "(case when 1=1 then {'a':1} else {'a':2} end).a"),
    ("list_contains_struct_r12", "list_contains([{'a':1}], {'a':1})"),
    ("filter_struct_lambda_r12",
     "list_filter([{'a':1},{'a':2}], s -> s.a > 1)[1].a"),
    ("len_nested_r12", "len([[1,2],[3,4,5]][2])"),
    ("list_concat_nested_r12", "list_concat([[1]], [[2,3]])[2][2]"),
    ("map_keys_idx_r12", "map_keys(map {'a': 1})[1]"),
]


def canon(v):
    import datetime
    import decimal
    import re as _re

    if isinstance(v, decimal.Decimal):
        return float(v)
    if hasattr(v, "asDict"):
        d = v.asDict()
        if d and all(_re.fullmatch(r"col\d+", k) for k in d):
            # auto-positional field names (list_zip shim): DuckDB's
            # unnamed structs arrive as plain tuples — compare by position
            return tuple(canon(x) for x in d.values())
        return canon(d)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        if set(v.keys()) == {"key", "value"} and isinstance(v.get("key"), list):
            return canon(dict(zip(v["key"], v["value"])))
        return tuple(sorted((str(k), canon(x)) for k, x in v.items()))
    if isinstance(v, datetime.datetime):
        v = v.replace(tzinfo=None)
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, float):
        return round(v, 9)
    return v


def same(a, b):
    a, b = canon(a), canon(b)
    if isinstance(a, float) and isinstance(b, (int, float)):
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(b, float) and isinstance(a, (int, float)):
        return math.isclose(float(a), b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(same(x, y) for x, y in zip(a, b))
    return a == b


# Representation-rooted interval divergences (round-10 batch, documented
# in SURVEY — DuckDB's interval is a (months, days, micros) TRIPLE while
# Spark's day-time interval is a single microsecond total, so component
# identity can't survive the crossing):
#   (interval '25 hours')::VARCHAR   duck '25:00:00'   spark '1 day 01:00:00'
#   (interval '-3 days 2 hours')::VARCHAR
#                                    duck '-3 days 02:00:00' (independent
#                                    component signs)  spark '-2 days -22:00:00'
#   interval '3 days' / 2            duck '1 day' (component-wise integer
#                                    division)         spark '1 day 12:00:00'
#   interval '1 month -1 day'        inexpressible in Spark's type system
#                                    (year-month and day-time are separate
#                                    types) — stays a loud error
# All four are equal-duration or loud, never silently short/long by a
# different amount; probes above pin the AGREEING spellings.

# Deliberately out of scope (documented engine boundaries, SURVEY §8.2):
# DuckDB-internal plumbing with no analytics meaning on Spark.
SKIP = {
    # DuckDB 1.1+ functions: the CONTAINER oracle (1.0) predates them;
    # the engine ships them (map_contains → map_contains_key shim, sha1
    # Spark-native) and tests/test_macros pins the values engine-side.
    "map_contains_fn": "DuckDB 1.1+ (container oracle predates); engine-pinned",
    "contains_list": "DuckDB 1.1+ contains(LIST) (container oracle predates); engine ships list_contains semantics",
    "contains_map": "DuckDB 1.1+ contains(MAP) (container oracle predates); engine ships map_contains_key semantics",
    "sha1_fn": "DuckDB 1.1+ (container oracle predates); engine-pinned",
    "sum_no_overflow": "DuckDB-internal (binder rejects direct use)",
    "constant_or_null": "DuckDB-internal COLUMNS plumbing",
    "current_setting": "engine-config introspection (no Spark analogue)",
    "txid_current": "no transaction ids in a Spark batch engine",
    "vector_type": "DuckDB vectorization introspection",
}


def main() -> None:
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    import duckdb

    from duckdb_psql_spark import PsqlSession, default_spark

    spark = default_spark(cpus=4)
    psql = PsqlSession(spark)
    con = duckdb.connect()
    ok, bad = [], []
    skipped = []
    for label, expr in PROBES:
        if filt and not any(f in label for f in filt.split(",")):
            continue
        if label in SKIP:
            skipped.append(label)
            continue
        sql = f"select {expr} as c"
        try:
            want = con.execute(sql).fetchone()[0]
        except Exception as e:  # noqa: BLE001
            bad.append((label, "oracle-error", str(e).splitlines()[0][:100]))
            continue
        try:
            got = psql.sql(sql).collect()[0][0]
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:100]
            bad.append((label, "engine-error", msg))
            continue
        if same(got, want):
            ok.append(label)
        else:
            bad.append((label, "mismatch", f"got={got!r} want={want!r}"))
    print(f"OK ({len(ok)}): {' '.join(ok)}")
    print(f"\nSKIP ({len(skipped)}): {' '.join(skipped)}")
    print(f"\nFAIL ({len(bad)}):")
    for label, kind, msg in bad:
        print(f"  {label:28s} {kind:12s} {msg}")
    spark.stop()


if __name__ == "__main__":
    main()
