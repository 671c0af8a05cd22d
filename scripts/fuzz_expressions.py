"""Randomized scalar-expression differential fuzzer.

The property sweep covers pipeline SHAPES; this covers expression
SEMANTICS: random expression trees over nation's columns plus edge-case
literals (0, -1, NULL, '', unicode, .5 ties), rendered once and run
through BOTH engines as `SELECT n_nationkey, <expr> FROM nation`.
Engine-vs-oracle comparison is order-insensitive with 1e-9 relative
float tolerance; a case where exactly one engine errors is recorded as
a skip (dialect-legal difference — e.g. ANSI DOUBLE÷0, documented), a
value mismatch fails the run.

Usage: python scripts/fuzz_expressions.py [n=400] [seed=11] [sf_dir]
"""

from __future__ import annotations

import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 11
SF = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

INT_LEAVES = ["n_nationkey", "n_regionkey", "0", "1", "-1", "7", "25",
              "cast(null as int)", "1000000", "-999999"]
STR_LEAVES = ["n_name", "''", "'a'", "'Hello World'", "'héllo'", "'a,b,,c'",
              "cast(null as string)", "' padded '", "'O''Neil'",
              "'line1\nline2'", "'MiXeD CaSe'"]
FLT_LEAVES = ["n_nationkey * 1.5", "0.5", "-2.5", "3.5", "n_regionkey / 4.0",
              "cast(null as double)"]

INT_FNS = [
    "abs({a})", "({a}) + ({b})", "({a}) - ({b})", "({a}) * ({b})",
    "({a}) % nullif(({b}), 0)", "({a}) // nullif(({b}), 0)",
    "({a}) / ({b})", "({a}) % ({b})", "mod({a}, {b})", "fmod({a}, {b})",
    "greatest({a}, {b})", "least({a}, {b})", "gcd(abs({a}), abs({b}))",
    "lcm(abs({a}) % 13, abs({b}) % 13)", "bit_count(abs({a}))",
    "sign({a})", "length(cast({a} as varchar))",
    # batch-10 operators: binary ^ is POWER in DuckDB (Spark XOR — the
    # silent-wrong class batch 10 fixed), type-split //, postfix !
    "2 ^ (abs({a}) % 8)", "(abs({a}) % 5) ** 2",
    "(abs({f}) + 0.5) // nullif(({b}), 0)",
    "cast((abs({a}) % 10)! as bigint)",
    # round-8 precedence fixes: factorial binds the whole arithmetic
    # chain; unary minus binds tighter than power; //-over-division is
    # plain division
    "cast((2 * (abs({a}) % 3))! as bigint)",
    "cast((1 + abs({b}) % 4)! as bigint)",
    "cast(-2 ^ (abs({a}) % 4) as double)",
    "cast(-abs({b} % 5) ^ 2 as double)",
    "(({a}) / nullif(({b}), 0)) // 3",
    "sqrt(abs({a}) + 1) // 2",
    "json_object({a}, cast({b} as varchar))",
    # round-8 batch 13: function-catalog tail
    "constant_or_null({a}, nullif({b}, 0))",
    "to_binary(abs({a}) % 256)",
    "round(regr_avgx(cast(abs({a}) % 100 as decimal(4,1)), "
    "cast(abs({b}) % 100 as decimal(4,1))) over (), 6)",
]
STR_FNS = [
    "upper({s})", "lower({s})", "reverse({s})", "trim({s})",
    "concat({s}, {t})", "({s}) || ({t})", "left({s}, 3)", "right({s}, 2)",
    "substring({s}, 2, 3)", "replace({s}, 'l', 'L')", "md5({s})",
    "length({s})", "strpos({s}, 'l')", "repeat({s}, 2)",
    "split_part({s}, ',', 1)", "starts_with({s}, 'H')",
    "regexp_replace({s}, 'l', 'x')", "regexp_replace({s}, 'l', 'x', 'g')",
    "string_split({s}, ',')", "ascii({s})", "instr({s}, 'a')",
    "lpad({s}, 6, '.')", "rpad({s}, 6, '.')", "{s} glob 'H*'",
    "contains({s}, 'a')", "levenshtein({s}, 'hello')",
    # batch-10 match/prefix operators
    "({s}) ^@ 'H'", "({s}) ~~ 'H%'", "({s}) !~~ 'z%'",
    "({s}) ~ '[a-z]+'", "({s}) !~ '^zzz'",
    "len(string_split({s}, 'l'))", "array_slice({s}, 2, 4)",
]
FLT_FNS = [
    "round({f}, 1)", "floor({f})", "ceil({f})", "cast({f} as bigint)",
    "abs({f})", "({f}) + ({g})", "({f}) * ({g})", "sqrt(abs({f}))",
    "ln(abs({f}) + 1)", "exp(least({f}, 2.0))", "power(abs({f}), 2)",
    "greatest({f}, {g})", "trunc({f})", "sign({f})",
]
LIST_FNS = [
    "[{a}, {b}]", "list_sum([{a}, {b}])",
    # distinct order is engine-unspecified — compare sorted
    "list_sort(array_distinct([{a}, {b}, {a}]))",
    "list_transform([{a}, {b}], x -> x + 1)",
    "list_transform([{a}, {b}], (x, i) -> x * i)",
    "list_filter([{a}, {b}], x -> x > 0)", "[{a}, {b}][1]",
    "[{a}, {b}, {a}, {b}][1:4:2]", "list_contains([{a}, {b}], {a})",
    "len([{a}, {b}])",
    # round-10 batch 2
    "list_contains([{a}, null], {b})",
    "list_concat([{a}], [{b}, {a}])",
    "array_pop_back([{a}, {b}, {a}])",
    "array_pop_front([{a}, {b}])",
    "list_slice([{a}, {b}, {a}, {b}], 2, -1)",
    "list_slice([{a}, {b}, {a}], -2, 99)",
    "list_any_value([null, {a}, {b}])",
    "list_sort(list_intersect([{a}, {b}], [{b}]))",
    # round-10 batch 6: direction/null-order matrix (duck default is
    # NULLS LAST for BOTH directions — the silent class batch 6 fixed)
    "list_sort([{a}, null, {b}], 'ASC')",
    "list_sort([{a}, null, {b}], 'DESC')",
    "list_sort([{a}, null, {b}], 'ASC', 'NULLS FIRST')",
    "list_sort([{a}, null, {b}], 'DESC', 'NULLS FIRST')",
    "list_reverse_sort([{a}, null, {b}], 'NULLS LAST')",
    "generate_series({a} % 5, {b} % 7)",
    "range({a} % 5, {b} % 7)",
    "range({a} % 4, {b} % 9, 2)",
    "range({b} % 9, {a} % 4, -3)",
    # map/struct tail
    "map(['k1','k2'], [{a}, {b}])['k1']",
    "cardinality(map(['k'], [{a}]))",
    "element_at(map(['x'], [{b}]), 'x')",
    "struct_pack(p := {a}, q := {b}).q",
    "struct_insert({{'p': {a}}}, q := {b}).q",
]
# round-10 ENUM surface under random values: positional vs lexicographic
# rules (enums.py) — tags chosen so the two orders DISAGREE
ENUM_FNS = [
    "('b'::ENUM('c','b','a')) < ('a'::ENUM('c','b','a'))",
    "enum_code(cast((case when ({a}) % 3 = 0 then 'c' when ({a}) % 3 = 1 "
    "then 'b' else 'a' end) as ENUM('c','b','a')))",
    "(case when ({a}) % 2 = 0 then 'x' else 'y' end)::ENUM('y','x') "
    "between 'y'::ENUM('y','x') and 'x'::ENUM('y','x')",
    "enum_range_boundary(null, 'b'::ENUM('c','b','a'))",
    "try_cast(concat('v', cast(({a}) % 3 as varchar)) as ENUM('v0','v1'))",
    "union_extract(union_value(num := {a}), 'num')",
    "union_tag(union_value(tagged := {b}))",
]
DATE_FNS = [
    "date '1995-06-17' + interval ({a} % 30) day",
    "date_part('year', date '1995-06-17')",
    "datediff('day', date '1995-01-01', date '1995-06-17')",
    "strftime(date '1995-06-17', '%Y/%m/%d')",
    "last_day(date '1995-06-17')",
    "date_trunc('month', timestamp '1995-06-17 10:30:00')",
    "date_trunc('minute', timestamp '1995-06-17 10:30:45')",
    "extract(dow from date '1995-06-17')",
    "extract(epoch from timestamp '1995-06-17 10:30:00')",
    "timestamp '1995-06-17 10:30:00' - interval 90 minute",
    "strftime(timestamp '1995-06-17 10:30:45', '%H:%M')",
    "make_date(1995, ({a} % 12) + 1, 17)",
    "dayname(date '1995-06-17')", "monthname(date '1995-06-17')",
    # round-10 batch 2: time_bucket widths/offsets over a derived ts
    "time_bucket(interval 15 minute, timestamp '1995-06-17 10:30:00' + interval (abs({a}) % 300) minute)",
    "time_bucket(interval 2 hour, timestamp '1995-06-17 10:30:00' + interval (abs({a}) % 90) hour, interval 30 minute)",
    "time_bucket(interval 3 months, date '1995-06-17' + interval (abs({a}) % 400) day)",
    "time_bucket(interval 1 year, date '1995-06-17' + interval (abs({a}) % 900) day)",
]
CAST_FNS = [
    "cast({a} as varchar)", "cast({f} as varchar)",
    "try_cast({s} as int)", "try_cast({s} as double)",
    "cast(cast({a} as varchar) as int)",
    "cast({a} % 2 = 0 as varchar)", "cast({a} as boolean)",
    "cast('7' as int) + ({a})", "({a})::varchar || 'x'",
    "cast({f} as decimal(10,2))",
]
# round-9 version-drift batch: the BIT-operator/interval-render surface
# (probe_functions.py round-9 section) under random inputs
BIT_FNS = [
    "get_bit('01100101'::BIT, abs({a}) % 8)",
    "set_bit('01100101'::BIT, abs({a}) % 8, 1)::VARCHAR",
    "(bitstring('0101011', 8 + abs({a}) % 4) & bitstring('1100110', 8 + abs({a}) % 4))::VARCHAR",
    "('011010'::BIT | '010111'::BIT)::VARCHAR",
    "xor('011010'::BIT, '010111'::BIT)::VARCHAR",
    "(~('0110'::BIT))::VARCHAR",
    "('01101100'::BIT << abs({a}) % 10)::VARCHAR",
    "('01101100'::BIT >> abs({a}) % 10)::VARCHAR",
    "bit_count(bitstring('0101011', 8 + abs({a}) % 5))",
    "bit_length(set_bit('01100101'::BIT, abs({a}) % 8, 0))",
    "octet_length(bitstring('01', 4 + abs({a}) % 13))",
    "(interval 1 month * (abs({a}) % 40))::VARCHAR",
    # keep day-time units below a day per unit: Spark normalizes
    # hours>=24 into days where DuckDB keeps '25:00:00' (documented)
    "(interval 1 minute * (abs({a}) % 200))::VARCHAR",
    "(interval 1 day * (abs({a}) % 5) + interval 1 minute * (abs({a}) % 200))::VARCHAR",
    "1.0::DECIMAL(18,3) / (1 + abs({a}))",
    "round(0.5::DECIMAL(9,3) / (1 + abs({b})) + 1.25::DECIMAL(8,2) / (1 + abs({a})), 9)",
]
BOOL_FNS = [
    "({a}) > ({b}) and ({a}) < 10", "({a}) > ({b}) or ({b}) is null",
    "not (({a}) = ({b}))", "({a}) in (1, 3, 7)",
    "({a}) in (1, null)", "({a}) not in (1, 2)",
    "({a}) between ({b}) and 10", "nullif({a}, {b})",
    "ifnull({a}, {b})", "coalesce(cast(null as int), {a}, {b})",
    "({a}) is distinct from ({b})", "({a}) is not distinct from ({b})",
    "if(({a}) > 2, {s}, {t})", "case ({a}) % 3 when 0 then 'z' when 1 then 'o' end",
]


AGG_FNS = [
    # rendered as `select n_regionkey, <agg> group by n_regionkey`
    "sum({a})", "avg({a})", "min({a})", "max({a})", "count({a})",
    "count(*)", "count(distinct {a})", "sum({f})",
    "round(avg({f}), 6)", "round(stddev_samp({a}), 6)",
    "round(var_pop({a}), 6)", "median({a})", "bool_and({a} > 2)",
    "bool_or({a} > 2)", "bit_and(abs({a}) + 1)", "bit_or(abs({a}))",
    "sum({a}) filter (where {a} > 1)",
    # unique key: a tied arg-key picks scan-order in DuckDB — arbitrary
    # in any parallel engine, so only the unique-key form is testable
    "arg_min({a}, n_nationkey)", "arg_max({a}, n_nationkey)",
    "min({s})", "max({s})",
    "string_agg({s}, '|' order by n_nationkey)",
    "list_sort(list({a}))", "count(distinct {s})",
    # higher moments: large offsets hit catastrophic cancellation in
    # DUCKDB's accumulator (symmetric data reads as skew -1.7); bound
    # the shift so both engines stay in numerically-sane range
    "round(skewness(n_nationkey + least(abs({a}), 50)), 4)",
    "round(kurtosis(n_nationkey + least(abs({a}), 50)), 4)",
    "round(corr(n_nationkey, {a}), 6)", "round(covar_pop(n_nationkey, {a}), 6)",
    "approx_count_distinct({a})", "mode(least({a}, 2))",
    "round(entropy(least({a}, 3)), 6)", "product(least(abs({a}), 2) + 1)",
    "round(geomean(abs({a}) + 1), 6)", "mad({a})",
    "round(quantile_cont({a}, 0.5), 6)", "quantile_disc({a}, 0.5)",
    # round-10: BIT-carrier bitwise aggregates (constant width per
    # group) and merged-structure aggregate
    "bit_and(set_bit('01100101'::BIT, abs({a}) % 8, 0))::VARCHAR",
    "bit_or(bitstring(cast(abs({a}) % 2 as varchar), 8))::VARCHAR",
    "bit_xor(set_bit('0110'::BIT, abs({a}) % 4, 1))::VARCHAR",
    "json_group_structure(json_object('a', {a}, 'b', cast({b} as varchar)))",
]


WIN_FNS = [
    # all deterministic: unique order key (n_nationkey), explicit frames
    "row_number() over (order by n_nationkey)",
    "rank() over (order by n_regionkey, n_nationkey)",
    "dense_rank() over (order by n_regionkey)",
    "ntile(4) over (order by n_nationkey)",
    "round(percent_rank() over (order by n_nationkey), 6)",
    "round(cume_dist() over (order by n_regionkey), 6)",
    "lag({a}, 1) over (order by n_nationkey)",
    "lag({a}, 2, -1) over (order by n_nationkey)",
    "lead({a}, 1) over (partition by n_regionkey order by n_nationkey)",
    "first_value({a}) over (order by n_nationkey rows between 1 preceding and 1 following)",
    "last_value({a}) over (order by n_nationkey rows between current row and unbounded following)",
    "nth_value({a}, 2) over (order by n_nationkey rows between unbounded preceding and current row)",
    "sum({a}) over (partition by n_regionkey order by n_nationkey rows between 1 preceding and current row)",
    "count(*) over (order by n_nationkey range between 2 preceding and current row)",
    "avg(n_nationkey) over (order by n_nationkey rows between unbounded preceding and current row)",
    "max({a}) over (partition by n_regionkey)",
    "count(*) over (order by n_regionkey groups between 1 preceding and current row)",
    "sum({a}) over (order by n_nationkey rows between 1 following and 2 following)",
    # frame EXCLUDE (batch-11 rewrite; DuckDB 1.0 needs an explicit frame)
    "sum({a}) over (order by n_regionkey range between unbounded preceding and current row exclude group)",
    "sum({a}) over (order by n_regionkey range between unbounded preceding and current row exclude ties)",
    "count({a}) over (partition by n_regionkey order by n_nationkey range between unbounded preceding and current row exclude current row)",
    "round(avg({a}) over (order by n_regionkey range between 1 preceding and 1 following exclude group), 6)",
    # round-8 min/max EXCLUDE frame-split (DuckDB 1.0 value-checks the
    # ROWS and default-RANGE spellings; GROUPS mode predates 1.0's
    # parser so those stay in the pytest/hand suite)
    "min({a}) over (order by n_nationkey rows between 2 preceding and 2 following exclude current row)",
    "max({a}) over (order by n_nationkey rows between 1 preceding and current row exclude current row)",
    "min({a}) over (order by n_regionkey range between unbounded preceding and current row exclude group)",
    "max({a}) over (order by n_regionkey range between unbounded preceding and current row exclude ties)",
    "min({a}) over (order by n_regionkey range between unbounded preceding and unbounded following exclude group)",
    # round-9: count(DISTINCT) EXCLUDE (multiset-aware rewrite) and the
    # one-sided-frame no-op
    "count(distinct {a}) over (order by n_nationkey rows between 3 preceding and 3 following exclude current row)",
    "count(distinct {a}) over (order by n_regionkey range between unbounded preceding and current row exclude group)",
    "count(distinct {a}) over (order by n_regionkey range between unbounded preceding and current row exclude ties)",
    "sum({a}) over (order by n_nationkey rows between 3 preceding and 1 preceding exclude current row)",
    # other one-sided frames stay out: DuckDB 1.0 widens the frame one
    # row toward the current row whenever EXCLUDE is present (probe:
    # count over `4 preceding and 2 preceding` gains a row with EXCLUDE;
    # standard says the exclusion is a no-op there — the engine keeps
    # standard semantics, shim-tested). `N..1 preceding` is the one
    # spelling where 1.0's widening lands exactly on the row the
    # exclusion removes, so it alone is oracle-testable.
    # round-10: ROWS TIES/GROUP and numeric-RANGE peer exclusion joined
    # the rewrite (in-frame peer multiset)
    "sum({a}) over (order by n_regionkey rows between 1 preceding and current row exclude group)",
    "min({a}) over (order by n_regionkey range between 1 preceding and 1 following exclude group)",
    "max({a}) over (order by n_regionkey range between unbounded preceding and current row exclude current row)",
]

# round-10 version-drift batch: json path extensions (back-index,
# wildcards in DOCUMENT order, list-of-paths, 2-arg json_keys) and
# epoch(interval) under random inputs. Paths stay literal (the variant
# reader requires constant paths — documented); documents are dynamic.
JSON10_FNS = [
    "json_extract(concat('[', abs({a}) % 5, ',', abs({b}) % 9, ',7]'), '$[#-2]')",
    "json_extract(concat('[', abs({a}) % 5, ',', abs({b}) % 9, ']'), '$[#-1]')",
    "json_extract(concat('[', abs({a}) % 5, ']'), '$[#-3]')",
    "json_extract(json_object('z', {a}, 'a', {b}), '$.*')",
    "json_extract_string(json_object('q', {a}, 'b', cast({b} as varchar)), '$.*')",
    "json_extract(concat('{{\"a\":', abs({a}) % 9, ',\"b\":[1,', abs({b}) % 9, ']}}'), ['$.a', '$.b[#-1]'])",
    "json_extract(concat('{{\"z\":{{\"v\":', abs({a}) % 9, '}},\"a\":{{\"v\":', abs({b}) % 9, '}}}}'), '$.*.v')",
    "json_keys(json_object('k', {a}, 'a', {b}))",
    "json_keys(concat('{{\"a\":{{\"x\":', abs({a}) % 9, ',\"y\":2}}}}'), '$.a')",
    "json_extract_path(concat('{{\"a\":{{\"b\":', abs({a}) % 9, '}}}}'), 'a/b')",
    "epoch(interval 1 minute * (abs({a}) % 500))",
    "epoch(interval 1 second * (abs({b}) % 4000))",
    "epoch(interval 1 month * ({a} % 40))",
    "epoch(interval 1 day * ({b} % 9))",
]


def gen_agg(rng: random.Random) -> str:
    a = rng.choice(INT_LEAVES)
    b = rng.choice(INT_LEAVES)
    s = rng.choice(STR_LEAVES)
    f = rng.choice(FLT_LEAVES)
    return rng.choice(AGG_FNS).format(a=a, b=b, s=s, f=f)


def gen(rng: random.Random) -> str:
    fam = rng.choice(["int", "str", "flt", "list", "date", "cast", "bool",
                      "bit", "json10", "enum"])
    a, b = rng.choice(INT_LEAVES), rng.choice(INT_LEAVES)
    s, t = rng.choice(STR_LEAVES), rng.choice(STR_LEAVES)
    f, g = rng.choice(FLT_LEAVES), rng.choice(FLT_LEAVES)
    tpl = rng.choice({"int": INT_FNS, "str": STR_FNS, "flt": FLT_FNS,
                      "list": LIST_FNS, "date": DATE_FNS,
                      "cast": CAST_FNS, "bool": BOOL_FNS,
                      "bit": BIT_FNS, "json10": JSON10_FNS,
                      "enum": ENUM_FNS}[fam])
    expr = tpl.format(a=a, b=b, s=s, t=t, f=f, g=g)
    if rng.random() < 0.3:  # one level of nesting via coalesce/case
        expr = rng.choice([
            f"coalesce({expr}, {expr})",
            f"case when n_regionkey % 2 = 0 then {expr} else null end",
        ])
    return expr


def norm(v):
    import decimal
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    from duckdb_psql_spark.session import default_spark
    from duckdb_psql_spark.session import PsqlSession  # type: ignore

    spark = default_spark(app_name="fuzz-expressions", cpus=8)
    psql = PsqlSession(spark)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW nation AS SELECT * FROM '{SF}/nation.parquet'")
    rng = random.Random(SEED)
    fails, skips = [], 0
    for i in range(N):
        roll = rng.random()
        if roll < 0.2:  # grouped-aggregate family
            expr = gen_agg(rng)
            q = (f"select n_regionkey, {expr} as e "
                 f"from '{SF}/nation.parquet' group by n_regionkey "
                 f"order by n_regionkey")
            oq = (f"SELECT n_regionkey, {expr} AS e FROM nation "
                  f"GROUP BY n_regionkey ORDER BY n_regionkey")
        elif roll < 0.35:  # window family
            a = rng.choice(INT_LEAVES)
            expr = rng.choice(WIN_FNS).format(a=a)
            q = (f"select n_nationkey, {expr} as e "
                 f"from '{SF}/nation.parquet' order by n_nationkey")
            oq = (f"SELECT n_nationkey, {expr} AS e FROM nation "
                  f"ORDER BY n_nationkey")
        else:
            expr = gen(rng)
            q = (f"select n_nationkey, {expr} as e "
                 f"from '{SF}/nation.parquet' order by n_nationkey")
            oq = f"SELECT n_nationkey, {expr} AS e FROM nation ORDER BY n_nationkey"
        try:
            ours = [norm(r.e) for r in psql.sql(q).collect()]
            ours_err = None
        except Exception as ex:
            ours, ours_err = None, str(ex).splitlines()[0][:90]
        try:
            theirs = [norm(r[1]) for r in con.sql(oq).fetchall()]
            theirs_err = None
        except Exception as ex:
            theirs, theirs_err = None, str(ex).splitlines()[0][:90]
        if (ours is None) != (theirs is None):
            skips += 1
            if os.environ.get("FUZZ_SHOW_SKIPS"):
                who = "OURS" if ours is None else "DUCK"
                err = ours_err if ours is None else theirs_err
                print(f"SKIP ({who} errored): {expr}\n  {err}")
            continue
        if ours is None:
            skips += 1
            continue
        if ours != theirs:
            diff_i = next(
                (k for k, (x, y) in enumerate(zip(ours, theirs)) if x != y), 0
            )
            fails.append((expr, diff_i, ours[diff_i], theirs[diff_i]))
            print(f"MISMATCH: {expr}\n  row {diff_i}: ours={ours[diff_i]!r} "
                  f"duck={theirs[diff_i]!r}")
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{N} done ({len(fails)} mismatches, {skips} one-engine-errors)")
    print(f"RESULT: {N - len(fails) - skips} match, {len(fails)} mismatch, "
          f"{skips} one-engine-error/skip")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
