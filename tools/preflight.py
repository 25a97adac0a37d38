#!/usr/bin/env python3
"""Type-sensitive oracle preflight (VERDICT r4 ask #2).

Reproduces the driver's CORRECTNESS check semantics — rows + SCHEMA TYPES +
values — over every SparkEntry oracle row, so a DuckDB-side type bug (e.g.
``sum(BIGINT)`` silently widening to HUGEINT) is caught BEFORE the round-end
artifact instead of shipping as a red hash row.

Round-4 post-mortem: the builder's old check used
``assert_frame_equal(check_dtype=False)``, which is value-based; the driver's
hash is typed, so ``web_pagerank``/``doc_corpus_mix`` shipped red with
bit-identical values. This tool closes that gap three ways:

1. **Arrow-schema compare**: the Spark parquet's Arrow types vs the DuckDB
   result's Arrow types, with only the equivalences the driver's reader
   cannot distinguish allowed (string/large_string, timestamp unit,
   non-null/nullable). DuckDB HUGEINT surfaces as decimal128(38,0) — an
   instant TYPE_MISMATCH against Spark's int64.
2. **Exact value compare** on column-name-sorted, row-sorted frames
   (check_exact=True, so IEEE doubles must be bit-identical, matching the
   driver's hash-of-values).
3. **Oracle-SQL lint**: DESCRIBE each oracle and flag any HUGEINT /
   UHUGEINT / DECIMAL output column (DuckDB integer-sum widening) unless the
   Spark side is decimal too.

Usage:
  python3 tools/preflight.py [SF_DIR] [VERIFY_OUT] [name1,name2,...]
Defaults: /root/testdata/sf0.01 /tmp/verify_out (all queries found in
VERIFY_OUT). Exit code 0 = all green, 1 = any mismatch.

Driver-side-only deps (duckdb, pyarrow, pandas) — this is a dev/preflight
tool, not part of the Scala library.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_type(t: pa.DataType) -> str:
    """Collapse Arrow types to the equivalence classes the driver's typed
    read cannot distinguish; everything else must match exactly.

    Calibrated against CORRECTNESS_r04: integer WIDTH differences
    (int8/int32/int64) were green at the driver (pandas widens them all to
    int64 before hashing), while int64 vs HUGEINT/decimal128 flipped the
    hash. So widths collapse; int-vs-decimal does not."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"  # unit/tz differences are reader artifacts
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_type(t.key_type)},{canon_type(t.item_type)}>"
    return str(t)


def sorted_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    by = [c for c in df.columns
          if not isinstance(df[c].iloc[0] if len(df) else None, (list, dict))
          and df[c].dtype != object or
          (len(df) and isinstance(df[c].iloc[0], (str, bytes, int, float,
                                                  type(None))))]
    sort_cols = [c for c in df.columns if c in by]
    if sort_cols:
        df = df.sort_values(by=sort_cols, kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    names = sorted(n for n in oracle
                   if os.path.isdir(os.path.join(out, n))
                   and (only is None or n in only))
    skipped = sorted(n for n in os.listdir(out)
                     if os.path.isdir(os.path.join(out, n))
                     and n not in oracle and (only is None or n in only))

    n_fail = 0
    for name in names:
        sql = oracle[name]
        problems = []
        try:
            files = sorted(glob.glob(os.path.join(out, name, "*.parquet")))
            spark_tbl = pa.concat_tables([pq.read_table(f) for f in files]) \
                if files else pq.read_table(os.path.join(out, name))
            duck_tbl = con.sql(sql).arrow()
            if isinstance(duck_tbl, pa.RecordBatchReader):
                duck_tbl = duck_tbl.read_all()

            # 1) typed schema compare (column-name order, driver-style)
            s_types = {f.name: canon_type(f.type) for f in spark_tbl.schema}
            d_types = {f.name: canon_type(f.type) for f in duck_tbl.schema}
            if sorted(s_types) != sorted(d_types):
                problems.append(
                    f"COLUMN_SET spark={sorted(s_types)} duck={sorted(d_types)}")
            else:
                for c in sorted(s_types):
                    if s_types[c] != d_types[c]:
                        problems.append(
                            f"TYPE_MISMATCH {c}: spark={s_types[c]} "
                            f"duck={d_types[c]}")

            # 3) lint: DuckDB integer-sum widening in the oracle result
            for f in duck_tbl.schema:
                if pa.types.is_decimal(f.type):
                    sp = spark_tbl.schema.field(f.name).type \
                        if f.name in spark_tbl.schema.names else None
                    if sp is None or not pa.types.is_decimal(sp):
                        problems.append(
                            f"LINT_HUGEINT {f.name}: oracle emits {f.type} "
                            f"(un-cast integer aggregate?) vs spark {sp}")

            # 2) exact value compare
            if len(spark_tbl) != len(duck_tbl):
                problems.append(
                    f"ROWS spark={len(spark_tbl)} duck={len(duck_tbl)}")
            elif not problems:
                s = sorted_frame(spark_tbl.to_pandas())
                d = sorted_frame(duck_tbl.to_pandas())
                try:
                    pd.testing.assert_frame_equal(
                        s, d, check_dtype=False, check_exact=True)
                except AssertionError as e:
                    problems.append(
                        "VALUES " + " | ".join(str(e).splitlines()[:3]))
        except Exception as e:  # noqa: BLE001 — report, keep scanning
            problems.append(f"ERROR {type(e).__name__}: {e}")

        if problems:
            n_fail += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name} rows={len(spark_tbl)}")

    for name in skipped:
        print(f"--   {name} (no oracle — rows-only at the driver)")
    print(f"\n{len(names) - n_fail}/{len(names)} oracle rows green, "
          f"{n_fail} failing, {len(skipped)} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
