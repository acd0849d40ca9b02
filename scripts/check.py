#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results on the same tables.

Usage: python3 scripts/check.py [sf_dir] [verify_out_dir]
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def fresh_connection():
    """One connection PER ORACLE QUERY on grown layouts: a long-lived
    in-memory connection accumulates buffer-pool state across heavy
    oracles until tiny allocations fail ("Failed to allocate block of
    16384 bytes" with 100+ GB of free RAM — observed deterministically
    after ~60 100x-gate queries, independent of memory_limit, threads,
    and temp_directory settings). The views are lazy read_parquet
    wrappers, so reconnecting costs nothing.
    """
    import os
    con = duckdb.connect()
    if os.environ.get("GRAFT_DUCKDB_MEMORY"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEMORY']}'")
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    # an in-memory duckdb cannot SPILL without a temp_directory: grown
    # layouts (10x/100x) hit per-query Out of Memory errors on oracles
    # whose intermediates exceed the buffer pool
    spill = os.environ.get("GRAFT_DUCKDB_TEMP", "/tmp/graft_duckdb_spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        # driver layouts are single files; probe layouts (ScaleGrowthProbe
        # grown dirs) are Spark output DIRECTORIES of part files
        path = f"{SF}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def main():
    import os
    # progress goes to stderr unbuffered so a crash mid-run still leaves
    # a trail (stdout keeps the exact PASS/FAIL format the driver parses)
    def progress(msg):
        print(msg, file=sys.stderr, flush=True)
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    ok, bad = [], []
    import glob

    # Verify records crashed queries in _failed.json (round-7 lesson:
    # a stderr-only failure can silently vanish from the driver's gate) —
    # surface every entry as a hard FAIL here
    failed_path = f"{OUT}/_failed.json"
    if os.path.exists(failed_path):
        for name, msg in sorted(json.load(open(failed_path)).items()):
            bad.append((name, f"VERIFY CRASH: {msg}"))

    def load_spark_output(path_glob):
        # read the Spark side with pyarrow→pandas, NOT duckdb: that is
        # the driver's reader, and the two disagree on INT96/ns
        # timestamps (pyarrow wraps year-9999 sentinels at the int64
        # nanos boundary; duckdb reads them fine — a divergence this
        # gate must reproduce, not paper over)
        parts = sorted(glob.glob(path_glob))
        got = pd.concat([pd.read_parquet(p) for p in parts],
                        ignore_index=True)
        tz_aware = []
        for c in got.columns:
            # Spark stamps isAdjustedToUTC → pyarrow yields tz-aware;
            # the session timezone is UTC, so dropping the tz is exact.
            # Record which columns were tz-aware: an LTZ column only
            # reads back tz-aware when outputTimestampType was switched
            # off INT96 — the exact shape that hash-failed 18 driver
            # queries in round 5 (INT96 reads back naive ns; NTZ naive us).
            if isinstance(got[c].dtype, pd.DatetimeTZDtype):
                tz_aware.append(c)
                got[c] = got[c].dt.tz_convert("UTC").dt.tz_localize(None)
            elif got[c].dtype == object and len(got) and isinstance(
                    got[c].dropna().iloc[0] if got[c].notna().any() else None,
                    __import__("datetime").date):
                # parquet date32 → python date objects; the oracle df
                # yields datetime64 — the driver compares these equal
                # (q63 date_taken passed round 4), so align here too.
                # Dates beyond the ns range (year-9999 sentinels) can't
                # convert — leave as objects; the want side is aligned to
                # date objects at compare time instead
                try:
                    got[c] = pd.to_datetime(got[c])
                except (ValueError, OverflowError, pd.errors.OutOfBoundsDatetime):
                    pass
        got.attrs["tz_aware"] = tz_aware
        return got

    only = set(filter(None,
        os.environ.get("GRAFT_CHECK_ONLY", "").split(",")))
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    for name, sql in sorted(oracles.items()):
        try:
            got = load_spark_output(f"{OUT}/{name}/*.parquet")
            con = fresh_connection()
            try:
                want = con.execute(sql).df()
            finally:
                con.close()
            for c in want.columns:
                # align want→date objects where got kept out-of-range dates
                # (guard on membership: a missing column should surface as
                # the columns-differ diagnostic below, not a KeyError here)
                if (c in got.columns and got[c].dtype == object
                        and want[c].dtype.kind == "M"
                        and got[c].notna().any() and isinstance(
                            got[c].dropna().iloc[0], __import__("datetime").date)):
                    want[c] = want[c].dt.date
        except Exception as e:
            bad.append((name, f"load/oracle error: {e}"))
            progress(f"[check] FAIL {name} (load/oracle error: {str(e)[:200]})")
            # the spark-side frame may have loaded before the oracle
            # failed — release it before the next query's oracle runs
            try:
                del got
            except NameError:
                pass
            import gc
            gc.collect()
            continue
        import gc
        if sorted(got.columns) != sorted(want.columns):
            bad.append((name, f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}"))
            progress(f"[check] FAIL {name} (columns differ)")
            del got, want
            gc.collect()
            continue
        g, w = canon(got), canon(want)
        if len(g) != len(w):
            bad.append((name, f"row count: spark={len(g)} oracle={len(w)}"))
            progress(f"[check] FAIL {name} (row count)")
            del got, want, g, w
            gc.collect()
            continue
        mism = []
        for c in g.columns:
            gv, wv = g[c], w[c]
            # the driver hashes the dtype itself: ANY numeric dtype inequality
            # (int32 vs int64, int64 vs uint64, float vs int) is a fail even
            # when every value compares equal
            if gv.dtype != wv.dtype and {gv.dtype.kind, wv.dtype.kind} <= {"i", "u", "f", "b"}:
                mism.append(f"{c}: DTYPE spark={gv.dtype} oracle={wv.dtype} (driver hash-fails on this)")
                continue
            if gv.dtype.kind == "M" and wv.dtype.kind == "M":
                # Empirical driver contract (CORRECTNESS r01-r04 green vs
                # r05 red): LTZ timestamps must be written INT96 (read
                # back NAIVE ns); a tz-aware column means
                # outputTimestampType was switched, which hash-failed 18
                # driver queries in round 5. Naive us (TIMESTAMP_NTZ
                # pass-through) passed the driver in every round. Unify
                # resolution only for the local value compare.
                if c in got.attrs.get("tz_aware", []):
                    mism.append(f"{c}: spark column is tz-aware (LTZ written non-INT96; driver hash-fails on this)")
                    continue
                if gv.dtype != wv.dtype:
                    try:
                        wv = wv.astype(gv.dtype)
                    except (ValueError, OverflowError,
                            pd.errors.OutOfBoundsDatetime):
                        mism.append(f"{c}: oracle timestamps exceed spark resolution range "
                                    "(year-9999 sentinel? clamp it in the query)")
                        continue
            if gv.dtype.kind == "f" or wv.dtype.kind == "f":
                eq = np.isclose(gv.astype(float), wv.astype(float),
                                rtol=0, atol=0, equal_nan=True)
                exact = eq
                close = np.isclose(gv.astype(float), wv.astype(float),
                                   rtol=1e-9, atol=1e-12, equal_nan=True)
                if not exact.all():
                    n_exact = int((~exact).sum())
                    n_close = int((~close).sum())
                    mism.append(f"{c}: {n_exact} inexact ({n_close} beyond 1e-9)")
                else:
                    # bit-level: the driver hashes raw float bits, so -0.0
                    # vs 0.0 (sign-of-zero) is a fail despite value equality
                    ga = gv.astype(float).to_numpy()
                    wa = wv.astype(float).to_numpy()
                    zmask = (ga == 0.0) & (wa == 0.0)
                    sgn = np.signbit(ga) != np.signbit(wa)
                    nz = int((zmask & sgn).sum())
                    if nz:
                        mism.append(f"{c}: {nz} sign-of-zero diffs (-0.0 vs 0.0; driver hash-fails)")
            else:
                # vectorized equality first: the object-array spelling
                # materializes one Python object per cell — on a 105M-row
                # grown-gate column that is tens of GB of RSS the process
                # never returns to the OS, and every LATER query's DuckDB
                # then fails tiny allocations (the run-5 OOM cascade)
                try:
                    eqm = (gv.eq(wv) | (gv.isna() & wv.isna())).to_numpy()
                    neq_idx = np.flatnonzero(~eqm)
                    if len(neq_idx):
                        i = int(neq_idx[0])
                        mism.append(f"{c}: {len(neq_idx)} diffs, first@{i}: "
                                    f"spark={gv.iloc[i]!r} oracle={wv.iloc[i]!r}")
                except (TypeError, ValueError):
                    gv2 = gv.astype(object).where(pd.notna(gv), None)
                    wv2 = wv.astype(object).where(pd.notna(wv), None)
                    neq = [i for i, (a, b) in enumerate(zip(gv2, wv2)) if a != b]
                    if neq:
                        i = neq[0]
                        mism.append(f"{c}: {len(neq)} diffs, first@{i}: spark={gv2[i]!r} oracle={wv2[i]!r}")
        if mism:
            bad.append((name, "; ".join(mism)))
            progress(f"[check] FAIL {name}")
        else:
            ok.append((name, len(g)))
            progress(f"[check] pass {name} ({len(g)} rows)")
        # big grown-gate frames: release before the next query's load so
        # peak RSS is one query's frames, not two
        del got, want, g, w
        import gc
        gc.collect()
    # rows-only queries (no oracle): compare against committed golden
    # outputs when one exists for this scale factor (run-to-run
    # determinism gate), else report row counts only
    golden_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "golden", os.path.basename(SF.rstrip("/")))
    declared = set()
    for p in glob.glob(f"{OUT}/*/"):
        declared.add(os.path.basename(p.rstrip("/")))
    if only:
        declared &= only
    # a golden-pinned query whose output never materialized is a FAILURE,
    # not a silent absence
    for gp in glob.glob(os.path.join(golden_dir, "*.parquet")):
        gname = os.path.basename(gp)[:-len(".parquet")]
        if only and gname not in only:
            continue
        if gname not in declared and gname not in oracles:
            bad.append((gname, "golden-pinned query produced no output directory"))
    rows_only = declared - set(oracles)
    for name in sorted(rows_only):
        gpath = os.path.join(golden_dir, f"{name}.parquet")
        try:
            # same driver-faithful pyarrow reader as the oracle path —
            # both sides here are Spark-written parquet
            got = load_spark_output(f"{OUT}/{name}/*.parquet")
        except Exception as e:
            if os.path.exists(gpath):
                bad.append((name, f"golden-pinned output unreadable: {e}"))
                rows_only.discard(name)
            else:
                print(f"ROWS-ONLY {name}: ERROR {e}")
            continue
        if not os.path.exists(gpath):
            print(f"ROWS-ONLY {name}: {len(got)} rows" +
                  ("  ** EMPTY **" if len(got) == 0 else ""))
            continue
        want = load_spark_output(gpath)
        rows_only.discard(name)
        if sorted(got.columns) != sorted(want.columns):
            bad.append((name, f"golden columns differ: spark={sorted(got.columns)} golden={sorted(want.columns)}"))
            continue
        g, w = canon(got), canon(want)
        if len(g) != len(w):
            bad.append((name, f"golden row count: spark={len(g)} golden={len(w)}"))
            continue
        diffs = []
        for c in g.columns:
            gv, wv = g[c], w[c]
            if gv.dtype != wv.dtype:
                diffs.append(f"{c}: DTYPE spark={gv.dtype} golden={wv.dtype}")
                continue
            if gv.dtype.kind == "f":
                eq = np.isclose(gv.astype(float), wv.astype(float),
                                rtol=0, atol=0, equal_nan=True)
                if not eq.all():
                    diffs.append(f"{c}: {int((~eq).sum())} value diffs vs golden")
            else:
                gv2 = gv.astype(object).where(pd.notna(gv), None)
                wv2 = wv.astype(object).where(pd.notna(wv), None)
                neq = sum(1 for a, b in zip(gv2, wv2) if a != b)
                if neq:
                    diffs.append(f"{c}: {neq} value diffs vs golden")
        if diffs:
            bad.append((name, "golden mismatch: " + "; ".join(diffs)))
        else:
            ok.append((name, len(g)))
            print(f"GOLDEN {name}: matches committed output ({len(g)} rows)")
    for name, n in ok:
        print(f"PASS {name} ({n} rows)")
    for name, msg in bad:
        print(f"FAIL {name}: {msg}")
    print(f"\n{len(ok)} pass / {len(bad)} fail / {len(rows_only)} rows-only")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
