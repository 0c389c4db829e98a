#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
  python3 tools/check.py /root/testdata/sf0.01 /tmp/graft_verify [query ...]

For each query in oracle_sql.json: run the SQL in DuckDB against views
over the sf parquet tables, load the Spark parquet result, sort columns
by name and rows by value, compare cell-by-cell.
"""
import sys, os, json, glob, re, tempfile
import duckdb

# The replica oracle build every local certification is pinned to.
# Round 11 lesson: all five driver-red queries passed BYTE-LEVEL
# against the local replica — a version string in each artifact is
# the only way to tell "our bug" from "their build". Certifying
# against an unpinned duckdb is meaningless; fail LOUDLY instead of
# silently blessing whatever is installed (VERDICT r11 item 5).
_PINNED_DUCKDB = "1.0.0"

# Parquet round-trippable types only. Anything outside this list (most
# notably HUGEINT, which DuckDB's SUM(BIGINT) returns and which the
# parquet writer degrades to DOUBLE) silently changes representation
# between the Python client and the driver's parquet/arrow hasher —
# exactly the q81 round-4 desync. Flag it loudly instead.
_TYPE_OK = re.compile(
    r"^(BOOLEAN|TINYINT|SMALLINT|INTEGER|BIGINT|FLOAT|DOUBLE|VARCHAR"
    r"|DATE|TIME|TIMESTAMP(?: WITH TIME ZONE)?"
    r"|DECIMAL\(\d+,\d+\)"
    r"|(?:BOOLEAN|TINYINT|SMALLINT|INTEGER|BIGINT|FLOAT|DOUBLE|VARCHAR)\[\])$")

def sort_key_cell(x):
    # floats sort by a rounded representation so near-equal values
    # (within cells_equal tolerance) land in the same position on
    # both sides; everything else sorts by its string form
    if isinstance(x, float):
        return (x is None, f"{x:.9e}")
    return (x is None, str(x))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple(sort_key_cell(x) for x in t))
    return [cols[i] for i in order], out

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b))
    # timestamps, decimals, ints, strings, lists
    return str(a) == str(b)

def main():
    if duckdb.__version__ != _PINNED_DUCKDB and \
            not os.environ.get("GRAFT_ALLOW_DUCKDB_DRIFT"):
        print(f"ABORT: local duckdb {duckdb.__version__} != pinned replica "
              f"{_PINNED_DUCKDB} — a local pass against an unpinned oracle "
              f"build certifies nothing (round-11 lesson). Set "
              f"GRAFT_ALLOW_DUCKDB_DRIFT=1 to probe other builds explicitly.")
        sys.exit(2)
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            # type gate: the driver hashes what parquet can represent;
            # refuse oracle SQL whose declared types leave that set
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
            bad_types = [(c, t) for c, t, *_ in desc if not _TYPE_OK.match(t)]
            if bad_types:
                print(f"FAIL {name}: oracle type(s) not parquet-stable: "
                      f"{bad_types} — CAST them (HUGEINT degrades to DOUBLE "
                      f"in the driver's materialization)")
                n_fail += 1
                continue
            # materialize through parquet — the SAME path the driver
            # hashes — so client-side type sugar can't mask a mismatch
            with tempfile.TemporaryDirectory() as td:
                opq = os.path.join(td, "oracle.parquet")
                con.execute(
                    f"COPY ({sql}) TO '{opq}' (FORMAT PARQUET)")
                res = con.execute(
                    f"SELECT * FROM read_parquet('{opq}')")
                dk_cols = [d[0] for d in res.description]
                dk_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        res2 = con.execute(
            "SELECT * FROM read_parquet(" + json.dumps(files) + ")")
        sp_cols = [d[0] for d in res2.description]
        sp_rows = res2.fetchall()
        dk_cols_s, dk = canon(dk_rows, dk_cols)
        sp_cols_s, sp = canon(sp_rows, sp_cols)
        if dk_cols_s != sp_cols_s:
            print(f"FAIL {name}: columns differ spark={sp_cols_s} duckdb={dk_cols_s}")
            n_fail += 1
            continue
        if len(dk) != len(sp):
            print(f"FAIL {name}: rowcount spark={len(sp)} duckdb={len(dk)}")
            n_fail += 1
            continue
        bad = None
        for i, (r1, r2) in enumerate(zip(sp, dk)):
            for j, (a, b) in enumerate(zip(r1, r2)):
                if not cells_equal(a, b):
                    bad = (i, dk_cols_s[j], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail == (duckdb {duckdb.__version__})")
    # stamp the replica's oracle engine version beside Verify's
    # env.json — round 10's local-vs-driver split was undiagnosable
    # from artifacts because neither side recorded what it ran
    env_path = f"{outdir}/env.json"
    try:
        env = json.load(open(env_path)) if os.path.exists(env_path) else {}
        env["duckdb_replica"] = duckdb.__version__
        json.dump(env, open(env_path, "w"), indent=1)
    except Exception as e:
        print(f"(env.json stamp skipped: {e})")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
