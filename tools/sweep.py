#!/usr/bin/env python3
"""Kill-proof sf10 value sweep (round-14 verdict task 2).

Usage: python3 tools/sweep.py <sfDir> <outDir> <logFile> [-Xmx48g] <query ...>

Runs graft.Verify in a subprocess with the queries IN THE GIVEN ORDER
(family-priority: changed operators first, then heaviest), watches its
stdout, and the moment a `[verify] done <name>` marker appears, oracle-checks
that one query in DuckDB and appends its PASS/FAIL line to <logFile> with an
immediate flush+fsync. A sweep killed by the round clock therefore keeps the
checked prefix on disk — the round-13 failure mode (alphabetical order, all
results checked at the end, zero rows recorded) cannot recur.

The log's first line records the start timestamp so the judge can verify the
sweep ran after the round's last source commit.
"""
import datetime
import json
import os
import subprocess
import sys
import time

import check_oracle


def main():
    sf_dir, out_dir, log_path = sys.argv[1], sys.argv[2], sys.argv[3]
    rest = sys.argv[4:]
    xmx = "-Xmx48g"
    if rest and rest[0].startswith("-Xmx"):
        xmx, rest = rest[0], rest[1:]
    queries = rest
    assert queries, "pass at least one query name"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    log = open(log_path, "a", buffering=1)

    def emit(line):
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()
        os.fsync(log.fileno())

    emit(f"# sweep start {datetime.datetime.now().isoformat()} sfDir={sf_dir} "
         f"queries={len(queries)} order={' '.join(queries)}")

    proc = subprocess.Popen(
        [os.path.join(repo, "tools", "runjava.sh"), xmx, "graft.Verify",
         sf_dir, out_dir] + queries,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, bufsize=1)

    con = None
    oracle = None
    n_pass = n_fail = n_error = 0
    checked = set()  # every requested query that reached a terminal outcome
    t0 = time.time()
    for raw in proc.stdout:
        line = raw.rstrip("\n")
        if line.startswith("[verify] done "):
            name = line.split()[2]
            checked.add(name)
            if oracle is None:
                oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
                con = check_oracle.connect(sf_dir)
            sql = oracle.get(name)
            if sql is None:
                emit(f"SKIP {name}: no oracle sql")
                continue
            tq = time.time()
            ok, report = check_one_safe(con, out_dir, name, sql)
            emit(f"{report}  [spark {line.split()[3]}, duckdb {time.time()-tq:.1f}s]")
            if ok:
                n_pass += 1
            else:
                n_fail += 1
        elif line.startswith("[verify] unknown query:"):
            # Verify swallows these (exit 0) — without counting them the
            # sweep would end "N pass, 0 fail" with queries never checked
            n_error += 1
            checked.add(line.split(":", 1)[1].strip())
            emit(f"ERROR {line}")
        elif line.startswith("[verify]") and " failed: " in line:
            n_error += 1
            checked.add(line.split()[1])
            emit(f"ERROR {line}")
        elif line.startswith("[verify]"):
            emit(line)
    proc.wait()
    # reconcile: a requested query with NO terminal marker (run killed, or a
    # marker line lost) is missing evidence, not a pass
    missing = [q for q in queries if q not in checked]
    if missing:
        emit(f"# sweep MISSING (never checked): {' '.join(missing)}")
    emit(f"# sweep end {datetime.datetime.now().isoformat()} "
         f"{n_pass} pass, {n_fail} fail, {n_error} error, "
         f"{len(missing)} missing, wall {time.time()-t0:.0f}s, "
         f"verify exit {proc.returncode}")
    sys.exit(1 if n_fail or n_error or missing or proc.returncode else 0)


def check_one_safe(con, out_dir, name, sql):
    try:
        return check_oracle.check_one(con, out_dir, name, sql)
    except Exception as e:  # a checker crash must not kill the sweep
        return False, f"FAIL {name}: CHECKER ERROR {e}"


if __name__ == "__main__":
    main()
