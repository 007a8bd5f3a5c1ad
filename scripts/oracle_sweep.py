#!/usr/bin/env python
"""Chunked full-registry oracle sweep — the NOTES_r7 §38/§39 protocol
as one command (VERDICT r7 #5), so large-scale cross-engine parity
verification survives builder turnover.

Why chunked fresh processes: a single shared Spark+DuckDB process
running the whole registry at sf1+ dies of mmap/thread exhaustion
(NOTES_r6 §13: DuckDB's ~256 KB buffer blocks each cost a glibc mmap;
vm.max_map_count is 65530 here, so the process dies with a spurious
16 KB "Out of Memory" while RAM is free) regardless of memory caps.
The protocol that completes reliably at every scale up to sf10:

- run the registry in chunks of 20 oracles, each chunk a FRESH child
  process with a bounded Spark driver (6 GB / local[8] by default) and
  the 8 GB-capped DuckDB connection from tests/oracle_harness;
- any chunk failure whose message smells like the spurious DuckDB
  small-block OOM (or a child that died wholesale) is re-run in
  ISOLATION (one oracle, fresh process); pass-in-isolation = spurious,
  recorded as such, NOT a parity failure;
- a failure that reproduces in isolation is REAL and fails the sweep —
  that is how the 2^53 decimal→double divergence was caught at sf1
  (NOTES_r7 §39).

DuckDB views: /root/testdata tables are single parquet FILES;
scripts/make_sfN.py output under .localdata stores tables as parquet
DIRECTORIES, which DuckDB needs globbed as ``<t>.parquet/*.parquet``
— handled here by an isdir probe.

Chunk ordering (r8 §17 lesson): one heavy oracle can consume a whole
chunk's timeout and starve its cheap chunk-mates into synthetic FAILs.
With ``--order-file`` (a JSON {name: seconds} from any prior sweep's
``--results-out``), oracles run CHEAPEST-FIRST and every oracle whose
recorded time lands in the slowest decile (or above ``--whale-sec``)
gets a SOLO chunk at the end — a whale can now only time itself out.

Usage:
  python scripts/oracle_sweep.py [SF_DIR]             # default sf0.01
  python scripts/oracle_sweep.py .localdata/sf1 --chunk 20 --mem 6g \
      --threads 8 [--only q_a,q_b] [--exclude q_c] \
      [--order-file timings.json] [--results-out sweep.jsonl]

Env knobs (whale-taming, r10/r11):
  SWEEP_MAX_RESULT   spark.driver.maxResultSize for children (dflt 8g)
  SWEEP_DUCK_MEM     DuckDB memory_limit per child (dflt 8GB)
  SWEEP_DUCK_THREADS cap DuckDB threads (pthread-TLS exhaustion)
  SWEEP_DUCK_NO_ORDER=1  preserve_insertion_order=false — heavy explode
                     oracles stream instead of buffering in order
                     (sound: the compare is order-insensitive)
  SWEEP_AGG_COMPARE  comma-separated names compared ENGINE-SIDE via
                     (count, canonical row-checksum) — for outputs too
                     large to materialize (oracle_harness.compare_agg);
                     recorded as "mode": "agg" in results rows

Exit 0 iff every oracle hash-matches (spurious-OOM retries allowed);
prints one JSON summary line last.  ``--results-out`` appends one JSON
line per oracle AS RESULTS ARRIVE, so a killed sweep loses nothing.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_OOM_MARKERS = (
    "Out of Memory",
    "OutOfMemory",
    "bad_alloc",
    "std::bad_alloc",
    # a dead Spark JVM mid-chunk surfaces as a refused/te-down py4j
    # gateway on every subsequent oracle in the chunk — same
    # retry-in-isolation shape as the DuckDB mmap OOM (r8 s4: chunk 8
    # lost its JVM under box contention and five green-able oracles
    # were recorded as hard FAILs)
    "ConnectionRefused",
    "Connection refused",
    "Py4JNetworkError",
    "Java gateway process",
    # DuckDB spill-disk exhaustion / cross-process spill-dir races are
    # box conditions, not parity failures (r9: a leaked 15 GB temp dir
    # from a crashed child plus two concurrent spilling whales ENOSPC'd
    # the box; a sibling process cleaning up yanked spill files out
    # from under a child before per-pid temp dirs landed)
    "No space left on device",
    "Could not remove file",
    "Could not write file",
)


def _sweep_stale_tempdirs(base: str = ".tmp") -> None:
    """Remove per-pid DuckDB spill dirs (``.tmp/duck_<pid>``) whose
    owner is dead — a crashed child never cleans its own, and leaked
    spills (15 GB+ per whale) eventually ENOSPC the box."""
    import shutil

    try:
        entries = os.listdir(base)
    except OSError:
        return
    for name in entries:
        if not name.startswith("duck_"):
            continue
        pid_s = name[5:]
        if not pid_s.isdigit():
            continue
        try:
            os.kill(int(pid_s), 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)
        except PermissionError:
            pass  # pid exists under another uid: leave it


def _duckdb_views(sf_dir: str, duck_mem: str = "8GB"):
    """oracle_harness.duckdb_conn, with directory-table globbing for
    make_sfN.py output. ``duck_mem`` raises the buffer-pool cap for the
    few genuinely memory-hungry oracles at sf10 (recursive-CTE closures)
    — keep the default for full sweeps: the 8 GB cap is what keeps
    mmap-block count under vm.max_map_count (NOTES_r6 §13)."""
    import duckdb

    from sec_financial_data_pipeline_using_snowflake_dbt_spark.workload.common import (
        TABLES,
    )

    _sweep_stale_tempdirs()
    con = duckdb.connect()
    con.execute(f"SET memory_limit = '{duck_mem}'")
    # thread-stack mmaps count against vm.max_map_count alongside the
    # buffer blocks; heavy oracles at default threads=32 can abort with
    # pthread EAGAIN ('Resource temporarily unavailable') — cap is
    # env-overridable for retries
    threads = os.environ.get("SWEEP_DUCK_THREADS")
    if threads:
        con.execute(f"SET threads = {int(threads)}")
    # insertion-order preservation forces DuckDB to buffer whole
    # pipeline outputs in order; the sweep compares order-insensitively,
    # so heavy explode oracles (the q_bpe_encode_ids sf1 TLS-exhaustion
    # bound, NOTES_r10 §9a) can drop it to stream instead of buffer
    if os.environ.get("SWEEP_DUCK_NO_ORDER") == "1":
        con.execute("SET preserve_insertion_order = false")
    # Per-process spill dir: DuckDB's default CWD-relative `.tmp` uses
    # non-unique spill file names, so two concurrent children (or a
    # sweep overlapping a pytest/verify run) corrupt each other's
    # spills and die rc=-6/-11 — the r9 q_dedup_recall/keep_best FAILs.
    # Pre-create the full path: DuckDB's own creation is not recursive,
    # and a missing `.tmp` kills the first SPILLING query with
    # "Failed to create directory" (r12 sf10 sweep).
    os.makedirs(f".tmp/duck_{os.getpid()}", exist_ok=True)
    con.execute(f"SET temp_directory = '.tmp/duck_{os.getpid()}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _describe_exc(exc: Exception, max_len: int = 4000) -> str:
    """Full diagnostic string for a child-side failure.

    ``repr()`` of a Py4JJavaError loses the Java cause entirely — r9
    banked three 40-minute q_dedup_jaccard deaths as the useless
    ``Py4JJavaError('... calling o198.getResult', JavaObject id=o199)``
    (VERDICT r9 What's wrong #1).  Pull the JVM exception's toString()
    plus its top stack frames (and chained causes) when present; fall
    back to repr for plain Python exceptions."""
    parts = [repr(exc)]
    jexc = getattr(exc, "java_exception", None)
    depth = 0
    while jexc is not None and depth < 4:
        try:
            parts.append(("caused by: " if depth else "java: ") + jexc.toString())
            frames = jexc.getStackTrace()
            parts.extend(f"  at {frames[i].toString()}" for i in range(min(8, len(frames))))
            jexc = jexc.getCause()
        except Exception:  # noqa: BLE001 — gateway may be dead; keep what we have
            break
        depth += 1
    return "\n".join(parts)[:max_len]


def _run_chunk(names: list[str], sf_dir: str, mem: str, threads: int) -> None:
    """Child entrypoint: run the named oracles in THIS process, print
    one JSON line per oracle."""
    from sec_financial_data_pipeline_using_snowflake_dbt_spark.session import (
        get_spark,
    )
    from sec_financial_data_pipeline_using_snowflake_dbt_spark.workload import (
        ORACLES,
        QUERIES,
    )
    from tests.oracle_harness import compare

    spark = get_spark(
        cpus=threads,
        extra_conf={
            "spark.driver.memory": mem,
            # cross-engine compare must MATERIALIZE both result sets;
            # at sf10 an output-huge oracle (q_dedup_jaccard: >1 GiB of
            # >=0.8 pairs) dies on the 1g default long after the query
            # itself succeeded (the r9 undiagnosed whale, root-caused in
            # r10 once the harness recorded real Java stacks)
            "spark.driver.maxResultSize": os.environ.get(
                "SWEEP_MAX_RESULT", "8g"
            ),
        },
    )
    con = _duckdb_views(sf_dir, duck_mem=os.environ.get("SWEEP_DUCK_MEM", "8GB"))
    # names whose output is too large to materialize for the full sorted
    # compare: both engines reduce to (count, canonical row-checksum)
    # engine-side instead — see oracle_harness.compare_agg (r11; the
    # q_dedup_embedding sf10 whale emits ~9e8 rows and the collect is
    # what killed the r10 JVM, not the join)
    agg_names = set(filter(None, os.environ.get("SWEEP_AGG_COMPARE", "").split(",")))
    for name in names:
        t0 = time.time()
        try:
            if name in agg_names:
                from tests.oracle_harness import compare_agg

                problems = compare_agg(
                    QUERIES[name](spark, sf_dir), con, ORACLES[name], name
                )
                rec = {
                    "name": name, "ok": not problems,
                    "problems": problems, "mode": "agg",
                }
            else:
                problems = compare(
                    QUERIES[name](spark, sf_dir),
                    con.execute(ORACLES[name]).df(),
                    name,
                )
                rec = {"name": name, "ok": not problems, "problems": problems}
        except Exception as exc:  # noqa: BLE001 — report, don't die mid-chunk
            rec = {
                "name": name,
                "ok": False,
                "problems": [f"{name}: {_describe_exc(exc)}"],
            }
        rec["sec"] = round(time.time() - t0, 3)
        print("@@RESULT " + json.dumps(rec), flush=True)


#: failure texts that mean the Spark JVM itself died (gateway gone) —
#: the r10 blind spot: ``_describe_exc`` captures live-JVM Java stacks,
#: but a DEAD JVM surfaces as a *Python* ConnectionRefusedError that
#: routes around it, banking zero diagnostic bits (VERDICT r10 #1)
_JVM_DEAD_MARKERS = (
    "ConnectionRefused",
    "Connection refused",
    "Py4JNetworkError",
    "Java gateway process",
    "child died",
)


def _attach_jvm_death_evidence(rec: dict, stderr: str, since: float) -> None:
    """On a dead-JVM failure, bank the child's stderr tail plus any
    JVM fatal-error log (``hs_err_pid*.log``) written since the chunk
    started — the bits r10's q_dedup_embedding death never captured."""
    import glob

    text = " ".join(rec.get("problems") or [])
    if rec.get("ok") or not any(m in text for m in _JVM_DEAD_MARKERS):
        return
    ev: list[str] = []
    tail = "\n".join(stderr.splitlines()[-100:])[-4000:]
    if tail.strip():
        ev.append("child stderr tail:\n" + tail)
    for f in sorted(glob.glob(os.path.join(REPO, "hs_err_pid*.log"))):
        try:
            if os.path.getmtime(f) >= since:
                with open(f, errors="replace") as fh:
                    ev.append(f"{os.path.basename(f)} head:\n" + fh.read(3000))
        except OSError:
            continue
    if ev:
        rec["jvm_death_evidence"] = ev


def _spawn(names: list[str], args) -> dict[str, dict]:
    """Parent side: run one chunk in a fresh process, parse its results.
    A child that dies wholesale yields synthetic not-ok records."""
    chunk_t0 = time.time()
    cmd = [
        sys.executable, os.path.abspath(__file__), args.sf_dir,
        "--child", ",".join(names),
        "--mem", args.mem, "--threads", str(args.threads),
    ]
    env = dict(os.environ, SWEEP_DUCK_MEM=args.duck_mem)
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO,
            timeout=args.timeout, check=False, env=env,
        )
        stdout, stderr, rc = proc.stdout, proc.stderr, proc.returncode
    except subprocess.TimeoutExpired as exc:
        # a hung/slow chunk must not kill the sweep: keep whatever the
        # child printed before the kill, mark the rest timed-out
        stdout = (exc.stdout or b"").decode() if isinstance(exc.stdout, bytes) else (exc.stdout or "")
        stderr = f"chunk timeout after {args.timeout}s"
        rc = -1
    out: dict[str, dict] = {}
    for line in stdout.splitlines():
        if line.startswith("@@RESULT "):
            rec = json.loads(line[len("@@RESULT "):])
            out[rec["name"]] = rec
    tail = (stdout + stderr)[-800:]
    for name in names:
        if name not in out:
            out[name] = {
                "name": name, "ok": False, "sec": None,
                "problems": [f"{name}: child died rc={rc}: {tail}"],
            }
    # stream per-oracle outcomes as chunks finish — a later crash must
    # not lose completed results (r8: a chunk timeout ate chunk 1's)
    for name in names:
        _attach_jvm_death_evidence(out[name], stderr, chunk_t0)
        r = out[name]
        took = f" ({r['sec']}s)" if r["sec"] is not None else ""
        print(f"[sweep]   {name}: {'ok' if r['ok'] else 'FAIL'}{took}", flush=True)
        if args.results_out:
            with open(args.results_out, "a") as fh:
                fh.write(json.dumps(r) + "\n")
    return out


def _plan_chunks(names: list[str], args) -> list[list[str]]:
    """Group oracles into chunks. Default: insertion-order slices of
    --chunk. With --order-file: cheapest-first slices, whales solo last."""
    if not args.order_file:
        return [names[i : i + args.chunk] for i in range(0, len(names), args.chunk)]
    with open(args.order_file) as fh:
        text = fh.read()
    try:
        raw = json.loads(text)
    except json.JSONDecodeError:
        # a --results-out JSONL file (one record per line): last row wins
        raw = {}
        for line in text.splitlines():
            line = line.strip()
            if line:
                rec = json.loads(line)
                raw[rec["name"]] = rec.get("sec") or 0.0
    # accept either {name: sec} or a dict of result records
    times = {n: (v if isinstance(v, (int, float)) else v.get("sec") or 0.0)
             for n, v in raw.items()}
    default_t = max(times.values(), default=1.0)  # unknown = assume whale
    ordered = sorted(names, key=lambda n: (times.get(n, default_t), n))
    known = sorted(t for n, t in times.items() if n in names)
    decile = known[int(len(known) * 0.9)] if known else float("inf")
    cut = min(args.whale_sec, decile) if known else args.whale_sec
    light = [n for n in ordered if times.get(n, default_t) < cut]
    whales = [n for n in ordered if n not in light]
    chunks = [light[i : i + args.chunk] for i in range(0, len(light), args.chunk)]
    chunks.extend([w] for w in whales)
    return chunks


def _is_spurious_candidate(rec: dict) -> bool:
    text = " ".join(rec.get("problems") or [])
    return any(m in text for m in _OOM_MARKERS) or "child died" in text


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--mem", default="6g")
    ap.add_argument("--duck-mem", default="8GB", help="DuckDB memory_limit per child")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--only", default=None, help="comma-separated oracle names")
    ap.add_argument("--exclude", default=None, help="comma-separated oracle names")
    ap.add_argument("--timeout", type=int, default=3600, help="per-chunk seconds")
    ap.add_argument(
        "--order-file", default=None,
        help="JSON {name: seconds} from a prior sweep; enables cheapest-first "
        "chunking with solo whale chunks",
    )
    ap.add_argument(
        "--whale-sec", type=float, default=120.0,
        help="order-file times at/above this always get a solo chunk",
    )
    ap.add_argument(
        "--results-out", default=None,
        help="append one JSON line per oracle as results stream in",
    )
    ap.add_argument("--child", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        _run_chunk(args.child.split(","), args.sf_dir, args.mem, args.threads)
        return 0

    from sec_financial_data_pipeline_using_snowflake_dbt_spark.workload import (
        ORACLES,
    )

    names = sorted(ORACLES)
    if args.only:
        names = [n for n in args.only.split(",") if n]
        unknown = [n for n in names if n not in ORACLES]
        if unknown:
            print(f"unknown oracle names: {unknown}", file=sys.stderr)
            return 2
    if args.exclude:
        drop = set(args.exclude.split(","))
        names = [n for n in names if n not in drop]
    t0 = time.time()
    results: dict[str, dict] = {}
    chunks = _plan_chunks(names, args)
    for ci, chunk in enumerate(chunks):
        print(
            f"[sweep] chunk {ci + 1}/{len(chunks)}: {chunk[0]}..{chunk[-1]} "
            f"({len(chunk)} oracles)",
            flush=True,
        )
        results.update(_spawn(chunk, args))

    # spurious-OOM protocol: every OOM-shaped failure re-runs isolated
    retried: list[str] = []
    for name, rec in sorted(results.items()):
        if not rec["ok"] and _is_spurious_candidate(rec):
            print(f"[sweep] retrying {name} in isolation (OOM-shaped)", flush=True)
            solo = _spawn([name], args)[name]
            if solo["ok"]:
                solo["spurious_oom_retry_pass"] = True
                retried.append(name)
            results[name] = solo

    failures = {n: r for n, r in results.items() if not r["ok"]}
    for n, r in sorted(failures.items()):
        for p in r["problems"]:
            print(f"[FAIL] {p[:400]}", file=sys.stderr)
    summary = {
        "sf_dir": args.sf_dir,
        "n_oracles": len(names),
        "n_green": len(names) - len(failures),
        "spurious_oom_retries": retried,
        "failures": sorted(failures),
        "wall_sec": round(time.time() - t0, 1),
    }
    print(json.dumps(summary))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
