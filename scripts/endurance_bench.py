"""Scale-endurance run (VERDICT r4 item 2): push the FULL narrative
pipeline (ingest → tokenize → NER → unify → co-occur → triples)
through a 10×-larger deterministic corpus in one local[32] session and
put the 100 TB evidence on the record:

- sustained docs/sec + triples/sec at the bigger size,
- peak resident memory of the whole process tree (poll of
  /proc/*/status VmRSS, java + python workers),
- shuffle spill (memory + disk) summed over all stages from the Spark
  UI REST API (enabled just for this run),
- determinism: an order-independent checksum of the full triple table,
  which must be BIT-IDENTICAL on a second run in a fresh session.

Usage: python scripts/endurance_bench.py [--docs 1500000] [--cpus 32]
Appends a results block to BENCH/ENDURANCE.md.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time, urllib.request
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from renard_spark.session import get_spark
from renard_spark import corpus, pipeline

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2])
spark = get_spark(
    "endurance", cpus=cpus,
    extra_conf={{"spark.ui.enabled": "true",
                 "spark.ui.port": "4049"}},
)
# generate-on-the-fly: the corpus generator is itself a distributed
# stage (spark.range -> mapInPandas), so the run measures the whole
# production shape -- no pre-materialized parquet crutch
t0 = time.perf_counter()
docs = corpus.generate_documents(spark, n_docs, seed=13, partitions=256)
out = pipeline.character_graph_pipeline(docs, dist=(1, "sentences"))
trip = out["triples"]
agg = trip.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum(F.crc32(F.concat_ws(chr(31), "doc_id", "subj", "pred", "obj",
                              F.col("weight").cast("string")))).alias("ck"),
).collect()[0]
wall = time.perf_counter() - t0

spill_mem = spill_disk = shuffle_write = 0
try:
    apps = json.load(urllib.request.urlopen(
        "http://localhost:4049/api/v1/applications", timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"http://localhost:4049/api/v1/applications/{{app_id}}/stages",
        timeout=30))
    for s in stages:
        spill_mem += s.get("memoryBytesSpilled", 0)
        spill_disk += s.get("diskBytesSpilled", 0)
        shuffle_write += s.get("shuffleWriteBytes", 0)
except Exception as exc:  # UI scrape is best-effort evidence
    print("ui-scrape-failed:", exc, file=sys.stderr)

print(json.dumps({{
    "cpus": cpus, "docs": n_docs, "wall_sec": round(wall, 2),
    "docs_per_sec": round(n_docs / wall, 1),
    "triples": int(agg["n"]), "checksum": int(agg["ck"]),
    "triples_per_sec": round(agg["n"] / wall, 1),
    "spill_mem_bytes": int(spill_mem), "spill_disk_bytes": int(spill_disk),
    "shuffle_write_bytes": int(shuffle_write),
}}))
"""


def _poll_peak_rss(stop: threading.Event, out: dict) -> None:
    peak = 0
    while not stop.is_set():
        total = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read()
                if (b"endurance" not in cmd and b"pyspark" not in cmd
                        and b"spark" not in cmd):
                    continue
                with open(f"/proc/{pid}/status") as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            total += int(line.split()[1])  # kB
                            break
            except OSError:
                continue
        peak = max(peak, total)
        out["peak_rss_kb"] = peak
        time.sleep(5)


def run_once(docs: int, cpus: int) -> dict:
    stop = threading.Event()
    mem: dict = {"peak_rss_kb": 0}
    t = threading.Thread(target=_poll_peak_rss, args=(stop, mem),
                         daemon=True)
    t.start()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", WORKER.format(repo=REPO),
             str(cpus), str(docs)],
            capture_output=True, text=True, timeout=7200,
        )
    finally:
        stop.set()
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-4000:])
    line = [l for l in proc.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    r = json.loads(line)
    r["peak_rss_gb"] = round(mem["peak_rss_kb"] / 1024 / 1024, 2)
    return r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_500_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--runs", type=int, default=2,
                    help="2 = determinism re-run (checksums must match)")
    args = ap.parse_args()

    results = []
    for i in range(args.runs):
        r = run_once(args.docs, args.cpus)
        print(json.dumps(r))
        results.append(r)

    identical = len({(r["triples"], r["checksum"]) for r in results}) == 1
    stamp = dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds")
    md = os.path.join(REPO, "BENCH", "ENDURANCE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    new = not os.path.exists(md)
    with open(md, "a") as f:
        if new:
            f.write(
                "# Endurance runs — full narrative pipeline, one "
                "session, generate-on-the-fly corpus\n\n"
                "Columns: wall for the WHOLE pipeline including "
                "distributed corpus generation; checksum is the "
                "order-independent crc32-sum of every triple row "
                "(bit-identity across runs = determinism at scale); "
                "spill/shuffle from the Spark UI stage API; peak RSS "
                "is the polled process-tree max.\n\n"
                "| when (UTC) | docs | cpus | wall s | docs/s | "
                "triples | triples/s | checksum | spill mem | "
                "spill disk | shuffle write | peak RSS GB | "
                "loadavg | identical |\n|---|---|---|---|---|---|---|"
                "---|---|---|---|---|---|---|\n")
        for r in results:
            f.write(
                f"| {stamp} | {r['docs']} | {r['cpus']} | "
                f"{r['wall_sec']} | {r['docs_per_sec']} | "
                f"{r['triples']} | {r['triples_per_sec']} | "
                f"{r['checksum']} | {r['spill_mem_bytes']} | "
                f"{r['spill_disk_bytes']} | {r['shuffle_write_bytes']} | "
                f"{r['peak_rss_gb']} | {os.getloadavg()[0]:.1f} | "
                f"{identical} |\n")
    print(json.dumps({"identical_checksums": identical,
                      "runs": len(results)}))
    if not identical:
        sys.exit(1)


if __name__ == "__main__":
    main()
