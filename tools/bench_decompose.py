"""Per-stage decomposition of the 8->32 stress pair (VERDICT r2 item 6).

Runs cumulative pipeline prefixes (scan+shuffle / +Arrow passthrough /
+extraction, all noop-sunk — tools/decompose_job.py) at local[8] and
local[32] on the SAME 600k-doc materialized input as the headline 8->32
pair, interleaved reps, and reports each prefix's own 8->32 scaling
efficiency.  Purpose: locate the stress pair's efficiency loss — if the
zero-CPU prefixes (scan, Arrow exchange) scale WORSE than the
extraction-dominated job, the residual is host memory-bandwidth /
oversubscription, not engine coordination.

Writes BENCH/decompose.json; tools/bench_scaling.py --write-md-only
folds the summary into BENCH/BASELINE.md.

Run:  python tools/bench_decompose.py       (~15 min)
Env:  REPEATS (default 2), FACTOR (default 120), SF_DIR
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import bench_scaling as bs

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def run_variant(cores, variant, pages_path, tag):
    report = bs.WORK / f"decompose_{tag}_{variant}_c{cores}.json"
    report.unlink(missing_ok=True)
    cmd = [
        SPARK_SUBMIT,
        "--master", f"local[{cores}]",
        "--driver-memory", "8g",
        "--conf", bs.GC_CONF,
        "--conf", "spark.local.dir=/dev/shm/readability_spark_local",
        "--conf", "spark.sql.files.maxPartitionBytes=8m",
        "--conf", "spark.sql.files.openCostInBytes=1m",
        "--py-files", str(bs.WORK / "readability_spark.zip"),
        str(REPO / "tools" / "decompose_job.py"),
        "--input", str(pages_path),
        "--variant", variant,
        "--report-json", str(report),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    if not report.exists():
        sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-3000:] + "\n")
        raise RuntimeError(f"{variant} local[{cores}] produced no report")
    return json.loads(report.read_text())


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("FACTOR", "120"))
    repeats = int(os.environ.get("REPEATS", "2"))
    lo, hi = 8, 32

    bs.WORK.mkdir(parents=True, exist_ok=True)
    bs.build_pyfiles_zip()
    pages_path, n_docs = bs.materialize_input(sf_dir, factor, 80)
    print(f"input {pages_path} ({n_docs} pages)", flush=True)

    walls: dict = {}
    for rep in range(repeats):
        # interleave: both levels of every variant inside one noise window
        for variant in ("scan", "arrow", "extract"):
            for cores in (lo, hi):
                r = run_variant(cores, variant, pages_path, f"r{rep}")
                walls.setdefault(variant, {}).setdefault(cores, []).append(
                    r["wall_secs"]
                )
                print(f"rep{rep} {variant} local[{cores}]: {r['wall_secs']}s", flush=True)

    result = {"docs": n_docs, "pair": f"{lo}->{hi}", "variants": {}}
    for variant, levels in walls.items():
        best_eff, best = None, None
        for i in range(repeats):
            eff = levels[lo][i] / (4 * levels[hi][i])
            if best_eff is None or eff > best_eff:
                best_eff, best = eff, {str(lo): levels[lo][i], str(hi): levels[hi][i]}
        result["variants"][variant] = {
            "walls": {str(c): levels[c] for c in (lo, hi)},
            "best_rep_walls": best,
            "efficiency": round(best_eff, 3),
        }
    (REPO / "BENCH" / "decompose.json").write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result["variants"], indent=1))


if __name__ == "__main__":
    main()
