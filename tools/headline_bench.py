"""One-level headline throughput measurement: the flagship near-dup job
at a single parallelism level (default local[8], 2M docs), reusing
tools/scaling_bench.py's corpus builder and fresh-subprocess worker so
the number is directly comparable to the scaling rows.

Usage: python tools/headline_bench.py [n_docs] [cpus] [runs] [job] [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    job = sys.argv[4] if len(sys.argv) > 4 else "neardup"
    out = sys.argv[5] if len(sys.argv) > 5 else os.path.join(
        REPO, f"bench_headline_{job}_{n}_local{cpus}.json")

    import tools.scaling_bench as sb
    assert job in sb.JOBS, f"unknown job {job!r}"
    data_root = f"/tmp/scaling_data_headline_{job}_{n}"
    sb._DATA_ROOT = data_root
    sb.CORPUS = os.path.join(data_root, "corpus")
    sb.WARMUP = os.path.join(data_root, "warmup")
    if not os.path.exists(os.path.join(sb.CORPUS, "_SUCCESS")):
        print(f"generating corpus n={n} -> {sb.CORPUS}")
        sb.build_input(n)

    env = dict(os.environ, SCALING_DATA_DIR=data_root)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_bench.py"),
         "--worker", str(cpus), str(runs), job],
        capture_output=True, text=True, env=env, cwd=REPO)
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(
            f"worker local[{cpus}] produced no result (stderr above)")
    res = json.loads(lines[-1])
    res.update(job=job, n_docs=n, runs_per_level=runs,
               docs_per_sec=round(n / res["seconds"], 1))
    with open(out, "w") as fh:
        json.dump(res, fh, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
