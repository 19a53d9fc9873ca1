"""Full local correctness sweep -> CORRECTNESS_LOCAL_r{N}.json.

Runs tools/check_correctness.py over EVERY registered gate in
fresh-process chunks (one JVM per chunk — the bench.py discipline: a
single long session degrades late gates and a crash would lose the
whole sweep) and writes the round artifact the judge reads next to the
driver's own CORRECTNESS_r{N}.json.

    python tools/local_sweep.py 13            # -> CORRECTNESS_LOCAL_r13.json
    python tools/local_sweep.py 13 --chunk 40
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("round", type=int)
    ap.add_argument("--chunk", type=int, default=60)
    args = ap.parse_args()

    from mofka_spark import queries as q

    names = list(q.SPARK_QUERIES)
    results: dict[str, str] = {}
    t0 = time.time()
    for i in range(0, len(names), args.chunk):
        chunk = names[i : i + args.chunk]
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(_REPO, "tools", "check_correctness.py"),
                *chunk,
            ],
            capture_output=True,
            text=True,
            cwd=_REPO,
        )
        for line in proc.stdout.splitlines():
            m = re.match(r"(PASS|FAIL)\s+(\{.*\})$", line.strip())
            if not m:
                continue
            try:
                import ast

                d = ast.literal_eval(m.group(2))
            except (ValueError, SyntaxError):
                continue
            results[d["query"]] = d.get("status", "ERROR")
        done = len(results)
        print(
            f"# chunk {i // args.chunk}: {done}/{len(names)} gates, "
            f"{round(time.time() - t0, 1)}s elapsed",
            file=sys.stderr,
        )
        if proc.returncode not in (0, 1):
            print(proc.stderr[-1000:], file=sys.stderr)
    missing = [n for n in names if n not in results]
    for n in missing:
        results[n] = "ERROR: no result line"
    n_pass = sum(1 for v in results.values() if v in ("MATCH", "ROWS_ONLY"))
    out = {
        "round": args.round,
        "sweep": "full local check_correctness at sf0.01 "
        "(tools/local_sweep.py, fresh JVM per chunk)",
        "n_gates": len(names),
        "n_pass": n_pass,
        "n_fail": len(names) - n_pass,
        "queries": results,
    }
    path = os.path.join(_REPO, f"CORRECTNESS_LOCAL_r{args.round}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(f"wrote {path}: {n_pass}/{len(names)} pass")
    return 0 if n_pass == len(names) else 1


if __name__ == "__main__":
    raise SystemExit(main())
