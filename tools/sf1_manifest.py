"""SF1_MANIFEST.json — the per-query ledger of sf1 oracle-parity evidence.

VERDICT r10 #5: SWEEPS.md proves a zero-mismatch full-registry sf1 pass
happened, but "which IDs have sf1 evidence RIGHT NOW" lived in /tmp logs
that do not survive the box. This tool makes the never-sf1-verified set
permanently enumerable from a checked-in artifact:

  SF1_MANIFEST.json = { query_id: {"status": ..., "run": ..., "log": ...} }

status values:
  "exact"       — tools/check.py OK at sf1 (rowcount + schema + value hash)
  "rows_only"   — ROWS-ONLY query (no oracle by design), rows checked at sf1
  "infeasible"  — sf1 parity cannot run ON THIS BOX for harness reasons
                  (documented in SWEEPS.md); the "note" field says why

Commands (run from the repo root):
  python tools/sf1_manifest.py ingest <check_log> --run <label>
      Parse a tools/check.py log and stamp every green row. A re-ingest
      of the same ID overwrites its stamp (latest evidence wins).
  python tools/sf1_manifest.py status
      Diff the manifest against the LIVE registry. Prints counts and the
      exact never-sf1-verified ID list; exit code 1 if any unverified
      (excluding "infeasible") remain — the verify skill consumes this.
  python tools/sf1_manifest.py mark <id> --status infeasible --note "..."
      Record a documented exception.

Round-workflow rule (mirrors SWEEPS.md): any NEW query, and any query
whose Spark body or oracle SQL changes, must be re-run at sf1 and
re-ingested before round end; `status` is the enforcement point.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "SF1_MANIFEST.json")

# tools/check.py green rows: "✓ <id>  OK  <wall>s" / "✓ <id>  ROWS-ONLY ..."
GREEN = re.compile(r"✓ ([a-z0-9_]+)\s+(OK|ROWS-ONLY)")
RED = re.compile(r"✗ ([a-z0-9_]+)")


def load() -> dict:
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            return json.load(f)
    return {}


def save(m: dict) -> None:
    with open(MANIFEST, "w") as f:
        json.dump(dict(sorted(m.items())), f, indent=1, sort_keys=True)
        f.write("\n")


def ingest(path: str, run: str) -> None:
    text = open(path, encoding="utf-8", errors="replace").read()
    m = load()
    n_ok = n_rows = 0
    for qid, status in GREEN.findall(text):
        m[qid] = {
            "status": "exact" if status == "OK" else "rows_only",
            "run": run,
            "log": os.path.basename(path),
        }
        n_ok += status == "OK"
        n_rows += status != "OK"
    reds = RED.findall(text)
    save(m)
    print(f"ingested {n_ok} exact + {n_rows} rows-only from {path} as run={run!r}")
    if reds:
        print(f"WARNING: {len(reds)} RED rows NOT stamped: {sorted(set(reds))}")


def mark(qid: str, status: str, run: str, note: str) -> None:
    m = load()
    m[qid] = {"status": status, "run": run, "note": note}
    save(m)
    print(f"marked {qid}: {status} ({note})")


def status() -> int:
    sys.path.insert(0, REPO)
    from etl_aws_spark import registry

    ids = set(registry.all_queries().keys())
    m = load()
    stale = sorted(set(m) - ids)
    verified = {q for q in ids if q in m and m[q]["status"] in ("exact", "rows_only")}
    infeasible = {q for q in ids if q in m and m[q]["status"] == "infeasible"}
    never = sorted(ids - verified - infeasible)
    print(f"registry: {len(ids)}  sf1-verified: {len(verified)} "
          f"(exact {sum(1 for q in verified if m[q]['status'] == 'exact')}, "
          f"rows-only {sum(1 for q in verified if m[q]['status'] == 'rows_only')})  "
          f"infeasible-documented: {len(infeasible)}  never-verified: {len(never)}")
    for q in sorted(infeasible):
        print(f"  INFEASIBLE {q}: {m[q].get('note', '')}")
    for q in never:
        print(f"  NEVER {q}")
    if stale:
        print(f"  stale manifest entries (not in registry): {stale}")
    return 1 if never else 0


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("ingest")
    p.add_argument("log")
    p.add_argument("--run", required=True)
    p = sub.add_parser("mark")
    p.add_argument("id")
    p.add_argument("--status", required=True,
                   choices=["exact", "rows_only", "infeasible"])
    p.add_argument("--run", default="manual")
    p.add_argument("--note", default="")
    sub.add_parser("status")
    a = ap.parse_args()
    if a.cmd == "ingest":
        ingest(a.log, a.run)
    elif a.cmd == "mark":
        mark(a.id, a.status, a.run, a.note)
    else:
        sys.exit(status())


if __name__ == "__main__":
    main()
