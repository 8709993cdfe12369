"""Driver-blind-spot rotation (r11 verdict task #7).

The driver's correctness gate provably resamples the same 50 queries
every round (r9-r11 keys identical), so registry IDs outside that set
are only ever checked by the builder's own sweeps. This tool names a
DETERMINISTIC rotating slice of the never-driver-sampled IDs — seeded
by a round label, so every round covers a different slice and any two
people computing the slice for the same label agree — for
`tools/check.py` to verify. The verify skill runs it each round and
logs the slice in SWEEPS.md.

Usage:
  python tools/blindspot.py r12            # print the 15-name slice
  python tools/blindspot.py r12 --n 20     # wider slice
  python tools/blindspot.py r12 --all      # every never-sampled ID
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def blind_ids() -> list[str]:
    from etl_aws_spark.registry import all_queries
    from etl_aws_spark.suite._coverage import LAST_DRIVER_ROUND

    return sorted(set(all_queries()) - set(LAST_DRIVER_ROUND))


def slice_for(label: str, n: int) -> list[str]:
    ids = blind_ids()
    ids.sort(key=lambda q: hashlib.md5(f"{label}:{q}".encode()).hexdigest())
    return sorted(ids[:n])


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    label = args[0] if args else "r0"
    if "--all" in sys.argv:
        names = blind_ids()
    else:
        n = 15
        if "--n" in sys.argv:
            n = int(sys.argv[sys.argv.index("--n") + 1])
        names = slice_for(label, n)
    print(f"# blind-spot slice label={label} ({len(names)} of {len(blind_ids())} never-driver-sampled)")
    print(" ".join(names))


if __name__ == "__main__":
    main()
