"""Round-start bookkeeping helper: diff the driver's CORRECTNESS_r*.json
records against registry.CERTIFIED and print the names to append (and
the RECERTIFY entries whose re-verification landed and can be cleared).

Usage: python tools/certify.py
Paste the printed block into registry.CERTIFIED; the companion test
(tests/test_registry.py::test_driver_rows_on_disk_are_certified) fails
until the lists agree.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_to_parquet_spark import registry  # noqa: E402


def main() -> None:
    registry.load_all()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    to_add: dict[str, list[str]] = {}
    landed_recert: set[str] = set()
    paths = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    for path in paths:
        with open(path) as f:
            rows = json.load(f)
        rnd = os.path.basename(path)
        for name, r in rows.items():
            if name not in registry.QUERIES:
                continue
            accepted = (r.get("hash_match") is True) or (
                r.get("err") == "no_oracle"
                and r.get("spark_rows") is not None
                and r.get("spark_rows") >= 0
            )
            if not accepted:
                continue
            # A RECERTIFY entry only counts as landed if the row is
            # from the NEWEST round — an older row predates the code
            # change that queued the re-verification.
            if name in registry.RECERTIFY and path == paths[-1]:
                landed_recert.add(name)
            if name not in registry.CERTIFIED:
                to_add.setdefault(rnd, []).append(name)
    if not to_add and not landed_recert:
        print("CERTIFIED and RECERTIFY are up to date.")
        return
    # Gate (exit 1) ONLY on uncertified accepted rows — the same
    # condition tests/test_registry.py's guard enforces. Landed
    # RECERTIFY entries print as an ADVISORY: an entry queued
    # MID-round legitimately coexists with a row from before its code
    # change (it awaits the NEXT driver window), and only the operator
    # knows when it was queued — gating on it would turn every
    # mid-round re-verification queue into a red `make closeout`.
    exit_code = 1 if to_add else 0
    for rnd, names in to_add.items():
        print(f"# {rnd}: {len(names)} accepted rows to certify")
        for i in range(0, len(names), 3):
            print("    " + " ".join(f'"{n}",' for n in sorted(names)[i : i + 3]))
    if landed_recert:
        print(
            "# RECERTIFY entries with a row in the newest CORRECTNESS file —\n"
            "# clear ONLY those queued BEFORE that round ran (entries queued\n"
            "# after it, mid-round, still await their driver row):"
        )
        for n in sorted(landed_recert):
            print(f"#   {n}")
    sys.exit(exit_code)


if __name__ == "__main__":
    main()
