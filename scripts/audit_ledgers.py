"""Run-vs-ledger reconciliation (VERDICT r4 item 8 / weak #6).

Every TPU run directory under ``cases/*/runs/*`` must either appear (by
path) in a committed artifact ledger (any .json under ``cases/`` or
``artifacts/``) or be explicitly discarded in
``artifacts/round5/discarded_runs.json``. Prints orphans and exits 1 when
any exist, so the campaign can gate on it.

Usage: python scripts/audit_ledgers.py [--write-report]
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DISCARDS = "artifacts/round5/discarded_runs.json"
REPORT = "artifacts/round5/ledger_audit.json"


def main():
    runs = sorted(
        d for d in glob.glob("cases/*/runs/*") if os.path.isdir(d)
    )
    ledgers = [
        p for p in glob.glob("cases/**/*.json", recursive=True)
        + glob.glob("artifacts/**/*.json", recursive=True)
        if "/runs/" not in p  # a run's own metrics don't vouch for it
    ]
    blob = ""
    for p in ledgers:
        try:
            blob += open(p).read()
        except OSError:
            pass

    discarded = {}
    if os.path.isfile(DISCARDS):
        discarded = json.load(open(DISCARDS))

    rows = []
    for run in runs:
        status = (
            "ledgered" if run in blob
            else "discarded" if run in discarded
            else "ORPHAN"
        )
        rows.append({"run": run, "status": status,
                     **({"reason": discarded[run]} if run in discarded else {})})

    orphans = [r for r in rows if r["status"] == "ORPHAN"]
    print(f"{len(runs)} runs, {len(runs) - len(orphans) - len([r for r in rows if r['status']=='discarded'])} "
          f"ledgered, {len([r for r in rows if r['status']=='discarded'])} discarded, "
          f"{len(orphans)} ORPHANS")
    for r in orphans:
        print(f"  ORPHAN: {r['run']}")

    if "--write-report" in sys.argv:
        os.makedirs(os.path.dirname(REPORT), exist_ok=True)
        with open(REPORT, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"-> {REPORT}")

    sys.exit(1 if orphans else 0)


if __name__ == "__main__":
    main()
