"""Migration job — the ``apply pending migrations`` analog of the
reference's SQLManager migration scan (sqlmanager.py:169-264), as an
explicit spark-submit job over a crawl state directory:

    python jobs/migrate.py --state /path/to/run/state            # upgrade
    python jobs/migrate.py --state ... --rollback-to 1           # Down
    python jobs/migrate.py --state ... --dry-run                 # pending?
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whakoom_webscrapper_spark import catalog, migrations
from whakoom_webscrapper_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True, help="crawl state directory")
    ap.add_argument("--target", type=int, default=None)
    ap.add_argument("--rollback-to", type=int, default=None)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    current = catalog.read_version(args.state) or 1
    if args.dry_run:
        pend = migrations.pending_migrations(args.state, args.target)
        print(json.dumps({
            "current": current,
            "pending": [
                {"version": m.version, "description": m.description} for m in pend
            ],
        }))
        return

    spark = get_spark("migrate", master=args.master)
    if args.rollback_to is not None:
        versions = migrations.rollback(spark, args.state, args.rollback_to)
        action = "rolled_back"
    else:
        versions = migrations.migrate(spark, args.state, args.target)
        action = "applied"
    print(json.dumps({
        "action": action,
        "versions": versions,
        "now_at": catalog.read_version(args.state),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
