"""spark-submit entrypoint for the maintenance job — the north rule's
deployment shape:

    spark-submit --master <cluster> --py-files octocode_spark.zip \\
        tools/submit_maintenance.py --root /path/to/table \\
        [--cluster-by zorder|hilbert|none] [--ledger DIR] [--expire-now]

Runs full table maintenance (bin-pack compaction + clustered rewrite +
manifest rewrite + snapshot expiry + orphan GC) against the LakeTable at
--root and prints ONE JSON line of metrics (partitions, files, bytes, rows,
per-phase seconds, snapshot ids) to stdout. The package reaches executors
via --py-files; when launched without it (plain `python`), the script
falls back to sys.path + addPyFile so behavior is identical.

Build the zip:  python tools/submit_maintenance.py --make-zip /tmp/ocs.zip
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zipfile


def make_zip(dest: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "octocode_spark")
    with zipfile.ZipFile(dest, "w") as zf:
        for dirpath, _dirs, names in os.walk(pkg):
            for name in sorted(names):
                if name.endswith(".py"):
                    full = os.path.join(dirpath, name)
                    zf.write(full, os.path.relpath(full, repo))
    return dest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", help="LakeTable root directory")
    ap.add_argument("--cluster-by", default="zorder", choices=["zorder", "hilbert", "none"])
    ap.add_argument("--ledger", default=None, help="checkpoint ledger dir (resume)")
    ap.add_argument("--retain-last", type=int, default=3)
    ap.add_argument("--expire-now", action="store_true",
                    help="expire with an immediate cutoff instead of the reader-safe age floor")
    ap.add_argument("--make-zip", default=None, help="write the --py-files zip and exit")
    args = ap.parse_args()

    if args.make_zip:
        print(make_zip(args.make_zip))
        return
    if not args.root:
        ap.error("--root is required")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:  # plain-python fallback; under spark-submit
        sys.path.insert(0, repo)  # --py-files already provides the package

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("octocode-maintenance").getOrCreate()
    # plain-python launches (no --py-files) must still ship the package to
    # executor workers; addPyFile is idempotent, so doing it unconditionally
    # also covers launch modes where --py-files reached only the driver
    import tempfile

    # unique per invocation: a fixed shared-temp path lets two concurrent
    # jobs (or users) race on the same zip — a torn file could be shipped.
    # The file must OUTLIVE addPyFile: executors fetch lazily at first task
    # and re-verify against the source path, so cleanup waits for exit.
    import atexit

    fd, zpath = tempfile.mkstemp(prefix="octocode_spark_submit_", suffix=".zip")
    os.close(fd)
    atexit.register(lambda: os.path.exists(zpath) and os.unlink(zpath))
    make_zip(zpath)
    spark.sparkContext.addPyFile(zpath)
    from octocode_spark.lakehouse import LakeTable, Ledger
    from octocode_spark.lakehouse.maintenance import full_maintenance

    t0 = time.monotonic()
    table = LakeTable.load(args.root)
    ledger = Ledger(args.ledger) if args.ledger else None
    out = full_maintenance(
        spark,
        table,
        ledger=ledger,
        cluster_by=None if args.cluster_by == "none" else args.cluster_by,
        retain_last=args.retain_last,
        expire_older_than_ms=(int(time.time() * 1000) + 60_000) if args.expire_now else None,
    )
    rw = out["rewrite"]
    print(json.dumps({
        "root": args.root,
        "partitions_done": len(rw.partitions_done),
        "partitions_skipped": len(rw.partitions_skipped),
        "files_in": rw.files_in,
        "files_out": rw.files_out,
        "bytes_in": rw.bytes_in,
        "rows": rw.rows,
        "phases": dict(rw.phases),
        "snapshots": rw.snapshots,
        "expired_snapshots": out.get("expired_snapshots"),
        "expired_files_removed": out.get("expired_files_removed"),
        "orphans_removed": out.get("orphans_removed"),
        "seconds": round(time.monotonic() - t0, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
