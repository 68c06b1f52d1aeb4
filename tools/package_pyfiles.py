"""Package the engine for `spark-submit --py-files` (the north rule's
cluster deployment path).

    python tools/package_pyfiles.py            # -> dist/pyfiles.zip
    spark-submit --master <cluster> --py-files dist/pyfiles.zip \\
        submit_job.py --source s3://.../transcripts --target s3://.../tiers \\
        -l 'role=assistant' -B 24h --tiers 1m,1h,1d

The zip contains only the package sources (no tests, no caches); the
session builder inherits `--master` from spark-submit, so the same code
runs local[N] in tests and N/4N executors on a cluster unchanged.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "prom_tsdb_copyer_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "pyfiles.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
