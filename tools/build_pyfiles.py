"""Build the --py-files artifact for spark-submit (north rule: "the job
ships via spark-submit --py-files to multi-executor clusters").

Produces dist/dedup_engine.zip containing the package, importable by
executors, plus a job entrypoint usable as:

    spark-submit --py-files dist/dedup_engine.zip tools/submit_job.py \
        --input /path/pages_parquet --workdir /path/workdir

Usage: python tools/build_pyfiles.py
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "deduplication_challenge_spark"
OUT = os.path.join(ROOT, "dist", "dedup_engine.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(ROOT, PKG)
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    print(OUT)


if __name__ == "__main__":
    main()
