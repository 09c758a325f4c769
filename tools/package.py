"""Build the --py-files artifact for cluster submission.

    python tools/package.py [out.zip]      # default: dist/fsharp_data_validation_spark.zip
    spark-submit --master yarn --py-files dist/fsharp_data_validation_spark.zip \
        jobs/validate.py --input db.transcripts --output s3://bucket/run1

The zip contains the package rooted at its import name, so executors (and
the driver) import it off the distributed cache with no repo checkout.
Deterministic: fixed timestamps + sorted entries, so the artifact hash is
stable for cache/lineage purposes.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "fsharp_data_validation_spark"


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    entries = []
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", PKG + ".zip"
    )
    print(build(out))
