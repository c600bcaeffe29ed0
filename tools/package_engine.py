"""Build the --py-files archive for cluster submission.

Zips the ``whakoom_webscrapper_spark`` package (source only, no caches)
into a single archive that ``spark-submit --py-files`` ships to every
executor — the deployment path the north rule names:

    python tools/package_engine.py /tmp/engine.zip
    spark-submit --master spark://... --py-files /tmp/engine.zip \
        jobs/crawl.py --n-urls 10000000 --out hdfs://.../run1

Entries are written in sorted order with a fixed timestamp so the same
tree always produces a byte-identical archive (reproducible deploys).
Exercised end-to-end by tests/test_spark_submit.py, which runs the real
``spark-submit`` binary against the zip from a foreign working
directory — the package must resolve from the archive, not the repo.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "whakoom_webscrapper_spark"
# fixed DOS timestamp (2020-01-01) → byte-identical archives per tree
_EPOCH = (2020, 1, 1, 0, 0, 0)


def build_zip(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    pkg_dir = os.path.join(root, PKG)
    names = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                names.append(os.path.join(dirpath, fn))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for path in names:
            arcname = os.path.relpath(path, root)
            info = zipfile.ZipInfo(arcname, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(path, "rb") as f:
                z.writestr(info, f.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine.zip"
    print(build_zip(out))
