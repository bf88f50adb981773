"""Package the engine for `spark-submit --py-files` (north_rule delivery).

Produces a single zip of the `lindorm_tsdb_contest_java_spark` package —
pure Python + numpy/pyarrow calls, no compiled extensions of our own —
that ships to every executor:

    python tools/package_pyfiles.py              # -> dist/engine.zip
    spark-submit --py-files dist/engine.zip your_job.py

A cluster job then does `from lindorm_tsdb_contest_java_spark import ...`
exactly like the local tests. The same zip works at N and 4N executors;
nothing in the package reads local paths except through arguments.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "lindorm_tsdb_contest_java_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
