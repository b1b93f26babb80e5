"""Build cascade.zip — the --py-files artifact the north_rule's deploy
surface ships (`spark-submit --py-files cascade.zip ...`).

The zip contains the `project_cascade_spark` package only (no tests, no
tools): spark-submit prepends it to the driver's sys.path and ships it to
every executor's PYTHONPATH, so jobs import the package with no repo
checkout on the cluster — the reference's "copy the Regional_Run_Files
tree to the box" deployment re-expressed as Spark's standard code-shipping
mechanism.

    python tools/make_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

PACKAGE = "project_cascade_spark"


def build(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PACKAGE)
    # deterministic member order + zeroed timestamps: identical trees
    # produce byte-identical artifacts (sane cache keys on a real cluster)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in sorted(os.walk(pkg_dir)):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                arc = os.path.relpath(full, root)
                info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                with open(full, "rb") as fh:
                    zf.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "cascade.zip"
    print(build(out))
