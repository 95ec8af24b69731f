"""Build the --py-files zip for spark-submit (lagespark package only).

    python tools/make_pyfiles_zip.py /tmp/lagespark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(dest: str, root: str | None = None) -> str:
    root = root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(root, "lagespark")
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return dest


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/lagespark.zip"))
