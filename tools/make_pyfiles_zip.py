"""Package the library for spark-submit --py-files distribution.

Produces a zip whose root contains the ``opentelemetry_collector_components_spark``
package — exactly what executors unpack onto sys.path on a real cluster.

    python tools/make_pyfiles_zip.py [out.zip]   # default /tmp/otelcol_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "opentelemetry_collector_components_spark"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/otelcol_spark.zip"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(repo, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    print(out)


if __name__ == "__main__":
    main()
