#!/bin/sh
# Package cuely_spark for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/cuely_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/cuely_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("cuely_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/cuely_spark.zip written")
EOF
