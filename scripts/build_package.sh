#!/bin/sh
# Build the spark-submit --py-files artifact (north_rule packaging).
#   scripts/build_package.sh  ->  dist/ocr_spark.zip
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ocr_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/ocr_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("ocr_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/ocr_spark.zip")
EOF
unzip -l dist/ocr_spark.zip | tail -3
