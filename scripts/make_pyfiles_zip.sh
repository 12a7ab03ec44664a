#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north rule: "run via
# spark-submit --py-files").  Usage: scripts/make_pyfiles_zip.sh [out.zip]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-/tmp/entity_linking_spark.zip}"
cd "$REPO"
rm -f "$OUT"
python - "$OUT" <<'EOF'
import sys, zipfile, pathlib
out = sys.argv[1]
root = pathlib.Path(".")
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("entity_linking_spark/**/*.py")):
        z.write(p, p.as_posix())
print(out)
EOF
