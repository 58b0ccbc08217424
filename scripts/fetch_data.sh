#!/bin/sh
# Fetch the FFVD datasets + Factnonlin warm starts (not vendored into this
# repo — see README.md "Data provenance").  Clones the upstream reference
# implementation and points the ffvd_tpu env vars at it.
#
# Usage:  sh scripts/fetch_data.sh [target_dir]   (default: ./FFVD-upstream)
set -e
TARGET="${1:-FFVD-upstream}"
if [ ! -d "$TARGET" ]; then
  git clone --depth 1 https://github.com/xuhuifan/FFVD "$TARGET"
fi
echo "Datasets:    $TARGET/data"
echo "Warm starts: $TARGET/Factnonlin_ini"
echo
echo "Export before running ffvd_tpu:"
echo "  export FFVD_DATA_DIR=\"$(cd "$TARGET" && pwd)/data\""
echo "  export FFVD_WARMSTART_DIR=\"$(cd "$TARGET" && pwd)/Factnonlin_ini\""
