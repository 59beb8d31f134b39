#!/usr/bin/env bash
# End-to-end demo on the bundled reference test dataset.
# Usage: examples/demo.sh [output_dir]
set -euo pipefail
OUT="${1:-/tmp/m6anet_tpu_demo}"
DATA="${M6ANET_DEMO_EVENTALIGN:-/root/reference/m6anet/tests/data/eventalign.txt}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"

echo "== dataprep =="
python -m m6anet_tpu dataprep --eventalign "$DATA" --out_dir "$OUT/dataprep" \
    --n_processes 2 --format both

echo "== inference (exact noisy-OR) =="
python -m m6anet_tpu inference --input_dir "$OUT/dataprep" --out_dir "$OUT/calls" \
    --pretrained_model HCT116_RNA002

echo "== top calls =="
head -5 "$OUT/calls/data.site_proba.csv"
echo "..."
wc -l "$OUT/calls/data.site_proba.csv" "$OUT/calls/data.indiv_proba.csv"
