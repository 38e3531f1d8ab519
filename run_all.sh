#!/usr/bin/env bash
# Grid driver (reference run_all.cmd): loop models over a dataset.
# Usage: ./run_all.sh [dataset] [loss] [epochs]
set -u

DATASET="${1:-dsb2018}"
LOSS="${2:-bce}"
EPOCHS="${3:-100}"

for MODEL in zf_unet linknet34 unet11 unet16 gcn; do
    python train.py -m "$MODEL" -d "$DATASET" -l "$LOSS" -o adam \
        -p 224 -b 16 -e "$EPOCHS" || echo "FAILED: $MODEL"
done
