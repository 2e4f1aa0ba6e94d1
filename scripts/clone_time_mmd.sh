#!/usr/bin/env bash
# Clone the Time-MMD dataset if not already present (reference scripts/clone_time_mmd.sh).
set -euo pipefail

DATA_DIR="${1:-data/Time-MMD}"

if [ -d "$DATA_DIR" ]; then
    echo "Time-MMD already present at $DATA_DIR"
    exit 0
fi

git clone --depth 1 https://github.com/AdityaLab/Time-MMD "$DATA_DIR"
echo "Cloned Time-MMD into $DATA_DIR"
