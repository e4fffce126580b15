#!/usr/bin/env bash
# Canonical pipeline driver (parity: the reference's run_scripts.sh):
# forward stats -> metric stats -> train -> sample -> FID -> analysis.
# Usage: ./run_pipeline.sh [dataset_name]
set -euo pipefail
cd "$(dirname "$0")"
DS="${1:-cifar10}"

python compute_stats_forward.py --dataset_name "$DS"
python compute_stats_metric.py --dataset "$DS" --regularize --adaptive_knn
python train_diffusion.py --dataset_name "$DS"
python sample.py --dataset_name "$DS"
python compute_fid.py --dataset_name "$DS"
python analyze_fids.py
