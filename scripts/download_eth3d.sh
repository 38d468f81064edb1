#!/bin/bash
# Fetch the ETH3D high-res multi-view training datasets used by the
# triangulation benchmark (reference: eth/download.sh), then bootstrap
# per-scene databases with lfr_tpu (reference: eth/prepare_dataset.sh).
#
# Usage: scripts/download_eth3d.sh [target_dir]
set -euo pipefail

TARGET=${1:-ETH3D}
mkdir -p "$TARGET"
cd "$TARGET"

SCENES=(courtyard delivery_area electro facade kicker meadow office pipes playground relief relief_2 terrace terrains)

for scene in "${SCENES[@]}"; do
    if [ ! -d "$scene/images" ]; then
        wget -q "https://www.eth3d.net/data/${scene}_dslr_undistorted.7z"
        7z x -y "${scene}_dslr_undistorted.7z" > /dev/null
        rm "${scene}_dslr_undistorted.7z"
    fi
    if [ ! -d "$scene/dslr_scan_eval" ]; then
        wget -q "https://www.eth3d.net/data/${scene}_scan_eval.7z"
        7z x -y "${scene}_scan_eval.7z" > /dev/null
        rm "${scene}_scan_eval.7z"
    fi
done

# Per-scene database + exhaustive match list.
cd - > /dev/null
for scene in "${SCENES[@]}"; do
    python -m lfr_tpu.pipelines.dataset_tools create-db-eth --dataset_path "$TARGET/$scene"
    python -m lfr_tpu.pipelines.dataset_tools match-list --dataset_path "$TARGET/$scene"
done
