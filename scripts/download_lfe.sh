#!/bin/bash
# Fetch the local-feature-evaluation reconstruction scenes
# (reference: local-feature-evaluation/download.sh): Strecha Fountain &
# Herzjesu, and the 1DSfM internet collections.
#
# Usage: scripts/download_lfe.sh [target_dir]
set -euo pipefail

TARGET=${1:-LFE}
mkdir -p "$TARGET"
cd "$TARGET"

BASE="https://dsp.stanford.edu/data"  # placeholder mirrors; see the
# upstream benchmark release for canonical URLs:
# https://github.com/ahojnnes/local-feature-evaluation

for scene in Fountain Herzjesu; do
    if [ ! -d "$scene/images" ]; then
        echo ">> fetch $scene manually from the LFE benchmark release" >&2
        mkdir -p "$scene/images"
    fi
done

for scene in Madrid_Metropolis Gendarmenmarkt Tower_of_London; do
    if [ ! -d "$scene/images" ]; then
        wget -q "http://landmark.cs.cornell.edu/projects/1dsfm/images.${scene}.tar" || {
            echo ">> fetch $scene manually (1DSfM release)" >&2
            continue
        }
        mkdir -p "$scene"
        tar -xf "images.${scene}.tar" -C "$scene"
        rm "images.${scene}.tar"
    fi
done

cd - > /dev/null
for scene in Fountain Herzjesu Madrid_Metropolis Gendarmenmarkt Tower_of_London; do
    [ -d "$TARGET/$scene/images" ] || continue
    python -m lfr_tpu.pipelines.dataset_tools create-db --dataset_path "$TARGET/$scene"
    python -m lfr_tpu.pipelines.dataset_tools match-list --dataset_path "$TARGET/$scene"
done
