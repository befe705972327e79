#!/usr/bin/env bash
# COCO 2017 keypoints data fetch (reference lib/datasets/CocoDataDownloader.sh).
# Usage: scripts/download_coco.sh [target_dir]
set -euo pipefail

TARGET=${1:-data/coco}
mkdir -p "$TARGET/images" "$TARGET/annotations"
cd "$TARGET"

fetch() {
    local url=$1 out=$2
    # treat 0-byte leftovers from a failed attempt as absent (wget -O
    # creates the file before DNS resolution, so a dead-egress attempt
    # leaves an empty zip that would otherwise block every retry)
    if [ ! -s "$out" ]; then
        rm -f "$out"
        wget -c "$url" -O "$out"
    fi
}

fetch http://images.cocodataset.org/zips/train2017.zip train2017.zip
fetch http://images.cocodataset.org/zips/val2017.zip val2017.zip
fetch http://images.cocodataset.org/annotations/annotations_trainval2017.zip \
    annotations_trainval2017.zip

unzip -n -q train2017.zip -d images
unzip -n -q val2017.zip -d images
unzip -n -q annotations_trainval2017.zip

echo "COCO 2017 ready under $TARGET"
