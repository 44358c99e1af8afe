#!/usr/bin/env bash
# Download COCO 2017 train/val images + keypoint annotations into dataset/.
# Equivalent of the reference's dataset/get_data.sh (C2): wget + unzip of
# train2017, val2017 and annotations_trainval2017 into the layout the
# Config defaults expect:
#   dataset/images/train2017/  dataset/images/val2017/  dataset/annotations/
set -euo pipefail

DATASET_DIR="${1:-dataset}"
IMAGES_DIR="$DATASET_DIR/images"
mkdir -p "$IMAGES_DIR" "$DATASET_DIR/annotations"

fetch_unzip() {
  local url="$1" dest="$2"
  local zip_name
  zip_name="$(basename "$url")"
  if [ ! -f "$DATASET_DIR/$zip_name" ]; then
    echo "Downloading $url"
    wget -q --show-progress -P "$DATASET_DIR" "$url"
  fi
  echo "Unzipping $zip_name -> $dest"
  unzip -q -n "$DATASET_DIR/$zip_name" -d "$dest"
  rm -f "$DATASET_DIR/$zip_name"
}

fetch_unzip "http://images.cocodataset.org/zips/train2017.zip" "$IMAGES_DIR"
fetch_unzip "http://images.cocodataset.org/zips/val2017.zip" "$IMAGES_DIR"
fetch_unzip "http://images.cocodataset.org/annotations/annotations_trainval2017.zip" "$DATASET_DIR"

echo "Done. Now run: python -m single_person_pose_estimation_tpu.cli gen-records"
