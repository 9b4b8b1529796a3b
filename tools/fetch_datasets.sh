#!/bin/bash
# Fetch the two real trajectories the reference's README reproduces its
# results on (/root/reference/README.md:102-158): ICL-NUIM living-room kt1
# ("frei_png" export) and TUM fr1/desk. Unpacks under data/, records
# sha256 sums on first successful fetch (this repo has been built under
# zero egress — upstream sums could not be pinned in advance; the recorded
# sums pin every LATER fetch), then smoke-runs the disk loaders on both.
#
# Usage:  bash tools/fetch_datasets.sh [data_dir]      (default: ./data)
#
# After it passes, the reference-reproduction runs are one command each —
# see tools/runbook_real_data.md for the expected-results table:
#   python -m e2eslam_tpu.apps.online_adaption \
#       --config_path configs/config_icl_online.yaml \
#       --data_path data/icl
#   python -m e2eslam_tpu.apps.online_adaption \
#       --config_path configs/config_tum_online.yaml \
#       --data_path data/tum/rgbd_dataset_freiburg1_desk
set -euo pipefail
cd "$(dirname "$0")/.."
DATA_DIR="${1:-data}"
SUMS="tools/dataset_checksums.sha256"
mkdir -p "$DATA_DIR/icl" "$DATA_DIR/tum"

ICL_URL="https://www.doc.ic.ac.uk/~ahanda/living_room_traj1_frei_png.tar.gz"
TUM_URL="https://cvg.cit.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_desk.tgz"

fetch() { # url dest
  local url="$1" dest="$2"
  if [ -f "$dest" ]; then
    echo "have $dest"
  else
    echo "fetching $url"
    curl -fL --retry 3 -o "$dest.part" "$url"
    mv "$dest.part" "$dest"
  fi
  local sum
  sum=$(sha256sum "$dest" | awk '{print $1}')
  local name
  name=$(basename "$dest")
  if grep -q " $name\$" "$SUMS" 2>/dev/null; then
    grep " $name\$" "$SUMS" | sha256sum -c - || {
      echo "CHECKSUM MISMATCH for $name — refusing to unpack" >&2
      exit 1
    }
  else
    echo "$sum  $name" >> "$SUMS"
    echo "recorded first-fetch sha256 for $name: $sum (commit $SUMS)"
  fi
}

ICL_TAR="$DATA_DIR/icl/living_room_traj1_frei_png.tar.gz"
TUM_TAR="$DATA_DIR/tum/rgbd_dataset_freiburg1_desk.tgz"
fetch "$ICL_URL" "$ICL_TAR"
fetch "$TUM_URL" "$TUM_TAR"

# The ICL frei_png tarball unpacks rgb/ depth/ *.gt.freiburg into CWD.
if [ ! -d "$DATA_DIR/icl/living_room_traj1_frei_png/rgb" ]; then
  mkdir -p "$DATA_DIR/icl/living_room_traj1_frei_png"
  tar -xzf "$ICL_TAR" -C "$DATA_DIR/icl/living_room_traj1_frei_png"
fi
if [ ! -d "$DATA_DIR/tum/rgbd_dataset_freiburg1_desk" ]; then
  tar -xzf "$TUM_TAR" -C "$DATA_DIR/tum"
fi

echo "== loader smoke (CPU) =="
JAX_PLATFORMS=cpu python - "$DATA_DIR" << 'EOF'
import sys

base = sys.argv[1]
from e2eslam_tpu.data.tumicl import ICLDataset, TUMDataset

icl = ICLDataset(basedir=f"{base}/icl", seqlen=2, height=256, width=320,
                 dilation=2, start=0)
colors, depths, K, poses, _ = icl[0]
assert colors.shape == (2, 256, 320, 3) and depths.shape[-1] == 1, colors.shape
print(f"ICL ok: {len(icl)} windows, K fx={K[0, 0]:.1f} fy={K[1, 1]:.1f}")

tum = TUMDataset(basedir=f"{base}/tum", seqlen=2, height=256, width=320,
                 dilation=5, start=0)
colors, depths, K, poses, _ = tum[0]
assert colors.shape == (2, 256, 320, 3), colors.shape
print(f"TUM ok: {len(tum)} windows, K fx={K[0, 0]:.1f} fy={K[1, 1]:.1f}")
print("fetch_datasets smoke PASSED")
EOF
echo "done — see tools/runbook_real_data.md for the reproduction runs"
