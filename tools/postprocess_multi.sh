#!/bin/bash
# Post-process a finished multi-prompt stylize run (tools/run_multi_stylize.py):
# per prompt — orbit renders (fast path, chip), before/after sbs gifs,
# eval_style with all three metric tiers, sparse style_delta artifact.
# Usage: bash tools/postprocess_multi.sh [tag] [prompts...]
#   tag: checkpoint tag — a step number (zero-padded to 4) or "final"
# Env overrides: RUN_DIR (style/toy/multi), RES (256), TRAJ (30),
#   SUFFIX ("" — appended to gif/eval/delta names, e.g. "_r5")
set -euo pipefail
cd "$(dirname "$0")/.."

TAG=${1:-final}
case "$TAG" in
  ''|*[!0-9]*) ;;  # non-numeric tag (e.g. final) used as-is
  *) TAG=$(printf "%04d" "$TAG");;
esac
shift || true
PROMPTS=("${@:-lava emerald porcelain}")
if [ ${#PROMPTS[@]} -eq 1 ]; then read -ra PROMPTS <<< "${PROMPTS[0]}"; fi
RUN_DIR=${RUN_DIR:-style/toy/multi}
RES=${RES:-256}
TRAJ=${TRAJ:-30}
SUFFIX=${SUFFIX:-}
BARE=multi_bare_${RES}

echo "== bare orbit (left side of the sbs gifs) =="
if [ ! -f demo/canonical_360/${BARE}/${BARE}_body_can_0000.png ]; then
  python render_canonical.py --weights_path artifacts/canonical/bare_smpl_tpu.pth.tar \
    --sampler fast --grid_path artifacts/canonical/grid.npy \
    --exp_name ${BARE} --render_h $RES --render_w $RES \
    --trajectory_resolution $TRAJ
fi

for P in "${PROMPTS[@]}"; do
  CKPT=${RUN_DIR}/multi_${P}_${TAG}.pth.tar
  GRID=${RUN_DIR}/multi_${P}_grid.npy
  echo "== $P: orbit render =="
  python render_canonical.py --weights_path "$CKPT" \
    --sampler fast --grid_path "$GRID" \
    --exp_name multi_${P}${SUFFIX} --render_h $RES --render_w $RES \
    --trajectory_resolution $TRAJ
  echo "== $P: sbs gifs =="
  python tools/make_sbs_gif.py --left demo/canonical_360/${BARE} \
    --right demo/canonical_360/multi_${P}${SUFFIX} --pattern '*_body_*.png' \
    --out docs/media/multi_${P}${SUFFIX}_sbs.gif
  python tools/make_sbs_gif.py --left demo/canonical_360/${BARE} \
    --right demo/canonical_360/multi_${P}${SUFFIX} --pattern '*_head_*.png' \
    --out docs/media/multi_${P}${SUFFIX}_head_sbs.gif
  echo "== $P: eval_style (3 tiers) =="
  python tools/eval_style.py --ckpt "$CKPT" --grid_path "$GRID" \
    --style ${P} --guidance artifacts/toy_guidance \
    --out docs/eval/multi_${P}${SUFFIX}.json
  echo "== $P: sparse delta =="
  mkdir -p artifacts/styled
  python tools/style_delta.py pack --base artifacts/canonical/bare_smpl_tpu.pth.tar \
    --styled "$CKPT" --grid "$GRID" --out artifacts/styled/multi_${P}${SUFFIX}_delta.npz
done
echo "== postprocess done =="
