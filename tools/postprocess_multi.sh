#!/bin/bash
# Post-process a finished multi-prompt stylize run (tools/run_multi_stylize.py):
# per prompt — orbit renders (fast path, chip), before/after sbs gifs,
# eval_style with all three metric tiers, sparse style_delta artifact.
# Usage: bash tools/postprocess_multi.sh [steps] [prompts...]
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS=${1:-2400}
shift || true
PROMPTS=("${@:-lava emerald porcelain}")
if [ ${#PROMPTS[@]} -eq 1 ]; then read -ra PROMPTS <<< "${PROMPTS[0]}"; fi
STEPS4=$(printf "%04d" "$STEPS")
TRAJ=30

echo "== bare orbit (left side of the sbs gifs) =="
if [ ! -f demo/canonical_360/multi_bare/multi_bare_body_can_0000.png ]; then
  python render_canonical.py --weights_path artifacts/canonical/bare_smpl_tpu.pth.tar \
    --sampler fast --grid_path artifacts/canonical/grid.npy \
    --exp_name multi_bare --render_h 256 --render_w 256 \
    --trajectory_resolution $TRAJ
fi

for P in "${PROMPTS[@]}"; do
  CKPT=style/toy/multi/multi_${P}_${STEPS4}.pth.tar
  GRID=style/toy/multi/multi_${P}_grid.npy
  echo "== $P: orbit render =="
  python render_canonical.py --weights_path "$CKPT" \
    --sampler fast --grid_path "$GRID" \
    --exp_name multi_${P} --render_h 256 --render_w 256 \
    --trajectory_resolution $TRAJ
  echo "== $P: sbs gifs =="
  python tools/make_sbs_gif.py --left demo/canonical_360/multi_bare \
    --right demo/canonical_360/multi_${P} --pattern '*_body_*.png' \
    --out docs/media/multi_${P}_sbs.gif
  python tools/make_sbs_gif.py --left demo/canonical_360/multi_bare \
    --right demo/canonical_360/multi_${P} --pattern '*_head_*.png' \
    --out docs/media/multi_${P}_head_sbs.gif
  echo "== $P: eval_style (3 tiers) =="
  python tools/eval_style.py --ckpt "$CKPT" --grid_path "$GRID" \
    --style ${P} --guidance artifacts/toy_guidance \
    --out docs/eval/multi_${P}.json
  echo "== $P: sparse delta =="
  mkdir -p artifacts/styled
  python tools/style_delta.py pack --base artifacts/canonical/bare_smpl_tpu.pth.tar \
    --styled "$CKPT" --grid "$GRID" --out artifacts/styled/multi_${P}_delta.npz
done
echo "== postprocess done =="
