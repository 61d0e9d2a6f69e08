#!/usr/bin/env bash
# Round-4 queue 2 — perf rebaseline + knob gating, chained after queue1b.
# Everything here touches the TPU (single-tenant): strictly serialized.
#
#  A. VERDICT item 4: one coherent HEAD profile (interval-union metric) +
#     fresh MFU/roofline + a bench.py reading — the numbers every round-4
#     perf A/B gates against.
#  B. VERDICT item 2 probe: union-metric profile of the truncated inlier
#     pyramid (inlier_num_layers 2 and 3; device time is weight-independent,
#     so random-init profiles predict the retrain's perf before paying it).
#  C. VERDICT item 7 perf side: morton-mode union-metric profile at HEAD.
#  D. VERDICT item 6: one FEAT train step at the full 18000-pt protocol via
#     the tiled circle loss (OOM check + step time).
#  E. VERDICT item 5: quality-gate --use_finetune and --pose_average_last
#     (128 pairs, full + p0.7 rungs, staged_po ckpt).
#  F. VERDICT item 7 quality side: morton on full/p0.7/p0.5 rungs at 128
#     pairs with the staged_po ckpt.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4
exec > >(tee -a logs_r4/queue2.log) 2>&1

# wait for queue1b to drain (TPU is single-tenant)
if [ -f /tmp/q1b.pid ]; then
  PREV=$(cat /tmp/q1b.pid)
  while kill -0 "$PREV" 2>/dev/null; do sleep 30; done
fi

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

# ---- A. HEAD rebaseline ----------------------------------------------------
step "profile HEAD bs2 (union metric)"
python scripts/profile_align.py --batch 2 > logs_r4/profile_head_bs2.txt 2>&1 \
  || echo "PROFILE FAILED: head_bs2"
tail -3 logs_r4/profile_head_bs2.txt

step "profile HEAD bs1"
python scripts/profile_align.py --batch 1 > logs_r4/profile_head_bs1.txt 2>&1 \
  || echo "PROFILE FAILED: head_bs1"
tail -3 logs_r4/profile_head_bs1.txt

step "mfu estimate HEAD"
python scripts/mfu_estimate.py > logs_r4/mfu_head.txt 2>&1 \
  || echo "MFU FAILED"
tail -5 logs_r4/mfu_head.txt

step "bench.py HEAD"
python bench.py > logs_r4/bench_head.json 2>&1 || echo "BENCH FAILED"
tail -1 logs_r4/bench_head.json

# ---- B. truncated inlier pyramid perf probe ---------------------------------
for L in 2 3; do
  step "profile inlier_num_layers=$L bs2"
  python scripts/profile_align.py --batch 2 --inlier_num_layers "$L" \
    > "logs_r4/profile_inlier${L}_bs2.txt" 2>&1 \
    || echo "PROFILE FAILED: inlier$L"
  tail -3 "logs_r4/profile_inlier${L}_bs2.txt"
done

# ---- C. morton perf at HEAD --------------------------------------------------
step "profile morton bs2"
python scripts/profile_align.py --batch 2 --pyramid_order morton \
  > logs_r4/profile_morton_bs2.txt 2>&1 || echo "PROFILE FAILED: morton"
tail -3 logs_r4/profile_morton_bs2.txt

# ---- D. feat train step at protocol N ---------------------------------------
step "feat train step 18000 pts (tiled circle loss)"
timeout 1200 python scripts/bench_train_step.py --pipeline feat \
  --circle_loss_tile 1500 --points 18000 --reps 4 \
  > logs_r4/feat_step_18000.txt 2>&1 || echo "FEAT STEP FAILED"
tail -2 logs_r4/feat_step_18000.txt

# ---- E/F. quality gates ------------------------------------------------------
COMMON=(--dataset_type Synthetic --num_points 1024 --feat_len 3
        --rot_mag 30 --trans_mag 1.0 --thres_radius 0.9)
ROBUST=(--synthetic_p_keep 0.7 --synthetic_noise 0.02)
P05=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
ALIGN_CKPT=logs_r3/staged_po/260817_191109_align/ckpt/model_best.msgpack

evaluate() {  # $1 outname, rest: extra flags
  local name=$1; shift
  step "eval $name"
  python test.py --pipeline align --resume "$ALIGN_CKPT" \
      --synthetic_eval_size 128 --clip_weight_thresh 0.05 \
      --eval_save_path "logs_r4/$name" "${COMMON[@]}" "$@" \
      > "logs_r4/$name.log" 2>&1 \
      || { echo "EVAL FAILED: $name"; return 1; }
  local summ
  summ=$(ls "logs_r4/$name"/*/summary_metrics.json 2>/dev/null | tail -1)
  [ -n "$summ" ] || { echo "NO SUMMARY: $name"; return 1; }
  echo "$name: $(cat "$summ")"
}

# E: finetune / pose averaging, full + robust rungs
evaluate q2_finetune_full   --use_finetune true
evaluate q2_finetune_p07    --use_finetune true "${ROBUST[@]}"
evaluate q2_poseavg_full    --pose_average_last 3
evaluate q2_poseavg_p07     --pose_average_last 3 "${ROBUST[@]}"

# F: morton quality on all three rungs (staged_po ckpt)
evaluate q2_morton_full     --pyramid_order morton
evaluate q2_morton_p07      --pyramid_order morton "${ROBUST[@]}"
evaluate q2_morton_p05      --pyramid_order morton "${P05[@]}"

step "queue2 done"
