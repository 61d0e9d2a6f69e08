#!/usr/bin/env bash
# Round-4 queue 8 — (a) redo of queue5's P1/P1b profiles that crashed on
# the missing --backbone_num_knn argparse flag (fixed), (b) the
# backbone_num_knn probe itself: profile + bench + eval-time quality
# gates on the flagship channels checkpoint (param tree unchanged, so the
# e2b ckpt evaluates directly at truncated backbone k — but the
# DESCRIPTOR path is the precision/context-sensitive one, so expect
# quality cost; this measures it), and (c) the gate-free robust stack on
# the flagship e2b ckpt: queue-4 found the eval-time mutual gate HURTS
# channel checkpoints, so the best-numbers stack is raw + finetune
# (+RANSAC/ICP arms for the ladder).
#
# Waits on the ACTUAL queue7 script process (TPU single-tenant).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4
exec > >(tee -a logs_r4/queue8.log) 2>&1

for pid in 28501; do
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
done

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }
die()  { echo "FATAL: $*"; exit 1; }

COMMON=(--dataset_type Synthetic --num_points 1024 --feat_len 3
        --rot_mag 30 --trans_mag 1.0 --thres_radius 0.9)
ROBUST=(--synthetic_p_keep 0.7 --synthetic_noise 0.02)
P05=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
XTRA=(--inlier_extra_feats dist,recip)

FLAG=$(ls -d logs_r4/*align_xboth/ckpt 2>/dev/null | tail -1)
[ -n "$FLAG" ] || die "no flagship (align_xboth) ckpt"
echo "flagship ckpt: $FLAG"

evaluate() {  # $1 outname, $2 ckpt, rest: extra flags
  local name=$1 ckpt=$2; shift 2
  step "eval $name"
  python test.py --pipeline align --resume "$ckpt/model_best.msgpack" \
      --synthetic_eval_size 128 --clip_weight_thresh 0.05 \
      --eval_save_path "logs_r4/$name" "${COMMON[@]}" "$@" \
      > "logs_r4/$name.log" 2>&1 \
      || { echo "EVAL FAILED: $name"; return 1; }
  local summ
  summ=$(ls "logs_r4/$name"/*/summary_metrics.json 2>/dev/null | tail -1)
  [ -n "$summ" ] || { echo "NO SUMMARY: $name"; return 1; }
  echo "$name: $(cat "$summ")"
}

step "P1redo profile inlier_num_knn 8 bs2"
python scripts/profile_align.py --batch 2 --inlier_num_knn 8 \
    > logs_r4/profile_knn8_bs2.txt 2>&1 || echo "P1redo FAILED"
step "P1bredo profile inlier_num_knn 8 + morton bs2"
python scripts/profile_align.py --batch 2 --inlier_num_knn 8 \
    --pyramid_order morton \
    > logs_r4/profile_knn8_morton_bs2.txt 2>&1 || echo "P1bredo FAILED"

step "B1 profile backbone_num_knn 8 bs2"
python scripts/profile_align.py --batch 2 --backbone_num_knn 8 \
    > logs_r4/profile_bknn8_bs2.txt 2>&1 || echo "B1 FAILED"
step "B2 profile backbone_num_knn 8 + inlier knn8 + inl2 bs2"
python scripts/profile_align.py --batch 2 --backbone_num_knn 8 \
    --inlier_num_knn 8 --inlier_num_layers 2 \
    > logs_r4/profile_bknn8_combo_bs2.txt 2>&1 || echo "B2 FAILED"

step "B3 bench backbone_num_knn 8"
DEEPSIR_BENCH_BACKBONE_KNN=8 python bench.py \
    > logs_r4/bench_bknn8.json 2>&1 || echo "B3 FAILED"
step "B4 bench backbone knn8 + inlier knn8 + inl2"
DEEPSIR_BENCH_BACKBONE_KNN=8 DEEPSIR_BENCH_INLIER_KNN=8 \
DEEPSIR_BENCH_INLIER_LAYERS=2 python bench.py \
    > logs_r4/bench_bknn8_combo.json 2>&1 || echo "B4 FAILED"

step "B5 eval-time backbone knn8 quality gates on the flagship"
evaluate e8b_full_raw "$FLAG" "${XTRA[@]}" --backbone_num_knn 8
evaluate e8b_p07_raw  "$FLAG" "${XTRA[@]}" --backbone_num_knn 8 "${ROBUST[@]}"
evaluate e8b_p05_raw  "$FLAG" "${XTRA[@]}" --backbone_num_knn 8 "${P05[@]}"

step "S2 gate-free robust stack on the flagship (channels ckpt)"
evaluate e8s_ft_p07  "$FLAG" "${XTRA[@]}" "${ROBUST[@]}" --use_finetune true
evaluate e8s_ft_p05  "$FLAG" "${XTRA[@]}" "${P05[@]}" --use_finetune true
evaluate e8s_ft_full "$FLAG" "${XTRA[@]}" --use_finetune true
evaluate e8s_all_p05 "$FLAG" "${XTRA[@]}" "${P05[@]}" \
    --use_finetune true --use_ransac true --use_icp true

step "queue8 done"
