#!/usr/bin/env bash
# Round-4 queue 5 — the inlier_num_knn perf lever + the refreshed flagship
# robust stack. Chained behind queue4 via pid file; TPU single-tenant, so
# everything is serialized.
#
#  P1: union-metric profiles of --inlier_num_knn 8 (alone and + morton) at
#      bs2 — the HEAD profile attributes ~16 ms/call to the inlier net's
#      level-0 feature gathers (576000 rows at K=16); gather cost scales
#      with ROW count, so k=8 should cut ~half of that.
#  P2: bench.py with DEEPSIR_BENCH_INLIER_KNN=8 (and +morton) — the e2e
#      arm of the same A/B.
#  Q1: 128-pair quality gates of eval-time k=8 on the best raw ckpt
#      (full / p0.7 / p0.5 rungs) — AttPooling params are per-channel, so
#      the full-K checkpoint evaluates directly at k=8.
#  Q2: align retrain AT k=8 (the inlier net learns its truncated
#      neighbourhoods) + the same eval matrix.
#  S:  refreshed flagship robust stack on the best raw ckpt: mutual gate
#      0.6 + finetune + RANSAC + ICP on p0.7 and p0.5 (the round-3 stack
#      numbers used the weaker staged_po base).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4
exec > >(tee -a logs_r4/queue5.log) 2>&1

if [ -f /tmp/q4.pid ]; then
  PREV=$(cat /tmp/q4.pid)
  while kill -0 "$PREV" 2>/dev/null; do sleep 30; done
fi

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }
die()  { echo "FATAL: $*"; exit 1; }

COMMON=(--dataset_type Synthetic --num_points 1024 --feat_len 3
        --rot_mag 30 --trans_mag 1.0 --thres_radius 0.9)
TRAIN=(-bs 8 --num_workers 4 --summary_every 100000)
CURR=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
GATE=(--mutual_check true --mutual_check_tol 0.6)
ROBUST=(--synthetic_p_keep 0.7 --synthetic_noise 0.02)
P05=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
STACK=("${GATE[@]}" --use_finetune true --use_ransac true --use_icp true)

# best raw align ckpt: prefer the retrained-feat raw variant (e1b), fall
# back to the p0.5-curriculum raw align on the old feat (e0b's ckpt)
BEST=$(ls -d logs_r4/*align_stg5raw/ckpt 2>/dev/null | tail -1)
[ -n "$BEST" ] || BEST=$(ls -d logs_r4/*align_p05raw/ckpt 2>/dev/null | tail -1)
[ -n "$BEST" ] || die "no best ckpt"
echo "best raw ckpt: $BEST"
FEAT_CKPT=$(ls -d logs_r4/*feat_po5mask/ckpt 2>/dev/null | tail -1)
[ -n "$FEAT_CKPT" ] || die "no feat ckpt"

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

step "P1 profile inlier_num_knn 8 bs2"
python scripts/profile_align.py --batch 2 --inlier_num_knn 8 \
    > logs_r4/profile_knn8_bs2.txt 2>&1 || echo "P1 FAILED"
step "P1b profile inlier_num_knn 8 + morton bs2"
python scripts/profile_align.py --batch 2 --inlier_num_knn 8 \
    --pyramid_order morton \
    > logs_r4/profile_knn8_morton_bs2.txt 2>&1 || echo "P1b FAILED"

step "P2 bench inlier_num_knn 8"
DEEPSIR_BENCH_INLIER_KNN=8 python bench.py \
    > logs_r4/bench_knn8.json 2>&1 || echo "P2 FAILED"
step "P2b bench inlier_num_knn 8 + morton"
DEEPSIR_BENCH_INLIER_KNN=8 DEEPSIR_BENCH_ORDER=morton python bench.py \
    > logs_r4/bench_knn8_morton.json 2>&1 || echo "P2b FAILED"

step "Q1 eval-time k=8 gates on $BEST"
evaluate "e3_knn8_full_raw" "$BEST" --inlier_num_knn 8
evaluate "e3_knn8_p07_raw"  "$BEST" --inlier_num_knn 8 "${ROBUST[@]}"
evaluate "e3_knn8_p05_raw"  "$BEST" --inlier_num_knn 8 "${P05[@]}"

step "Q2 align retrain at inlier_num_knn 8"
T0=$(date +%s)
python train.py --pipeline align --logdir logs_r4 --name align_knn8 \
    --max_epochs 80 -v -5 --synthetic_train_size 256 \
    --num_train_reg_iter 2 --resume "$FEAT_CKPT" --inlier_num_knn 8 \
    "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" \
    > logs_r4/align_knn8.train.log 2>&1 || die "align_knn8 train failed"
CKPT8=$(ls -d logs_r4/*align_knn8/ckpt 2>/dev/null | tail -1)
[ -n "$CKPT8" ] || die "no align_knn8 ckpt"
[ "$(stat -c %Y "$CKPT8/model_best.msgpack")" -ge "$((T0 - 60))" ] \
    || die "stale align_knn8 ckpt"
evaluate "e4_knn8rt_full_raw" "$CKPT8" --inlier_num_knn 8
evaluate "e4_knn8rt_p07_raw"  "$CKPT8" --inlier_num_knn 8 "${ROBUST[@]}"
evaluate "e4_knn8rt_p05_raw"  "$CKPT8" --inlier_num_knn 8 "${P05[@]}"

step "S flagship robust stack on $BEST"
evaluate "e5_stack_p07" "$BEST" "${ROBUST[@]}" "${STACK[@]}"
evaluate "e5_stack_p05" "$BEST" "${P05[@]}" "${STACK[@]}"
evaluate "e5_stack_full" "$BEST" "${STACK[@]}"

step "queue5 done"
