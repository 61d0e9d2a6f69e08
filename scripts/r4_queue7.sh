#!/usr/bin/env bash
# Round-4 queue 7 — the combined deploy-config probe for VERDICT item 2:
# truncated inlier pyramid (--inlier_num_layers 2, -2.2 ms union) composed
# with k-truncated neighbourhoods (--inlier_num_knn 8, halves the dominant
# L0 feature-gather rows), alone ("fast" = bench-default candidate) and
# with the outlier-signal channels ("flag" = quality-flagship candidate).
#
#  P: union-metric profile + chained-fence bench of the combined knobs
#     (runs FIRST so the perf answer lands early; host must be idle).
#  T: align retrains on the p0.5 curriculum over the BEST feat chain —
#     queue6's scaled chain if its raw p0.7 eval matched e1b's 0.883,
#     else the e1b chain (feat_po5mask).
#  E: 128-pair rung matrix for both retrains.
#
# Waits on the ACTUAL queue4/5/6 script processes (TPU single-tenant;
# the /tmp/q*.pid files hold wrapper-shell pids, so the script pids are
# pinned here directly).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4
exec > >(tee -a logs_r4/queue7.log) 2>&1

for pid in 11572 29705 7670; do
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
done

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }
die()  { echo "FATAL: $*"; exit 1; }

COMMON=(--dataset_type Synthetic --num_points 1024 --feat_len 3
        --rot_mag 30 --trans_mag 1.0 --thres_radius 0.9)
TRAIN=(-bs 8 --num_workers 4 --summary_every 100000)
CURR=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
GATE=(--mutual_check true --mutual_check_tol 0.6)
ROBUST=(--synthetic_p_keep 0.7 --synthetic_noise 0.02)
P05=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
PERF=(--inlier_num_knn 8 --inlier_num_layers 2)
XTRA=(--inlier_extra_feats dist,recip)

step "P1 profile combined knobs bs2"
python scripts/profile_align.py --batch 2 --inlier_num_knn 8 \
    --inlier_num_layers 2 \
    > logs_r4/profile_knn8_inl2_bs2.txt 2>&1 || echo "P1 FAILED"

step "P2 bench combined knobs"
DEEPSIR_BENCH_INLIER_KNN=8 DEEPSIR_BENCH_INLIER_LAYERS=2 python bench.py \
    > logs_r4/bench_knn8_inl2.json 2>&1 || echo "P2 FAILED"

# feat chain: adopt queue6's scaled chain only if its raw p0.7 eval beat
# the e1b recipe's 0.883 (the scaled chain saw 2x data and 2x epochs)
FEAT_CKPT=$(ls -d logs_r4/*feat_po5mask/ckpt 2>/dev/null | tail -1)
EPOCHS=80; TSIZE=256
E6=$(ls logs_r4/e6_p07_raw/*/summary_metrics.json 2>/dev/null | tail -1)
if [ -n "$E6" ]; then
  WIN=$(python -c "import json; print(1 if json.load(open('$E6'))['succ'] >= 0.883 else 0)")
  if [ "$WIN" = 1 ]; then
    FEAT_SC=$(ls -d logs_r4/*feat_scale/ckpt 2>/dev/null | tail -1)
    if [ -n "$FEAT_SC" ]; then FEAT_CKPT=$FEAT_SC; EPOCHS=160; TSIZE=512; fi
  fi
fi
[ -n "$FEAT_CKPT" ] || die "no feat ckpt"
echo "feat ckpt: $FEAT_CKPT (align ${EPOCHS}ep x ${TSIZE} pairs)"

train_align() {  # $1 name, rest: extra flags; sets $CKPT
  local name=$1; shift
  local start; start=$(date +%s)
  step "train $name"
  python train.py --pipeline align --logdir logs_r4 --name "$name" \
      --max_epochs "$EPOCHS" -v -5 --synthetic_train_size "$TSIZE" \
      --num_train_reg_iter 2 --resume "$FEAT_CKPT" \
      "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" "$@" \
      > "logs_r4/$name.train.log" 2>&1 \
      || die "train $name failed (see logs_r4/$name.train.log)"
  CKPT=$(ls -d logs_r4/*"$name"/ckpt 2>/dev/null | tail -1)
  [ -n "$CKPT" ] || die "no ckpt dir for $name"
  [ "$(stat -c %Y "$CKPT/model_best.msgpack")" -ge "$((start - 60))" ] \
      || die "stale checkpoint for $name: $CKPT"
  echo "-> $CKPT"
}

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

train_align align_fast "${PERF[@]}";             CKPT_F=$CKPT
train_align align_flag "${PERF[@]}" "${XTRA[@]}"; CKPT_G=$CKPT

evaluate e7f_full_raw "$CKPT_F" "${PERF[@]}"
evaluate e7f_p07_raw  "$CKPT_F" "${PERF[@]}" "${ROBUST[@]}"
evaluate e7f_p05_raw  "$CKPT_F" "${PERF[@]}" "${P05[@]}"

evaluate e7g_full_raw "$CKPT_G" "${PERF[@]}" "${XTRA[@]}"
evaluate e7g_p07_raw  "$CKPT_G" "${PERF[@]}" "${XTRA[@]}" "${ROBUST[@]}"
evaluate e7g_p05_raw  "$CKPT_G" "${PERF[@]}" "${XTRA[@]}" "${P05[@]}"
evaluate e7g_p07_gate "$CKPT_G" "${PERF[@]}" "${XTRA[@]}" "${ROBUST[@]}" \
    "${GATE[@]}"

step "queue7 done"
