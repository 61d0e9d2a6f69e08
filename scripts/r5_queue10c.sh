#!/usr/bin/env bash
# Round-5 queue 10c — final triage of queue 10b (which itself replaced
# queues 10+11): the S2 2x-data-again probe is CUT (2.5-3h for a probe
# that cannot change this round's deploy decision) and the final
# default-config bench is moved OUT of the script (run manually after
# the bench.py default flip, on an idle host; the driver's round-end
# bench.py run is the authoritative BENCH_r05 anyway). Order:
#
#  F:  e7f_full_raw rerun (first run killed by a remote-compile hang) —
#      the missing full-rung cell for align_fast (knn8+inl2 trained-in).
#  BK: backbone_num_knn 8 gates on align_fast, the actual deploy ckpt
#      (queue-8's B5 gated it on e2b: 1.000/0.566, 0.875, 0.477 — all
#      pass) — pass = adopt the triple combo (bknn8+knn8+inl2, bench
#      41.57 pairs/sec bs2, union 39.36 ms) as the deploy config.
#  Z1: deploy-combo bench via env knobs (deterministic, independent of
#      the bench.py default flip).
#  L:  gate-free best-numbers ladder on align_fast (+finetune all rungs,
#      +finetune+RANSAC+ICP robust rungs).
#  M:  morton gate on the combo (bench + 3 rungs) — morton saved ~2 ms
#      at knn8 (profile_knn8_morton_bs2.txt).
#  T:  trained-in backbone-knn8 chain (feat_bk8 -> align_bk8 on the
#      scaled chain) — erases any eval-time truncation cost; stretch,
#      killable if the clock runs out.
#
# Waits on the queue9 script process (TPU single-tenant).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r5
exec > >(tee -a logs_r5/queue10c.log) 2>&1

for pid in 27068; do
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
done

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }
die()  { echo "FATAL: $*"; exit 1; }

COMMON=(--dataset_type Synthetic --num_points 1024 --feat_len 3
        --rot_mag 30 --trans_mag 1.0 --thres_radius 0.9)
TRAIN=(-bs 8 --num_workers 4 --summary_every 100000)
CURR=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
ROBUST=(--synthetic_p_keep 0.7 --synthetic_noise 0.02)
P05=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
PERF=(--inlier_num_knn 8 --inlier_num_layers 2)
BK=(--backbone_num_knn 8)

evaluate() {  # $1 outname, $2 ckpt-file, rest: extra flags
  local name=$1 ckpt=$2; shift 2
  step "eval $name"
  timeout 2400 python test.py --pipeline align --resume "$ckpt" \
      --synthetic_eval_size 128 --clip_weight_thresh 0.05 \
      --eval_save_path "logs_r5/$name" "${COMMON[@]}" "$@" \
      > "logs_r5/$name.log" 2>&1 \
      || { echo "EVAL FAILED: $name"; return 1; }
  local summ
  summ=$(ls "logs_r5/$name"/*/summary_metrics.json 2>/dev/null | tail -1)
  [ -n "$summ" ] || { echo "NO SUMMARY: $name"; return 1; }
  echo "$name: $(cat "$summ")"
}

fresh_ckpt() {  # $1 name, $2 start-epoch-seconds; sets $CKPT
  CKPT=$(ls -d logs_r5/*"$1"/ckpt 2>/dev/null | tail -1)
  [ -n "$CKPT" ] || die "no ckpt dir for $1"
  [ "$(stat -c %Y "$CKPT/model_best.msgpack")" -ge "$(($2 - 60))" ] \
      || die "stale checkpoint for $1: $CKPT"
  echo "-> $CKPT"
}

FAST=$(ls -d logs_r4/*align_fast/ckpt 2>/dev/null | tail -1)
[ -n "$FAST" ] || die "no align_fast ckpt"
FASTC="$FAST/model_best.msgpack"

step "F e7f_full_raw rerun"
evaluate r10_e7f_full "$FASTC" "${PERF[@]}"

step "BK backbone_num_knn 8 gates on align_fast"
evaluate r10_bk_full "$FASTC" "${PERF[@]}" "${BK[@]}"
evaluate r10_bk_p07  "$FASTC" "${PERF[@]}" "${BK[@]}" "${ROBUST[@]}"
evaluate r10_bk_p05  "$FASTC" "${PERF[@]}" "${BK[@]}" "${P05[@]}"

step "Z1 deploy-combo bench (env knobs)"
DEEPSIR_BENCH_INLIER_KNN=8 DEEPSIR_BENCH_INLIER_LAYERS=2 \
DEEPSIR_BENCH_BACKBONE_KNN=8 timeout 2400 python bench.py \
    > logs_r5/bench_deploy_combo.json 2>&1 || echo "Z1 FAILED"
tail -1 logs_r5/bench_deploy_combo.json

step "L gate-free ladder on align_fast"
evaluate r10_ft_full "$FASTC" "${PERF[@]}" --use_finetune true
evaluate r10_ft_p07  "$FASTC" "${PERF[@]}" --use_finetune true "${ROBUST[@]}"
evaluate r10_ft_p05  "$FASTC" "${PERF[@]}" --use_finetune true "${P05[@]}"
evaluate r10_all_p07 "$FASTC" "${PERF[@]}" --use_finetune true \
    --use_ransac true --use_icp true "${ROBUST[@]}"
evaluate r10_all_p05 "$FASTC" "${PERF[@]}" --use_finetune true \
    --use_ransac true --use_icp true "${P05[@]}"

step "M morton gate on the combo"
DEEPSIR_BENCH_INLIER_KNN=8 DEEPSIR_BENCH_INLIER_LAYERS=2 \
DEEPSIR_BENCH_BACKBONE_KNN=8 DEEPSIR_BENCH_ORDER=morton \
timeout 2400 python bench.py \
    > logs_r5/bench_combo_morton.json 2>&1 || echo "M bench FAILED"
tail -1 logs_r5/bench_combo_morton.json
evaluate r10_mo_full "$FASTC" "${PERF[@]}" "${BK[@]}" --pyramid_order morton
evaluate r10_mo_p07  "$FASTC" "${PERF[@]}" "${BK[@]}" --pyramid_order morton \
    "${ROBUST[@]}"
evaluate r10_mo_p05  "$FASTC" "${PERF[@]}" "${BK[@]}" --pyramid_order morton \
    "${P05[@]}"

LABEL_CKPT=$(ls -d logs_r4/*label_po5/ckpt 2>/dev/null | tail -1)
[ -n "$LABEL_CKPT" ] || die "no label ckpt"

step "T trained-in backbone-knn8 chain (stretch)"
T0=$(date +%s)
python train.py --pipeline feat --logdir logs_r5 --name feat_bk8 \
    --max_epochs 30 --synthetic_train_size 512 -v 0 \
    --resume "$LABEL_CKPT" --overlap_det_mask true "${BK[@]}" \
    "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" \
    > logs_r5/feat_bk8.train.log 2>&1 || die "feat_bk8 train failed"
fresh_ckpt feat_bk8 "$T0"; FEAT_BK=$CKPT

T0=$(date +%s)
python train.py --pipeline align --logdir logs_r5 --name align_bk8 \
    --max_epochs 160 --synthetic_train_size 512 -v -5 \
    --num_train_reg_iter 2 --resume "$FEAT_BK" "${BK[@]}" "${PERF[@]}" \
    "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" \
    > logs_r5/align_bk8.train.log 2>&1 || die "align_bk8 train failed"
fresh_ckpt align_bk8 "$T0"; ABK=$CKPT

evaluate r10_tbk_full "$ABK/model_best.msgpack" "${PERF[@]}" "${BK[@]}"
evaluate r10_tbk_p07  "$ABK/model_best.msgpack" "${PERF[@]}" "${BK[@]}" \
    "${ROBUST[@]}"
evaluate r10_tbk_p05  "$ABK/model_best.msgpack" "${PERF[@]}" "${BK[@]}" \
    "${P05[@]}"

step "queue10c done"
