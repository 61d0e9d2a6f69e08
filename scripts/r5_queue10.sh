#!/usr/bin/env bash
# Round-5 queue 10 — the quality-push trainings that build on the queue-6
# scale-probe discovery (2x data/epochs on the p0.5 curriculum beats every
# recorded rung: e6 raw 1.000/0.992/0.617):
#
#  P: bench + union profile of the channels+knobs deploy config
#     (inlier_num_knn 8 + inlier_num_layers 2 + dist,recip channels) —
#     the honest bench numbers for the case where the flagship deploy
#     config includes the channels (queue-7 align_flag).
#  X: align_xscale — dist,recip channels retrain at DEFAULT k16 on the
#     queue-6 scaled feat chain. Pure quality-flagship candidate: channels
#     were worth +0.015/+0.055 on the e1b chain (e2b); this measures them
#     on the scaled chain. 3 raw rungs at 128 pairs.
#  S2: feat_scale2 + align_scale2 — 2x data AGAIN (1024 synthetic pairs,
#     epochs held at the queue-6 budget) to test whether the data axis is
#     saturated. 3 raw rungs at 128 pairs.
#
# Waits on the queue9 script process (TPU single-tenant).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r5
exec > >(tee -a logs_r5/queue10.log) 2>&1

if [ -f /tmp/q9.pid ]; then
  PREV=$(cat /tmp/q9.pid)
  while kill -0 "$PREV" 2>/dev/null; do sleep 30; done
fi

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }
die()  { echo "FATAL: $*"; exit 1; }

COMMON=(--dataset_type Synthetic --num_points 1024 --feat_len 3
        --rot_mag 30 --trans_mag 1.0 --thres_radius 0.9)
TRAIN=(-bs 8 --num_workers 4 --summary_every 100000)
CURR=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
ROBUST=(--synthetic_p_keep 0.7 --synthetic_noise 0.02)
P05=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
XTRA=(--inlier_extra_feats dist,recip)

evaluate() {  # $1 outname, $2 ckpt-file, rest: extra flags
  local name=$1 ckpt=$2; shift 2
  step "eval $name"
  python test.py --pipeline align --resume "$ckpt" \
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

step "P1 bench channels + knobs deploy config"
DEEPSIR_BENCH_INLIER_KNN=8 DEEPSIR_BENCH_INLIER_LAYERS=2 \
DEEPSIR_BENCH_EXTRA_FEATS=dist,recip python bench.py \
    > logs_r5/bench_knn8_inl2_chan.json 2>&1 || echo "P1 FAILED"
step "P2 profile channels + knobs deploy config bs2"
python scripts/profile_align.py --batch 2 --inlier_num_knn 8 \
    --inlier_num_layers 2 --inlier_extra_feats dist,recip \
    > logs_r5/profile_knn8_inl2_chan_bs2.txt 2>&1 || echo "P2 FAILED"

FEAT_SC=$(ls -d logs_r4/*feat_scale/ckpt 2>/dev/null | tail -1)
[ -n "$FEAT_SC" ] || die "no feat_scale ckpt"

T0=$(date +%s)
step "X train align_xscale (channels, default k, scaled chain)"
python train.py --pipeline align --logdir logs_r5 --name align_xscale \
    --max_epochs 160 --synthetic_train_size 512 -v -5 \
    --num_train_reg_iter 2 --resume "$FEAT_SC" "${XTRA[@]}" \
    "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" \
    > logs_r5/align_xscale.train.log 2>&1 || die "align_xscale train failed"
fresh_ckpt align_xscale "$T0"; XS=$CKPT

evaluate r10_xs_full "$XS/model_best.msgpack" "${XTRA[@]}"
evaluate r10_xs_p07  "$XS/model_best.msgpack" "${XTRA[@]}" "${ROBUST[@]}"
evaluate r10_xs_p05  "$XS/model_best.msgpack" "${XTRA[@]}" "${P05[@]}"

LABEL_CKPT=$(ls -d logs_r4/*label_po5/ckpt 2>/dev/null | tail -1)
[ -n "$LABEL_CKPT" ] || die "no label ckpt"

T0=$(date +%s)
step "S2 train feat_scale2 (30 ep x 1024 pairs, overlap-masked detector)"
python train.py --pipeline feat --logdir logs_r5 --name feat_scale2 \
    --max_epochs 30 --synthetic_train_size 1024 -v 0 \
    --resume "$LABEL_CKPT" --overlap_det_mask true \
    "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" \
    > logs_r5/feat_scale2.train.log 2>&1 || die "feat_scale2 train failed"
fresh_ckpt feat_scale2 "$T0"; FEAT_S2=$CKPT

T0=$(date +%s)
step "S2 train align_scale2 (160 ep x 1024 pairs, raw forward)"
python train.py --pipeline align --logdir logs_r5 --name align_scale2 \
    --max_epochs 160 --synthetic_train_size 1024 -v -5 \
    --num_train_reg_iter 2 --resume "$FEAT_S2" \
    "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" \
    > logs_r5/align_scale2.train.log 2>&1 || die "align_scale2 train failed"
fresh_ckpt align_scale2 "$T0"; AS2=$CKPT

evaluate r10_s2_full "$AS2/model_best.msgpack"
evaluate r10_s2_p07  "$AS2/model_best.msgpack" "${ROBUST[@]}"
evaluate r10_s2_p05  "$AS2/model_best.msgpack" "${P05[@]}"

step "queue10 done"
