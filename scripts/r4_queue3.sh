#!/usr/bin/env bash
# Round-4 queue 3 — the deep attack on VERDICT item 1: retrain the
# detector/descriptor (feat) stage itself on the partial-overlap curriculum
# with the overlap-masked detector loss (round-3 analysis: the detector term
# REWARDS scoring non-overlap points high unless masked — losses/detdes.py),
# then two align variants (gate-in-train vs raw) on top, then the
# {full, p0.7, p0.5} x {raw, gate} eval matrix for both.
#
# Stages (all TPU, serialized; chained behind queue2 via pid file):
#   label: retrained on the p0.5 curriculum (staged_po retrained label on its
#          curriculum too; scale-derived labels are crop-insensitive but the
#          backbone sees cropped clouds)
#   feat:  p0.5 curriculum + --overlap_det_mask true
#   align A: p0.5 curriculum, gate-in-train (tol 0.6)
#   align B: p0.5 curriculum, raw train forward
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4
exec > >(tee -a logs_r4/queue3.log) 2>&1

if [ -f /tmp/q2.pid ]; then
  PREV=$(cat /tmp/q2.pid)
  while kill -0 "$PREV" 2>/dev/null; do sleep 30; done
fi

COMMON=(--dataset_type Synthetic --num_points 1024 --feat_len 3
        --rot_mag 30 --trans_mag 1.0 --thres_radius 0.9)
TRAIN=(-bs 8 --num_workers 4 --summary_every 100000)
CURR=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
GATE=(--mutual_check true --mutual_check_tol 0.6)
ROBUST=(--synthetic_p_keep 0.7 --synthetic_noise 0.02)
P05=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }
die()  { echo "FATAL: $*"; exit 1; }

fresh_ckpt() {  # $1 name, $2 start-epoch-seconds; sets $CKPT
  CKPT=$(ls -d logs_r4/*"$1"/ckpt 2>/dev/null | tail -1)
  [ -n "$CKPT" ] || die "no ckpt dir for $1"
  [ "$(stat -c %Y "$CKPT/model_best.msgpack")" -ge "$(($2 - 60))" ] \
      || die "stale checkpoint for $1: $CKPT"
  echo "-> $CKPT"
}

step "train label_po5"
T0=$(date +%s)
python train.py --pipeline label --logdir logs_r4 --name label_po5 \
    --max_epochs 30 -v 0 "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" \
    > logs_r4/label_po5.train.log 2>&1 || die "label train failed"
fresh_ckpt label_po5 "$T0"; LABEL_CKPT=$CKPT

step "train feat_po5mask (overlap-masked detector loss)"
T0=$(date +%s)
python train.py --pipeline feat --logdir logs_r4 --name feat_po5mask \
    --max_epochs 15 -v 0 --resume "$LABEL_CKPT" --overlap_det_mask true \
    "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" \
    > logs_r4/feat_po5mask.train.log 2>&1 || die "feat train failed"
fresh_ckpt feat_po5mask "$T0"; FEAT_CKPT=$CKPT

train_align() {  # $1 name, rest: extra flags; sets $CKPT
  local name=$1; shift
  local start; start=$(date +%s)
  step "train $name"
  python train.py --pipeline align --logdir logs_r4 --name "$name" \
      --max_epochs 80 -v -5 --synthetic_train_size 256 \
      --num_train_reg_iter 2 --resume "$FEAT_CKPT" \
      "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" "$@" \
      > "logs_r4/$name.train.log" 2>&1 \
      || die "train $name failed (see logs_r4/$name.train.log)"
  fresh_ckpt "$name" "$start"
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

train_align align_stg5gate "${GATE[@]}"; CKPT_A=$CKPT
train_align align_stg5raw;               CKPT_B=$CKPT

for tag in a b; do
  if [ "$tag" = a ]; then ckpt=$CKPT_A; else ckpt=$CKPT_B; fi
  evaluate "e1${tag}_full_raw"   "$ckpt"
  evaluate "e1${tag}_full_gate"  "$ckpt" "${GATE[@]}"
  evaluate "e1${tag}_p07_raw"    "$ckpt" "${ROBUST[@]}"
  evaluate "e1${tag}_p07_gate"   "$ckpt" "${ROBUST[@]}" "${GATE[@]}"
  evaluate "e1${tag}_p05_raw"    "$ckpt" "${P05[@]}"
  evaluate "e1${tag}_p05_gate"   "$ckpt" "${P05[@]}" "${GATE[@]}"
done

step "queue3 done"
