#!/usr/bin/env bash
# Round-4 queue 6 — the training-scale probe on the winning e1b recipe:
# 2x data (512 synthetic pairs) and 2x epochs (160) for the feat and align
# stages on the p0.5 curriculum (label stage reused from e1b — its
# scale-derived targets are crop-insensitive and its mIoU was flat by
# epoch 60 at the matched-budget study). Attacks the last VERDICT item-1
# delta: raw p0.5 0.445 vs the 0.45 target. Round-3's "4x data lost"
# lesson was a FULL-OVERLAP align-only A/B; the robust rungs have never
# had a scale probe.  Chained behind queue5 via pid file.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4
exec > >(tee -a logs_r4/queue6.log) 2>&1

if [ -f /tmp/q5.pid ]; then
  PREV=$(cat /tmp/q5.pid)
  while kill -0 "$PREV" 2>/dev/null; do sleep 30; done
fi

COMMON=(--dataset_type Synthetic --num_points 1024 --feat_len 3
        --rot_mag 30 --trans_mag 1.0 --thres_radius 0.9)
TRAIN=(-bs 8 --num_workers 4 --summary_every 100000)
CURR=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
GATE=(--mutual_check true --mutual_check_tol 0.6)
ROBUST=(--synthetic_p_keep 0.7 --synthetic_noise 0.02)
P05=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
FEAT_SCALE=(--max_epochs 30 --synthetic_train_size 512 -v 0)
ALIGN_SCALE=(--max_epochs 160 --synthetic_train_size 512 -v -5)

LABEL_CKPT=$(ls -d logs_r4/*label_po5/ckpt 2>/dev/null | tail -1)
[ -n "$LABEL_CKPT" ] || { echo "FATAL: no label ckpt"; exit 1; }

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }
die()  { echo "FATAL: $*"; exit 1; }

fresh_ckpt() {  # $1 name, $2 start-epoch-seconds; sets $CKPT
  CKPT=$(ls -d logs_r4/*"$1"/ckpt 2>/dev/null | tail -1)
  [ -n "$CKPT" ] || die "no ckpt dir for $1"
  [ "$(stat -c %Y "$CKPT/model_best.msgpack")" -ge "$(($2 - 60))" ] \
      || die "stale checkpoint for $1: $CKPT"
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

T0=$(date +%s)
step "train feat_scale (30 ep x 512 pairs, overlap-masked detector)"
python train.py --pipeline feat --logdir logs_r4 --name feat_scale \
    --resume "$LABEL_CKPT" --overlap_det_mask true \
    "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" "${FEAT_SCALE[@]}" \
    > logs_r4/feat_scale.train.log 2>&1 || die "feat_scale train failed"
fresh_ckpt feat_scale "$T0"; FEAT_SC=$CKPT

T0=$(date +%s)
step "train align_scale (160 ep x 512 pairs, raw forward)"
python train.py --pipeline align --logdir logs_r4 --name align_scale \
    --num_train_reg_iter 2 --resume "$FEAT_SC" \
    "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" "${ALIGN_SCALE[@]}" \
    > logs_r4/align_scale.train.log 2>&1 || die "align_scale train failed"
fresh_ckpt align_scale "$T0"; ALIGN_SC=$CKPT

evaluate e6_full_raw "$ALIGN_SC"
evaluate e6_p07_raw  "$ALIGN_SC" "${ROBUST[@]}"
evaluate e6_p05_raw  "$ALIGN_SC" "${P05[@]}"
evaluate e6_p07_gate "$ALIGN_SC" "${ROBUST[@]}" "${GATE[@]}"
evaluate e6_p05_gate "$ALIGN_SC" "${P05[@]}" "${GATE[@]}"

step "queue6 done"
