#!/usr/bin/env bash
# Round-4 queue 1b — resume of r4_queue1.sh after the round boundary killed
# it mid-way: the align_p05gate train COMPLETED (best val succ 0.4375,
# logs_r4/260819_001128_align_p05gate/ckpt), the align_p05raw ablation train
# died at epoch 9, and none of the 12 evals ran.  This script re-trains only
# p05raw and then runs the full eval matrix for both checkpoints.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4
exec > >(tee -a logs_r4/queue1.log) 2>&1

COMMON=(--dataset_type Synthetic --num_points 1024 --feat_len 3
        --rot_mag 30 --trans_mag 1.0 --thres_radius 0.9)
TRAIN=(-bs 8 --num_workers 4 --summary_every 100000)
CURR=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
FEAT_CKPT=logs_r3/staged_po/260817_185849_feat/ckpt

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }
die()  { echo "FATAL: $*"; exit 1; }

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

GATE=(--mutual_check true --mutual_check_tol 0.6)
ROBUST=(--synthetic_p_keep 0.7 --synthetic_noise 0.02)
P05=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)

CKPT_A=logs_r4/260819_001128_align_p05gate/ckpt
[ -f "$CKPT_A/model_best.msgpack" ] || die "missing completed gate ckpt"

train_align align_p05raw; CKPT_B=$CKPT

for tag in a b; do
  if [ "$tag" = a ]; then ckpt=$CKPT_A; else ckpt=$CKPT_B; fi
  evaluate "e0${tag}_full_raw"   "$ckpt"
  evaluate "e0${tag}_full_gate"  "$ckpt" "${GATE[@]}"
  evaluate "e0${tag}_p07_raw"    "$ckpt" "${ROBUST[@]}"
  evaluate "e0${tag}_p07_gate"   "$ckpt" "${ROBUST[@]}" "${GATE[@]}"
  evaluate "e0${tag}_p05_raw"    "$ckpt" "${P05[@]}"
  evaluate "e0${tag}_p05_gate"   "$ckpt" "${P05[@]}" "${GATE[@]}"
done

step "queue1b done"
