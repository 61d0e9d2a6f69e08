#!/usr/bin/env bash
# Round-5 queue 9 — the deterministic TPU work items from the round-4
# VERDICT that don't depend on queue 7/8 outcomes:
#
#  R: VERDICT item 4 — the imported reference align checkpoint
#     (logs_r5/ref_import_ckpt, from scripts/import_reference_ckpt.py)
#     through OUR eval driver at 128 pairs, full rung; compared offline
#     against the torch reference's own eval of the SAME checkpoint on
#     the SAME pairs (logs_r5/ref_torch_full128.json).
#  G: VERDICT item 3's missing cell — e2b (align_xboth) p0.5 rung with the
#     relaxed mutual gate.
#  S: gate-free robust stack ladder on align_scale (the queue-6 scale-probe
#     winner: raw 1.000/0.992/0.617) — raw numbers exist (e6_*); this adds
#     +finetune and +finetune+RANSAC+ICP arms.
#  K: VERDICT item 7 — randla_skips='post' (reference-faithful pooled
#     decoder skips) staged retrain at the EXACT budget of the current
#     flagship chain (label 30ep x 256 -> feat 30ep x 512 masked ->
#     align 160ep x 512 raw, p0.5 curriculum) + 128-pair rungs.
#
# Waits on the queue8 script process (TPU single-tenant).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r5
exec > >(tee -a logs_r5/queue9.log) 2>&1

for pid in 1309; do
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
POST=(--randla_skips post)

evaluate() {  # $1 outname, $2 ckpt-file-or-dir, rest: extra flags
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

step "R imported reference ckpt through our eval driver, 128 pairs full rung"
evaluate r9_ref_import_full "logs_r5/ref_import_ckpt/model_best.msgpack" \
    --fc_norm none --randla_skips post

E2B=$(ls -d logs_r4/*align_xboth/ckpt 2>/dev/null | tail -1)
if [ -n "$E2B" ]; then
  step "G e2b p0.5 gate cell (VERDICT item 3)"
  evaluate r9_e2b_p05_gate "$E2B/model_best.msgpack" \
      --inlier_extra_feats dist,recip "${P05[@]}" "${GATE[@]}"
else
  echo "SKIP G: no align_xboth ckpt"
fi

ASC=$(ls -d logs_r4/*align_scale/ckpt 2>/dev/null | tail -1)
if [ -n "$ASC" ]; then
  step "S gate-free stack ladder on align_scale"
  evaluate r9_asc_ft_full "$ASC/model_best.msgpack" --use_finetune true
  evaluate r9_asc_ft_p07  "$ASC/model_best.msgpack" --use_finetune true "${ROBUST[@]}"
  evaluate r9_asc_ft_p05  "$ASC/model_best.msgpack" --use_finetune true "${P05[@]}"
  evaluate r9_asc_all_p07 "$ASC/model_best.msgpack" --use_finetune true \
      --use_ransac true --use_icp true "${ROBUST[@]}"
  evaluate r9_asc_all_p05 "$ASC/model_best.msgpack" --use_finetune true \
      --use_ransac true --use_icp true "${P05[@]}"
else
  echo "SKIP S: no align_scale ckpt"
fi

step "K randla_skips=post staged chain at the flagship budget"
T0=$(date +%s)
step "train label_post (30 ep, p0.5 curriculum)"
python train.py --pipeline label --logdir logs_r5 --name label_post \
    --max_epochs 30 -v 0 "${POST[@]}" \
    "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" \
    > logs_r5/label_post.train.log 2>&1 || die "label_post train failed"
fresh_ckpt label_post "$T0"; LABEL_P=$CKPT

T0=$(date +%s)
step "train feat_post (30 ep x 512, overlap-masked detector)"
python train.py --pipeline feat --logdir logs_r5 --name feat_post \
    --max_epochs 30 --synthetic_train_size 512 -v 0 \
    --resume "$LABEL_P" --overlap_det_mask true "${POST[@]}" \
    "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" \
    > logs_r5/feat_post.train.log 2>&1 || die "feat_post train failed"
fresh_ckpt feat_post "$T0"; FEAT_P=$CKPT

T0=$(date +%s)
step "train align_post (160 ep x 512, raw forward)"
python train.py --pipeline align --logdir logs_r5 --name align_post \
    --max_epochs 160 --synthetic_train_size 512 -v -5 \
    --num_train_reg_iter 2 --resume "$FEAT_P" "${POST[@]}" \
    "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" \
    > logs_r5/align_post.train.log 2>&1 || die "align_post train failed"
fresh_ckpt align_post "$T0"; ALIGN_P=$CKPT

evaluate r9_post_full "$ALIGN_P/model_best.msgpack" "${POST[@]}"
evaluate r9_post_p07  "$ALIGN_P/model_best.msgpack" "${POST[@]}" "${ROBUST[@]}"
evaluate r9_post_p05  "$ALIGN_P/model_best.msgpack" "${POST[@]}" "${P05[@]}"

step "queue9 done"
