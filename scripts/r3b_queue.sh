#!/usr/bin/env bash
# Round-3 second-session measurement queue.  Everything that touches the TPU
# is serialized here (the chip is single-tenant through the tunnel); CPU
# evals are interleaved in the same serial stream so they never contend with
# a TPU job's host thread on this one-core box.
#
# Produces:
#   logs_r3b/bench_head.json            fresh flagship bench at HEAD
#   logs_r3b/label_<probe>/             fc_norm/epoch/seed label probes
#   logs_r3b/label_<probe>_eval/        ... their 128-pair CPU mIoU evals
#   logs_r3b/tpu_<rung>_<cfg>/          128-pair TPU confirmations (staged_po)
#   logs_r3b/profile_<arm>.txt          xplane device-time profiles
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r3b

COMMON=(--dataset_type Synthetic --num_points 1024 --feat_len 3
        --rot_mag 30 --trans_mag 1.0 --thres_radius 0.9)
TRAIN=(-bs 8 --num_workers 4 --summary_every 100000 -v 0)
ALIGN_CKPT=logs_r3/staged_po/260817_191109_align/ckpt/model_best.msgpack

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

# ---- label-pipeline probes (the one axis the reference leads) -------------
# train on the TPU (fast), eval mIoU on CPU exact fp32 — the same protocol
# as the recorded reference/ours table (BASELINE.md label note)
label_probe() {
  # $1 probe name, $2 model flags (shared train+eval, e.g. fc_norm — the
  # eval must rebuild the SAME param tree), $3 train-only flags
  local name=$1 model_flags=$2 train_flags=$3
  local start; start=$(date +%s)
  step "label probe $name: train"
  # shellcheck disable=SC2086
  python train.py --pipeline label --logdir logs_r3b --name "label_$name" \
      --max_epochs 30 $model_flags $train_flags "${COMMON[@]}" "${TRAIN[@]}" \
      > "logs_r3b/label_$name.log" 2>&1 \
      || { echo "TRAIN FAILED: label_$name (skipping its eval)"; return 1; }
  local ckpt
  ckpt=$(ls -d logs_r3b/*label_$name/ckpt/model_best.msgpack 2>/dev/null | tail -1)
  # freshness guard (ADVICE r3): a failed/step-zero train must not hand a
  # STALE checkpoint from an earlier same-name probe to the eval
  [ -n "$ckpt" ] && [ "$(stat -c %Y "$ckpt")" -ge "$((start - 60))" ] \
      || { echo "STALE/MISSING CKPT: label_$name"; return 1; }
  step "label probe $name: 128-pair CPU mIoU eval"
  # shellcheck disable=SC2086
  python scripts/run_cpu.py test.py --pipeline label --resume "$ckpt" \
      --synthetic_eval_size 128 --eval_save_path "logs_r3b/label_${name}_eval" \
      $model_flags "${COMMON[@]}" > "logs_r3b/label_${name}_eval.log" 2>&1
  grep -i "mean iou" "logs_r3b/label_${name}_eval.log" | tail -2
}

label_probe batch30   "--fc_norm batch" ""
label_probe group60   ""                "--max_epochs 60"
label_probe batch60   "--fc_norm batch" "--max_epochs 60"
label_probe group30s1 ""                "--seed 1"

# ---- 128-pair TPU confirmations of the robustness ladder ------------------
# staged_po ckpt; rungs and opt-in stacks recorded from CPU in BASELINE.md,
# re-measured here on the real chip (matmul_precision=highest default)
tpu_eval() {
  local name=$1; shift
  step "tpu eval $name"
  python test.py --pipeline align --resume "$ALIGN_CKPT" \
      --synthetic_eval_size 128 --clip_weight_thresh 0.05 \
      --eval_save_path "logs_r3b/tpu_$name" "${COMMON[@]}" "$@" \
      > "logs_r3b/tpu_$name.log" 2>&1
  tail -5 "logs_r3b/tpu_$name.log" | grep -v "^$" | tail -3
  ls logs_r3b/tpu_$name/*/summary_metrics.json 2>/dev/null | tail -1 | xargs cat 2>/dev/null
}

ROBUST=(--synthetic_p_keep 0.7 --synthetic_noise 0.02)
P05=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
GATE=(--mutual_check true --mutual_check_tol 0.6)

tpu_eval robust_raw        "${ROBUST[@]}"
tpu_eval robust_gate       "${ROBUST[@]}" "${GATE[@]}"
tpu_eval robust_gate_icp   "${ROBUST[@]}" "${GATE[@]}" --use_icp true
tpu_eval robust_full       "${ROBUST[@]}" "${GATE[@]}" --use_ransac true --use_icp true
tpu_eval p05_full          "${P05[@]}"    "${GATE[@]}" --use_ransac true --use_icp true
tpu_eval full_gate         "${GATE[@]}"

# ---- perf-sensitive steps: LAST so the one-core host is idle by now -------
step "fresh bench at HEAD"
python bench.py > logs_r3b/bench_head.json 2> logs_r3b/bench_head.err
cat logs_r3b/bench_head.json

# ---- device-time profile arms (idle host required; queue is serial) -------
step "profile: flagship fp32"
python scripts/profile_align.py --batch 2 > logs_r3b/profile_base.txt 2>&1
step "profile: inlier bf16"
python scripts/profile_align.py --batch 2 --inlier_compute_dtype bfloat16 \
    > logs_r3b/profile_inlier_bf16.txt 2>&1
step "profile: mutual gate"
python scripts/profile_align.py --batch 2 --mutual_check \
    > logs_r3b/profile_mutual.txt 2>&1

step "queue done"
