#!/usr/bin/env bash
# Round-5 queue 11 — final evidence queue:
#
#  F: rerun of e7f_full_raw (the first run was killed by a remote-compile
#     hang, logs_r4/queue7.log) — the missing full-rung cell for the
#     align_fast (knn8+inl2, no channels) deploy candidate.
#  M: morton-order gate on the deploy candidate: bench knn8+inl2+morton
#     (r4 measured knn8+morton at 35.13 vs knn8 33.66) and the three raw
#     rungs of align_fast evaluated with --pyramid_order morton. Morton is
#     an eval-time data-layer knob; if rungs hold, it joins the deploy
#     config.
#  L: gate-free best-numbers ladder on align_flag (e7g, the combined-knob
#     + channels retrain): +finetune on all three rungs, +finetune+RANSAC
#     +ICP on the two robust rungs (the relaxed mutual gate HURTS channel
#     checkpoints — round-4 finding — so the stack is gate-free).
#  Z: final deploy-config bench with bench.py DEFAULTS (flipped to the
#     adopted quality-clean knobs by the time this runs) -> the number
#     BENCH_r05.json will reproduce.
#
# Waits on the queue10 script process (TPU single-tenant).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r5
exec > >(tee -a logs_r5/queue11.log) 2>&1

for pid in 30505; do
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
done

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

COMMON=(--dataset_type Synthetic --num_points 1024 --feat_len 3
        --rot_mag 30 --trans_mag 1.0 --thres_radius 0.9)
ROBUST=(--synthetic_p_keep 0.7 --synthetic_noise 0.02)
P05=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
PERF=(--inlier_num_knn 8 --inlier_num_layers 2)
XTRA=(--inlier_extra_feats dist,recip)

evaluate() {  # $1 outname, $2 ckpt-file, rest: extra flags
  local name=$1 ckpt=$2; shift 2
  step "eval $name"
  timeout 1500 python test.py --pipeline align --resume "$ckpt" \
      --synthetic_eval_size 128 --clip_weight_thresh 0.05 \
      --eval_save_path "logs_r5/$name" "${COMMON[@]}" "$@" \
      > "logs_r5/$name.log" 2>&1 \
      || { echo "EVAL FAILED: $name"; return 1; }
  local summ
  summ=$(ls "logs_r5/$name"/*/summary_metrics.json 2>/dev/null | tail -1)
  [ -n "$summ" ] || { echo "NO SUMMARY: $name"; return 1; }
  echo "$name: $(cat "$summ")"
}

FAST=$(ls -d logs_r4/*align_fast/ckpt 2>/dev/null | tail -1)
FLAGC=$(ls -d logs_r4/*align_flag/ckpt 2>/dev/null | tail -1)

if [ -n "$FAST" ]; then
  step "F e7f_full_raw rerun"
  evaluate r11_e7f_full "$FAST/model_best.msgpack" "${PERF[@]}"

  step "M1 bench knn8+inl2+morton"
  DEEPSIR_BENCH_INLIER_KNN=8 DEEPSIR_BENCH_INLIER_LAYERS=2 \
  DEEPSIR_BENCH_ORDER=morton timeout 1800 python bench.py \
      > logs_r5/bench_knn8_inl2_morton.json 2>&1 || echo "M1 FAILED"
  step "M2-4 morton rungs on align_fast"
  evaluate r11_fast_morton_full "$FAST/model_best.msgpack" "${PERF[@]}" \
      --pyramid_order morton
  evaluate r11_fast_morton_p07  "$FAST/model_best.msgpack" "${PERF[@]}" \
      --pyramid_order morton "${ROBUST[@]}"
  evaluate r11_fast_morton_p05  "$FAST/model_best.msgpack" "${PERF[@]}" \
      --pyramid_order morton "${P05[@]}"
else
  echo "SKIP F/M: no align_fast ckpt"
fi

if [ -n "$FLAGC" ]; then
  step "L gate-free ladder on align_flag"
  evaluate r11_flag_ft_full "$FLAGC/model_best.msgpack" "${PERF[@]}" \
      "${XTRA[@]}" --use_finetune true
  evaluate r11_flag_ft_p07  "$FLAGC/model_best.msgpack" "${PERF[@]}" \
      "${XTRA[@]}" --use_finetune true "${ROBUST[@]}"
  evaluate r11_flag_ft_p05  "$FLAGC/model_best.msgpack" "${PERF[@]}" \
      "${XTRA[@]}" --use_finetune true "${P05[@]}"
  evaluate r11_flag_all_p07 "$FLAGC/model_best.msgpack" "${PERF[@]}" \
      "${XTRA[@]}" --use_finetune true --use_ransac true --use_icp true \
      "${ROBUST[@]}"
  evaluate r11_flag_all_p05 "$FLAGC/model_best.msgpack" "${PERF[@]}" \
      "${XTRA[@]}" --use_finetune true --use_ransac true --use_icp true \
      "${P05[@]}"
else
  echo "SKIP L: no align_flag ckpt"
fi

step "Z final deploy-config bench (bench.py defaults)"
timeout 1800 python bench.py > logs_r5/bench_final_deploy.json 2>&1 \
    || echo "Z FAILED"
cat logs_r5/bench_final_deploy.json

step "queue11 done"
